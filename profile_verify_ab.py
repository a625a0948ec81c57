"""One-off stage-level A/B: build the 200k catalog once (through
candidates), then time (a) verify with the full 64-bit sig vs the
compact sig32 column, and (b) connected components with AQE on vs off,
N repetitions each, reporting floors. Diagnostic only.

Usage: python profile_verify_ab.py [cores] [n_docs] [reps]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main() -> None:
    from pyspark.sql import functions as F

    from deduplicator_go_spark.config import DedupConfig
    from deduplicator_go_spark.fixtures.webtext import generate
    from deduplicator_go_spark.operators.verify import verify_pairs
    from deduplicator_go_spark.plans.pipeline import DedupPipeline
    from deduplicator_go_spark.session import get_spark
    from deduplicator_go_spark.sources.catalog import CheckpointCatalog

    corpus_dir = tempfile.mkdtemp(prefix="profv-corpus-")
    pq = os.path.join(corpus_dir, "documents.parquet")
    generate(n_docs=N, seed=42).documents.drop(columns=["kind"]).to_parquet(
        pq, coerce_timestamps="us", allow_truncated_timestamps=True,
        row_group_size=4096,
    )
    spark = get_spark("profv", cores=CORES, shuffle_partitions=max(8, CORES))
    docs = spark.read.parquet(pq)
    root = tempfile.mkdtemp(prefix="profv-ckpt-", dir="/dev/shm")
    c = DedupConfig()
    pipe = DedupPipeline(spark, CheckpointCatalog(root), c)
    pipe.run(docs)  # full run: catalog now holds every stage table

    cat = pipe.catalog
    cands = cat.read(spark, "candidates")
    sigs = cat.read(spark, "minhash_sigs")
    valid = cat.read(spark, "valid_docs")
    n_pairs = cands.count()
    print(f"pairs: {n_pairs}  sig cols: {sigs.columns}")

    sink = os.path.join(root, "_ab_out")

    def time_verify(sig_df, label):
        floors = []
        for _ in range(REPS):
            t0 = time.time()
            verify_pairs(cands, valid, c.shingle_size, c.verify_threshold,
                         sigs=sig_df, num_perm=c.num_perm
                         ).write.mode("overwrite").parquet(sink)
            floors.append(time.time() - t0)
        print(f"verify[{label}]: floor {min(floors):.2f}s  runs {['%.2f' % x for x in floors]}")

    time_verify(sigs.select("url", "sig"), "sig64")
    time_verify(sigs, "sig16")

    from deduplicator_go_spark.operators import components as CCM

    edges = (
        cat.read(spark, "verified_pairs").filter("is_dup")
        .select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
        .unionByName(cat.read(spark, "exact_edges").select("src", "dst"))
        .localCheckpoint(eager=True)
    )

    def time_cc(aqe: bool, label: str):
        floors = []
        for _ in range(REPS):
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
            t0 = time.time()
            CCM.connected_components(edges).write.mode("overwrite").parquet(sink)
            floors.append(time.time() - t0)
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        print(f"cc[{label}]: floor {min(floors):.2f}s  runs {['%.2f' % x for x in floors]}")

    # note: connected_components itself forces AQE off for its round
    # loop now; time_cc(True) only varies the surrounding conf.
    time_cc(True, "outer-aqe-on")
    time_cc(False, "outer-aqe-off")

    spark.stop()
    import shutil
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
