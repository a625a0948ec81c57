"""Finer-grained profiler: time build-plan vs write-job vs lineage vs
release inside each stage at local[1]. Diagnostic only."""
from __future__ import annotations

import os
import sys
import tempfile
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000


def main() -> None:
    from deduplicator_go_spark import sources
    from deduplicator_go_spark.config import DedupConfig
    from deduplicator_go_spark.fixtures.webtext import generate
    from deduplicator_go_spark.plans.pipeline import DedupPipeline
    from deduplicator_go_spark.session import get_spark
    from deduplicator_go_spark.sources.catalog import CheckpointCatalog

    corpus_dir = tempfile.mkdtemp(prefix="prof-corpus-")
    pq = os.path.join(corpus_dir, "documents.parquet")
    generate(n_docs=N, seed=42).documents.drop(columns=["kind"]).to_parquet(
        pq, coerce_timestamps="us", allow_truncated_timestamps=True,
        row_group_size=4096,
    )
    spark = get_spark("prof2", cores=1, shuffle_partitions=8)
    docs = spark.read.parquet(pq)
    root = tempfile.mkdtemp(prefix="prof-ckpt-", dir="/dev/shm")
    cat = CheckpointCatalog(root)

    timings: dict[str, dict[str, float]] = {}

    orig_write = CheckpointCatalog.write
    orig_lineage = CheckpointCatalog._record_lineage

    def timed_write(self, df, name, params_hash, **kw):
        t0 = time.time()
        r = orig_write(self, df, name, params_hash, **kw)
        timings.setdefault(name, {})["cat_write"] = time.time() - t0
        return r

    def timed_lineage(self, name, params_hash, wall_ms, reset=True):
        t0 = time.time()
        r = orig_lineage(self, name, params_hash, wall_ms, reset)
        timings.setdefault(name, {})["lineage"] = time.time() - t0
        return r

    CheckpointCatalog.write = timed_write
    CheckpointCatalog._record_lineage = timed_lineage

    pipe = DedupPipeline(spark, cat, DedupConfig())

    orig_release = pipe._release_persisted

    def timed_release():
        t0 = time.time()
        orig_release()
        timings.setdefault("_release", {}).setdefault("total", 0.0)
        timings["_release"]["total"] += time.time() - t0

    pipe._release_persisted = timed_release

    # wrap the stage runners to time build-plan construction separately
    for attr in ("_stage", "_incremental_stage"):
        orig = getattr(pipe, attr)

        def wrap(orig):
            def run(name, build, *a, **kw):
                def timed_build():
                    t0 = time.time()
                    df = build()
                    timings.setdefault(name, {})["build_plan"] = time.time() - t0
                    return df

                t0 = time.time()
                r = orig(name, timed_build, *a, **kw)
                timings.setdefault(name, {})["stage_total"] = time.time() - t0
                return r
            return run

        setattr(pipe, attr, wrap(orig))

    t0 = time.time()
    pipe.run(docs)
    print(f"pipeline wall {time.time() - t0:.1f}s")
    print(f"{'stage':16} {'total':>7} {'build':>7} {'write':>7} {'lineage':>8} {'other':>7}")
    for name, t in timings.items():
        if name == "_release":
            continue
        tot = t.get("stage_total", 0)
        b = t.get("build_plan", 0)
        w = t.get("cat_write", 0)
        ln = t.get("lineage", 0)
        print(f"{name:16} {tot:>7.2f} {b:>7.2f} {w - ln:>7.2f} {ln:>8.2f} {tot - b - w:>7.2f}")
    print("release total:", round(timings.get("_release", {}).get("total", 0), 2))
    spark.stop()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
