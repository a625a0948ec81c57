"""One-off profiler: per-JOB timeline inside selected pipeline stages.

Like profile_gaps.py, but prints every Spark job (description,
duration, gap since the previous job finished) inside the wall window
of each requested stage, so barrier/planning costs are attributable to
specific actions. Diagnostic only — not part of the bench.

Usage: python profile_jobs.py [cores] [n_docs] [stage,stage,...]
"""
from __future__ import annotations

import datetime
import json
import os
import sys
import tempfile
import time
import urllib.request

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
STAGES = (sys.argv[3] if len(sys.argv) > 3 else "verified_pairs,clusters").split(",")


def main() -> None:
    from deduplicator_go_spark.config import DedupConfig
    from deduplicator_go_spark.fixtures.webtext import generate
    from deduplicator_go_spark.plans.pipeline import DedupPipeline
    from deduplicator_go_spark.session import get_spark
    from deduplicator_go_spark.sources.catalog import CheckpointCatalog

    corpus_dir = tempfile.mkdtemp(prefix="profj-corpus-")
    pq = os.path.join(corpus_dir, "documents.parquet")
    generate(n_docs=N, seed=42).documents.drop(columns=["kind"]).to_parquet(
        pq, coerce_timestamps="us", allow_truncated_timestamps=True,
        row_group_size=4096,
    )
    spark = get_spark("profj", cores=CORES, shuffle_partitions=max(8, CORES),
                      extra_conf={"spark.ui.enabled": "true"})
    docs = spark.read.parquet(pq)
    root = tempfile.mkdtemp(prefix="profj-ckpt-", dir="/dev/shm")
    pipe = DedupPipeline(spark, CheckpointCatalog(root), DedupConfig())

    windows: list[tuple[str, float, float]] = []

    def wrap(orig):
        def run(name, build, *a, **kw):
            t0 = time.time()
            r = orig(name, build, *a, **kw)
            windows.append((name, t0, time.time()))
            return r
        return run

    pipe._stage = wrap(pipe._stage)
    pipe._incremental_stage = wrap(pipe._incremental_stage)
    pipe.run(docs)

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/jobs?status=succeeded"
    ) as r:
        jobs = json.load(r)

    def ts(s):
        return datetime.datetime.strptime(
            s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
        ).timestamp()

    jrows = sorted(
        (ts(j["submissionTime"]), ts(j["completionTime"]),
         j.get("description") or j.get("name", ""))
        for j in jobs if "completionTime" in j
    )
    for name, a, b in windows:
        if name not in STAGES:
            continue
        print(f"\n== {name}: wall {b - a:.2f}s ==")
        prev_end = a
        for s, e, desc in jrows:
            if e <= a or s >= b:
                continue
            print(f"  gap {s - prev_end:6.2f}  job {e - s:6.2f}  {desc[:110]}")
            prev_end = max(prev_end, e)
        print(f"  tail gap {b - prev_end:6.2f}")
    spark.stop()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
