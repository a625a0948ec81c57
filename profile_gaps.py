"""One-off profiler: run the dedup pipeline once at a given parallelism
with the UI on, record per-stage wall windows, then attribute Spark job
intervals to stages and report each stage's driver-side gap (wall not
covered by any running job). Diagnostic only — not part of the bench.

Usage: python profile_gaps.py [cores] [n_docs]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 1
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000


def main() -> None:
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
    spark = get_spark("prof", cores=CORES, shuffle_partitions=max(8, CORES),
                      extra_conf={"spark.ui.enabled": "true"})
    docs = spark.read.parquet(pq)
    root = tempfile.mkdtemp(prefix="prof-ckpt-", dir="/dev/shm")
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
    t_run0 = time.time()
    pipe.run(docs)
    t_run1 = time.time()

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded") as r:
        jobs = json.load(r)
    import datetime

    def ts(s):
        return datetime.datetime.strptime(
            s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
        ).timestamp()

    jiv = sorted((ts(j["submissionTime"]), ts(j["completionTime"])) for j in jobs
                 if "completionTime" in j)
    print(f"total jobs: {len(jiv)}  pipeline wall: {t_run1 - t_run0:.1f}s")
    print(f"{'stage':16} {'wall':>7} {'njobs':>5} {'jobcov':>7} {'gap':>7}")
    rows = []
    for name, a, b in windows:
        inside = [(max(s, a), min(e, b)) for s, e in jiv if e > a and s < b]
        # union of intervals
        cov = 0.0
        cur_s = cur_e = None
        for s, e in sorted(inside):
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    cov += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            cov += cur_e - cur_s
        n_jobs = len(inside)
        gap = (b - a) - cov
        rows.append((name, b - a, n_jobs, cov, gap))
        print(f"{name:16} {b - a:>7.2f} {n_jobs:>5} {cov:>7.2f} {gap:>7.2f}")
    tot_wall = sum(r[1] for r in rows)
    tot_gap = sum(r[4] for r in rows)
    pre = windows[0][1] - t_run0 if windows else 0.0
    print(f"{'TOTAL':16} {tot_wall:>7.2f} {len(jiv):>5} {'':>7} {tot_gap:>7.2f}")
    print(f"pre-stage (input fingerprint etc): {pre:.2f}s")
    spark.stop()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
