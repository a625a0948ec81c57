"""One-off tick profiler: from-scratch run on the base corpus, then one
5% tick on the same catalog — per-stage wall windows for BOTH runs, with
Spark job intervals attributed to tick stages (driver-side gap = wall
not covered by any running job). Diagnostic only — not part of the bench.

Usage: python profile_tick.py [cores] [n_docs]
"""
from __future__ import annotations

import datetime
import json
import os
import sys
import tempfile
import time
import urllib.request

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
FRAC = 0.05


def main() -> None:
    from deduplicator_go_spark.config import DedupConfig
    from deduplicator_go_spark.fixtures.webtext import generate
    from deduplicator_go_spark.plans.pipeline import DedupPipeline
    from deduplicator_go_spark.session import get_spark
    from deduplicator_go_spark.sources.catalog import CheckpointCatalog

    corpus_dir = tempfile.mkdtemp(prefix="proftick-corpus-")
    n_base = int(N * (1 - FRAC))
    docs_all = generate(n_docs=N, seed=42).documents.drop(columns=["kind"])
    base_pq = os.path.join(corpus_dir, "base.parquet")
    full_pq = os.path.join(corpus_dir, "full.parquet")
    for df, pq in ((docs_all.iloc[:n_base], base_pq), (docs_all, full_pq)):
        df.to_parquet(pq, coerce_timestamps="us",
                      allow_truncated_timestamps=True, row_group_size=4096)

    spark = get_spark("proftick", cores=CORES, shuffle_partitions=CORES,
                      extra_conf={"spark.ui.enabled": "true"})
    root = tempfile.mkdtemp(prefix="proftick-ckpt-", dir="/dev/shm")
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

    t0 = time.time()
    r0 = pipe.run(spark.read.parquet(base_pq))
    t_scratch = time.time() - t0
    scratch_stages = {s.name: s.wall_ms / 1000 for s in r0.stages}
    windows.clear()

    t1 = time.time()
    r1 = pipe.run(spark.read.parquet(full_pq))
    t1e = time.time()

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

    jiv = sorted(
        (ts(j["submissionTime"]), ts(j["completionTime"]), j.get("numTasks", 0))
        for j in jobs if "completionTime" in j
    )
    tick_jobs = [(s, e, n) for s, e, n in jiv if e > t1]
    print(f"\nscratch wall {t_scratch:.1f}s  tick wall {t1e - t1:.1f}s  "
          f"tick jobs {len(tick_jobs)}")
    print(f"{'stage':16} {'scr_s':>7} {'tick_s':>7} {'njobs':>5} "
          f"{'jobcov':>7} {'gap':>7}")
    for name, a, b in windows:
        inside = [(max(s, a), min(e, b)) for s, e, _n in tick_jobs
                  if e > a and s < b]
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
        gap = (b - a) - cov
        print(f"{name:16} {scratch_stages.get(name, 0):>7.2f} {b - a:>7.2f} "
              f"{len(inside):>5} {cov:>7.2f} {gap:>7.2f}")
    pre = windows[0][1] - t1 if windows else 0.0
    print(f"pre-stage (input fingerprint): {pre:.2f}s")
    # longest tick jobs
    longest = sorted(((e - s, s - t1, n) for s, e, n in tick_jobs),
                     reverse=True)[:12]
    print("longest tick jobs (dur_s, start_offset_s, ntasks):")
    for d, off, n in longest:
        print(f"  {d:6.2f}  @{off:7.2f}  tasks={n}")
    spark.stop()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
