"""One-off A/B floor measurement: run the dedup pipeline R interleaved
rounds at two parallelism levels, print per-stage wall floors next to
the cached scaling floors (BENCH/scaling_floors.json) for comparison.
Diagnostic only — not part of the bench.

Usage: python profile_floor.py [rounds] [n_docs]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile

R = int(sys.argv[1]) if len(sys.argv) > 1 else 2
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000


def main() -> None:
    import bench
    from deduplicator_go_spark.fixtures.webtext import generate

    corpus_dir = tempfile.mkdtemp(prefix="proff-corpus-")
    pq = os.path.join(corpus_dir, "documents.parquet")
    generate(n_docs=N, seed=42).documents.drop(columns=["kind"]).to_parquet(
        pq, coerce_timestamps="us", allow_truncated_timestamps=True,
        row_group_size=4096,
    )
    floors: dict[int, dict[str, int]] = {1: {}, 4: {}}
    walls: dict[int, list[float]] = {1: [], 4: []}
    # untimed warm-up at hi
    s = bench._fresh_spark(4)
    bench.run_pipeline(s, pq, N)
    s.stop()
    for i in range(R):
        for cores in ((1, 4) if i % 2 == 0 else (4, 1)):
            s = bench._fresh_spark(cores)
            r = bench.run_pipeline(s, pq, N)
            s.stop()
            walls[cores].append(r["wall_sec"])
            for k, v in r["stages"].items():
                floors[cores][k] = min(floors[cores].get(k, 1 << 60), v)
    cache = json.load(open("BENCH/scaling_floors.json"))
    print(f"{'stage':16} {'lo_new':>8} {'lo_old':>8} {'hi_new':>8} {'hi_old':>8} {'eff_new':>8} {'eff_old':>8}")
    tot = {"lo_new": 0, "lo_old": 0, "hi_new": 0, "hi_old": 0}
    for k in floors[1]:
        lo_n, hi_n = floors[1][k], floors[4][k]
        lo_o, hi_o = cache["lo"].get(k, 0), cache["hi"].get(k, 0)
        tot["lo_new"] += lo_n; tot["hi_new"] += hi_n
        tot["lo_old"] += lo_o; tot["hi_old"] += hi_o
        eff_n = lo_n / hi_n / 4 if hi_n else 0
        eff_o = lo_o / hi_o / 4 if hi_o else 0
        print(f"{k:16} {lo_n:>8} {lo_o:>8} {hi_n:>8} {hi_o:>8} {eff_n:>8.2f} {eff_o:>8.2f}")
    print(f"{'TOTAL':16} {tot['lo_new']:>8} {tot['lo_old']:>8} {tot['hi_new']:>8} {tot['hi_old']:>8} "
          f"{tot['lo_new']/tot['hi_new']/4:>8.3f} {tot['lo_old']/tot['hi_old']/4:>8.3f}")
    print("walls lo:", walls[1], "hi:", walls[4])
    import shutil
    shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
