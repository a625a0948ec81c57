"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "dedup": {docs_per_sec, n_docs, wall_sec},
   "scaling": {cores_lo, cores_hi, docs_per_sec_lo, docs_per_sec_hi,
               efficiency}}

and refreshes BENCH/BASELINE.md with the scaling-efficiency evidence
(north rule: same job at N and 4N parallelism on the same input;
efficiency = (throughput_hi / throughput_lo) / (cores_hi / cores_lo)).

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_N_DOCS (default 20000),
BENCH_SCALING=0 to skip the scaling runs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("BENCH_N_DOCS", "20000"))
DO_SCALING = os.environ.get("BENCH_SCALING", "1") != "0"

HEADLINE = [
    "exact_dup_groups",
    "cluster_labels",
    "ngram_pairs",
    "embedding_topk",
    "pricing_summary",
    "top_revenue_orders",
    "events_hourly",
    "sessionize",
    "change_detection",
]


def _fresh_spark(cores: int):
    from deduplicator_go_spark.session import get_spark

    return get_spark("bench", cores=cores, shuffle_partitions=max(8, cores))


def run_headline(spark) -> dict[str, float]:
    import __spark_entry__ as E

    out: dict[str, float] = {}
    qs = E.queries()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, SF_DIR).collect()
        out[name] = round(time.time() - t0, 3)
    return out


def run_pipeline(spark, docs_parquet: str, n_docs: int) -> dict:
    from deduplicator_go_spark.config import DedupConfig
    from deduplicator_go_spark.plans.pipeline import DedupPipeline
    from deduplicator_go_spark.sources.catalog import CheckpointCatalog

    docs = spark.read.parquet(docs_parquet)
    root = tempfile.mkdtemp(prefix="bench-ckpt-")
    try:
        pipe = DedupPipeline(spark, CheckpointCatalog(root), DedupConfig(), with_substr=True)
        report = pipe.run(docs)
        return {
            "n_docs": report.docs_in,
            "wall_sec": round(report.wall_sec, 3),
            "docs_per_sec": round(report.docs_per_sec(), 1),
            "stages": {s.name: s.wall_ms for s in report.stages},
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    t_all = time.time()

    # deterministic bench corpus, generated once to parquet
    corpus_dir = tempfile.mkdtemp(prefix="bench-corpus-")
    docs_parquet = os.path.join(corpus_dir, "documents.parquet")
    from deduplicator_go_spark.fixtures.webtext import generate

    corpus = generate(n_docs=N_DOCS, seed=42)
    # coerce to microseconds — Spark cannot read TIMESTAMP(NANOS) parquet
    corpus.documents.drop(columns=["kind"]).to_parquet(
        docs_parquet, coerce_timestamps="us", allow_truncated_timestamps=True
    )

    try:
        spark = _fresh_spark(CPUS)
        queries = run_headline(spark)
        dedup_hi = run_pipeline(spark, docs_parquet, N_DOCS)
        spark.stop()

        scaling = None
        if DO_SCALING:
            lo_cores = max(2, CPUS // 4)
            spark_lo = _fresh_spark(lo_cores)
            dedup_lo = run_pipeline(spark_lo, docs_parquet, N_DOCS)
            spark_lo.stop()
            speedup = dedup_hi["docs_per_sec"] / max(dedup_lo["docs_per_sec"], 1e-9)
            eff = speedup / (CPUS / lo_cores)
            scaling = {
                "cores_lo": lo_cores,
                "cores_hi": CPUS,
                "docs_per_sec_lo": dedup_lo["docs_per_sec"],
                "docs_per_sec_hi": dedup_hi["docs_per_sec"],
                "speedup": round(speedup, 3),
                "efficiency": round(eff, 3),
            }
            _write_baseline_md(queries, dedup_hi, scaling)

        total = round(sum(queries.values()) + dedup_hi["wall_sec"], 3)
        print(
            json.dumps(
                {
                    "metric": "headline_queries_plus_dedup_pipeline",
                    "value": total,
                    "unit": "sec",
                    "queries": queries,
                    "sf": SF_DIR.rstrip("/").split("sf")[-1],
                    "dedup": dedup_hi,
                    "scaling": scaling,
                    "bench_wall_sec": round(time.time() - t_all, 1),
                }
            )
        )
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)


def _write_baseline_md(queries, dedup, scaling) -> None:
    os.makedirs("BENCH", exist_ok=True)
    lines = [
        "# BENCH/BASELINE.md — measured numbers (this engine)",
        "",
        f"Corpus: deterministic synthetic webtext, n_docs={dedup['n_docs']}, seed=42",
        f"Host: local mode, {os.cpu_count()} CPUs visible",
        "",
        "## End-to-end dedup pipeline (exact + MinHash/LSH + verify + CC + substr)",
        "",
        f"- wall: {dedup['wall_sec']} s → **{dedup['docs_per_sec']} docs/sec** at {scaling['cores_hi']} cores",
        "",
        "## Cluster-size scaling evidence (north rule: N vs 4N)",
        "",
        "A real multi-executor cluster is unavailable in this sandbox; per the",
        "driver's instruction the same job ran at two local parallelism levels",
        "on the same input:",
        "",
        "| parallelism | docs/sec |",
        "|---|---|",
        f"| local[{scaling['cores_lo']}] | {scaling['docs_per_sec_lo']} |",
        f"| local[{scaling['cores_hi']}] | {scaling['docs_per_sec_hi']} |",
        "",
        f"speedup {scaling['speedup']}x over a {scaling['cores_hi'] // scaling['cores_lo']}x core increase → ",
        f"**scaling efficiency = {scaling['efficiency']}** (target ≥ 0.8 would mean",
        "near-linear; local mode shares one JVM heap + page cache, so treat as a",
        "lower bound on cluster scaling where executors do not contend).",
        "",
        "## Headline query times (sf dir: %s)" % SF_DIR,
        "",
        "| query | sec |",
        "|---|---|",
    ]
    for k, v in queries.items():
        lines.append(f"| {k} | {v} |")
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    sys.exit(main())
