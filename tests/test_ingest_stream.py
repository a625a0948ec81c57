"""Structured-Streaming ingest driving pipeline ticks (foreachBatch):
per-micro-batch tick equivalence vs a from-scratch batch run, and
url-idempotent raw-table appends under batch replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_go_spark.config import DedupConfig
from deduplicator_go_spark.fixtures.webtext import generate, to_spark
from deduplicator_go_spark.plans.pipeline import DedupPipeline
from deduplicator_go_spark.sources.catalog import CheckpointCatalog
from deduplicator_go_spark.streaming.ingest_stream import (
    pipeline_tick_sink,
    run_stream_ticks,
)


def _partition(rows):
    from collections import defaultdict

    by_label = defaultdict(set)
    for r in rows:
        by_label[r["cluster_id"]].add(r["url"])
    return {frozenset(v) for v in by_label.values() if len(v) > 1}


def test_stream_ticks_match_batch(spark, docs, tmp_path_factory):
    land = str(tmp_path_factory.mktemp("landing"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    cat = CheckpointCatalog(str(tmp_path_factory.mktemp("stream_cat")))

    # land the corpus as two batches of files (two arrival waves)
    wave1 = docs.filter(F.xxhash64("url") % 2 == 0)
    wave2 = docs.join(wave1.select("url"), "url", "left_anti")
    wave1.coalesce(1).write.mode("append").parquet(land)
    wave2.coalesce(1).write.mode("append").parquet(land)

    ticks = []
    run_stream_ticks(
        spark, land, cat, ckpt,
        config=DedupConfig(),
        max_files_per_trigger=1,
        on_tick=lambda bid, rep: ticks.append((bid, rep)),
    )
    # one tick per landed file wave
    assert len(ticks) == 2
    # every stage of the second tick ran incrementally (none skipped
    # wholesale is fine — but the pipeline must have processed wave2)
    assert cat.table_rows("raw_docs") == docs.count()

    # stream-built clusters == from-scratch batch clusters on the union
    batch_cat = CheckpointCatalog(str(tmp_path_factory.mktemp("batch_cat")))
    DedupPipeline(spark, batch_cat, DedupConfig()).run(docs)
    got = _partition(cat.read(spark, "clusters").collect())
    want = _partition(batch_cat.read(spark, "clusters").collect())
    assert got == want


def test_sink_replay_is_idempotent(spark, docs, tmp_path_factory):
    cat = CheckpointCatalog(str(tmp_path_factory.mktemp("replay_cat")))
    small = docs.limit(50)
    sink = pipeline_tick_sink(cat, DedupConfig(), with_substr=False)
    sink(small, 0)
    n1 = cat.table_rows("raw_docs")
    rep_rows1 = cat.read(spark, "dup_report").count()
    # a foreachBatch replay after a sink failure re-delivers the batch
    sink(small, 0)
    assert cat.table_rows("raw_docs") == n1
    assert cat.read(spark, "dup_report").count() == rep_rows1
