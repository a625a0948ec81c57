"""Frontier-based incremental batch (streaming/incremental.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_go_spark.sources.catalog import CheckpointCatalog
from deduplicator_go_spark.streaming.incremental import frontier, run_incremental, staleness_filter


def test_frontier_anti_join_and_limit(spark):
    inputs = spark.createDataFrame([(f"u{i}", i) for i in range(10)], "url string, size long")
    done = spark.createDataFrame([("u0",), ("u1",)], "url string")
    f1 = frontier(inputs, done, "url")
    assert f1.count() == 8
    f2 = frontier(inputs, done, "url", limit=3, large_first="size")
    rows = f2.collect()
    assert len(rows) == 3
    assert sorted(r["url"] for r in rows) == ["u7", "u8", "u9"]  # largest first


def test_run_incremental_drains_in_batches(spark, tmp_path):
    cat = CheckpointCatalog(str(tmp_path / "cat"))
    inputs = spark.createDataFrame([(f"u{i}",) for i in range(25)], "url string")

    def transform(batch):
        return batch.withColumn("sig", F.sha2(F.col("url"), 256))

    total = run_incremental(
        spark, cat, "sigs", inputs, transform, key="url",
        params_hash="p1", batch_limit=10,
    )
    assert total == 25
    out = cat.read(spark, "sigs")
    assert out.count() == 25
    assert out.select("url").distinct().count() == 25


def test_staleness_filter(spark):
    df = spark.createDataFrame(
        [("a",), ("b",)], "url string"
    ).withColumn(
        "sig_ts",
        F.when(F.col("url") == "a",
               F.current_timestamp() - F.expr("INTERVAL 8 DAYS"))
        .otherwise(F.current_timestamp()),
    )
    stale = [r["url"] for r in staleness_filter(df).collect()]
    assert stale == ["a"]


def test_run_incremental_key_preserving_status_rows_drain(spark, tmp_path):
    """The documented contract for per-key failures: emit status rows
    (tombstones), never filter keys — then batched ticks drain the
    whole frontier and failures stay queryable (the reference's
    sentinel-hash pattern, files/hash.go:27-33)."""
    from pyspark.sql import functions as F

    from deduplicator_go_spark.sources.catalog import CheckpointCatalog
    from deduplicator_go_spark.streaming.incremental import run_incremental

    cat = CheckpointCatalog(str(tmp_path / "cat"))
    inputs = spark.createDataFrame(
        [(f"u{i:02d}", i) for i in range(20)], "url string, v int"
    )

    # odd v "fails": keep the key, mark the row — never drop it
    def transform(batch):
        return batch.select(
            "url",
            F.when(F.col("v") % 2 == 0, F.col("v")).alias("v"),
            F.when(F.col("v") % 2 == 0, F.lit("ok")).otherwise(F.lit("error")).alias("status"),
        )

    total = run_incremental(
        spark, cat, "signed", inputs, transform, key="url",
        params_hash="t", batch_limit=5,
    )
    assert total == 20  # every key committed across 4 batches
    out = cat.read(spark, "signed")
    assert out.filter("status = 'error'").count() == 10
    assert out.filter("status = 'ok' and v is null").count() == 0


def test_append_lineage_records_each_file_once(spark, tmp_path):
    """Append-mode ticks must not re-record prior ticks' files: lineage
    rows stay one per output file with the run that actually wrote it
    (review regression: quadratic duplicate lineage)."""
    from pyspark.sql import functions as F

    from deduplicator_go_spark.sources.catalog import CheckpointCatalog

    cat = CheckpointCatalog(str(tmp_path / "cat"))
    for tick in range(3):
        df = spark.createDataFrame([(f"u{tick}-{i}",) for i in range(4)], "url string")
        info = cat.write(df.repartition(2), "inc", params_hash="p", mode="append")
    assert info.rows == 12  # commit info still totals the whole table
    lin = cat.lineage(spark).filter("stage = 'inc'")
    per_file = lin.groupBy("partition").agg(F.count("*").alias("n"))
    assert per_file.filter("n > 1").count() == 0  # each file exactly once
    assert lin.agg(F.sum("rows")).collect()[0][0] == 12


def test_overwrite_cleans_orphan_tmp_dirs(spark, tmp_path):
    """A killed run's leftover .tmp-<dead-run> copy is removed by the
    next overwrite of the same table (review regression: orphaned
    full-size table copies accumulate)."""
    import os

    from deduplicator_go_spark.sources.catalog import CheckpointCatalog

    root = str(tmp_path / "cat")
    c1 = CheckpointCatalog(root, run_id="deadrun")
    orphan = c1.table_path("t") + ".tmp-deadrun"
    os.makedirs(orphan)
    c2 = CheckpointCatalog(root, run_id="liverun")
    df = spark.createDataFrame([(1,)], "x int")
    c2.write(df, "t", params_hash="p")
    assert not os.path.exists(orphan)
    assert c2.read(spark, "t").count() == 1


def test_read_cache_invalidates_on_data_change(spark, tmp_path):
    """catalog.read caches source resolution per (session, data-file
    set): an unchanged table returns the SAME DataFrame handle (no
    re-resolution — the fixed driver cost taxes scaling efficiency),
    while any append — including an orphan file from a killed append
    that the frags sidecar never recorded — changes the fingerprint
    and forces a fresh read that sees the new rows (the kill-window
    frontier defence reads actual contents, not the manifest)."""
    import pandas as pd

    from deduplicator_go_spark.sources.catalog import CheckpointCatalog

    cat = CheckpointCatalog(str(tmp_path / "cat"))
    df = spark.createDataFrame([("u1",), ("u2",)], "url string")
    cat.write(df, "t", params_hash="p", mode="append")
    r1 = cat.read(spark, "t")
    assert r1 is cat.read(spark, "t")  # unchanged table → cache hit
    assert r1.count() == 2

    # committed append invalidates
    cat.write(spark.createDataFrame([("u3",)], "url string"), "t",
              params_hash="p", mode="append")
    r2 = cat.read(spark, "t")
    assert r2 is not r1
    assert r2.count() == 3

    # orphan file written behind the catalog's back (killed mid-append:
    # data file exists, sidecar/marker never updated) ALSO invalidates
    pd.DataFrame({"url": ["u4"]}).to_parquet(
        cat.table_path("t") + "/part-orphan.parquet"
    )
    r3 = cat.read(spark, "t")
    assert r3 is not r2
    assert r3.count() == 4

    cat.drop("t")
    assert cat._read_cache.get("t") is None
