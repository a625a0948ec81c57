"""Custom stateful streaming operator (applyInPandasWithState)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_go_spark.streaming import events_stream


def test_stateful_user_totals_matches_batch(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2025-01-01 00:00:00", 10, "click", 1.5, "{}"),
         (2, "2025-01-01 00:01:00", 10, "click", 2.5, "{}"),
         (3, "2025-01-01 00:02:00", 11, "view", 4.0, "{}"),
         (4, "2025-01-01 00:03:00", 10, "view", 3.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    src = tmp_path / "stream"
    src.mkdir()
    df.coalesce(1).write.parquet(str(src / "p"))

    stream = events_stream.read_events_stream(spark, str(src / "p"))
    out = events_stream.stateful_user_totals(stream)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("t_stateful_out").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {r["user_id"]: r for r in spark.sql("SELECT * FROM t_stateful_out").collect()}
    assert got[10]["n_events"] == 3
    assert abs(got[10]["total_value"] - 7.0) < 1e-9
    assert str(got[10]["session_start"]).startswith("2025-01-01 00:00:00")
    assert got[11]["n_events"] == 1
    assert abs(got[11]["total_value"] - 4.0) < 1e-9
