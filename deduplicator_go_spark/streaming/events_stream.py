"""Structured Streaming over the events table — capability extension.

The reference has no streaming operators (SURVEY.md §2.9), so the
core engine stays batch-incremental.  This module exists for the
engine's training-pipeline tier: the same windowed aggregations the
batch path runs (``_q_events_hourly``) expressed as a Structured
Streaming job with watermarked event time, runnable against a parquet
directory for deterministic local smoke tests (availableNow trigger +
memory sink) and against Kafka/files in production unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str, schema: str = EVENTS_SCHEMA) -> DataFrame:
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event_type."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            F.round("total_value", 4).alias("total_value"),
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact-dedup: keep the first event per key within the
    watermark horizon — the engine's dedup semantics applied to a
    stream (state is bounded by the watermark; native operator, no
    custom state management)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows as a native streaming aggregation
    (`F.session_window`): a user's session extends while events arrive
    within ``gap`` of the last one; the watermark closes sessions and
    bounds state. The streaming twin of the batch ``sessionize`` query
    (lag-threshold windows) — session_window works identically on a
    batch DataFrame, which the equivalence test exploits."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            F.round("total_value", 4).alias("total_value"),
        )
    )


SESSION_STATE_SCHEMA = "n_events long, total_value double, session_start_us long"
SESSION_OUT_SCHEMA = "user_id long, n_events long, total_value double, session_start timestamp"


def stateful_user_totals(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running event count / value total, emitting a changelog
    row per key per micro-batch.

    This is the engine's escape hatch for stateful semantics that
    watermarked windows can't express; state per key is one small
    tuple. ``timeout_ms`` enables processing-time state expiry for
    continuous deployments; leave None for drain-style (availableNow)
    runs — an armed processing-time timeout keeps the availableNow
    trigger alive waiting for expirations and the query never
    terminates.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return iter(())
        n, total, start_us = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            first_us = int(pd.Timestamp(pdf["ts"].min()).value // 1000)
            start_us = first_us if start_us is None else min(start_us, first_us)
        state.update((n, total, start_us))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "session_start": [pd.Timestamp(start_us * 1000)],
            }
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def run_once_to_memory(agg: DataFrame, name: str = "stream_out") -> None:
    """Drain all available input synchronously into a memory sink —
    deterministic local execution of the streaming plan."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
