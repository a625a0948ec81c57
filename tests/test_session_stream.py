"""Streaming gap-based sessionization (F.session_window): drained
stream result equals the same aggregation run as a batch job."""

from __future__ import annotations

from datetime import datetime, timedelta

from deduplicator_go_spark.streaming.events_stream import (
    read_events_stream,
    streaming_sessionize,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark):
    t0 = datetime(2026, 1, 1, 8, 0, 0)
    rows = []
    eid = 0
    for uid in (1, 2):
        # session 1: three events 5 min apart; >30 min gap; session 2: two
        for off in (0, 5, 10, 60, 65):
            rows.append(
                (eid, t0 + timedelta(minutes=off + uid), uid, "click", 1.5, None)
            )
            eid += 1
    # watermark sentinel: append-mode session aggregation only emits a
    # session once the watermark passes its END, so a bounded drain
    # needs one far-future event to close everything before it
    rows.append((eid, t0 + timedelta(days=1), 99, "click", 0.0, None))
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_streaming_sessions_equal_batch(spark, tmp_path):
    df = _events(spark)
    src = str(tmp_path / "events_in")
    df.write.parquet(src)

    agg = streaming_sessionize(
        read_events_stream(spark, src), gap="30 minutes", watermark="0 seconds"
    )
    q = (
        agg.writeStream.outputMode("append").format("memory")
        .queryName("t_sessions").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in spark.table("t_sessions").collect()
    }
    # batch twin: identical aggregation on the static frame; the
    # sentinel's own session never closes in the stream, so exclude it
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in streaming_sessionize(df, gap="30 minutes").collect()
        if r["user_id"] != 99
    }
    assert got == want
    # two sessions per user: 3-event and 2-event
    per_user = sorted(n for (u, s, e, n, v) in got if u == 1)
    assert per_user == [2, 3]
