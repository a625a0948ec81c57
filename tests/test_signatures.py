"""Status-column signature stage, retry/renew/refresh work-queue
predicates (hash.go:18-51 parity) and selective hash upgrade
(hash_upgrade.go:17-99 parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduplicator_go_spark.operators import signatures as SG


@pytest.fixture()
def docs(spark):
    rows = [
        ("u1", "short text"),
        ("u2", "x" * 300),          # longer than the partial window
        ("u3", None),               # null text -> hash_error
        ("u4", "y" * 50),
        ("u5", "z" * 200),
    ]
    return spark.createDataFrame(rows, "url string, text string")


def test_sign_documents_status_rows(spark, docs):
    out = SG.sign_documents(docs, failure_expr=F.col("url") == "u4")
    rows = {r["url"]: r for r in out.collect()}
    assert rows["u1"]["status"] == SG.SIG_OK and rows["u1"]["content_sha"]
    assert rows["u3"]["status"] == SG.SIG_HASH_ERROR and rows["u3"]["content_sha"] is None
    assert rows["u4"]["status"] == SG.SIG_TIMEOUT and rows["u4"]["content_sha"] is None
    assert all(r["params_version"] == "v2-full" for r in rows.values())


def test_work_queue_flags(spark, docs):
    done = SG.sign_documents(
        docs.filter(F.col("url").isin("u1", "u3", "u4")),
        failure_expr=F.col("url") == "u4",
    )
    # default: only never-signed rows
    q = {r["url"] for r in SG.work_queue(docs, done).select("url").collect()}
    assert q == {"u2", "u5"}
    # retry-problematic: + error-status rows (u3 hash_error, u4 timeout)
    q = {r["url"] for r in
         SG.work_queue(docs, done, retry_problematic=True).select("url").collect()}
    assert q == {"u2", "u5", "u3", "u4"}
    # refresh: everything
    q = {r["url"] for r in SG.work_queue(docs, done, refresh=True).select("url").collect()}
    assert q == {"u1", "u2", "u3", "u4", "u5"}


def test_work_queue_renew(spark, docs):
    # one stale row (signed 8 days ago), one fresh
    done = spark.createDataFrame(
        [("u1", "sha", 10, SG.SIG_OK, "v2-full"),
         ("u2", "sha", 300, SG.SIG_OK, "v2-full")],
        "url string, content_sha string, size long, status string, params_version string",
    ).withColumn(
        "sig_ts",
        F.when(F.col("url") == "u1",
               F.current_timestamp() - F.expr("INTERVAL 8 DAYS"))
        .otherwise(F.current_timestamp()),
    )
    q = {r["url"] for r in SG.work_queue(docs, done, renew=True).select("url").collect()}
    assert q == {"u1", "u3", "u4", "u5"}  # stale + never-signed


def test_work_queue_size_blocking(spark):
    rows = [("a", "xx"), ("b", "xx"), ("c", "yyy")]  # size 2 twice, size 3 once
    docs = spark.createDataFrame(rows, "url string, text string")
    q = {r["url"] for r in
         SG.work_queue(docs, None, size_blocking=True).select("url").collect()}
    assert q == {"a", "b"}


def test_upgrade_signatures(spark, docs):
    present = docs.filter(F.col("text").isNotNull())
    # materialize: in production the done table is read from storage;
    # lazily re-evaluating current_timestamp() would shift sig_ts per action
    legacy = SG.sign_documents(
        present, prefix_chars=100, params_version="v1-partial"
    ).localCheckpoint(eager=True)
    # one legacy row's doc has disappeared -> failed branch
    remaining = present.filter(F.col("url") != "u4")
    upgraded, stats = SG.upgrade_signatures(legacy, remaining, params_version="v2-full")
    upgraded = upgraded.localCheckpoint(eager=True)
    assert stats == {"checked": 4, "upgraded": 2, "unchanged": 1, "failed": 1}
    rows = {r["url"]: r for r in upgraded.collect()}
    legacy_rows = {r["url"]: r for r in legacy.collect()}
    # u1 (10 chars): partial == full -> unchanged, old ts kept, version bumped
    assert rows["u1"]["params_version"] == "v2-full"
    assert rows["u1"]["sig_ts"] == legacy_rows["u1"]["sig_ts"]
    assert rows["u1"]["content_sha"] == legacy_rows["u1"]["content_sha"]
    # u2 (300 chars): partial != full -> re-signed
    assert rows["u2"]["content_sha"] != legacy_rows["u2"]["content_sha"]
    assert rows["u2"]["params_version"] == "v2-full"
    # u4 gone: marked hash_error, keeps legacy version + sha + ts
    assert rows["u4"]["status"] == SG.SIG_HASH_ERROR
    assert rows["u4"]["params_version"] == "v1-partial"
    assert rows["u4"]["content_sha"] == legacy_rows["u4"]["content_sha"]
    assert rows["u4"]["sig_ts"] == legacy_rows["u4"]["sig_ts"]
    # idempotent: a second upgrade has nothing to check except the failure
    upgraded2, stats2 = SG.upgrade_signatures(upgraded, remaining, params_version="v2-full")
    assert stats2["checked"] == 0


def test_upgrade_then_retry_flow(spark, docs):
    """A failed upgrade row re-enters the work queue via retry_problematic
    — the status column composes across flows."""
    present = docs.filter(F.col("text").isNotNull())
    legacy = SG.sign_documents(
        present, prefix_chars=100, params_version="v1-partial"
    ).localCheckpoint(eager=True)
    upgraded, _ = SG.upgrade_signatures(
        legacy, present.filter(F.col("url") != "u4"), params_version="v2-full"
    )
    q = {r["url"] for r in
         SG.work_queue(docs, upgraded, retry_problematic=True).select("url").collect()}
    assert "u4" in q and "u3" in q  # failed upgrade + never-signed
