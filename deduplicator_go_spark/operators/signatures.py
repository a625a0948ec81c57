"""Signature table with an explicit status column + retry / renew /
refresh work-queue predicates + selective hash upgrade.

Parity targets:
- the reference overloads the hash value domain with sentinels
  ('TIMEOUT_ERROR', 'HASH_ERROR', /root/reference/files/hash.go:27-33)
  and composes flag-driven WHERE clauses over them
  (buildHashWhereClause, hash.go:18-51).  Per SURVEY §1.3 this engine
  keeps the value domain clean: nullable signature columns plus a
  ``status`` column ('ok' | 'timeout_error' | 'hash_error'), so a
  failed row lands as a *retryable status row* instead of a poisoned
  hash value or a thrown job.
- the selective hash upgrade (/root/reference/files/hash_upgrade.go:
  17-99): rows signed under a legacy partial-hash scheme are re-signed
  in place — recompute, update only the changed rows, keep unchanged
  rows' timestamps — without wiping the table (the params_hash wipe in
  sources/catalog.py covers whole-table invalidation; this covers
  upgrade-without-recompute-everything).

Partial signatures (``prefix_chars``) model the reference's legacy
partial-file hashes: sha over the first N characters instead of the
whole text.  calculateFileHash errors map to status rows; an optional
``failure_expr`` injects deterministic failures for tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import content_sha

SIG_OK = "ok"
SIG_TIMEOUT = "timeout_error"
SIG_HASH_ERROR = "hash_error"
PROBLEM_STATUSES = (SIG_TIMEOUT, SIG_HASH_ERROR)


def sign_documents(
    docs: DataFrame,
    prefix_chars: int | None = None,
    params_version: str = "v2-full",
    failure_expr=None,
) -> DataFrame:
    """→ (url, content_sha, size, status, sig_ts, params_version).

    ``prefix_chars`` = legacy partial-hash mode (sha over the first N
    chars — hash_upgrade.go's "stored hashes" population); None = full.
    NULL text → ('hash_error', NULL sha); ``failure_expr`` (boolean
    column) marks rows as 'timeout_error' (NULL sha) — the analog of
    calculateFileHash timeouts, used to drive retry tests."""
    basis = F.col("text") if prefix_chars is None else F.substring("text", 1, prefix_chars)
    failed = F.lit(False) if failure_expr is None else failure_expr
    status = (
        F.when(failed, F.lit(SIG_TIMEOUT))
        .when(F.col("text").isNull(), F.lit(SIG_HASH_ERROR))
        .otherwise(F.lit(SIG_OK))
    )
    return docs.select(
        "url",
        F.when(status == SIG_OK, content_sha(basis)).alias("content_sha"),
        F.length("text").cast("long").alias("size"),
        status.alias("status"),
        F.current_timestamp().alias("sig_ts"),
        F.lit(params_version).alias("params_version"),
    )


def work_queue(
    inputs: DataFrame,
    done: DataFrame | None,
    key: str = "url",
    retry_problematic: bool = False,
    renew: bool = False,
    refresh: bool = False,
    max_age: str = "INTERVAL 1 WEEK",
    size_blocking: bool = False,
) -> DataFrame:
    """Rows of ``inputs`` due for (re)signing — buildHashWhereClause
    (hash.go:18-51) over the status column instead of hash sentinels:

    - default:             never signed (anti-join on key)
    - --retry-problematic: + status IN (timeout_error, hash_error)
    - --renew:             + sig_ts older than ``max_age``
    - --refresh:           everything
    - not full-hash:       restrict to sizes occurring >1 in the input
                           (size-blocking subquery, hash.go:37-48)
    """
    out = inputs
    if not refresh and done is not None:
        redo = F.lit(False)
        if retry_problematic:
            redo = redo | F.col("status").isin(*PROBLEM_STATUSES)
        if renew:
            redo = redo | (F.col("sig_ts") < F.current_timestamp() - F.expr(max_age))
        redo_keys = done.filter(redo).select(key)
        never = inputs.join(done.select(key).distinct(), key, "left_anti")
        again = inputs.join(redo_keys.distinct(), key, "left_semi")
        out = never.unionByName(again)
    if size_blocking:
        sizes = (
            inputs.select(F.length("text").cast("long").alias("__sz"))
            .groupBy("__sz").agg(F.count("*").alias("n")).filter("n > 1")
            .select("__sz")
        )
        out = out.join(
            F.broadcast(sizes),
            F.length(out["text"]).cast("long") == F.col("__sz"),
            "left_semi",
        )
    return out


def upgrade_signatures(
    done: DataFrame,
    docs: DataFrame,
    params_version: str = "v2-full",
    key: str = "url",
) -> tuple[DataFrame, dict]:
    """Selective re-sign of ok-status rows computed under an older
    params_version (UpgradeStoredHashes, hash_upgrade.go:17-99):

    - candidates: status = 'ok' AND params_version != current (the
      reference's "hash IS NOT NULL AND hash NOT IN (errors)");
    - recompute the full signature; rows whose sha is unchanged keep
      their original sig_ts (partial hash == full hash for short docs,
      the reference's `unchanged` branch); changed rows get the new
      sha + fresh sig_ts; rows failing recompute keep the old row but
      move to 'hash_error' (reference logs + skips);
    - everything else passes through untouched.

    Input contract: ``docs`` must cover the signed corpus — a url
    missing from it is treated as a disappeared document (the failed
    branch: LAST-KNOWN-GOOD sha deliberately retained, status flipped
    to 'hash_error' so --retry-problematic re-examines it). Passing a
    partial corpus therefore flags its out-of-scope rows; scope the
    upgrade input like the reference scopes its id range.

    Returns (upgraded_table, stats) — stats mirrors the reference's
    checked/upgraded/unchanged/failed counters. Lazy: one plan, no
    driver loop (the reference pages by id purely for DB-cursor
    reasons; a snapshot engine upgrades in one pass).
    """
    cand = done.filter(
        (F.col("status") == SIG_OK) & (F.col("params_version") != params_version)
    )
    keep = done.join(cand.select(key), key, "left_anti")

    fresh = sign_documents(docs, prefix_chars=None, params_version=params_version)
    joined = (
        cand.select(
            key,
            F.col("content_sha").alias("old_sha"),
            F.col("size").alias("old_size"),
            F.col("sig_ts").alias("old_ts"),
            F.col("params_version").alias("old_ver"),
        )
        .join(
            fresh.filter(F.col("status") == SIG_OK).select(
                key,
                F.col("content_sha").alias("new_sha"),
                F.col("size").alias("new_size"),
                F.col("sig_ts").alias("new_ts"),
            ),
            key,
            "left",
        )
    )
    # two consumers (the upgraded projection below and the stats agg):
    # pin the join result once, or the full-corpus re-sign — the most
    # expensive step — evaluates once for the stats and again when the
    # caller materializes the returned table
    joined = joined.localCheckpoint(eager=True)
    changed = F.col("new_sha").isNotNull() & (F.col("new_sha") != F.col("old_sha"))
    failed = F.col("new_sha").isNull()   # doc gone or recompute failed
    upgraded = joined.select(
        key,
        F.coalesce("new_sha", "old_sha").alias("content_sha"),
        F.coalesce("new_size", "old_size").alias("size"),
        F.when(failed, F.lit(SIG_HASH_ERROR)).otherwise(F.lit(SIG_OK)).alias("status"),
        F.when(changed, F.col("new_ts")).otherwise(F.col("old_ts")).alias("sig_ts"),
        F.when(failed, F.col("old_ver"))
         .otherwise(F.lit(params_version)).alias("params_version"),
    )
    # stats in one aggregation pass over the join result
    agg = joined.agg(
        F.count("*").alias("checked"),
        F.coalesce(F.sum(changed.cast("int")), F.lit(0)).alias("upgraded"),
        F.coalesce(F.sum((F.col("new_sha") == F.col("old_sha")).cast("int")),
                   F.lit(0)).alias("unchanged"),
        F.coalesce(F.sum(failed.cast("int")), F.lit(0)).alias("failed"),
    ).collect()[0]
    stats = {k: int(agg[k]) for k in ("checked", "upgraded", "unchanged", "failed")}
    return keep.unionByName(upgraded.select(*done.columns)), stats
