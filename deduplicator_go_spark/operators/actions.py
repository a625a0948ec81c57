"""Action planning: turn keeper elections into executable plans.

The reference's action layer physically moves/deletes files (rsync +
os.Rename in files/dedupe.go:211-225, files/move.go:283-305) and
deletes catalog rows per move.  In the Spark engine actions are
*data*: a committed plan table that a downstream MERGE/DELETE (or an
external mover) consumes — the audit trail the reference keeps only
in logs.

Also covers:
- F6 dest-exclusion (files/dedupe.go:72-84): groups with any member
  already under the archive prefix are skipped;
- A4 savings accounting per plan;
- O7 determinism: plans are fully ordered by (cluster, url).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def plan_removals(
    elected: DataFrame,
    archive_prefix: str | None = None,
) -> DataFrame:
    """elected (…, content_sha, size, url, is_keeper) → plan rows
    (content_sha, size, url, action ∈ {keep, remove}, freed_bytes).

    If ``archive_prefix`` is given, any group containing a member
    already under that prefix is excluded entirely (reference
    skip-dest-dir rule)."""
    df = elected
    if archive_prefix is not None:
        flagged = df.withColumn(
            "_under", F.col("url").startswith(F.lit(archive_prefix)).cast("int")
        )
        bad = (
            flagged.groupBy("content_sha", "size")
            .agg(F.max("_under").alias("any_under"))
            .filter(F.col("any_under") == 1)
            .select("content_sha", "size")
        )
        df = flagged.join(bad, ["content_sha", "size"], "left_anti").drop("_under")
    return df.select(
        "content_sha",
        "size",
        "url",
        F.when(F.col("is_keeper"), F.lit("keep")).otherwise(F.lit("remove")).alias("action"),
        F.when(~F.col("is_keeper"), F.col("size")).otherwise(F.lit(0)).alias("freed_bytes"),
    ).orderBy("content_sha", "size", "url")


def plan_summary(plan: DataFrame) -> DataFrame:
    """Run-level accounting (A4 savings + A3 counts)."""
    return plan.agg(
        F.sum(F.when(F.col("action") == "remove", 1).otherwise(0)).alias("n_removals"),
        F.sum(F.when(F.col("action") == "keep", 1).otherwise(0)).alias("n_keepers"),
        F.sum("freed_bytes").alias("freed_bytes"),
    )


def apply_removals(catalog: DataFrame, plan: DataFrame, key: str = "url") -> DataFrame:
    """Apply a plan to the catalog: anti-join out removed rows — the
    parquet stand-in for Iceberg `MERGE ... WHEN MATCHED THEN DELETE`
    (the reference deletes per-row inside the move loop,
    files/move.go:300-305)."""
    removals = plan.filter(F.col("action") == "remove").select(key)
    return catalog.join(removals, key, "left_anti")
