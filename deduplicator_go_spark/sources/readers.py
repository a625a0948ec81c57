"""Ingest sources (reference S1-S4, SURVEY.md §2.1) re-expressed as
DataFrame scans + MERGE-shaped upserts.

The reference ingests by walking filesystems and upserting rows into
Postgres one prepared statement at a time (files/process.go:19-128,
files/find.go:18-241).  Spark-side, ingest is a declarative scan +
a change-classification join + an atomic table write; nothing is
row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import change_detection

LISTING_SCHEMA = "path string, size long, mod_time timestamp"


def read_listing_text(spark: SparkSession, path: str) -> DataFrame:
    """S1: newline-delimited path listing (the stdin ingest,
    files/process.go:19-128) — one path per line."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("path"))
        .filter(F.length("path") > 0)
    )


def read_binary_files(spark: SparkSession, glob: str) -> DataFrame:
    """S2: directory-walk ingest — Spark's binaryFile source yields
    (path, modificationTime, length, content); the hash stage is a
    column op instead of a worker pool (files/process.go:131-468)."""
    return (
        spark.read.format("binaryFile").load(glob)
        .select(
            F.col("path"),
            F.col("length").alias("size"),
            F.col("modificationTime").alias("mod_time"),
            F.sha2(F.col("content"), 256).alias("hash"),
        )
    )


def upsert(
    stored: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    compare: list[str],
) -> DataFrame:
    """MERGE-shaped upsert without a MERGE-capable catalog (the parquet
    stand-in for Iceberg MERGE INTO): classify incoming rows, keep
    unchanged stored rows, take updated+inserted from incoming.

    Reference: ON CONFLICT (path, hostname) DO UPDATE
    (files/process.go:53-58) and the skip-unchanged check
    (files/process.go:369-393)."""
    # one row per key, like ON CONFLICT: a listing repeating a path
    # must not produce duplicate catalog rows
    incoming = incoming.dropDuplicates(keys)
    classified = change_detection(incoming, stored, keys, compare)
    changed_keys = classified.filter(F.col("change") != "unchanged").select(*keys)
    kept = stored.join(changed_keys, keys, "left_anti")
    replacement = classified.filter(F.col("change") != "unchanged").drop("change")
    return kept.unionByName(replacement)


def age_filter(df: DataFrame, ts_col: str, min_age_minutes: int) -> DataFrame:
    """S4/F7: only rows whose timestamp is at least N minutes old
    (files/import.go:149-157)."""
    return df.filter(
        F.col(ts_col) <= F.current_timestamp() - F.expr(f"INTERVAL {min_age_minutes} MINUTES")
    )
