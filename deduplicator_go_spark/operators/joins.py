"""Catalog-maintenance join operators (reference parity, SURVEY.md §2.3).

These re-express the reference's mirror / import / prune / ingest
joins as single declarative plans.  Keys are generic (caller names
them); in the webtext engine the (host, relpath) identity becomes
(domain, url path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def existence_antijoin(new_rows: DataFrame, existing: DataFrame, key: str | list[str]) -> DataFrame:
    """J4: keep rows whose key does not already exist on the target
    (the reference probes per-row with SELECT COUNT(*),
    /root/reference/files/import.go:270-323 — here one anti-join)."""
    keys = [key] if isinstance(key, str) else list(key)
    return new_rows.join(existing.select(*keys).distinct(), keys, "left_anti")


def mirror_missing(catalog: DataFrame, host_col: str, key_col: str, all_hosts: DataFrame) -> DataFrame:
    """J5/U3: per key, which hosts are missing a copy
    (/root/reference/files/mirror.go:47-128 builds per-host
    map[relpath]hash and diffs in memory)."""
    present = catalog.groupBy(key_col).agg(F.collect_set(host_col).alias("present"))
    universe = all_hosts.agg(F.collect_set(host_col).alias("all_hosts"))
    return (
        present.crossJoin(F.broadcast(universe))
        .select(
            key_col,
            F.array_sort(F.array_except("all_hosts", "present")).alias("missing_hosts"),
        )
        .filter(F.size("missing_hosts") > 0)
    )


def mirror_conflicts(catalog: DataFrame, key_col: str, hash_col: str) -> DataFrame:
    """J6: same key with >1 distinct hash across hosts → conflict, not a
    transfer task (/root/reference/files/mirror.go:84-101)."""
    return (
        catalog.groupBy(key_col)
        .agg(F.countDistinct(hash_col).alias("n_hashes"))
        .filter(F.col("n_hashes") > 1)
    )


def hash_size_conflicts(catalog: DataFrame, hash_col: str, size_col: str) -> DataFrame:
    """A7: one hash must map to one size
    (/root/reference/files/group_mirror.go:368-379)."""
    return (
        catalog.groupBy(hash_col)
        .agg(F.countDistinct(size_col).alias("n_sizes"))
        .filter(F.col("n_sizes") > 1)
    )


def change_detection(
    incoming: DataFrame,
    stored: DataFrame,
    keys: list[str],
    compare: list[str],
) -> DataFrame:
    """J9: MERGE-shaped classification of incoming rows vs the stored
    catalog: insert / update / unchanged
    (/root/reference/files/process.go:340-393 decides skip/update/insert
    per row; here one full-outer join).

    → incoming columns + ``change`` ∈ {insert, update, unchanged}.
    """
    # explicit existence marker: inferring a match from old-column
    # nullness misclassifies stored rows whose compare columns are all
    # NULL (e.g. listing-only catalog rows) as inserts on every run
    s = stored.select(
        *keys,
        *[F.col(c).alias(f"__old_{c}") for c in compare],
        F.lit(True).alias("__matched"),
    )
    joined = incoming.join(s, keys, "left")
    changed = None
    for c in compare:
        neq = ~F.col(c).eqNullSafe(F.col(f"__old_{c}"))
        changed = neq if changed is None else (changed | neq)
    matched = F.coalesce(F.col("__matched"), F.lit(False))
    out = joined.withColumn(
        "change",
        F.when(~matched, F.lit("insert"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged")),
    )
    return out.drop("__matched", *[f"__old_{c}" for c in compare])


def prune_missing(catalog: DataFrame, listing: DataFrame, key: str | list[str]) -> DataFrame:
    """J8: catalog rows whose key no longer exists in the live listing →
    delete set (/root/reference/files/prune.go:206-235 stats each row;
    here one anti-join)."""
    keys = [key] if isinstance(key, str) else list(key)
    return catalog.join(listing.select(*keys).distinct(), keys, "left_anti")


def keep_most_specific(catalog: DataFrame, resolved_col: str, root_col: str, id_col: str) -> DataFrame:
    """O6/U4: duplicate resolved keys keep the row with the longest root
    then smallest id (/root/reference/files/prune.go:80,122,175-204)."""
    from pyspark.sql import Window

    w = Window.partitionBy(resolved_col).orderBy(
        F.desc(F.length(F.coalesce(F.col(root_col), F.lit("")))), F.asc(id_col)
    )
    return (
        catalog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
