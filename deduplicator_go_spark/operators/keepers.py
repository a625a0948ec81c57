"""Quality-weighted canonical selection for near-dup clusters.

The reference elects keepers lexicographically or by directory priority
(/root/reference/files/move.go:226-236 — W2/W3 in SURVEY §2);
a training-data pipeline elects by CONTENT quality: of a cluster of
near-identical pages, keep the one with the least boilerplate/junk and
drop the rest. Deterministic: quality descending, id ascending on ties
(exact copies have equal quality, so this degrades to the reference's
lexicographic rule exactly when quality cannot separate members).

Scale shape: one window over cluster_id — the same single-shuffle rank
as every other keeper election here; a viral cluster is one partition
of the window, bounded by the report's membership cap upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quality_keeper(
    clusters: DataFrame,
    cluster_col: str = "cluster_id",
    id_col: str = "url",
    quality_col: str = "quality",
) -> DataFrame:
    """→ one row per cluster: (cluster_col, keeper_id, keeper_quality,
    n_members). Keeper = highest quality, ties to the smallest id."""
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    wc = Window.partitionBy(cluster_col)
    return (
        clusters.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc))
        .filter(F.col("__rn") == 1)
        .select(
            cluster_col,
            F.col(id_col).alias("keeper_id"),
            F.col(quality_col).alias("keeper_quality"),
            "n_members",
        )
    )


def drop_non_keepers(
    docs: DataFrame,
    clusters: DataFrame,
    cluster_col: str = "cluster_id",
    id_col: str = "url",
    quality_col: str = "quality",
) -> DataFrame:
    """The curation action: docs restricted to elected keepers plus
    every unclustered doc (left_anti against the losing members)."""
    keep = quality_keeper(clusters, cluster_col, id_col, quality_col)
    losers = clusters.join(
        keep.select(cluster_col, F.col("keeper_id").alias(id_col)),
        [cluster_col, id_col],
        "left_anti",
    ).select(id_col)
    return docs.join(losers, id_col, "left_anti")
