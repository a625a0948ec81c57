"""Deterministic train/val/test splits and output sharding.

The last mile of a training-data pipeline: every document gets a
stable split and a stable output shard, reproducible across reruns,
ticks, engines, and cluster sizes. Both are keyed on
md5(id || salt) — content-independent (an edited page keeps its
split), engine-portable (md5 has an exact ANSI-SQL twin, unlike
xxhash64), and salt-re-rollable.

The leakage guard is the part naive pipelines miss: near-duplicate
documents that straddle train and eval leak the eval answers into
training (Lee et al. 2022 measure exactly this). ``assign_split_by_
cluster`` keys the split on the document's dedup CLUSTER (falling
back to its own id when unclustered), so a whole near-dup family
lands on one side of the split by construction.

Scale shape: split/shard assignment is pure map-stage column algebra
(zero shuffle; whole-stage codegen); cluster-consistent splits add
one left join against the cluster-membership table (id-keyed, skew-
free); shard_stats is one partially-aggregated groupBy on a bounded
key domain (n_shards rows out). write_sharded repartitions BY the
shard column so each output file is one shard — at 10^12 docs the
write is embarrassingly parallel and a shard never exceeds
corpus/n_shards (md5 is uniform).

Reference provenance: no analog — the reference moves dup files to a
quarantine dir (/root/reference/files/move.go); split/shard
bookkeeping only exists for training corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_key(col: Column | str, salt: str = "") -> Column:
    """Uniform 60-bit integer from md5(id || salt) — 15 hex digits,
    so the value fits a signed 64-bit long exactly in Spark's conv()
    and in ANSI SQL's CAST('0x…' AS BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 15),
        16, 10,
    ).cast("long")


def assign_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "url",
    salt: str = "",
) -> DataFrame:
    """docs + a ``split`` column. Weights are fractions summing to 1
    (default 98/1/1 train/val/test); assignment thresholds the key's
    residue mod 1e6, so expected split sizes are exact to 1e-6 and
    every row's split is a pure function of (id, salt)."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    bucket = split_key(id_col, salt) % F.lit(1_000_000)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < F.lit(int(round(acc * 1_000_000)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return docs.withColumn("split", expr)


def assign_split_by_cluster(
    docs: DataFrame,
    clusters: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "url",
    cluster_col: str = "cluster_id",
    salt: str = "",
) -> DataFrame:
    """Leakage-proof split: the split key is the document's dedup
    cluster id (its own id when unclustered), so no near-dup family
    straddles train/eval. clusters = (id_col, cluster_col) membership
    rows from the dedup report."""
    members = clusters.select(
        F.col(id_col), F.col(cluster_col).alias("__cluster")
    )
    keyed = docs.join(members, id_col, "left").withColumn(
        "__skey", F.coalesce(F.col("__cluster").cast("string"), F.col(id_col))
    )
    out = assign_split(keyed, weights, id_col="__skey", salt=salt)
    return out.drop("__skey", "__cluster")


def assign_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "url",
    salt: str = "",
) -> DataFrame:
    """docs + a ``shard`` column in [0, n_shards): stable, uniform,
    content-independent."""
    return docs.withColumn(
        "shard", (split_key(id_col, salt) % F.lit(n_shards)).cast("int")
    )


def shard_stats(sharded: DataFrame, text_col: str | None = "text") -> DataFrame:
    """Per-shard balance report: (shard, n_docs[, n_chars]). The
    balance factor (max/mean) a writer would alert on is a one-row agg
    over this output."""
    aggs = [F.count("*").alias("n_docs")]
    if text_col is not None and text_col in sharded.columns:
        aggs.append(
            F.sum(F.length(F.coalesce(F.col(text_col), F.lit("")))).alias("n_chars")
        )
    return sharded.groupBy("shard").agg(*aggs)


def write_sharded(
    docs: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "url",
    salt: str = "",
    mode: str = "overwrite",
) -> None:
    """Write docs as n_shards hash-sharded parquet partitions
    (shard=K directories). repartition BY the shard expression so
    each task owns whole shards — one file per shard, no tiny-file
    explosion, embarrassingly parallel at any corpus size."""
    sharded = assign_shards(docs, n_shards, id_col, salt)
    (
        sharded.repartition(n_shards, "shard")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
