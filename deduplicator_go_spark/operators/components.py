"""Connected components: alternating large-star / small-star.

The reference's "clustering" is GROUP BY exact hash (SURVEY.md §4 —
no iterative computation exists there); near-dup clustering needs
true connected components.  This is the large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) as an iterative DataFrame job:

- large-star: every node connects its *larger* neighbors to its
  minimum neighbor (or itself);
- small-star: every node connects its smaller-or-equal neighbors to
  the minimum one.

Converges in O(log n) rounds — important here because salted-chain
edges (operators/lsh.py) can have O(bucket/salt) diameter, which
would sink plain min-label propagation.

Node ids are urls; the final label is min(url) of the component —
deterministic, the W2 keeper rule at cluster scope
(/root/reference/files/move.go:226-236).

Scale notes: each round is two shuffles on node id; ``localCheckpoint``
truncates lineage every round so plans don't grow; convergence is
detected with a one-pass count+checksum aggregate, not exceptAll.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )


def _large_star(sym: DataFrame, parts: int) -> DataFrame:
    """emit (v, m) for v in N(u), v > u, where m = min(N(u) ∪ {u}).

    Partition sizing is per-DataFrame: the explicit repartition on the
    grouping/join key satisfies the downstream distribution requirement,
    so the groupBy and the self-join reuse it (ReusedExchange) instead
    of shuffling again at the session-global partition count — no
    SparkSession conf is mutated (session-safe under concurrent
    pipelines)."""
    sym = sym.repartition(parts, "u")
    nbr_min = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = nbr_min.withColumn("m", F.least("u", "mn")).select("u", "m")
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .repartition(parts, "src", "dst")
        .distinct()
    )


def _small_star(edges: DataFrame, parts: int) -> DataFrame:
    """orient edges (u,v) with v <= u; emit (v, m) for v in N(u) ∪ {u} \\ m."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).repartition(parts, "u")
    nbr_min = oriented.groupBy("u").agg(F.min("v").alias("m"))
    linked = (
        oriented.join(nbr_min, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )
    self_link = nbr_min.filter(F.col("u") != F.col("m")).select(
        F.col("u").alias("src"), F.col("m").alias("dst")
    )
    return (
        linked.unionByName(self_link)
        .repartition(parts, "src", "dst")
        .distinct()
    )


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # bit_xor, not sum: overflow-safe under Spark 4's default ANSI mode
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """edges(src, dst) → assignments(url, cluster_id); singletons absent
    (callers left-join and coalesce to self-label).

    Shuffle sizing: each round is several tiny shuffles; with the
    session's byte-based AQE coalescing off (see session.py), running
    them at the global shuffle-partition count pays per-task scheduling
    overhead × rounds for sub-MB data. The round loop therefore sizes
    partitions from the measured edge count (~50k edges/task, clamped
    to [4, global]) via explicit per-DataFrame repartitioning on the
    shuffle keys — the downstream groupBy/join/distinct reuse those
    exchanges, so no session conf is mutated (safe when two pipelines
    share a SparkSession).

    Job-count slack: star rounds are cheap transformations but each
    convergence fingerprint is a job with fixed scheduling+commit
    latency; running TWO star rounds per fingerprint halves the job
    count for the common multi-round case at the cost of at most one
    extra (idempotent-at-fixpoint) round after convergence.
    """
    sess = edges.sparkSession
    cur = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    cur = cur.localCheckpoint(eager=True)
    n0, _ = _fingerprint(cur)
    global_parts = int(sess.conf.get("spark.sql.shuffle.partitions"))
    cc_parts = max(4, min(global_parts, n0 // 50_000 + 1))
    prev_fp = None
    for _ in range(max(1, (max_iters + 1) // 2)):
        cur = _small_star(_large_star(_symmetrize(cur), cc_parts), cc_parts)
        cur = _small_star(_large_star(_symmetrize(cur), cc_parts), cc_parts)
        # lazy checkpoint: the fingerprint action below materializes
        # it, so each round-pair is ONE job (checkpoint+converge fused)
        cur = cur.localCheckpoint(eager=False)
        fp = _fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    # converged state is a star forest: src (member) -> dst (root)
    members = cur.select(F.col("src").alias("url"), F.col("dst").alias("cluster_id"))
    roots = cur.select(F.col("dst").alias("url"), F.col("dst").alias("cluster_id")).distinct()
    return members.unionByName(roots).groupBy("url").agg(
        F.min("cluster_id").alias("cluster_id")
    )


def assign_all(docs: DataFrame, assignments: DataFrame) -> DataFrame:
    """Every url gets a label; non-clustered docs are their own cluster."""
    return (
        docs.select("url")
        .join(assignments, "url", "left")
        .select("url", F.coalesce("cluster_id", "url").alias("cluster_id"))
    )
