"""SemDeDup-style semantic dedup (operators/semantic.py).

Covers: the paper's keeper rule (within a near-dup group, keep the
member FARTHEST from its cluster centroid), deterministic tie-breaks,
family co-location under exact/scaled copies, the Lloyd-trained
production path, and the plan shape (cell-keyed equi-join, never a
cartesian product).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplicator_go_spark.operators.semantic import (
    anchors_from_lowest_ids,
    assign_rounded,
    semantic_dedup,
)


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_keeper_is_farthest_from_centroid(spark):
    """Two near-identical vectors in one cell: the one with the LOWER
    centroid cosine (farther out) is kept; the closer one is dropped
    with dup_of pointing at the keeper — the SemDeDup keep rule."""
    a = math.radians
    rows = [
        (1, [math.cos(a(5)), math.sin(a(5))]),    # close to centroid
        (2, [math.cos(a(12)), math.sin(a(12))]),  # farther from centroid
        (3, [0.0, 1.0]),                          # non-dup, other direction
    ]
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _emb_df(spark, rows), tau=0.99, centroids=cents
        ).collect()
    }
    # cos(5°,12°)=cos(7°)≈0.9925 ≥ τ → one group; id 2 has lower ccos
    assert out[2]["kept"] and out[2]["dup_of"] is None
    assert not out[1]["kept"] and out[1]["dup_of"] == 2
    assert out[3]["kept"]
    assert out[1]["cell"] == 0 and out[2]["cell"] == 0 and out[3]["cell"] == 1
    assert out[2]["centroid_cos"] < out[1]["centroid_cos"]


def test_equal_ccos_ties_break_on_lowest_id(spark):
    """Exact and power-of-two-scaled copies have bit-identical rounded
    centroid cosine, so the keeper tie-break falls to ascending id."""
    v = [0.3, -1.2, 0.7, 0.05]
    rows = [(10, v), (11, [2.0 * x for x in v]), (12, v)]
    cents = np.array([v, [-x for x in v]], dtype=np.float64)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _emb_df(spark, rows), tau=0.9, centroids=cents
        ).collect()
    }
    assert out[10]["kept"]
    assert not out[11]["kept"] and out[11]["dup_of"] == 10
    assert not out[12]["kept"] and out[12]["dup_of"] == 10
    assert len({out[i]["centroid_cos"] for i in (10, 11, 12)}) == 1


def test_planted_families_on_synthetic_embeddings(spark, sf_dir):
    """The oracle-mirrored shape: base ∪ exact copy ∪ ×2-scaled copy →
    every family keeps exactly its base row (lowest id at equal ccos)
    and non-family rows never merge (isotropic cos ≤ ~0.52 < τ)."""
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .limit(60)
    )
    view = emb.unionByName(
        emb.select((F.col("vec_id") + F.lit(1000000)).alias("vec_id"), "embedding")
    ).unionByName(
        emb.select(
            (F.col("vec_id") + F.lit(2000000)).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
        )
    )
    anchors = anchors_from_lowest_ids(view, n_cells=4)
    rows = semantic_dedup(view, tau=0.9, centroids=anchors).collect()
    by_id = {r["vec_id"]: r for r in rows}
    bases = [i for i in by_id if i < 1000000]
    assert len(rows) == 3 * len(bases)
    for b in bases:
        assert by_id[b]["kept"], b
        for off in (1000000, 2000000):
            r = by_id[b + off]
            assert not r["kept"] and r["dup_of"] == b
            assert r["cell"] == by_id[b]["cell"]
            assert r["centroid_cos"] == by_id[b]["centroid_cos"]


def test_lloyd_trained_path_partitions_corpus(spark, sf_dir):
    """centroids=None trains seeded Lloyd centroids (the production
    path); output still covers every row exactly once and planted
    exact copies are still deduped (same cell by construction)."""
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .limit(40)
    )
    view = emb.unionByName(
        emb.select((F.col("vec_id") + F.lit(1000000)).alias("vec_id"), "embedding")
    )
    rows = semantic_dedup(view, tau=0.9, n_cells=4, seed=7).collect()
    assert len(rows) == 2 * 40
    kept = {r["vec_id"] for r in rows if r["kept"]}
    dropped = {r["vec_id"]: r["dup_of"] for r in rows if not r["kept"]}
    # every family resolved: one kept, one dropped pointing at the keeper
    for b in (r["vec_id"] for r in rows if r["vec_id"] < 1000000):
        pair = {b, b + 1000000}
        assert len(pair & kept) == 1
        loser = next(iter(pair - kept))
        assert dropped[loser] == (pair - {loser}).pop()


def test_assignment_is_rounded_and_tie_broken_by_cell(spark):
    """A vector equidistant from two centroids lands in the LOWER cell
    index in every engine (argmax over rounded sims takes the first)."""
    rows = [(1, [1.0, 1.0])]
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    out = assign_rounded(_emb_df(spark, rows), cents).collect()
    assert out[0]["cell"] == 0
    assert out[0]["ccos"] == round(1 / math.sqrt(2), 6)


def test_plan_has_no_cartesian_product(spark):
    """The within-cell pair stage must be a cell-keyed equi-join —
    a cartesian product would be the 10^12-row scale killer."""
    rows = [(i, [float(i), 1.0, -float(i)]) for i in range(8)]
    cents = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    df = semantic_dedup(_emb_df(spark, rows), tau=0.95, centroids=cents)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
