"""SemDeDup-style semantic deduplication over embedding columns.

Published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): cluster the
embedding space with k-means, then *within each cluster* mark groups
of points whose pairwise cosine exceeds a threshold and keep exactly
one representative per group — the paper keeps the point with the
LOWEST cosine to its cluster centroid (the "outer edge" of the blob),
dropping the rest.

Why this is the 100 TB shape: the clustering step turns the O(n^2)
all-pairs problem into sum(|cell|^2) — with k chosen so the expected
cell size is bounded (k ~ n / cap), the within-cell pair join is an
equi-join on cell id whose buckets stay task-sized. Skewed corpora
(one dense semantic blob) are handled by raising k, not by salting:
unlike top-k probing, the dominance decision needs *all* same-cell
pairs in one bucket, so the knob that bounds the bucket is the
cluster count itself. All heavy math is Arrow-batched numpy
(`mapInPandas` matmuls) or native column algebra — no per-row Python.

Two centroid sources:
- ``anchors_from_lowest_ids`` — deterministic, SQL-mirrorable anchor
  centroids (the k lowest-id vectors), used by the correctness oracle;
- ``train_centroids`` from operators/ivf.py — seeded driver-side
  Lloyd iterations, the production path.

Cross-engine float discipline (same trick as the green ANN oracles):
every cosine that feeds an ORDER BY / threshold / equality is rounded
to 6 decimals first, so a last-ulp disagreement between Spark's and
DuckDB's summation order cannot flip an assignment, a keep decision,
or a tie-break. Exact ties after rounding break on ascending id /
cell index in both engines.

Reference provenance: deDuplicator-Go has no embedding path; this
extends its exact-hash dup-group + keeper-election semantics
(/root/reference/files/dedupe.go keeper selection) into
semantic space, keeping the same "group then elect one keeper
deterministically" contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import cosine


def anchors_from_lowest_ids(
    emb: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic anchor centroids: the ``n_cells`` lowest-id
    vectors, L2-normalized. Mirrorable in ANSI SQL (ORDER BY id LIMIT
    k), which is what makes the semantic-dedup oracle value-checkable.
    """
    rows = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .orderBy("id")
        .limit(n_cells)
        .collect()
    )
    mat = np.vstack([r["vec"] for r in rows]).astype(np.float64)
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def assign_rounded(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, vec, cell, ccos): nearest centroid by cosine, with the
    ordering taken over ROUNDED cosine (6 dp) and ties broken by
    ascending centroid index — bit-stable across engines. One numpy
    matmul per Arrow batch; centroids broadcast (k x dim, tiny)."""
    sc = emb.sparkSession.sparkContext
    b = sc.broadcast(centroids)
    out_schema = "id long, vec array<double>, cell int, ccos double"

    def assign(it):
        cents = b.value
        for pdf in it:
            if not len(pdf):
                continue
            m = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = np.round(m @ cents.T, 6)
            # argmax over rounded sims; np.argmax takes the FIRST max,
            # i.e. ties break on ascending centroid index
            cell = np.argmax(sims, axis=1)
            ccos = sims[np.arange(len(m)), cell]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "vec": pdf["vec"],
                    "cell": cell.astype(np.int32),
                    "ccos": ccos,
                }
            )

    src = emb.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    return src.mapInPandas(assign, out_schema)


def semantic_dedup(
    emb: DataFrame,
    tau: float = 0.9,
    n_cells: int = 8,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup: → (vec_id, cell, ccos, kept, dup_of).

    A row is DROPPED iff some other row in the same cell has rounded
    pairwise cosine ≥ tau and strictly dominates it under the keeper
    order (lower ccos wins — the paper's keep-farthest-from-centroid —
    with ascending id as the tie-break). ``dup_of`` is the dominating
    row that is itself first in keeper order (the group's
    representative seen from this row); NULL for kept rows.

    ``centroids=None`` trains seeded Lloyd centroids
    (operators/ivf.py:train_centroids — the production path); pass
    ``anchors_from_lowest_ids(emb, n_cells)`` for the SQL-mirrorable
    variant the oracle checks.

    Plan shape: one assignment pass (Arrow matmul) → self equi-join on
    cell (native rounded-cosine predicate, Catalyst keeps vectors out
    of the shuffle until the join) → groupBy(loser) min-by keeper
    order → left join back. Every shuffle is keyed by cell or id;
    nothing quadratic leaves a cell.
    """
    if centroids is None:
        from .ivf import train_centroids

        centroids = train_centroids(
            emb, n_cells=n_cells, seed=seed, vec_col=vec_col
        )
    assigned = assign_rounded(emb, centroids, id_col, vec_col)

    # the cell self-join carries ONLY (id, ccos) — vectors attach by id
    # AFTER the keeper-order prune (broadcast/AQE hash joins that never
    # shuffle the pair table), the same vectors-never-ride-the-pair-
    # shuffle rule as similarity/ivf. With vectors inline both cell
    # shuffles hauled dim doubles per row and every ordered pair
    # materialized ~2·dim doubles through the join (measured: the
    # whole 37 s stage wall at the sf0.1 oracle view).
    a = assigned.select(
        F.col("id").alias("id_a"), "cell", F.col("ccos").alias("ccos_a")
    )
    b = assigned.select(
        F.col("id").alias("id_b"), "cell", F.col("ccos").alias("ccos_b")
    )
    # norms hoisted to one per-vector column: cosine per pair is then a
    # single zip_with/aggregate dot over the pair instead of three
    # (dot + both norms — measured 13.3 → ~5 s on the 2.27M sf0.1
    # pairs). sqrt(dot(v,v)) is computed by the same expression on the
    # same input, so the quotient is bit-identical to the inline form.
    from .similarity import _dot, _norm

    vecs = assigned.select("id", "vec", _norm(F.col("vec")).alias("nrm"))
    pair_cos = F.round(
        _dot(F.col("va"), F.col("vb")) / (F.col("nrm_a") * F.col("nrm_b")), 6
    )
    # every ordered pair (loser=a, dominator=b) in the same cell above
    # tau where b precedes a in keeper order (ccos ASC, id ASC); the
    # keeper-order filter runs before the cosine so only ordered-
    # dominating pairs pay the vector attach + dot product
    dominated = (
        a.join(b, "cell")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(
            (F.col("ccos_b") < F.col("ccos_a"))
            | ((F.col("ccos_b") == F.col("ccos_a")) & (F.col("id_b") < F.col("id_a")))
        )
        .join(
            vecs.withColumnsRenamed({"id": "id_a", "vec": "va", "nrm": "nrm_a"}),
            "id_a",
        )
        .join(
            vecs.withColumnsRenamed({"id": "id_b", "vec": "vb", "nrm": "nrm_b"}),
            "id_b",
        )
        .filter(pair_cos >= F.lit(tau))
    )
    w = Window.partitionBy("id_a").orderBy(F.asc("ccos_b"), F.asc("id_b"))
    dup_of = (
        dominated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("id_a").alias("id"), F.col("id_b").alias("dup_of"))
    )
    return (
        assigned.join(dup_of, "id", "left")
        .select(
            F.col("id").alias("vec_id"),
            "cell",
            F.col("ccos").alias("centroid_cos"),
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
        )
    )
