"""IVF (inverted-file) approximate nearest neighbors.

The second scale path for embedding similarity (besides the
random-hyperplane LSH in operators/similarity.py): vectors are
assigned to their nearest of C coarse centroids; a query probes the
``n_probe`` nearest centroid cells and scores exactly within them.

Spark shape:
- centroids are trained driver-side on a bounded seeded sample with
  plain-numpy Lloyd iterations (deterministic, no MLlib dependency),
  then broadcast — centroid tables are tiny (C x dim);
- assignment is one matmul per Arrow batch (mapInPandas);
- the probe join is cell-id equi-join: queries replicate n_probe
  times, candidates shuffle once on cell id — the only data-sized
  shuffle, keyed to balance across C cells.

Skew note: clustered corpora make hot cells; the probe join salts them
(``cell_cap``): per-cell member counts (tiny, broadcast) give each cell
a salt fan-out ``ceil(n/cell_cap)``; stored rows hash into one salted
sub-cell, query rows replicate across all of that cell's sub-cells.
Every join bucket is then bounded by ~cell_cap stored rows — same total
candidate work, no single hot task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def train_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic Lloyd k-means on a seeded sample (driver-side numpy;
    the sample is bounded, never the full table)."""
    frac_rows = emb.select(vec_col).limit(sample).collect()
    mat = np.vstack([r[vec_col] for r in frac_rows]).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    cents[c] = v / n
    return cents


def assign_cells(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """→ (id, vec, cell, probe_rank). n_probe=1 gives the storage
    assignment; n_probe>1 gives the query-side probe list."""
    sc = emb.sparkSession.sparkContext
    b = sc.broadcast(centroids)

    out_schema = "id long, vec array<double>, cell int, probe_rank int"

    def assign(it):
        cents = b.value
        for pdf in it:
            m = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ cents.T
            order = np.argsort(-sims, axis=1)[:, :n_probe]
            rows = {"id": [], "vec": [], "cell": [], "probe_rank": []}
            for i in range(len(pdf)):
                for r in range(order.shape[1]):
                    rows["id"].append(pdf["id"].iloc[i])
                    rows["vec"].append(list(pdf["vec"].iloc[i]))
                    rows["cell"].append(int(order[i, r]))
                    rows["probe_rank"].append(r)
            yield pd.DataFrame(rows)

    src = emb.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    return src.mapInPandas(assign, out_schema)


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int = 4096,
) -> DataFrame:
    """Approximate top-k via IVF probing → (id_a, id_b, cos, rank).

    Hot-cell skew control: the probe equi-join is salted per cell.
    ``cell_sizes`` (C rows, broadcast) carries each cell's salt fan-out
    ``ns = ceil(members / cell_cap)``; stored rows take
    ``salt = pmod(xxhash64(id), ns)`` while query probes explode across
    all ns salts, so a clustered corpus (one cell holding most vectors)
    joins in bounded ~cell_cap buckets instead of one hot task that AQE
    cannot split further without losing the equi-join key.
    """
    from .similarity import _attach_vectors, attached_cosine

    cents = train_centroids(emb, n_cells=n_cells, seed=seed, vec_col=vec_col)
    # the probe join carries ONLY (cell, salt, id) — vectors attach by
    # id AFTER pair dedup, the same rule every other pair path follows
    # (similarity._attach_vectors): with vectors inline, each candidate
    # row hauled 2·dim doubles through the join + dropDuplicates
    # shuffles (measured: 24M candidate rows × ~1 KB at the sf0.1
    # oracle view = the entire 178 s stage wall; ids-only rows are
    # ~16 B — a ~60× shuffle-byte cut before any scoring)
    stored = assign_cells(emb, cents, id_col, vec_col, n_probe=1).select(
        F.col("id").alias("id_b"), "cell"
    )
    queries = assign_cells(emb, cents, id_col, vec_col, n_probe=n_probe).select(
        F.col("id").alias("id_a"), "cell"
    )
    cell_sizes = stored.groupBy("cell").agg(
        F.ceil(F.count("*") / F.lit(cell_cap)).cast("int").alias("ns")
    )
    stored_s = stored.join(F.broadcast(cell_sizes), "cell").withColumn(
        "salt", F.pmod(F.xxhash64("id_b"), F.col("ns")).cast("int")
    )
    queries_s = queries.join(F.broadcast(cell_sizes), "cell").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.col("ns") - 1))
    )
    pairs = (
        queries_s.join(stored_s.select("cell", "salt", "id_b"), ["cell", "salt"])
        .filter(F.col("id_a") != F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b")
    )
    scored = _attach_vectors(pairs, emb, id_col, vec_col).select(
        "id_a", "id_b", F.round(attached_cosine(), 6).alias("cos")
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id_a", "id_b", "cos", "rank")
    )
