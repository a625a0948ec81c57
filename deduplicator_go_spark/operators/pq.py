"""Product quantization (PQ) — compressed-domain embedding ANN.

The third scale path for embedding similarity (after the hyperplane
LSH in operators/similarity.py and the IVF probe join in
operators/ivf.py), solving the problem neither touches: the
REPRESENTATION. At 10^12 vectors × 64-dim float64 the corpus is
~0.5 PB; PQ codes at m=8 small ints per vector are ~100× smaller —
the candidate-scoring join ships codes, not vectors, and the shuffle
shrinks by the same factor. (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011.)

Pipeline shape (IVF-PQ with exact re-rank — the standard composition):

1. codebooks: per-subspace k-means on a bounded seeded driver sample
   (numpy Lloyd, same policy as ivf.train_centroids), broadcast —
   m × k × (d/m) doubles, tiny.
2. encode: one mapInPandas pass; per subspace one matmul + argmax per
   Arrow batch. Encoding picks the centroid maximizing the SUBSPACE
   DOT (not min-L2): for normalized inputs the two agree up to
   centroid norm, and max-dot makes ADC provably self-consistent —
   ADC(q, code(q)) = Σ_s max_c q_s·c is the maximum achievable score
   for q over ALL codes, so an exact copy can never be out-scored
   (the property the planted-truth oracle pins).
3. shortlist: IVF cell probe join (salted, bounded buckets — reused
   machinery) where the stored side carries only (id, cell, code);
   ADC scores each (query, candidate) via per-query lookup tables —
   applyInPandas grouped by query id so the k×m table is built ONCE
   per query and each candidate costs O(m) lookups (the ADC economics;
   scoring row-wise would pay the table per row).
4. re-rank: the top-``shortlist`` ADC candidates per query join their
   FULL vectors by id (pairs ≪ corpus after the cut) and exact cosine
   orders the final top-k — approximation bounded to recall, never to
   reported scores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ivf import assign_cells, train_centroids
from .similarity import cosine


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """→ (m, k, d/m) per-subspace centroids. Deterministic Lloyd on a
    bounded seeded sample, normalized whole-vector first (cosine
    geometry), run independently per subspace."""
    rows = emb.select(vec_col).limit(sample).collect()
    mat = np.vstack([r[vec_col] for r in rows]).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, sub), dtype=np.float64)
    for s in range(m):
        x = mat[:, s * sub : (s + 1) * sub]
        cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
        if len(cents) < k:  # degenerate tiny sample: pad by repetition
            cents = np.vstack([cents] * (k // len(cents) + 1))[:k]
        for _ in range(iters):
            # L2 assignment for training (spread), dot for encoding
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = x[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s] = cents
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, code array<int>): per-subspace argmax-dot centroid index.
    One matmul per (subspace, Arrow batch); codes are the compressed
    representation every downstream join ships instead of vectors."""
    sc = emb.sparkSession.sparkContext
    b = sc.broadcast(codebooks)

    def encode(it):
        books = b.value
        m, _, sub = books.shape
        for pdf in it:
            x = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(x), m), dtype=np.int64)
            for s in range(m):
                codes[:, s] = np.argmax(
                    x[:, s * sub : (s + 1) * sub] @ books[s].T, axis=1
                )
            yield pd.DataFrame({"id": pdf["id"], "code": list(codes)})

    src = emb.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    return src.mapInPandas(encode, "id long, code array<long>")


def ivfpq_topk(
    emb: DataFrame,
    k: int = 5,
    m: int = 8,
    k_cent: int = 16,
    n_cells: int = 16,
    n_probe: int = 4,
    shortlist: int = 32,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int = 4096,
) -> DataFrame:
    """IVF-PQ with exact re-rank → (id_a, id_b, cos, rank).

    The probe join's stored side is (id, cell, salt, code) — m small
    ints of payload per row instead of d doubles (the 100 TB win: at
    d=64/m=8 the shuffled bytes drop ~30×; the full vectors move only
    for shortlist·n query pairs in the re-rank). ADC scoring groups by
    query so each query builds its k×m lookup table once. Hot-cell
    salting is inherited from ivf.ivf_topk (bounded ~cell_cap join
    buckets)."""
    cents = train_centroids(emb, n_cells=n_cells, seed=seed, vec_col=vec_col)
    books = train_pq_codebooks(
        emb, m=m, k=k_cent, seed=seed, vec_col=vec_col
    )
    codes = pq_encode(emb, books, id_col, vec_col)

    stored = (
        assign_cells(emb, cents, id_col, vec_col, n_probe=1)
        .select(F.col("id").alias("id_b"), "cell")
        .join(codes.withColumnRenamed("id", "id_b"), "id_b")
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
    # the candidate join/dedup carries ONLY (id_a, id_b, code) — m
    # small ints of payload. The query vector previously rode every
    # candidate row through the join, the dropDuplicates shuffle AND
    # the applyInPandas groupBy shuffle (d doubles × candidates ≈ the
    # whole stage wall at the sf0.1 oracle view). ADC scoring is now
    # split by economics: the per-query (m×k) lookup table is built in
    # ONE pandas pass over the 1-row-per-query side, and each
    # candidate's O(m) table-lookup sum runs as a native codegen
    # expression after a hash join of the (flattened) tables onto the
    # skinny candidates — no per-candidate Python, no vectors in any
    # pair shuffle. Same left-to-right 8-term double sum as the numpy
    # row sum it replaces, so scores (and the shortlist) are
    # bit-identical.
    cand = (
        queries_s.join(stored_s.select("cell", "salt", "id_b", "code"), ["cell", "salt"])
        .filter(F.col("id_a") != F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "code")
    )

    sc = emb.sparkSession.sparkContext
    b = sc.broadcast(books)
    n_short = shortlist
    k_codes = books.shape[1]

    def adc_tables(it):
        books_ = b.value
        m_, _, sub = books_.shape
        for pdf in it:
            x = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            # (batch, m·k) flattened ADC tables: row-major [s·k + c]
            tabs = np.concatenate(
                [x[:, s * sub : (s + 1) * sub] @ books_[s].T for s in range(m_)],
                axis=1,
            )
            yield pd.DataFrame({"id_a": pdf["id"], "tab": list(tabs)})

    tabs = emb.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).mapInPandas(adc_tables, "id_a long, tab array<double>")

    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.col("tab"), (s * k_codes + F.element_at(F.col("code"), s + 1) + 1).cast("int")
        ),
    )
    w_short = Window.partitionBy("id_a").orderBy(F.desc("adc"), F.asc("id_b"))
    short = (
        cand.join(tabs, "id_a")
        .withColumn("adc", adc)
        .withColumn("srn", F.row_number().over(w_short))
        .filter(F.col("srn") <= n_short)
        .select("id_a", "id_b")
    )

    # exact re-rank: full vectors attach by id AFTER the shortlist cut
    vecs = emb.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    scored = (
        short.join(vecs.withColumnRenamed("id", "id_a").withColumnRenamed("v", "va"), "id_a")
        .join(vecs.withColumnRenamed("id", "id_b").withColumnRenamed("v", "vb"), "id_b")
        .select(
            "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos")
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id_a", "id_b", "cos", "rank")
    )
