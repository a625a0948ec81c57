"""Product-quantization ANN (operators/pq.py): code determinism,
exact-copy code identity, and planted-truth top-k recovery."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplicator_go_spark.operators import pq


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=32)]) for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()


def _with_copies(emb, js=(1, 2, 3)):
    out = emb
    for j in js:
        out = out.unionByName(
            emb.select(
                (F.col("vec_id") + F.lit(j * 1000000)).alias("vec_id"), "embedding"
            )
        )
    return out


def test_exact_copy_gets_identical_code(spark, emb):
    books = pq.train_pq_codebooks(emb, m=8, k=16, seed=1)
    assert books.shape == (8, 16, 4)
    view = _with_copies(emb, js=(1,))
    codes = {r["id"]: list(r["code"]) for r in pq.pq_encode(view, books).collect()}
    for i in range(200):
        assert codes[i] == codes[i + 1000000]
        assert len(codes[i]) == 8  # m small ints, not 32 doubles


def test_codebooks_deterministic(spark, emb):
    b1 = pq.train_pq_codebooks(emb, m=4, k=8, seed=3)
    b2 = pq.train_pq_codebooks(emb, m=4, k=8, seed=3)
    assert np.array_equal(b1, b2)


def test_ivfpq_topk_recovers_planted_siblings(spark, emb):
    view = _with_copies(emb)
    out = pq.ivfpq_topk(view, k=3, n_cells=4, n_probe=2, shortlist=16).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r["id_a"], []).append(r)
    assert len(by_query) == 800
    for qid, rows in by_query.items():
        base = qid % 1000000
        want = sorted(base + j * 1000000 for j in range(4) if base + j * 1000000 != qid)
        got = [r["id_b"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert got == want, (qid, got, want)
        assert all(abs(r["cos"] - 1.0) < 1e-9 for r in rows)


def test_bad_subspace_split_raises(spark, emb):
    with pytest.raises(ValueError):
        pq.train_pq_codebooks(emb, m=5, k=8)  # 32 % 5 != 0
