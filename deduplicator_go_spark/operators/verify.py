"""Candidate-pair verification: exact character-shingle Jaccard.

The "cheap key first, expensive compute on collisions only" shape of
the reference's size-blocking (/root/reference/files/hash.go:37-48):
LSH surfaces candidates; only those pay the exact-Jaccard cost.

Verification recomputes shingle hash *sets* (not MinHash estimates)
with the same rolling hash as the signature stage, via a vectorized
pandas UDF over the joined pair texts — Arrow batches, numpy set
intersection per pair, no per-row Python serde.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .minhash import shingle_hashes


def attach_texts(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """Join both endpoints' texts onto the candidate edges.

    Two shuffle joins on url; the docs side is pre-projected to
    (url, text) so only needed columns move.
    """
    texts = docs.select("url", "text")
    return (
        pairs.join(texts.withColumnsRenamed({"url": "url_a", "text": "text_a"}), "url_a")
        .join(texts.withColumnsRenamed({"url": "url_b", "text": "text_b"}), "url_b")
    )


def exact_jaccard_udf(shingle_size: int):
    @F.pandas_udf(T.DoubleType())
    def jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta), dtype=np.float64)
        for i in range(len(ta)):
            sa = shingle_hashes(ta.iloc[i] or "", shingle_size)
            sb = shingle_hashes(tb.iloc[i] or "", shingle_size)
            if len(sa) == 0 and len(sb) == 0:
                out[i] = 1.0
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            out[i] = inter / (len(sa) + len(sb) - inter)
        return pd.Series(out)

    return jac


def verify_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    shingle_size: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """→ (url_a, url_b, origin, jaccard, is_dup)."""
    jac = exact_jaccard_udf(shingle_size)
    joined = attach_texts(pairs, docs)
    return joined.select(
        "url_a",
        "url_b",
        "origin",
        jac(F.col("text_a"), F.col("text_b")).alias("jaccard"),
    ).withColumn("is_dup", F.col("jaccard") >= F.lit(threshold))
