"""Directed n-gram containment (asymmetric Jaccard) detection.

Symmetric near-dup measures (Jaccard, MinHash, SimHash) miss the
subset relationship a web corpus is full of: quote pages, aggregator
excerpts, syndicated snippets — doc A whose shingle set lives almost
entirely INSIDE doc B while B has much more text. Containment scores
the direction explicitly:

    containment(A → B) = |grams(A) ∩ grams(B)| / |grams(A)|

(Broder 1997's resemblance-vs-containment distinction.) A pair with
containment ≈ 1 but Jaccard well under the dup threshold is a true
excerpt, not a duplicate — a curation pipeline usually KEEPS the
superset doc and drops the excerpt, the opposite of what a symmetric
dedup would do (which sees no pair at all).

Scale shape — identical to the Jaccard path it extends
(operators/ngram.py): one gram explode (native split/transform, no
UDF), document-frequency cap dropping viral grams from the universe
*before* the self-join (both the intersection and the per-doc totals,
so the score stays exact over the filtered universe — semantics the
DuckDB oracle mirrors verbatim), then a gram equi-join whose keys are
all bounded by C(cap, 2). The directed output keeps both orders of a
mutual-dup pair; at 100 TB you run this on LSH candidates, not the
raw corpus — the operator takes any (id, text) frame, so feeding it
`candidate_pairs` survivors is a plain filter upstream.

Reference provenance: extends /root/reference/files/dedupe.go:168-181
exact-group semantics the same way operators/ngram.py does; no
containment analogue exists in the reference (its hashes are
whole-file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ngram import word_ngrams


def ngram_containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.9,
    id_col: str = "url",
    text_col: str = "text",
    max_doc_freq: int | None = 256,
) -> DataFrame:
    """All DIRECTED pairs (id_a, id_b) with
    containment(a → b) >= threshold over the df-capped gram universe
    → (id_a, id_b, n_common, na, nb, containment, jaccard).

    ``containment`` is n_common/na (how much of A is inside B);
    ``jaccard`` rides along so consumers can split excerpts
    (containment high, jaccard low) from mutual dups (both high).
    Scores are exact integer ratios rounded to 6 decimals — bit-equal
    across engines, no float-order hazard.
    """
    grams = word_ngrams(docs, n, id_col, text_col).localCheckpoint(eager=True)
    if max_doc_freq is not None:
        hot = (
            grams.groupBy("gram")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("gram")
        )
        grams = grams.join(F.broadcast(hot), "gram", "left_anti")
    sizes = grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(b, "gram")
        .filter(F.col("a.id") != F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_grams": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_grams": "nb"}), "id_b")
        .withColumn("containment", F.col("n_common") / F.col("na"))
        .filter(F.col("containment") >= threshold)
        .select(
            "id_a",
            "id_b",
            "n_common",
            "na",
            "nb",
            F.round("containment", 6).alias("containment"),
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
    )


def excerpt_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.9,
    jaccard_max: float = 0.5,
    id_col: str = "url",
    text_col: str = "text",
    max_doc_freq: int | None = 256,
) -> DataFrame:
    """True excerpts only: directed containment >= threshold while the
    symmetric Jaccard stays <= jaccard_max — the pairs every symmetric
    dedup path misses by construction. Keep id_b (the superset doc),
    drop id_a (the excerpt)."""
    return ngram_containment_pairs(
        docs, n, threshold, id_col, text_col, max_doc_freq
    ).filter(F.col("jaccard") <= F.lit(jaccard_max))
