"""Word n-gram Jaccard near-duplicate detection — fully native.

A SQL-expressible dedup path (DuckDB-oracle friendly): word n-grams
via explode + window-free self-join on shared grams, Jaccard from
gram counts.  Used for the `queries()` correctness surface and as a
cheaper alternative to MinHash when the corpus fits exact gram joins
(at 100 TB you'd use MinHash; this operator documents the exact
computation MinHash approximates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams(docs: DataFrame, n: int = 3, id_col: str = "url", text_col: str = "text") -> DataFrame:
    """→ (id, gram) distinct word n-grams per doc, native exprs:
    split → transform over index range → explode."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    k = F.size(toks) - (n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array())
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("gram"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "url",
    text_col: str = "text",
    max_doc_freq: int | None = 256,
) -> DataFrame:
    """All pairs with n-gram Jaccard >= threshold over the gram universe
    with document frequency <= ``max_doc_freq``.

    Hot-gram skew control: a gram shared by m docs contributes C(m,2)
    rows to the self-join — one viral trigram makes a single O(n²)
    shuffle key that AQE cannot split (self-join). Grams with
    doc_freq > max_doc_freq are dropped from the universe *before* the
    join (both the intersection AND the per-doc totals, so Jaccard
    stays exact over the filtered universe — well-defined semantics the
    DuckDB oracle mirrors verbatim). The hot-gram list is tiny (only
    grams above the cap) and broadcast for the anti-join.

    Shuffle shape: explode → gram df agg → broadcast anti-join →
    pair counts (every key now bounded by C(cap,2)) → join per-doc
    totals → Jaccard. ``max_doc_freq=None`` disables the cap.
    """
    # the gram table feeds several consumers (df agg, per-doc sizes,
    # both self-join sides); materialize the explode once instead of
    # re-deriving it per consumer (same reuse pattern as the LSH band
    # table — on a production run this is a stage-catalog table)
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
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_grams": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_grams": "nb"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "na", "nb", F.round("jaccard", 6).alias("jaccard"))
    )
