"""Word n-gram Jaccard near-duplicate detection — fully native.

A SQL-expressible dedup path (DuckDB-oracle friendly): word n-grams
via explode, then exact all-pairs similarity with **prefix filtering**
(AllPairs / PPJoin — Bayardo et al., WWW'07; Xiao et al., WWW'08)
instead of the naive gram self-join.  Used for the `queries()`
correctness surface and as a cheaper alternative to MinHash when the
corpus fits exact gram joins (at 100 TB you'd use MinHash; this
operator documents the exact computation MinHash approximates).

Why prefix filtering: the naive shape (self-join on gram → count
co-occurrences per pair → threshold) materializes one row per shared
gram per pair — sum over grams of C(df, 2) rows.  Measured on the
sf1.0 bench corpus that is 166.6M join rows collapsing to 149.6M
distinct pairs (mean n_common ≈ 1.1), of which ~10³ survive the
Jaccard-0.8 threshold: >99.99% of the shuffle is provably-doomed
pairs, because J ≥ t requires n_common ≥ t/(1+t)·(na+nb) and almost
all co-occurring pairs share a single gram.  Prefix filtering prunes
those pairs BEFORE they are generated, exactly:

- sort each doc's (capped) gram set by a global total order
  (ascending document frequency, ties by gram — rarest first);
- a pair with J ≥ t MUST share a gram within the first
  ``n - ceil(t·n) + 1`` grams of each side's sorted set (prefix
  lemma: for a qualifying pair c ≥ t/(1+t)(na+nb) ≥ ceil(t·na),
  and the first common gram g_min has all c common grams at or
  after its position, so pos(g_min) ≤ na - c + 1 ≤ prefix length);
- candidates additionally pass the size filter
  (min(na,nb) ≥ t·max(na,nb), implied by J ≥ t since c ≤ min) and
  the positional filter (c ≤ min(na-pa, nb-pb)+1 for the minimal
  common gram's positions, so require that bound ≥
  ceil(t/(1+t)(na+nb)));
- surviving candidates are verified EXACTLY: n_common =
  |array_intersect| of the two full (capped) gram sets, then the
  same Jaccard threshold as before.  False candidates cost a little
  verify work; qualifying pairs provably survive every filter, so
  the output is identical to the naive join (oracle-checked).

Measured at sf1.0: 166.6M naive join rows → 634k prefix rows →
3.1M candidates (53x less pair traffic), each verified with one
~n-element array intersect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams(docs: DataFrame, n: int = 3, id_col: str = "url", text_col: str = "text") -> DataFrame:
    """→ (id, gram) distinct word n-grams per doc, native exprs:
    split → transform over index range → explode.

    Gram construction reads tokens with ``element_at`` + one
    ``concat_ws`` over scalar args — the earlier ``F.slice(toks, i+1,
    n)`` form allocated a fresh n-element array per (doc, gram)
    position (tens of millions of temporaries per corpus pass; the
    same allocation class lsh.band_hash_array eliminated). The token
    array is projected into its own column first so the regex
    split/lower/trim runs once per doc rather than riding every
    reference inside the transform (measured 5.4 → 4.7 s for the
    sf1.0 gram pass)."""
    toks = F.col("__toks")
    k = F.size(toks) - (n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array())
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
        )
        .select("id", F.explode(F.array_distinct(grams)).alias("gram"))
    )


# float-safe ceil for threshold arithmetic: t·n computed in binary can
# land a hair ABOVE the exact product (0.8·5 → 4.0000000000000002),
# and a too-large ceil SHRINKS the prefix / RAISES the required
# overlap — the direction that loses qualifying pairs.  The epsilon
# only ever loosens the filters (more candidates), and the exact
# verify step makes loose filters harmless.
def _safe_ceil(col):
    return F.ceil(col - F.lit(1e-9))


def gram_docsets(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "url",
    text_col: str = "text",
    max_doc_freq: int | None = 256,
) -> DataFrame:
    """→ pinned (id, grams, n_grams): per-doc df-capped gram sets as
    arrays sorted by the global (document frequency ASC, gram ASC)
    order — the shared input shape of the prefix-filtered similarity
    joins (Jaccard here, directed containment in
    operators/containment.py). Rarest-first ordering is what makes
    prefixes selective; any consistent total order preserves
    exactness."""
    from .minhash import cpu_partitions

    # the tokenize/gram projection is CPU-bound and would otherwise run
    # inside the scan stage at the parquet split count (4 tasks at
    # sf1.0 on 32 cores — measured 33 s serialized vs ~4 s spread);
    # repartition the docs first so the explode uses every core
    grams = word_ngrams(
        docs.repartition(cpu_partitions(docs)), n, id_col, text_col
    )
    # two consumers below (df agg + the docsets build): pin the explode
    # once — unpinned, each consumer re-runs the tokenize/gram pass
    grams = grams.localCheckpoint(eager=True)
    df = grams.groupBy("gram").agg(F.count("*").alias("df"))
    if max_doc_freq is not None:
        df = df.filter(F.col("df") <= max_doc_freq)
    docsets = (
        grams.join(df, "gram")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "gram"))).alias("gs"))
        .select(
            "id",
            F.col("gs").getField("gram").alias("grams"),
            F.size("gs").alias("n_grams"),
        )
    )
    # multiple consumers (prefix explode + verify sides): pin once
    # (same multi-consumer rule as the LSH band table)
    return docsets.localCheckpoint(eager=True)


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
    candidate rows — one viral trigram makes a single O(n²) shuffle key
    that AQE cannot split (self-join). Grams with doc_freq >
    max_doc_freq are dropped from the universe *before* anything else
    (both the intersection AND the per-doc totals, so Jaccard stays
    exact over the filtered universe — well-defined semantics the
    DuckDB oracle mirrors verbatim). ``max_doc_freq=None`` disables
    the cap.

    Shuffle shape (prefix-filtered, see module docstring): explode →
    gram df agg → per-doc sorted gram arrays → prefix explode (only
    ``n - ceil(t·n) + 1`` rarest grams per doc) → prefix self-join with
    size + positional filters → distinct candidates → exact
    array_intersect verify against the full gram arrays.  The heavy
    gram strings cross an exchange once (building the per-doc arrays);
    the self-join carries only the tiny prefix table.
    """
    t = float(threshold)
    docsets = gram_docsets(docs, n, id_col, text_col, max_doc_freq)

    pref_len = (F.col("n_grams") - _safe_ceil(F.lit(t) * F.col("n_grams")) + 1).cast("int")
    prefix = docsets.select(
        "id",
        "n_grams",
        F.posexplode(F.slice("grams", F.lit(1), F.greatest(pref_len, F.lit(1)))).alias(
            "pos0", "gram"
        ),
    ).select("id", "n_grams", (F.col("pos0") + 1).alias("pos"), "gram")

    a = prefix.alias("a")
    b = prefix.alias("b")
    tt = t / (1.0 + t)
    # candidate filters (each only PRUNES; qualifying pairs provably
    # pass all three — proof in the module docstring):
    #   size:       min(na, nb) >= t·max(na, nb)
    #   positional: min(na - pa, nb - pb) + 1 >= ceil(tt·(na + nb))
    cand = (
        a.join(b, "gram")
        .filter(
            (F.col("a.id") < F.col("b.id"))
            & (
                F.least("a.n_grams", "b.n_grams")
                >= F.lit(t) * F.greatest("a.n_grams", "b.n_grams") - F.lit(1e-9)
            )
            & (
                F.least(
                    F.col("a.n_grams") - F.col("a.pos"),
                    F.col("b.n_grams") - F.col("b.pos"),
                )
                + 1
                >= _safe_ceil(F.lit(tt) * (F.col("a.n_grams") + F.col("b.n_grams")))
            )
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    # exact verify: intersect the full capped gram sets (arrays hold
    # per-doc-distinct grams, so |array_intersect| IS n_common)
    sa = docsets.select(
        F.col("id").alias("id_a"), F.col("grams").alias("ga"), F.col("n_grams").alias("na")
    )
    sb = docsets.select(
        F.col("id").alias("id_b"), F.col("grams").alias("gb"), F.col("n_grams").alias("nb")
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_common", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "na", "nb", F.round("jaccard", 6).alias("jaccard"))
    )
