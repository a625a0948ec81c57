"""Corpus-hygiene operators for LLM training-data pipelines.

Three operators a web-scale training pipeline runs between crawl and
tokenizer, complementing the whole-document dedup stack (MinHash/LSH,
SimHash, substring blocks):

- **chunk-level (paragraph) dedup** — CCNet-style: the unit of
  duplication is a fixed word-window "paragraph", not the whole doc;
  boilerplate shared across pages (nav bars, footers, license blurbs)
  is detected and stripped even when the surrounding documents differ.
  (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
  from Web Crawl Data", 2020 — paragraph-hash dedup.)
- **repetition signals** — Gopher-style per-document repetitiousness:
  duplicate-word fraction and most-frequent-bigram fraction (Rae et
  al., "Scaling Language Models: ... Gopher", 2021, §A1.1.2). Docs
  dominated by one repeated phrase are low-value training data and
  cheap to flag before signature cost.
- **benchmark decontamination** — flag training documents sharing any
  word n-gram with a held-out evaluation set (GPT-3 §4 / PaLM-style
  13-gram overlap; n is configurable and small here because the
  synthetic docs are short).

Everything is native column algebra (split / slice / explode /
groupBy) — no Python UDFs, fully whole-stage-codegen, and every
operator has a DuckDB-expressible mirror registered in
``__spark_entry__.oracle_sql()``.

Scale notes (10^12 docs):
- chunk tables group by the chunk string; map-side partial
  aggregation collapses each partition's repeats before the shuffle,
  and a viral chunk is ONE grouped key (a count, never a pair
  explosion), so hot boilerplate cannot create a skew-join.
- ``strip_duplicated_chunks`` joins chunks→viral on the chunk string;
  the viral set (doc-frequency ≥ min_docs) is a tiny fraction of the
  chunk universe. The join is a plain shuffled hash join keyed by
  chunk; reassembly groups by doc id (uniform key).
- decontamination broadcasts the BENCHMARK gram set: evaluation
  suites are fixed-size (thousands of docs) while the train side is
  the 10^12-doc corpus — the classic small-dim broadcast.

Reference parity: the reference engine has no corpus-text analogs
(it dedups file bytes); these extend the same group/elect machinery
(/root/reference/files/dupes.go:31-108's group-and-keep shape) to
sub-document granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ngram import word_ngrams


def _words(text_col: Column) -> Column:
    """Normalized word array: lower, trim, single-space split — the
    exact tokenization the oracles mirror (regexp_replace + split so a
    run of whitespace never yields empty tokens)."""
    return F.split(F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " "), " ")


def doc_chunks(
    docs: DataFrame,
    chunk_words: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, chunk_idx, chunk): disjoint ``chunk_words``-word windows
    covering the document in order; the last chunk may be short. The
    "paragraph" unit for chunk-level dedup (synthetic corpus text has
    no newlines, so fixed word windows stand in for paragraphs; real
    web text would split on '\\n' first and chunk long paragraphs).

    Native: split → sequence → transform(slice) → posexplode. A
    non-empty string always yields ≥1 token after the single-space
    normalization, so the sequence bound is ≥0 and never descends.
    """
    toks = _words(F.col(text_col))
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.concat_ws(" ", F.slice(toks, k * chunk_words + 1, chunk_words)),
    )
    return docs.select(
        F.col(id_col).alias("id"), F.posexplode(chunks).alias("chunk_idx", "chunk")
    )


def duplicated_chunks(
    docs: DataFrame,
    chunk_words: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide duplicated-paragraph report: chunks appearing in
    ≥ ``min_docs`` distinct documents, with distinct-doc and total
    occurrence counts. The discovery half of CCNet paragraph dedup —
    at crawl scale this surfaces boilerplate (cookie banners, footers)
    shared across sites that whole-doc dedup can never merge."""
    chunks = doc_chunks(docs, chunk_words, id_col, text_col)
    return (
        chunks.groupBy("chunk")
        .agg(
            F.countDistinct("id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_duplicated_chunks(
    docs: DataFrame,
    chunk_words: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style paragraph dedup: remove every chunk occurrence whose
    chunk appears in ≥ ``min_docs`` distinct docs, EXCEPT in the
    canonical keeper (min id over the chunk's docs — the same
    lexicographic-keeper election the whole-doc path uses,
    /root/reference/files/dupes.go:66-83). Unique chunks and the
    keeper's copies survive; order is preserved on reassembly.

    → (id, clean_text, n_kept_chunks, n_removed_chunks) for EVERY
    input doc — a doc that is entirely boilerplate keeps an empty
    clean_text row rather than vanishing (downstream token accounting
    needs the tombstone).
    """
    chunks = doc_chunks(docs, chunk_words, id_col, text_col)
    viral = (
        chunks.groupBy("chunk")
        .agg(F.countDistinct("id").alias("__nd"), F.min("id").alias("__keeper"))
        .filter(F.col("__nd") >= min_docs)
        .select("chunk", "__keeper")
    )
    flagged = chunks.join(viral, "chunk", "left").withColumn(
        "__kept",
        F.col("__keeper").isNull() | (F.col("id") == F.col("__keeper")),
    )
    # collect_list skips nulls → only kept chunks enter the array;
    # array_sort on (chunk_idx, chunk) structs restores document order
    kept_struct = F.when(
        F.col("__kept"), F.struct(F.col("chunk_idx"), F.col("chunk"))
    )
    return flagged.groupBy("id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["chunk"]
            ),
        ).alias("clean_text"),
        F.sum(F.col("__kept").cast("int")).alias("n_kept_chunks"),
        F.sum((~F.col("__kept")).cast("int")).alias("n_removed_chunks"),
    )


def repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style per-document repetition features, fully native:

    - ``dup_word_frac``  = 1 − distinct_words / total_words
    - ``top_bigram_frac`` = occurrences of the most frequent word
      bigram / total bigrams (0.0 when the doc has < 2 words)

    → (id, n_words, dup_word_frac, top_bigram_frac). Thresholding is
    the caller's policy (Gopher drops docs with top-2-gram fraction
    > 0.20); emitting raw fractions keeps the operator reusable and
    the oracle exact. Two uniform-key aggregations (word and bigram
    counts group by (id, token) then id) — no skew surface."""
    toks = _words(F.col(text_col))
    base = docs.select(F.col(id_col).alias("id"), toks.alias("__t"))
    words = base.select("id", F.explode("__t").alias("word"))
    word_stats = words.groupBy("id").agg(
        F.count("*").alias("n_words"),
        F.countDistinct("word").alias("n_distinct"),
    )
    bigrams = base.select(
        "id",
        F.explode(
            F.when(
                F.size("__t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("__t", i),
                        F.element_at("__t", i + 1),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("bigram"),
    )
    top_bigram = (
        bigrams.groupBy("id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bigrams"))
    )
    return (
        word_stats.join(top_bigram, "id", "left")
        .select(
            "id",
            "n_words",
            F.round(
                F.lit(1.0) - F.col("n_distinct") / F.col("n_words"), 6
            ).alias("dup_word_frac"),
            F.round(
                F.coalesce(F.col("top_c") / F.col("n_bigrams"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
        )
    )


def source_mixing_weights(
    docs: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source sampling weights for training-mix construction:
    weight ∝ n_tokens^alpha, normalized to sum 1 (alpha < 1 upweights
    small high-quality sources — the standard temperature-style mix,
    e.g. multilingual sampling in XLM-R §3.1 / GPT-3 table 2.2's
    non-proportional source weights).

    → (source, n_docs, n_tokens, weight). One partial-aggregated
    groupBy; the normalizing total joins back from a one-row broadcast
    (source cardinality is tiny — never a window over the corpus)."""
    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_words(F.col(text_col)))).alias("n_tokens"),
    )
    total = per.agg(
        F.sum(F.pow(F.col("n_tokens"), F.lit(alpha))).alias("__z")
    )
    return per.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.pow(F.col("n_tokens"), F.lit(alpha)) / F.col("__z"), 6).alias(
            "weight"
        ),
    )


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic per-source downsampling to a token budget: docs
    are ordered by a multiplicative integer hash of their id (Knuth
    2654435761 — identical arithmetic in Spark and ANSI SQL, unlike
    xxhash64), and each source keeps docs while its running token
    total stays within ``budget_tokens``. The greedy prefix rule keeps
    the doc that CROSSES the budget (so a budget smaller than the
    first doc still yields one doc per source, and the kept set is a
    deterministic function of (ids, budget) — resume-stable).

    → (id, source, n_tokens, cum_tokens, kept) for every doc. Window
    is partitioned by source — per-source state, never a global sort.
    A skewed source (one source = half the corpus) makes a hot window
    partition; for that shape pre-bucket by range of the hash and
    cumulate bucket offsets — documented, not needed at test scale.

    String ids (urls) order by xxhash64 instead — equally
    deterministic, just not mirrored by the SQL oracle (which uses the
    numeric-id table)."""
    from pyspark.sql import Window
    from pyspark.sql.types import NumericType

    id_type = docs.schema[id_col].dataType
    if isinstance(id_type, NumericType):
        h = F.pmod(F.col(id_col) * F.lit(2654435761), F.lit(4294967296)).alias("__h")
    else:
        h = F.xxhash64(id_col).alias("__h")
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.size(_words(F.col(text_col))).cast("long").alias("n_tokens"),
        h,
    )
    w = Window.partitionBy("source").orderBy("__h", "id")
    return base.select(
        "id",
        "source",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
    ).withColumn(
        "kept",
        (F.col("cum_tokens") - F.col("n_tokens")) < F.lit(int(budget_tokens)),
    )


def benchmark_overlap(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Decontamination: for every training document, the number of
    distinct word ``n``-grams it shares with the benchmark set, plus a
    ``contaminated`` flag (any shared gram). GPT-3 §4-style n-gram
    overlap with the eval suite; n=13 there, configurable here
    (synthetic docs are 10–90 words).

    The benchmark gram universe is aggregated and BROADCAST — eval
    suites are fixed-size while the train side scales to 10^12 docs,
    so the contamination join never shuffles the corpus by gram.
    → (id, n_shared_grams, contaminated) for every train doc."""
    bench_grams = (
        word_ngrams(benchmark, n=n, id_col=id_col, text_col=text_col)
        .select("gram")
        .distinct()
    )
    train_grams = word_ngrams(train, n=n, id_col=id_col, text_col=text_col)
    hits = (
        train_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("__hits"))
    )
    ids = train.select(F.col(id_col).alias("id")).distinct()
    return ids.join(hits, "id", "left").select(
        "id",
        F.coalesce("__hits", F.lit(0)).alias("n_shared_grams"),
        (F.coalesce("__hits", F.lit(0)) > 0).alias("contaminated"),
    )
