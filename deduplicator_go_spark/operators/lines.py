"""Line-level boilerplate dedup: strip lines repeated across documents.

Whole-document and span dedup (exact / MinHash / ExactSubstr) treat a
document as the unit; web corpora also carry LINE-level repetition —
nav menus, cookie banners, footers — that repeats across thousands of
pages of a site without making any page pair near-identical. CCNet
(Wenzek et al. 2020) and RefinedWeb (Penedo et al. 2023) both dedup at
line granularity: a line occurring in >= min_docs distinct documents
(optionally scoped per host, where boilerplate actually repeats) is
removed from EVERY document, and each document keeps its unique
remainder in original line order.

Contrast with operators/corpus.py's chunk dedup: that one dedups
word-window CONTENT chunks and keeps one canonical copy (min-id
keeper); this one removes BOILERPLATE lines from all occurrences —
nobody should train on the cookie banner even once — and scopes the
count per host when boilerplate is site-local.

Scale shape: one distinct + count aggregation keyed by (scope, line) —
partial map-side combine makes viral lines ("Home") single reduce keys
with pre-aggregated partials, and the distinct's (line, url) key is
collision-free so no hot partition; the duplicate-line set is the
boilerplate tail (tiny next to the corpus — AQE broadcasts it under
the threshold), joined per exploded line; reassembly is ONE groupBy(url)
whose per-doc state is the doc's own lines. No driver-side data path.

Reference provenance: no analog — the reference dedups whole files by
content hash (/root/reference/files/hash.go); sub-document
surgery only exists for text corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exploded_lines(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(url, pos, line): text split on '\\n', 1-based position. A NULL
    or empty text yields one empty line at pos 1 (kept — empty lines
    never meet the min_chars bar for removal)."""
    exploded = F.posexplode(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    ).alias("p0", "line")
    return docs.select(F.col(url_col).alias("url"), exploded).select(
        "url", (F.col("p0") + 1).alias("pos"), "line"
    )


def duplicate_lines(
    docs: DataFrame,
    min_docs: int = 2,
    min_chars: int = 1,
    url_col: str = "url",
    text_col: str = "text",
    scope_col: str | None = None,
) -> DataFrame:
    """The boilerplate table: lines of >= min_chars chars occurring in
    >= min_docs DISTINCT documents → ([scope_col], line, n_docs).

    Distinct-docs is computed as distinct(scope, line, url) → count —
    the distinct's composite key is skew-free even when one line
    appears in every document of the corpus."""
    lines = exploded_lines(docs, url_col, text_col)
    if scope_col is not None:
        scopes = docs.select(F.col(url_col).alias("url"), scope_col)
        lines = lines.join(scopes, "url")
    keys = ([scope_col] if scope_col else []) + ["line"]
    return (
        lines.filter(F.length("line") >= min_chars)
        .select(*keys, "url")
        .distinct()
        .groupBy(*keys)
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_duplicate_lines(
    docs: DataFrame,
    min_docs: int = 2,
    min_chars: int = 1,
    url_col: str = "url",
    text_col: str = "text",
    scope_col: str | None = None,
) -> DataFrame:
    """Rewrite every document with its boilerplate lines removed
    (removed from ALL occurrences — the CCNet/RefinedWeb rule, unlike
    keep-one document dedup). → docs columns with ``text_col``
    rewritten in original line order, plus n_lines_removed /
    chars_removed lineage columns (0 for untouched docs;
    chars_removed counts line characters, not the eaten newlines)."""
    dups = duplicate_lines(
        docs, min_docs, min_chars, url_col, text_col, scope_col
    ).withColumn("__dup", F.lit(1))
    lines = exploded_lines(docs, url_col, text_col)
    keys = ["line"]
    if scope_col is not None:
        scopes = docs.select(F.col(url_col).alias("url"), scope_col)
        lines = lines.join(scopes, "url")
        keys = [scope_col, "line"]
    marked = lines.join(dups.select(*keys, "__dup"), keys, "left")

    kept = F.filter(
        F.array_sort(F.collect_list(F.struct("pos", "line", "__dup"))),
        lambda x: x["__dup"].isNull(),
    )
    rebuilt = marked.groupBy("url").agg(
        F.array_join(F.transform(kept, lambda x: x["line"]), "\n").alias("__new"),
        F.count(F.col("__dup")).alias("n_lines_removed"),
        F.coalesce(
            F.sum(F.when(F.col("__dup").isNotNull(), F.length("line"))), F.lit(0)
        ).alias("chars_removed"),
    )
    others = [c for c in docs.columns if c not in (url_col, text_col)]
    return (
        docs.withColumnRenamed(url_col, "url")
        .join(rebuilt, "url")
        .select(
            F.col("url").alias(url_col),
            *others,
            F.col("__new").alias(text_col),
            "n_lines_removed",
            "chars_removed",
        )
    )
