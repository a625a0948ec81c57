"""Crawler-trap detection: URL-template grouping.

Calendar pages, session-id paths, print-view variants, and infinite
pagination generate unbounded URL families whose pages are worthless
near-copies — at crawl scale they are the dominant source of junk
BEFORE content dedup ever sees a byte. The standard sieve (used by
production crawlers; the C4/CCNet pipelines drop the survivors later
by content) groups urls by a *template*: the path with every digit
run collapsed to ``N`` and every long hex run collapsed to ``H``. A
template backed by an implausible number of distinct pages on one
host is a trap; its pages can be dropped or down-sampled without
reading any content.

This is the webtext analog of the reference's most-specific-prefix
pruning (``/root/reference/files/prune.go`` — kill whole
subtrees by path pattern, not file-by-file): the "subtree" here is a
url template, discovered from data instead of configured.

Scale shape: template derivation is pure map-side string algebra
(native ``regexp_replace``/``try_parse_url``, whole-stage codegen; no
UDF). Trap discovery is ONE partially-aggregated groupBy on
(host, template) — a 10^8-page calendar trap is a single group row,
never a pair explosion. Flagging joins the (small, aggregated) trap
table back broadcast; the corpus side never shuffles.

Every step has an exact ANSI-SQL twin (digit/hex character classes
mean the same thing in Java regex and RE2), so the driver oracle is a
full value-level mirror.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.url import url_host, url_path

# digit runs first (so hex runs containing digits are already partly
# collapsed), then long lower-hex runs (session ids, content hashes).
# Both classes are identical in Java regex (Spark) and RE2/PCRE
# (DuckDB) — no \d / unicode ambiguity.
_DIGITS = "[0-9]+"
_HEX = "[a-f]{8,}|[a-f0-9]{16,}"


def url_template(url: Column) -> Column:
    """The url's path with digit runs → ``N`` and long hex runs →
    ``H`` (host is carried as its own column by every consumer).

    ``/cal/2024/05/31`` and ``/cal/2025/01/02`` collapse to the same
    ``/cal/N/N/N`` — one template row no matter how deep the trap.
    Query strings are dropped (canonical_url handles tracking params;
    a ?page=N trap still surfaces through its path-identical family
    via ``n_pages`` vs ``n_distinct_paths`` below when paths tie)."""
    # try_parse_url returns '' (not NULL) for a path-less url — both
    # normalize to '/'
    path = F.coalesce(F.nullif(url_path(url), F.lit("")), F.lit("/"))
    t = F.regexp_replace(path, _DIGITS, "N")
    return F.regexp_replace(t, _HEX, "H")


def template_stats(
    docs: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """→ (host, template, n_pages, n_distinct_paths) — one
    partially-aggregated groupBy; the map side emits (host, template)
    keys only, so a viral template costs one reduce-side row."""
    u = F.col(url_col)
    base = docs.select(
        url_host(u).alias("host"),
        url_template(u).alias("template"),
        F.coalesce(url_path(u), F.lit("/")).alias("path"),
    )
    return base.groupBy("host", "template").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("path").alias("n_distinct_paths"),
    )


def trap_templates(
    docs: DataFrame,
    url_col: str = "url",
    min_pages: int = 100,
    min_distinct_paths: int = 50,
) -> DataFrame:
    """Templates flagged as traps: implausibly many pages AND enough
    distinct underlying paths that it is genuinely a generated family
    (a single hot page re-crawled 10^4 times is recrawl_dedup's job,
    not a trap). Output is aggregated — at 10^12 docs the trap table
    is tiny and broadcastable."""
    stats = template_stats(docs, url_col)
    return stats.withColumn(
        "is_trap",
        (F.col("n_pages") >= F.lit(min_pages))
        & (F.col("n_distinct_paths") >= F.lit(min_distinct_paths)),
    )


def flag_trap_pages(
    docs: DataFrame,
    traps: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Annotate each page with its template's trap flag. The trap
    side is the aggregated template table (bounded by the template
    universe, not the corpus) — broadcast it; the corpus side stays
    shuffle-free."""
    u = F.col(url_col)
    t = F.broadcast(
        traps.filter("is_trap").select("host", "template")
        .withColumn("is_trap", F.lit(True))
    )
    return (
        docs.withColumn("host", url_host(u))
        .withColumn("template", url_template(u))
        .join(t, ["host", "template"], "left")
        .withColumn("is_trap", F.coalesce("is_trap", F.lit(False)))
    )
