"""Host-level aggregation: spam / boilerplate host detection.

Web-curation pipelines (CCNet, RefinedWeb) drop entire hosts, not just
pages: a host whose pages are mostly duplicates of each other (or of
the wider corpus) is a mirror, a scraper, or an SEO farm, and its
*novel* pages are rarely worth the crawl budget either. The reference
has the same shape at file-system scope — per-host scoping of dup
groups (/root/reference/files/hash.go host filters); this is
the webtext analog over the (url, text) corpus.

Scale shape: one sha-keyed aggregation to mark duplicated content
(global, partial-aggregated), one host-keyed aggregation for the
stats. Both shuffles key on high-cardinality columns (sha, host);
a viral host is ONE group row, never a pair explosion. Runs on the
raw corpus before any pairwise dedup — the cheap first sieve.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_of(url: Column) -> Column:
    """The lowercased authority of a url ('' when absent) — the
    grouping key for host-level stats. Pure string algebra with an
    exact ANSI-SQL twin (regexp_extract group 1 + lower)."""
    return F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/]+)", 1))


def host_stats(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """Per-host corpus hygiene stats →
    (host, n_pages, n_dup_pages, dup_share, avg_len, n_langs).

    ``n_dup_pages`` counts pages whose exact content (sha256) appears
    on >= 2 pages anywhere in the corpus — cross-host mirrors count,
    matching how a curation pipeline sees a scraper site. Ratios are
    rounded to 6 decimals so engines cannot disagree.
    """
    base = docs.select(
        host_of(F.col(url_col)).alias("host"),
        F.sha2(F.col(text_col), 256).alias("sha"),
        F.length(F.col(text_col)).alias("len"),
        *( [F.col(lang_col).alias("lang")] if lang_col else [F.lit("und").alias("lang")] ),
    )
    sha_counts = base.groupBy("sha").agg(F.count("*").alias("sha_n"))
    return (
        base.join(sha_counts, "sha")
        .groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum((F.col("sha_n") >= 2).cast("long")).alias("n_dup_pages"),
            F.round(F.avg("len"), 6).alias("avg_len"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .withColumn(
            "dup_share", F.round(F.col("n_dup_pages") / F.col("n_pages"), 6)
        )
        .select(
            "host", "n_pages", "n_dup_pages", "dup_share", "avg_len", "n_langs"
        )
    )


def spam_hosts(
    stats: DataFrame,
    dup_share_min: float = 0.5,
    min_pages: int = 3,
) -> DataFrame:
    """Hosts a curation pass would drop wholesale: enough pages to
    judge (>= min_pages) and a duplicated-content share at or above
    ``dup_share_min``. → stats columns + is_spam (always True here;
    kept so the frame unions cleanly with flagged-not-dropped flows)."""
    return stats.filter(
        (F.col("n_pages") >= min_pages) & (F.col("dup_share") >= dup_share_min)
    ).withColumn("is_spam", F.lit(True))


def flag_spam_hosts(
    docs: DataFrame,
    stats: DataFrame | None = None,
    url_col: str = "url",
    dup_share_min: float = 0.5,
    min_pages: int = 3,
) -> DataFrame:
    """Annotate every page with its host's spam verdict (broadcast
    join — the host table is tiny next to the corpus). → docs columns
    + host + host_is_spam."""
    if stats is None:
        stats = host_stats(docs, url_col)
    spam = spam_hosts(stats, dup_share_min, min_pages).select(
        "host", F.col("is_spam").alias("host_is_spam")
    )
    return (
        docs.withColumn("host", host_of(F.col(url_col)))
        .join(F.broadcast(spam), "host", "left")
        .withColumn("host_is_spam", F.coalesce("host_is_spam", F.lit(False)))
    )


def host_cap_sample(
    docs: DataFrame,
    cap: int,
    url_col: str = "url",
    salt: str = "",
    n_presample: int = 64,
) -> DataFrame:
    """Per-host over-representation cap: keep at most ``cap`` pages
    per host, chosen by a deterministic uniform hash — the C4-style
    guard against a handful of mega-hosts dominating the training
    mix (forums, wikis, doc mirrors), applied AFTER spam/trap sieves
    and BEFORE token-budget sampling.

    → (host, url, sample_rank) for kept rows only; rank is 1..cap in
    key order. Selection is a pure function of (url, salt): stable
    across reruns, ticks, engines, and cluster sizes, re-rollable by
    salt (same contract as operators/splits.py, whose md5 key this
    reuses — exact ANSI-SQL twin, unlike xxhash64).

    Scale shape: a naive ``row_number() over (partition by host)``
    puts a 10^8-page host in ONE window partition — a straggler by
    construction. This is the standard two-phase distributed top-k:
    phase 1 ranks within (host, presample-bucket) — ``n_presample``
    parallel slices per host — and keeps ``cap`` per slice (every
    global-top-``cap`` member survives its own slice's cut, so the
    pre-pass is provably lossless); phase 2 ranks the <= n_presample
    * cap survivors per host. The hot window shrinks from the host's
    page count to ``n_presample * cap`` regardless of skew, and the
    result is bit-identical to the naive single window.
    """
    from .splits import split_key

    u = F.col(url_col)
    key = split_key(u, salt)
    base = docs.select(
        host_of(u).alias("host"), u.alias("url"), key.alias("__key")
    )
    from pyspark.sql import Window

    slice_col = F.pmod(F.xxhash64("url"), F.lit(n_presample))
    pre = (
        base.withColumn("__slice", slice_col)
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy("host", "__slice").orderBy("__key", "url")
        ))
        .filter(F.col("__rn") <= cap)
    )
    w2 = Window.partitionBy("host").orderBy("__key", "url")
    return (
        pre.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= cap)
        .select("host", "url", "sample_rank")
    )
