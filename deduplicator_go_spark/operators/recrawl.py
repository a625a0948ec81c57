"""Re-crawl deduplication: latest crawl wins per canonical URL.

A web corpus carries the same page many times — successive crawls,
tracking-parameter variants, fragment links. Before any content-level
dedup runs, the cheap first pass collapses re-crawls: group by
``canonical_url`` (functions/url.py — fragment/tracking-param/case
normalization) and keep the NEWEST capture, the polar opposite of the
event-stream first-seen rule (``dedup_events``) and the webtext analog
of the reference's change-detection upsert (the newest scan of a path
replaces the stored row, /root/reference/files/hash.go
update-on-change semantics).

Scale shape: one shuffle keyed by canonical_url (a window rank + count
over the group — no join), after a map-side canonicalization that is
pure string algebra. Hot keys are structurally bounded: a canonical
url's group is its own crawl history, and no page is crawled 10^6
times; nothing here needs salting. Runs BEFORE text hashing at 100 TB
precisely because it prunes the corpus with zero content reads —
filter early, hash less.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.url import canonical_url


def latest_crawl_dedup(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """→ one row per canonical_url: (canonical_url, keeper_url,
    keeper_ts, n_crawls). Keeper = the row with the greatest capture
    timestamp; exact ties break on the greatest raw url (total order,
    deterministic across engines and retries)."""
    base = docs.withColumn("canonical_url", canonical_url(F.col(url_col)))
    w = Window.partitionBy("canonical_url").orderBy(
        F.desc(ts_col), F.desc(url_col)
    )
    wc = Window.partitionBy("canonical_url")
    return (
        base.withColumn("rn", F.row_number().over(w))
        .withColumn("n_crawls", F.count("*").over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "canonical_url",
            F.col(url_col).alias("keeper_url"),
            F.col(ts_col).alias("keeper_ts"),
            "n_crawls",
        )
    )


def recrawl_losers(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """The complement: every superseded crawl row → (canonical_url,
    url, ts, superseded_by). Feed to a delete/tombstone sink."""
    base = docs.withColumn("canonical_url", canonical_url(F.col(url_col)))
    w = Window.partitionBy("canonical_url").orderBy(
        F.desc(ts_col), F.desc(url_col)
    )
    keeper = F.first(F.col(url_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        base.withColumn("rn", F.row_number().over(w))
        .withColumn("superseded_by", keeper)
        .filter(F.col("rn") > 1)
        .select(
            "canonical_url",
            F.col(url_col).alias("url"),
            F.col(ts_col).alias("ts"),
            "superseded_by",
        )
    )
