"""Canonical-URL re-crawl dedup (operators/recrawl.py +
functions/url.py:canonical_url)."""

from pyspark.sql import functions as F

from deduplicator_go_spark.functions.url import canonical_url
from deduplicator_go_spark.operators.recrawl import (
    latest_crawl_dedup,
    recrawl_losers,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]


def test_canonical_url_normalization(spark):
    got = _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM/A/B?utm_source=x&id=2&utm_campaign=y#frag",
            "https://www.example.com/A/B?id=2",
            "https://site.org/path/",
            "https://site.org/path",
            "https://site.org/p?b=2&a=1",
            "https://site.org/p?a=1&b=2&fbclid=XYZ",
            "https://site.org/p?utm_source=only",
            "not a url at all",
        ],
    )
    # tracking params + fragment + host case collapse
    assert got[0] == got[1] == "https://www.example.com/A/B?id=2"
    # trailing slash collapses
    assert got[2] == got[3] == "https://site.org/path"
    # param order collapses
    assert got[4] == got[5] == "https://site.org/p?a=1&b=2"
    # all params tracked → bare pre-query part
    assert got[6] == "https://site.org/p"
    # junk input passes through un-crashed (no scheme → no host rewrite)
    assert got[7] == "not a url at all"


def test_latest_crawl_wins(spark):
    rows = [
        ("https://a.com/x?utm_source=1", 100),
        ("https://a.com/x?utm_source=2", 300),
        ("https://A.COM/x", 200),
        ("https://b.com/y", 50),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts long")
    out = {r["canonical_url"]: r for r in latest_crawl_dedup(df).collect()}
    assert out["https://a.com/x"]["keeper_ts"] == 300
    assert out["https://a.com/x"]["keeper_url"] == "https://a.com/x?utm_source=2"
    assert out["https://a.com/x"]["n_crawls"] == 3
    assert out["https://b.com/y"]["n_crawls"] == 1

    losers = {(r["url"], r["superseded_by"]) for r in recrawl_losers(df).collect()}
    assert losers == {
        ("https://a.com/x?utm_source=1", "https://a.com/x?utm_source=2"),
        ("https://A.COM/x", "https://a.com/x?utm_source=2"),
    }


def test_ts_tie_breaks_on_url_desc(spark):
    rows = [("https://a.com/x?v=1", 100), ("https://a.com/x?v=1&utm_source=z", 100)]
    df = spark.createDataFrame(rows, "url string, warc_ts long")
    out = latest_crawl_dedup(df).collect()
    assert len(out) == 1
    # ties: greatest raw url wins (total order, engine-stable)
    assert out[0]["keeper_url"] == "https://a.com/x?v=1&utm_source=z"


def test_single_shuffle_no_join(spark):
    df = spark.createDataFrame(
        [(f"https://a.com/{i % 3}", i) for i in range(9)], "url string, warc_ts long"
    )
    plan = latest_crawl_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # window-only: one shuffle on canonical_url
