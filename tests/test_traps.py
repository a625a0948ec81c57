"""Crawler-trap URL-template detection (operators/traps.py) and the
per-host cap sampler (operators/hosts.py:host_cap_sample)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from deduplicator_go_spark.operators.hosts import host_cap_sample
from deduplicator_go_spark.operators.traps import (
    flag_trap_pages,
    trap_templates,
    url_template,
)


def _templates(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["t"] for r in df.select(url_template(F.col("url")).alias("t")).collect()
    ]


def test_url_template_collapse(spark):
    got = _templates(
        spark,
        [
            "https://a.com/cal/2024/05/31",
            "https://a.com/cal/1999/1/2",
            "https://a.com/article/plain-words",
            "https://a.com/s/deadbeefcafebabe00112233",  # long hex run
            "https://a.com/s/abcdefab",  # 8+ lower hex letters
            "https://a.com",  # no path
        ],
    )
    assert got[0] == got[1] == "/cal/N/N/N"
    assert got[2] == "/article/plain-words"
    # digit run collapses first ('00112233' -> N), then the 16
    # remaining lower-hex letters collapse to H
    assert got[3] == "/s/HN"
    assert got[4] == "/s/H"
    assert got[5] == "/"


def _trap_corpus(spark):
    # one calendar trap on trap.com (40 pages, all distinct paths), one
    # hot-but-single-path page on news.com (30 recrawl rows of ONE
    # path), and 5 singleton articles
    rows = [
        (f"https://trap.com/cal/{2000 + i % 4}/{i % 12}/d{i}",) for i in range(40)
    ]
    rows += [("https://news.com/breaking",)] * 30
    rows += [(f"https://site{i}.org/about-us",) for i in range(5)]
    return spark.createDataFrame(rows, "url string")


def test_trap_templates_flags_generated_family_only(spark):
    docs = _trap_corpus(spark)
    out = trap_templates(docs, min_pages=10, min_distinct_paths=5)
    flagged = {
        (r["host"], r["template"])
        for r in out.filter("is_trap").collect()
    }
    # the single-path hot page has n_distinct_paths == 1: recrawl
    # territory, NOT a trap
    assert flagged == {("trap.com", "/cal/N/N/dN")}
    news = out.filter(F.col("host") == "news.com").collect()
    assert len(news) == 1
    assert news[0]["n_pages"] == 30 and news[0]["n_distinct_paths"] == 1


def test_flag_trap_pages_broadcast_annotation(spark):
    docs = _trap_corpus(spark)
    traps = trap_templates(docs, min_pages=10, min_distinct_paths=5)
    flagged = flag_trap_pages(docs, traps)
    assert flagged.filter("is_trap").count() == 40
    assert flagged.count() == docs.count()
    # trap side arrives broadcast: corpus never shuffles for the join
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _skewed_pages(spark):
    rows = [(f"https://big.com/p/{i}",) for i in range(500)]
    rows += [(f"https://tiny.org/p/{i}",) for i in range(7)]
    return spark.createDataFrame(rows, "url string")


def test_host_cap_matches_naive_window(spark):
    """The two-phase presample top-k must be bit-identical to the
    naive single window (membership AND rank), for any slice count."""
    from deduplicator_go_spark.operators.hosts import host_of
    from deduplicator_go_spark.operators.splits import split_key

    docs = _skewed_pages(spark)
    naive = (
        docs.select(
            host_of(F.col("url")).alias("host"), "url",
            split_key(F.col("url")).alias("k"),
        )
        .withColumn(
            "sample_rank",
            F.row_number().over(Window.partitionBy("host").orderBy("k", "url")),
        )
        .filter(F.col("sample_rank") <= 20)
        .select("host", "url", "sample_rank")
    )
    expect = {(r["host"], r["url"]): r["sample_rank"] for r in naive.collect()}
    assert len(expect) == 27  # 20 capped + 7 under-cap
    for n_presample in (1, 4, 64):
        got = {
            (r["host"], r["url"]): r["sample_rank"]
            for r in host_cap_sample(
                docs, cap=20, n_presample=n_presample
            ).collect()
        }
        assert got == expect


def test_host_cap_under_cap_host_keeps_everything(spark):
    docs = _skewed_pages(spark)
    out = host_cap_sample(docs, cap=20)
    tiny = out.filter(F.col("host") == "tiny.org")
    assert tiny.count() == 7
    ranks = sorted(r["sample_rank"] for r in tiny.collect())
    assert ranks == list(range(1, 8))
