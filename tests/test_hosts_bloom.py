"""Host-level spam detection + distributed Bloom filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_go_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
    definitely_new,
    false_positive_rate,
    optimal_k,
)
from deduplicator_go_spark.operators.hosts import (
    flag_spam_hosts,
    host_of,
    host_stats,
    spam_hosts,
)


def _url_docs(spark):
    """12 pages on 3 hosts; mirror.example hosts 4 pages that are all
    copies (2 shas x 2), plus one copy of a page that also lives on
    good.example (cross-host dup counts)."""
    rows = []
    for i in range(4):
        rows.append((f"https://good.example/p/{i}", f"unique text {i}", "en"))
    for i in range(4):
        rows.append(
            (f"https://mirror.example/m/{i}", f"copied text {i % 2}", "en")
        )
    rows.append(("https://mirror.example/m/9", "unique text 0", "de"))
    for i in range(3):
        rows.append((f"http://small.example/s/{i}", f"small text {i}", "en"))
    return spark.createDataFrame(rows, "url string, text string, lang string")


def test_host_of_extracts_lowercased_authority(spark):
    got = (
        spark.createDataFrame(
            [("HTTPS://WWW.Example.COM/A/b?q=1",), ("no-scheme-here",)],
            "url string",
        )
        .select(host_of(F.col("url")).alias("h"))
        .collect()
    )
    assert [r["h"] for r in got] == ["www.example.com", ""]


def test_host_stats_and_spam_flag(spark):
    stats = host_stats(_url_docs(spark)).collect()
    by = {r["host"]: r for r in stats}
    assert by["good.example"]["n_pages"] == 4
    # one good.example page is mirrored on mirror.example -> global dup
    assert by["good.example"]["n_dup_pages"] == 1
    m = by["mirror.example"]
    assert m["n_pages"] == 5 and m["n_dup_pages"] == 5
    assert m["dup_share"] == 1.0 and m["n_langs"] == 2
    assert by["small.example"]["n_dup_pages"] == 0

    spam = {r["host"] for r in spam_hosts(host_stats(_url_docs(spark))).collect()}
    assert spam == {"mirror.example"}

    flagged = flag_spam_hosts(_url_docs(spark))
    agg = {
        r["host"]: r["n"]
        for r in flagged.filter("host_is_spam").groupBy("host").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert agg == {"mirror.example": 5}


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    n = 3000
    seen = spark.range(n).select(
        F.concat(F.lit("https://seen/"), F.col("id")).alias("url")
    )
    unseen = spark.range(n).select(
        F.concat(F.lit("https://unseen/"), F.col("id")).alias("url")
    )
    m_bits = 16 * n
    k = optimal_k(m_bits, n)
    bloom = bloom_build(seen, "url", m_bits, k).cache()
    # bitset is sharded: never more rows than words, every word nonzero
    assert bloom.count() <= m_bits // 64 + 1
    assert bloom.filter("bits = 0").count() == 0

    hits = bloom_probe(seen, bloom, "url", m_bits, k)
    assert hits.filter(~F.col("might_contain")).count() == 0  # no FNs

    fp = bloom_probe(unseen, bloom, "url", m_bits, k).filter(
        F.col("might_contain")
    ).count()
    # textbook rate with generous slack for hash variance
    bound = max(8, int(5 * n * false_positive_rate(m_bits, n, k)))
    assert fp <= bound


def test_definitely_new_filters_all_seen(spark):
    seen = spark.range(500).select(
        F.concat(F.lit("u"), F.col("id")).alias("url")
    )
    probe = spark.range(1000).select(
        F.concat(F.lit("u"), F.col("id")).alias("url")
    )
    new = definitely_new(probe, seen, "url")
    got = {r["url"] for r in new.collect()}
    # nothing seen leaks through; FPs only ever REMOVE genuinely-new rows
    assert all(int(u[1:]) >= 500 for u in got)
    assert len(got) >= 450  # and not many of them
