"""Exact-dedup slice: golden hashes, grouping, keeper election.

Mirrors the reference's scenario tests (duplicates across hosts,
hash+size group splitting, ordering by total size, priority keepers —
/root/reference/files/duplicates_scenarios_test.go:17-318,
/root/reference/test/scenarios/duplicates.md)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from deduplicator_go_spark.operators import exact


def test_content_sha_golden(spark):
    rows = [("u1", "hello world"), ("u2", ""), ("u3", "Zäöü ß")]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r["url"]: r["content_sha"] for r in exact.with_signature(df).collect()}
    for u, t in rows:
        assert got[u] == hashlib.sha256(t.encode()).hexdigest()


def test_valid_filter_excludes_edge_rows(docs, corpus):
    valid = exact.valid_documents(docs)
    n_blank = sum(1 for t in corpus.documents["text"] if not t.strip())
    assert valid.count() == len(corpus.documents) - n_blank


def test_dup_groups_match_truth(docs, corpus):
    sigs = exact.with_signature(exact.valid_documents(docs))
    groups = exact.dup_groups(sigs)
    got = groups.collect()
    # ground truth: exact-dup clusters share identical text
    texts = corpus.documents[corpus.documents["kind"] == "exact"]["text"]
    truth_sizes = texts.value_counts()
    assert len(got) == len(truth_sizes)
    assert sorted(r["n_copies"] for r in got) == sorted(truth_sizes.tolist())
    for r in got:
        # size grouping: every member has identical length → total = n*size
        assert r["total_size"] == r["n_copies"] * r["size"]


def test_same_hash_different_size_split(spark):
    # reference: groups split when recorded sizes differ even for one hash
    # (files/duplicates_scenarios_test.go:60). Simulate at the operator
    # level with a pre-built signature table.
    sigs = spark.createDataFrame(
        [("u1", "h", 10), ("u2", "h", 10), ("u3", "h", 20), ("u4", "h", 20)],
        "url string, content_sha string, size long",
    )
    groups = exact.dup_groups(sigs).collect()
    assert len(groups) == 2
    assert all(g["n_copies"] == 2 for g in groups)


def test_size_blocking(spark):
    sigs = spark.createDataFrame(
        [("a", "x", 5), ("b", "y", 5), ("c", "z", 7)],
        "url string, content_sha string, size long",
    )
    sizes = [r["size"] for r in exact.size_blocking(sigs).collect()]
    assert sizes == [5]


def test_top_groups_ordering(spark):
    sigs = spark.createDataFrame(
        [("a", "h1", 100), ("b", "h1", 100),
         ("c", "h2", 10), ("d", "h2", 10), ("e", "h2", 10),
         ("f", "h3", 50), ("g", "h3", 50)],
        "url string, content_sha string, size long",
    )
    top = exact.top_groups(exact.dup_groups(sigs), limit=2).collect()
    assert [r["content_sha"] for r in top] == ["h1", "h3"]


def test_keeper_lexicographic(spark):
    sigs = spark.createDataFrame(
        [("b://x", "h", 5), ("a://y", "h", 5), ("c://z", "h", 5)],
        "url string, content_sha string, size long",
    )
    members = exact.dup_members(sigs, exact.dup_groups(sigs))
    elected = exact.elect_keeper_lexicographic(members)
    keepers = [r["url"] for r in elected.filter("is_keeper").collect()]
    assert keepers == ["a://y"]
    assert elected.filter(~F.col("is_keeper")).count() == 2


def test_keeper_priority_policy(spark):
    # 4 copies across 3 domains; priorities: site00=10, site01=50, default 100
    sigs = spark.createDataFrame(
        [(f"https://site0{i}.example/a/d{i}", "h", 9) for i in range(4)],
        "url string, content_sha string, size long",
    )
    policy = spark.createDataFrame(
        [("site00", 10), ("site01", 50)], "domain string, priority int"
    )
    members = exact.dup_members(sigs, exact.dup_groups(sigs))
    elected = exact.elect_keepers_priority(members, policy, min_copies=2)
    keep = sorted(r["domain"] for r in elected.filter("is_keeper").collect())
    assert keep == ["site00", "site01"]
    # keep-all when group is at/below min_copies
    elected_all = exact.elect_keepers_priority(members, policy, min_copies=4)
    assert elected_all.filter("is_keeper").count() == 4
    # respect-limits caps at max_copies
    elected_cap = exact.elect_keepers_priority(
        members, policy, min_copies=2, max_copies=3, respect_limits=True
    )
    assert elected_cap.filter("is_keeper").count() == 3


def test_savings(spark):
    sigs = spark.createDataFrame(
        [("a", "h1", 100), ("b", "h1", 100), ("c", "h1", 100), ("d", "h2", 7), ("e", "h2", 7)],
        "url string, content_sha string, size long",
    )
    row = exact.savings(exact.dup_groups(sigs)).collect()[0]
    assert row["savings_bytes"] == 200 + 7
    assert row["n_groups"] == 2


def test_exact_edges_linear_star(spark):
    sigs = spark.createDataFrame(
        [("a", "h", 5), ("b", "h", 5), ("c", "h", 5), ("z", "u", 9)],
        "url string, content_sha string, size long",
    )
    edges = exact.exact_edges(sigs).collect()
    assert {(r["src"], r["dst"]) for r in edges} == {("a", "b"), ("a", "c")}
