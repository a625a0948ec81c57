"""Deterministic splits + sharding (operators/splits.py)."""

import hashlib

import pytest
from pyspark.sql import Row

from deduplicator_go_spark.operators.splits import (
    assign_shards,
    assign_split,
    assign_split_by_cluster,
    shard_stats,
    split_key,
    write_sharded,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [Row(url=f"u{i}", text="x" * (i % 7 + 1)) for i in range(400)]
    )


def _py_key(s: str, salt: str = "") -> int:
    return int(hashlib.md5((s + salt).encode()).hexdigest()[:15], 16)


def test_split_key_matches_reference_md5(spark, docs):
    rows = docs.select("url", split_key("url").alias("k")).collect()
    for r in rows[:25]:
        assert r.k == _py_key(r.url)


def test_assign_split_deterministic_and_exhaustive(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.url: r.split for r in assign_split(docs, w).collect()}
    b = {r.url: r.split for r in assign_split(docs, w).collect()}
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    # thresholds mirror the md5 algebra exactly
    for url, sp in list(a.items())[:25]:
        bucket = _py_key(url) % 1_000_000
        want = "train" if bucket < 800_000 else (
            "val" if bucket < 900_000 else "test")
        assert sp == want
    # roughly weighted (400 docs: train within a wide band)
    n_train = sum(1 for s in a.values() if s == "train")
    assert 280 <= n_train <= 370


def test_salt_rerolls(spark, docs):
    a = {r.url: r.split for r in assign_split(docs, salt="s1").collect()}
    b = {r.url: r.split for r in assign_split(docs, salt="s2").collect()}
    assert a != b


def test_cluster_consistent_split(spark, docs):
    # 400 docs in 40 families -> every family must land in ONE split
    clusters = docs.select(
        "url",
        (F_int("url") % 40).alias("cluster_id"),
    )
    out = assign_split_by_cluster(
        docs, clusters, {"train": 0.5, "val": 0.5}, cluster_col="cluster_id"
    )
    fam = out.join(clusters, "url").select("cluster_id", "split").distinct()
    per_family = fam.groupBy("cluster_id").count().collect()
    assert all(r["count"] == 1 for r in per_family)
    # unclustered docs fall back to their own id
    out2 = assign_split_by_cluster(docs, clusters.limit(0))
    assert out2.filter("split is null").count() == 0


def F_int(col):
    from pyspark.sql import functions as F
    return F.regexp_extract(col, r"(\d+)", 1).cast("long")


def test_shards_uniform_and_stats(spark, docs):
    sharded = assign_shards(docs, 8)
    stats = shard_stats(sharded)
    rows = stats.collect()
    assert {r.shard for r in rows} == set(range(8))
    assert sum(r.n_docs for r in rows) == 400
    assert max(r.n_docs for r in rows) <= 3 * (400 // 8)  # uniform-ish
    assert all(r.n_chars > 0 for r in rows)


def test_write_sharded_round_trip(spark, docs, tmp_path):
    out = str(tmp_path / "sharded")
    write_sharded(docs, out, n_shards=4)
    back = spark.read.parquet(out)
    assert back.count() == 400
    assert back.select("shard").distinct().count() == 4
    # shard dirs exist; each shard holds exactly its hash class
    got = back.select("url", "shard").collect()
    for r in got[:25]:
        assert r.shard == _py_key(r.url) % 4
