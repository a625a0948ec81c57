"""Group-mirror task planner — mirrors the reference's test cases
(/root/reference/files/group_mirror_test.go:19-84) plus the conflict
classes and path sanitation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduplicator_go_spark.operators import mirror_plan as MP


def _members(spark, rows):
    return spark.createDataFrame(rows, "member string, file_count long")


def _cat(spark, rows):
    return spark.createDataFrame(rows, "member string, relpath string, hash string, size long")


def test_prefers_most_common_path(spark):
    # group_mirror_test.go:19-38 — albums path held twice beats imports
    members = _members(spark, [("Brain", 10), ("PI4", 50), ("Pinky", 20), ("m4", 5)])
    cat = _cat(spark, [
        ("Brain", "albums/2020/photo.jpg", "hash-a", 10),
        ("PI4", "imports/photo.jpg", "hash-a", 10),
        ("Pinky", "albums/2020/photo.jpg", "hash-a", 10),
    ])
    tasks, conflicts = MP.group_mirror_plan(cat, members)
    t = tasks.collect()
    assert len(t) == 1 and conflicts.count() == 0
    assert t[0]["rel_path"] == "albums/2020/photo.jpg"
    assert t[0]["dst_member"] == "m4"
    # source = most-populated holder of the elected path (Pinky fc=20 > Brain 10)
    assert t[0]["src_member"] == "Pinky"


def test_tie_break_most_populated_member(spark):
    # group_mirror_test.go:40-59 — one copy each; PI4 (fc=50) wins the path
    members = _members(spark, [("Brain", 10), ("PI4", 50), ("Pinky", 20), ("m4", 5)])
    cat = _cat(spark, [
        ("Brain", "albums/photo.jpg", "hash-a", 10),
        ("PI4", "media/photo.jpg", "hash-a", 10),
        ("Pinky", "backup/photo.jpg", "hash-a", 10),
    ])
    tasks, _ = MP.group_mirror_plan(cat, members)
    t = tasks.collect()
    assert len(t) == 1
    assert t[0]["rel_path"] == "media/photo.jpg"
    assert t[0]["src_member"] == "PI4"


def test_occupied_destination_conflicts(spark):
    # group_mirror_test.go:61-84 — dst path indexed under a different hash
    members = _members(spark, [("Brain", 20), ("PI4", 10)])
    cat = _cat(spark, [
        ("Brain", "albums/photo.jpg", "hash-a", 10),
        ("PI4", "albums/photo.jpg", "hash-b", 10),
    ])
    tasks, conflicts = MP.group_mirror_plan(cat, members)
    assert tasks.count() == 0
    rows = conflicts.collect()
    assert len(rows) == 2  # each hash blocked by the other's occupancy
    assert all(r["reason"] == MP.REASON_OCCUPIED for r in rows)


def test_size_conflict(spark):
    members = _members(spark, [("m1", 1), ("m2", 1)])
    cat = _cat(spark, [
        ("m1", "a/f", "hash-a", 10),
        ("m2", "b/f", "hash-a", 11),
    ])
    tasks, conflicts = MP.group_mirror_plan(cat, members)
    assert tasks.count() == 0
    rows = conflicts.collect()
    assert len(rows) == 1 and rows[0]["reason"] == MP.REASON_SIZE


def test_unsafe_path_conflict(spark):
    members = _members(spark, [("m1", 1), ("m2", 1)])
    cat = _cat(spark, [
        ("m1", "../evil", "hash-a", 10),
        ("m2", "ok/f", "hash-b", 5),
    ])
    tasks, conflicts = MP.group_mirror_plan(cat, members)
    reasons = {r["hash"]: r["reason"] for r in conflicts.collect()}
    assert reasons.get("hash-a") == MP.REASON_UNSAFE
    # hash-b still plans normally
    assert [r["hash"] for r in tasks.collect()] == ["hash-b"]


def test_planned_collision_first_hash_wins(spark):
    # two hashes elect the same destination (member, path): ascending
    # hash order wins, the later one conflicts (plannedDestPaths analog)
    members = _members(spark, [("m1", 2), ("m2", 0)])
    cat = _cat(spark, [
        ("m1", "shared/f", "hash-a", 10),
        ("m1", "shared/f2", "hash-b", 11),
    ])
    # force both to elect 'shared/f' is impossible with distinct paths;
    # instead both hashes live at the same relpath on m1 (a catalog can
    # index two hashes under one path across time)
    cat = _cat(spark, [
        ("m1", "shared/f", "hash-a", 10),
        ("m1", "shared/f", "hash-b", 11),
    ])
    tasks, conflicts = MP.group_mirror_plan(cat, members)
    t = {r["hash"]: r for r in tasks.collect()}
    c = [r for r in conflicts.collect()]
    assert set(t) == {"hash-a"}
    assert t["hash-a"]["dst_member"] == "m2"
    assert len(c) == 1 and c[0]["hash"] == "hash-b" and c[0]["reason"] == MP.REASON_PLANNED


def test_clean_rel_path(spark):
    cases = [
        ("a/b/../c", "a/c"),
        ("./x//y/", "x/y"),
        ("  a/b ", "a/b"),
        ("/abs/path", None),
        ("..", None),
        ("a/../..", None),
        ("", None),
        (".", None),
    ]
    df = spark.createDataFrame([(p,) for p, _ in cases], "p string")
    got = df.select("p", MP.clean_rel_path(F.col("p")).alias("c")).collect()
    want = dict(cases)
    for r in got:
        assert r["c"] == want[r["p"]], (r["p"], r["c"])
