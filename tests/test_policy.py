"""Policy-table management verbs + integration with keeper election
(reference migration 000005, cmd/manage.go:313-430, scenarios in
test/scenarios/host-and-path-management.md)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from deduplicator_go_spark.cli import main
from deduplicator_go_spark.sources.catalog import CheckpointCatalog
from deduplicator_go_spark.sources.policy import PolicyError, PolicyStore


@pytest.fixture()
def store(spark, tmp_path):
    return PolicyStore(spark, CheckpointCatalog(str(tmp_path / "cat")))


def test_group_crud_roundtrip(store):
    store.group_add("photos", "Family photos", min_copies=2, max_copies=3)
    store.group_add_path("photos", "brain", "photos", priority=10)
    store.group_add_path("photos", "pinky", "photos", priority=50)

    g = store.group_show("photos")
    assert g["min_copies"] == 2 and g["max_copies"] == 3
    assert [(m["host_name"], m["priority"]) for m in g["members"]] == [
        ("brain", 10), ("pinky", 50)
    ]

    # uniqueness constraints (migration 000005 UNIQUE clauses)
    with pytest.raises(PolicyError, match="already exists"):
        store.group_add("photos")
    with pytest.raises(PolicyError, match="already belongs"):
        store.group_add_path("photos", "brain", "photos")
    with pytest.raises(PolicyError, match="not found"):
        store.group_add_path("nope", "h", "p")

    store.group_remove_path("pinky", "photos")
    assert store.members("photos").count() == 1
    with pytest.raises(PolicyError, match="not in any group"):
        store.group_remove_path("pinky", "photos")

    # cascade delete
    store.group_delete("photos")
    assert store.groups().count() == 0
    assert store.members().count() == 0
    with pytest.raises(PolicyError, match="not found"):
        store.group_show("photos")


def test_policy_survives_reopen(spark, tmp_path):
    root = str(tmp_path / "cat")
    PolicyStore(spark, CheckpointCatalog(root)).group_add("docs", min_copies=1)
    reopened = PolicyStore(spark, CheckpointCatalog(root))
    assert [r["group_name"] for r in reopened.groups().collect()] == ["docs"]


def test_priority_keeper_reads_persisted_policy(spark, store):
    """elect_keepers_priority consumes the persisted policy table:
    low-priority hosts win keeper slots."""
    from deduplicator_go_spark.operators.exact import elect_keepers_priority

    store.group_add("media", min_copies=1, max_copies=2)
    store.group_add_path("media", "fast", "m", priority=10)
    store.group_add_path("media", "slow", "m", priority=90)

    members = spark.createDataFrame(
        [("http://fast.example/a", "sha1", 10, 2),
         ("http://slow.example/a", "sha1", 10, 2)],
        "url string, content_sha string, size long, n_copies long",
    )
    pm, min_copies, max_copies = store.keeper_policy("media")
    elected = elect_keepers_priority(members, pm, min_copies, max_copies)
    keepers = {r["url"]: r["is_keeper"] for r in elected.collect()}
    assert keepers == {"http://fast.example/a": True, "http://slow.example/a": False}


def _run(capsys, argv):
    rc = main(argv)
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_manage_verbs(capsys, tmp_path):
    cat = str(tmp_path / "cat")
    out = _run(capsys, ["--catalog", cat, "--cores", "8", "manage", "group-add",
                        "photos", "--min-copies", "2", "--max-copies", "3",
                        "--description", "Family photos"])
    assert out["group"] == "photos"
    _run(capsys, ["--catalog", cat, "--cores", "8", "manage", "group-add-path",
                  "photos", "brain", "photos", "--priority", "10"])
    out = _run(capsys, ["--catalog", cat, "--cores", "8", "manage", "group-show", "photos"])
    assert out["min_copies"] == 2 and len(out["members"]) == 1
    out = _run(capsys, ["--catalog", cat, "--cores", "8", "manage", "group-list"])
    assert [g["group_name"] for g in out["groups"]] == ["photos"]


def test_cli_mirror_plan(capsys, spark, tmp_path):
    p = str(tmp_path / "cat.parquet")
    spark.createDataFrame(
        [("h1", "a/f", "hash-a", 10),
         ("h2", "b/f", "hash-b", 5),
         ("h1", "b/f", "hash-b", 5)],
        "member string, relpath string, hash string, size long",
    ).write.parquet(p)
    out = _run(capsys, ["--catalog", str(tmp_path / "cat"), "--cores", "8",
                        "mirror-plan", "--input", p])
    # hash-a missing on h2 -> one task; hash-b present everywhere
    assert out["tasks"] == 1 and out["conflicts"] == 0
