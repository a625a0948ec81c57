"""Quality-weighted keeper election."""

from __future__ import annotations

from deduplicator_go_spark.operators.keepers import (
    drop_non_keepers,
    quality_keeper,
)


def _clusters(spark):
    return spark.createDataFrame(
        [
            ("c1", "u1", 0.9),
            ("c1", "u2", 0.95),   # keeper: best quality
            ("c1", "u3", 0.95),   # tie -> u2 wins (smaller id)
            ("c2", "u9", 0.1),    # singleton keeps itself
        ],
        "cluster_id string, url string, quality double",
    )


def test_quality_keeper_rule(spark):
    got = {r["cluster_id"]: r for r in quality_keeper(_clusters(spark)).collect()}
    assert got["c1"]["keeper_id"] == "u2"
    assert got["c1"]["keeper_quality"] == 0.95
    assert got["c1"]["n_members"] == 3
    assert got["c2"]["keeper_id"] == "u9" and got["c2"]["n_members"] == 1


def test_drop_non_keepers(spark):
    docs = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "c"), ("u9", "d"), ("u0", "free")],
        "url string, text string",
    )
    kept = {r["url"] for r in drop_non_keepers(docs, _clusters(spark)).collect()}
    assert kept == {"u2", "u9", "u0"}  # losers u1/u3 dropped, free doc kept
