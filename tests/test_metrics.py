"""pair_recall metric helper."""

from __future__ import annotations

import pandas as pd

from deduplicator_go_spark.metrics import pair_recall


def test_pair_recall_perfect_and_partial():
    truth_pairs = pd.DataFrame(
        [("a", "b", "exact", 1.0), ("c", "d", "near", 0.9),
         ("e", "f", "near", 0.5),          # below threshold → not counted
         ("x", "y", "negative", 0.0)],
        columns=["url_a", "url_b", "kind", "jaccard"],
    )
    truth_clusters = pd.DataFrame(
        [("a", "a"), ("b", "a"), ("t1", "t1"), ("t2", "t1"), ("t3", "t1")],
        columns=["url", "cluster_id"],
    )
    labels = pd.DataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "c"),
         ("t1", "t1"), ("t2", "t1"), ("t3", "zzz"),  # one template member missed
         ("x", "x"), ("y", "y")],
        columns=["url", "cluster_id"],
    )
    rr = pair_recall(labels, truth_pairs, truth_clusters, verify_threshold=0.8)
    # exact 1/1, near 1/1, template 1/3
    assert rr.per_kind["exact"] == 1.0
    assert rr.per_kind["near"] == 1.0
    assert abs(rr.per_kind["template"] - 1 / 3) < 1e-9
    assert rr.n_truth_pairs == 1 + 1 + 3
    assert rr.false_merges == 0


def test_pair_recall_detects_false_merge():
    truth_pairs = pd.DataFrame(
        [("x", "y", "negative", 0.0)], columns=["url_a", "url_b", "kind", "jaccard"]
    )
    truth_clusters = pd.DataFrame(columns=["url", "cluster_id"])
    labels = pd.DataFrame([("x", "m"), ("y", "m")], columns=["url", "cluster_id"])
    rr = pair_recall(labels, truth_pairs, truth_clusters)
    assert rr.false_merges == 1
