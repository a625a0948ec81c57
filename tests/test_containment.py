"""Directed n-gram containment / excerpt detection
(operators/containment.py)."""

from pyspark.sql import functions as F

from deduplicator_go_spark.operators.containment import (
    excerpt_pairs,
    ngram_containment_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_excerpt_is_directed(spark):
    """A word-prefix excerpt is fully contained in its source doc
    (containment 1.0, one direction only); the reverse direction and
    unrelated docs never surface."""
    full = " ".join(f"w{i}" for i in range(20))
    excerpt = " ".join(f"w{i}" for i in range(8))
    other = " ".join(f"z{i}" for i in range(20))
    out = ngram_containment_pairs(
        _docs(spark, [("full", full), ("ex", excerpt), ("other", other)]),
        n=3,
        threshold=0.9,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == ("ex", "full")
    assert r["containment"] == 1.0
    # 6 excerpt grams vs 18 full grams → jaccard 6/18
    assert r["na"] == 6 and r["nb"] == 18 and r["n_common"] == 6
    assert r["jaccard"] == round(6 / 18, 6)


def test_mutual_dups_surface_both_directions(spark):
    """Exact copies contain each other: containment 1.0 both ways,
    jaccard 1.0 — and excerpt_pairs (jaccard_max) excludes them while
    keeping true excerpts."""
    full = " ".join(f"w{i}" for i in range(20))
    excerpt = " ".join(f"w{i}" for i in range(8))
    docs = _docs(spark, [("c1", full), ("c2", full), ("ex", excerpt)])
    both = ngram_containment_pairs(docs, n=3, threshold=0.9)
    got = {(r["id_a"], r["id_b"]): r for r in both.collect()}
    assert ("c1", "c2") in got and ("c2", "c1") in got
    assert got[("c1", "c2")]["jaccard"] == 1.0
    # the excerpt is contained in BOTH copies
    assert ("ex", "c1") in got and ("ex", "c2") in got

    ex_only = {
        (r["id_a"], r["id_b"]) for r in excerpt_pairs(docs, n=3).collect()
    }
    assert ex_only == {("ex", "c1"), ("ex", "c2")}


def test_df_cap_keeps_containment_exact_over_filtered_universe(spark):
    """Grams above the df cap drop from BOTH the numerator and the
    denominator, so a subset relation keeps containment exactly 1.0."""
    shared = "the same boilerplate tail here"
    rows = [(f"d{i}", f"unique{i}a unique{i}b unique{i}c {shared}") for i in range(5)]
    full = " ".join(f"w{i}" for i in range(12)) + " " + shared
    excerpt = " ".join(f"w{i}" for i in range(12))
    rows += [("full", full), ("ex", excerpt)]
    out = {
        (r["id_a"], r["id_b"]): r
        for r in ngram_containment_pairs(
            _docs(spark, rows), n=3, threshold=0.9, max_doc_freq=3
        ).collect()
    }
    assert ("ex", "full") in out
    assert out[("ex", "full")]["containment"] == 1.0


def test_plan_joins_on_gram_never_cartesian(spark):
    docs = _docs(spark, [(f"d{i}", f"a b c d{i}") for i in range(6)])
    df = ngram_containment_pairs(docs, n=3, threshold=0.5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
