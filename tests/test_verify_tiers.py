"""Tiered verification: estimate tier decides clear cases, exact tier
decides the borderline band; decisions agree with pure-exact verify."""

from __future__ import annotations

from deduplicator_go_spark.config import DEFAULT_CONFIG as C
from deduplicator_go_spark.operators.minhash import minhash_signatures
from deduplicator_go_spark.operators.verify import verify_pairs


def _mk(spark):
    base = " ".join(f"tok{i:03d}" for i in range(400))
    toks = base.split()
    # exact copy → est ≈ 1.0 (clear accept)
    dup = base
    # ~7% token edits → jaccard ~0.75-0.88 (borderline band around 0.8)
    mid_toks = list(toks)
    for i in range(0, len(mid_toks), 14):
        mid_toks[i] = f"zzz{i}"
    mid = " ".join(mid_toks)
    # unrelated → est ≈ 0 (clear reject)
    far = " ".join(f"other{i:03d}" for i in range(400))
    docs = spark.createDataFrame(
        [("a", base), ("b", dup), ("c", mid), ("d", far)], "url string, text string"
    )
    pairs = spark.createDataFrame(
        [("a", "b", "pair"), ("a", "c", "pair"), ("a", "d", "pair")],
        "url_a string, url_b string, origin string",
    )
    return docs, pairs


def test_tiers_and_agreement(spark):
    docs, pairs = _mk(spark)
    sigs = minhash_signatures(docs, C.shingle_size, C.num_perm, C.minhash_seed)
    tiered = {(r["url_a"], r["url_b"]): r for r in
              verify_pairs(pairs, docs, C.shingle_size, 0.8, sigs=sigs).collect()}
    exact = {(r["url_a"], r["url_b"]): r for r in
             verify_pairs(pairs, docs, C.shingle_size, 0.8).collect()}

    assert tiered[("a", "b")]["verify_tier"] == "est"
    assert tiered[("a", "b")]["is_dup"]
    assert tiered[("a", "d")]["verify_tier"] == "est"
    assert not tiered[("a", "d")]["is_dup"]
    # the mid pair sits inside the borderline band → exact tier decides
    assert tiered[("a", "c")]["verify_tier"] == "exact"
    assert abs(tiered[("a", "c")]["jaccard"] - exact[("a", "c")]["jaccard"]) < 1e-9

    # decisions agree with the pure-exact path on every pair
    for k in exact:
        assert tiered[k]["is_dup"] == exact[k]["is_dup"], k
