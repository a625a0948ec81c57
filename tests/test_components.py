"""Connected components vs a pure-Python union-find oracle."""

from __future__ import annotations

import random

from deduplicator_go_spark.operators.components import assign_all, connected_components


def _uf_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["url"]: r["cluster_id"] for r in connected_components(df).collect()}
    want = _uf_oracle(edges)
    # same partition AND same canonical min-label
    assert got == want


def test_cc_simple_chain(spark):
    _check(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")])


def test_cc_star_and_cycle(spark):
    _check(spark, [("m", "a"), ("m", "b"), ("m", "c"), ("p", "q"), ("q", "r"), ("r", "p")])


def test_cc_long_chain_converges_fast(spark):
    # salted-chain edges create long paths; large-star/small-star must
    # converge in O(log n) rounds, not O(n)
    n = 200
    nodes = [f"n{i:04d}" for i in range(n)]
    edges = list(zip(nodes, nodes[1:]))
    _check(spark, edges)


def test_cc_random_graph(spark):
    rng = random.Random(7)
    nodes = [f"v{i:03d}" for i in range(120)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_assign_all_singletons(spark):
    docs = spark.createDataFrame([("a",), ("b",), ("c",)], "url string")
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    labels = {r["url"]: r["cluster_id"] for r in
              assign_all(docs, connected_components(edges)).collect()}
    assert labels == {"a": "a", "b": "a", "c": "c"}
