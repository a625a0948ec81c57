"""Planted-truth tests for PII redaction (functions/pii.py) and
source-mixing operators (operators/corpus.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from deduplicator_go_spark.functions import pii
from deduplicator_go_spark.operators import corpus


def test_pii_counts_and_redaction(spark):
    text = (
        "mail a.b+c@ex-ample.org or root@h.io, server 10.0.255.7 "
        "and 192.168.1.1, call +155-010-1234 now"
    )
    df = spark.createDataFrame([(1, text)], "id long, text string")
    c = pii.pii_counts(F.col("text"))
    row = df.select(
        c["n_emails"].alias("e"), c["n_ips"].alias("i"), c["n_phones"].alias("p"),
        pii.redact_pii(F.col("text")).alias("r"),
    ).first()
    assert (row["e"], row["i"], row["p"]) == (2, 2, 1)
    assert row["r"] == (
        "mail [EMAIL] or [EMAIL], server [IP] and [IP], call [PHONE] now"
    )


def test_pii_clean_text_untouched(spark):
    df = spark.createDataFrame([(1, "no secrets here at all")], "id long, text string")
    row = df.select(pii.redact_pii(F.col("text")).alias("r")).first()
    assert row["r"] == "no secrets here at all"


def test_source_mixing_weights_exact(spark):
    # src a: 4 tokens total over 2 docs; src b: 16 tokens in 1 doc
    df = spark.createDataFrame(
        [(1, "a", "w x"), (2, "a", "y z"), (3, "b", " ".join(["t"] * 16))],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in corpus.source_mixing_weights(df, alpha=0.5).collect()}
    # weights ∝ sqrt(tokens): sqrt(4)=2, sqrt(16)=4 -> 1/3 and 2/3
    assert out["a"]["n_docs"] == 2 and out["a"]["n_tokens"] == 4
    assert math.isclose(out["a"]["weight"], round(1 / 3, 6), abs_tol=1e-9)
    assert math.isclose(out["b"]["weight"], round(2 / 3, 6), abs_tol=1e-9)


def test_token_budget_greedy_prefix(spark):
    # one source, 3 docs of 10 tokens each, budget 15:
    # first doc kept (0 < 15), second kept only if its cum start < 15,
    # i.e. exactly the doc that CROSSES the budget is kept, later dropped
    df = spark.createDataFrame(
        [(i, "s", " ".join([f"w{j}" for j in range(10)])) for i in (1, 2, 3)],
        "doc_id long, source string, text string",
    )
    rows = corpus.token_budget_sample(df, budget_tokens=15).collect()
    kept = sorted(r["cum_tokens"] for r in rows if r["kept"])
    dropped = sorted(r["cum_tokens"] for r in rows if not r["kept"])
    assert kept == [10, 20] and dropped == [30]
    # deterministic under re-run
    again = corpus.token_budget_sample(df, budget_tokens=15).collect()
    assert {(r["id"], r["kept"]) for r in rows} == {(r["id"], r["kept"]) for r in again}


def test_token_budget_tiny_budget_keeps_one_doc(spark):
    df = spark.createDataFrame(
        [(1, "s", "a b c d e"), (2, "s", "f g h i j")],
        "doc_id long, source string, text string",
    )
    rows = corpus.token_budget_sample(df, budget_tokens=1).collect()
    assert sum(1 for r in rows if r["kept"]) == 1
