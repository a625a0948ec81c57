"""Planted-truth tests for operators/corpus.py (chunk-level dedup,
repetition signals, decontamination)."""

from __future__ import annotations

from deduplicator_go_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_chunks_tail_and_order(spark):
    # 10 words, chunk_words=4 -> chunks of 4, 4, 2 (short tail kept)
    words = [f"w{i}" for i in range(10)]
    df = _docs(spark, [(1, " ".join(words))])
    rows = sorted(
        corpus.doc_chunks(df, chunk_words=4).collect(), key=lambda r: r["chunk_idx"]
    )
    assert [r["chunk"] for r in rows] == [
        "w0 w1 w2 w3",
        "w4 w5 w6 w7",
        "w8 w9",
    ]
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]


def test_duplicated_chunks_report(spark):
    shared = "the quick brown fox"
    df = _docs(
        spark,
        [
            (1, shared + " alpha beta gamma delta"),
            (2, shared + " epsilon zeta eta theta"),
            (3, "totally unique words here only once"),
        ],
    )
    out = corpus.duplicated_chunks(df, chunk_words=4, min_docs=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["chunk"] == shared and r["n_docs"] == 2 and r["n_occurrences"] == 2


def test_strip_duplicated_chunks_keeper_retains(spark):
    shared = "one two three four"
    df = _docs(
        spark,
        [
            (5, shared + " aa bb cc dd"),
            (9, shared + " ee ff gg hh"),
        ],
    )
    out = {
        r["id"]: r
        for r in corpus.strip_duplicated_chunks(df, chunk_words=4, min_docs=2).collect()
    }
    # min-id doc keeps the shared chunk; the other loses it but keeps order
    assert out[5]["clean_text"] == shared + " aa bb cc dd"
    assert out[5]["n_removed_chunks"] == 0
    assert out[9]["clean_text"] == "ee ff gg hh"
    assert out[9]["n_kept_chunks"] == 1 and out[9]["n_removed_chunks"] == 1


def test_strip_all_boilerplate_doc_survives_empty(spark):
    shared = "x1 x2 x3 x4"
    df = _docs(spark, [(1, shared), (2, shared)])
    out = {r["id"]: r for r in corpus.strip_duplicated_chunks(df, chunk_words=4).collect()}
    assert out[2]["clean_text"] == "" and out[2]["n_kept_chunks"] == 0
    assert out[1]["clean_text"] == shared


def test_repetition_signals_exact_fractions(spark):
    # "a a a b": 4 words, 2 distinct -> dup_word_frac = 0.5
    # bigrams: "a a" x2, "a b" x1 -> top_bigram_frac = 2/3
    df = _docs(spark, [(1, "a a a b"), (2, "p q r s")])
    out = {r["id"]: r for r in corpus.repetition_signals(df).collect()}
    assert out[1]["n_words"] == 4
    assert abs(out[1]["dup_word_frac"] - 0.5) < 1e-9
    assert abs(out[1]["top_bigram_frac"] - round(2 / 3, 6)) < 1e-9
    assert out[2]["dup_word_frac"] == 0.0
    assert abs(out[2]["top_bigram_frac"] - round(1 / 3, 6)) < 1e-9


def test_benchmark_overlap_planted_contamination(spark):
    bench = _docs(spark, [(100, "secret eval question about spark joins")])
    train = _docs(
        spark,
        [
            # contains the full bench text -> shares 5-grams
            (1, "intro words secret eval question about spark joins outro"),
            (2, "completely clean training document with fresh words"),
        ],
    )
    out = {
        r["id"]: r for r in corpus.benchmark_overlap(train, bench, n=5).collect()
    }
    assert out[1]["contaminated"] and out[1]["n_shared_grams"] >= 2
    assert not out[2]["contaminated"] and out[2]["n_shared_grams"] == 0
