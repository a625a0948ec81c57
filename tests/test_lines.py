"""Line-level boilerplate dedup (operators/lines.py)."""

import pytest
from pyspark.sql import Row

from deduplicator_go_spark.operators.lines import (
    duplicate_lines,
    exploded_lines,
    strip_duplicate_lines,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(url="a", host="h1", text="unique a1\nNAV MENU\nunique a2"),
            Row(url="b", host="h1", text="NAV MENU\nunique b1"),
            Row(url="c", host="h1", text="unique c1\nNAV MENU"),
            Row(url="d", host="h2", text="NAV MENU\nonly here once: FOOT"),
            Row(url="e", host="h2", text="\nunique e1\n"),  # empty lines
            Row(url="f", host="h2", text=""),  # empty doc
        ]
    )


def test_exploded_positions(spark, docs):
    rows = exploded_lines(docs).filter("url = 'a'").orderBy("pos").collect()
    assert [(r.pos, r.line) for r in rows] == [
        (1, "unique a1"), (2, "NAV MENU"), (3, "unique a2")
    ]


def test_duplicate_lines_corpus(spark, docs):
    dup = duplicate_lines(docs, min_docs=3).collect()
    assert [(r.line, r.n_docs) for r in dup] == [("NAV MENU", 4)]


def test_duplicate_lines_scoped(spark, docs):
    dup = duplicate_lines(docs, min_docs=2, scope_col="host").collect()
    assert sorted((r.host, r.line, r.n_docs) for r in dup) == [("h1", "NAV MENU", 3)]


def test_strip_removes_everywhere_keeps_order(spark, docs):
    out = {r.url: r for r in strip_duplicate_lines(docs, min_docs=3).collect()}
    assert out["a"].text == "unique a1\nunique a2"
    assert out["a"].n_lines_removed == 1 and out["a"].chars_removed == 8
    assert out["b"].text == "unique b1"
    assert out["c"].text == "unique c1"
    # below threshold in h2-only docs is kept; unscoped count crosses it
    assert out["d"].text == "only here once: FOOT"
    # empty lines are never removal candidates (min_chars)
    assert out["e"].text == "\nunique e1\n" and out["e"].n_lines_removed == 0
    assert out["f"].text == "" and out["f"].chars_removed == 0
    # non-key columns survive
    assert out["a"].host == "h1"


def test_strip_scoped_leaves_other_host(spark, docs):
    out = {r.url: r.text for r in
           strip_duplicate_lines(docs, min_docs=2, scope_col="host").collect()}
    assert out["a"] == "unique a1\nunique a2"
    assert out["d"] == "NAV MENU\nonly here once: FOOT"  # h2 has it once


def test_strip_can_empty_a_doc(spark):
    docs = spark.createDataFrame(
        [Row(url="x", text="SAME"), Row(url="y", text="SAME")]
    )
    out = {r.url: r for r in strip_duplicate_lines(docs, min_docs=2).collect()}
    assert out["x"].text == "" and out["x"].n_lines_removed == 1
    assert out["y"].chars_removed == 4
