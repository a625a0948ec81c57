"""C7: size parse/format parity (files/utils.go:236 ParseSize,
files/import.go:123 formatSize)."""

from __future__ import annotations

import pytest

from deduplicator_go_spark.functions.sizes import (
    format_size,
    format_size_col,
    parse_size,
)


def test_parse_size_units():
    assert parse_size("10K") == 10 * 1024
    assert parse_size("500M") == 500 * 1024**2
    assert parse_size("1.5G") == int(1.5 * 1024**3)
    assert parse_size("2TB") == 2 * 1024**4
    assert parse_size("100b") == 100
    assert parse_size("0.5kb") == 512


def test_parse_size_bare_and_empty():
    assert parse_size("123456") == 123456
    assert parse_size("") == 0
    assert parse_size("   ") == 0
    assert parse_size(None) == 0
    assert parse_size(42) == 42


@pytest.mark.parametrize("bad", ["1.5X", "G", "abc", "1..5G5G"])
def test_parse_size_rejects_junk(bad):
    with pytest.raises(ValueError):
        parse_size(bad)


def test_format_size_matches_reference_shape():
    assert format_size(512) == "512 B"
    assert format_size(1023) == "1023 B"
    assert format_size(1536) == "1.5 KB"
    assert format_size(5 * 1024**2) == "5.0 MB"
    assert format_size(int(2.5 * 1024**3)) == "2.5 GB"
    assert format_size(3 * 1024**4) == "3.0 TB"


def test_parse_format_roundtrip_close():
    for n in [1, 999, 10 * 1024, 7 * 1024**2, int(1.3 * 1024**3)]:
        back = parse_size(format_size(n).replace(" ", ""))
        assert abs(back - n) <= max(1, n * 0.06)  # one printed decimal


def test_format_size_col_matches_python(spark):
    sizes = [0, 1, 512, 1023, 1024, 1536, 10**6, 10**9,
             5 * 1024**3, 3 * 1024**4, 2 * 1024**5]
    df = spark.createDataFrame([(s,) for s in sizes], "size long")
    got = {r["size"]: r["human"] for r in
           df.select("size", format_size_col("size").alias("human")).collect()}
    for s in sizes:
        assert got[s] == format_size(s), s
