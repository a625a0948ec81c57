"""Replicates the driver's correctness gate locally: every queries()
entry with an oracle must match DuckDB on row count, column names and
values (order-insensitive) at sf0.01."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in E.TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, bool):
                v = bool(v)
            elif isinstance(v, float):
                v = round(v, 6)
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


QUERY_NAMES = sorted(set(E.queries()) & set(E.oracle_sql()))


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, con, name):
    fn = E.queries()[name]
    sdf = fn(spark, SF)
    spark_rows = [r.asDict() for r in sdf.collect()]
    cols = sorted(sdf.columns)

    odf = con.execute(E.oracle_sql()[name]).fetch_arrow_table()
    oracle_cols = sorted(odf.column_names)
    assert cols == oracle_cols, f"{name}: columns {cols} vs {oracle_cols}"

    oracle_rows = odf.to_pylist()
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: {len(spark_rows)} spark rows vs {len(oracle_rows)} oracle rows"
    )

    a = _normalize(spark_rows, cols)
    b = _normalize(oracle_rows, cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    # allow float wobble at the last normalized digit
    real = []
    for x, y in mismatches:
        ok = True
        for xv, yv in zip(x, y):
            if isinstance(xv, float) and isinstance(yv, float):
                if not math.isclose(xv, yv, rel_tol=1e-9, abs_tol=2e-6):
                    ok = False
            elif xv != yv:
                ok = False
        if not ok:
            real.append((x, y))
    assert not real, f"{name}: {len(real)} mismatching rows, first: {real[:3]}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    n = df.count()
    assert n > 0
    assert {"url", "content_sha", "is_keeper"} <= set(df.columns)


def test_every_query_runs(spark):
    for name, fn in E.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name
