"""Local mini-version of the driver's correctness gate: every
queries()/oracle_sql() pair must agree (columns, row count, values) between
Spark and DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from conftest import SF_SMOKE, assert_frames_match, duck_df

QUERY_NAMES = sorted(entry_mod.queries().keys())


def test_all_queries_have_oracles():
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q, f"oracle without query: {o - q}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_parity(spark, duck_smoke, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        pytest.skip("rows-only query (no SQL oracle)")
    spark_df = q(spark, SF_SMOKE)
    assert_frames_match(spark_df, duck_df(duck_smoke, sql), name)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0
