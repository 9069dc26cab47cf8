"""portable_round parity: the floor(x*10^p+0.5)/10^p formulation must give
the SAME double in Python, DuckDB, and Spark for every input — that is the
whole point of rounding.py (plain round() provably differs between Spark
and DuckDB on decimal-boundary ratios like 57/800)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from buildlogparser_spark.rounding import portable_round, portable_round_sql


def _py_round(x: float, p: int) -> float:
    s = 10 ** p
    return math.floor(x * s + 0.5) / s


def test_duckdb_matches_python_on_all_small_ratios():
    # every k/n ratio up to n=1200 — includes all 21 ratios where Spark's
    # round() and DuckDB's round() disagree at 4 decimals (e.g. 57/800)
    con = duckdb.connect()
    expr = portable_round_sql("CAST(k AS DOUBLE) / n", 4)
    rows = con.execute(
        f"SELECT k, n, {expr} FROM (SELECT unnest(range(1, 1201)) AS n), "
        "LATERAL (SELECT unnest(range(0, n + 1)) AS k)").fetchall()
    assert len(rows) > 700_000
    for k, n, got in rows:
        assert got == _py_round(k / n, 4), (k, n, got)


def test_plain_round_actually_diverges_cross_engine():
    # documents WHY portable_round exists: DuckDB round() rounds the scaled
    # binary double (57/800 < 0.07125 in binary → 0.0712) while Spark's
    # round() applies HALF_UP to the shortest decimal string "0.07125"
    # (→ 0.0713); portable_round sides with the binary value in both
    from decimal import Decimal, ROUND_HALF_UP

    con = duckdb.connect()
    duck = con.execute("SELECT round(57.0 / 800, 4)").fetchone()[0]
    spark_semantics = float(
        Decimal(repr(57 / 800)).quantize(Decimal("0.0001"), ROUND_HALF_UP))
    assert duck == 0.0712 and spark_semantics == 0.0713
    assert _py_round(57 / 800, 4) == duck


@pytest.mark.parametrize("p", [1, 2, 4, 6, 9])
def test_spark_matches_python(spark, p):
    # boundary-heavy sample: k/n grids plus negatives (cosine sims)
    vals = [k / n for n in (3, 7, 800, 997, 1200) for k in range(0, n + 1, 13)]
    vals += [-v for v in vals[:50]]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, x double")
    got = {r.i: r.y for r in df.select("i", portable_round(F.col("x"), p).alias("y")).collect()}
    for i, v in enumerate(vals):
        assert got[i] == _py_round(v, p), (i, v, p, got[i])
