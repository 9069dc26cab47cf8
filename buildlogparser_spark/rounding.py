"""Cross-engine-portable decimal rounding.

Spark's ``round()`` on DOUBLE re-parses the shortest decimal string into a
BigDecimal and applies HALF_UP; DuckDB rounds the scaled binary double.
For ratios whose double value straddles a decimal half (57/800 = 0.07125)
the two land on opposite sides of the boundary — a latent value-hash
mismatch on any dataset that produces such a ratio (brute force finds 21
k/n pairs below n=1200 for 4 decimals).

``portable_round`` uses floor(x * 10^p + 0.5) / 10^p instead: every step
is plain IEEE754 double arithmetic, bit-identical in Spark, DuckDB, and
Python, so both engines round the same double to the same double by
construction. Semantics: half-up toward +infinity — identical to HALF_UP
for non-negative inputs (every use in this repo is a non-negative ratio /
percentage / duration; cosine similarity may be negative, where the two
engines still agree with each other, which is the property the gate
needs). Scale limit: |x| * 10^p must stay within 2^53 for the arithmetic
to be exact — true for all uses here (ratios ≤ 1 at p ≤ 9, microsecond
durations ≲ 1e7 at p = 6).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def portable_round(col: Column, p: int) -> Column:
    scale = 10 ** p
    return F.floor(col * scale + F.lit(0.5)) / scale


def portable_round_sql(expr: str, p: int) -> str:
    scale = 10 ** p
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
