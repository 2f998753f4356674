"""Fixed-point money arithmetic — exact, overflow-safe, bigint-backed.

The engine's determinism rule is that every monetary aggregate must be
bit-identical between Spark and the DuckDB oracle. The first-generation
helper summed ``CAST(x AS DECIMAL(25,6))``: exact, but precision 25
forces Spark onto the BigDecimal slow path (precision ≤ 18 is
Long-backed), and profiling shows the decimal aggregation costs ~3-5×
the entire remaining scan+shuffle on sum-heavy queries (q1-style). At
100 TB that is pure per-core CPU burn in the map-side partial
aggregate.

This module replaces it with classic fixed-point: split each value into
an integer part and a scaled fractional part, sum BOTH as bigints
(exact, commutative — partition order can never change a bit), and
recombine with one division + one addition at the end (both single IEEE
ops, identical on any engine).

    fsum(x, d):  sum(floor(x))  +  sum(round((x - floor(x)) · 10^d)) / 10^d

Why the split instead of one ``sum(round(x·10^d))``: the single-sum
form overflows ``bigint`` at roughly ``9.2e18 / (max|x|·10^d)`` rows —
for TPC-H charge values (~1e5) at d=6 that is ~1e8 rows, i.e. dead at
sf100. The split form bounds the integer sum by ``rows · max|x|`` and
the fraction sum by ``rows · 10^d``, pushing overflow past 1e13 rows
for both — comfortably beyond 100 TB.

Correctness requirements (guarded by ``tests/test_properties.py``'s
fixed-point testdata guard):
- the column holds values with at most ``d`` decimal digits, so
  ``round((x - floor(x)) · 10^d)`` recovers the exact fraction;
- |x| < 2^52 so the long→double promotion inside the recombine is
  exact.

Negative values work: floor(-3.25) = -4 with fraction 0.75 recombines
to -3.25.

``isum`` is the degenerate d=0 case for integral-valued double columns
(l_quantity): one bigint sum, no rounding.

Both helpers have SQL twins (``fsum_sql`` / ``isum_sql``) so an oracle
can state the IDENTICAL computation — keeping the Spark expression and
the SQL string in one module is what makes the 40-odd call sites safe
to audit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fsum(col: Column, decimals: int = 6) -> Column:
    """Exact fixed-point sum of a ≤``decimals``-dp double column;
    returns double. Two bigint aggregates; overflow-safe past 1e13
    rows."""
    scale = float(10**decimals)
    ipart = F.floor(col)  # long in Spark SQL
    frac = F.round((col - ipart) * F.lit(scale)).cast("long")
    return (
        F.sum(ipart) + F.sum(frac) / F.lit(scale)
    ).cast("double")


def fsum_sql(expr: str, decimals: int = 6) -> str:
    """DuckDB twin of :func:`fsum` for oracle SQL strings."""
    scale = f"{10**decimals}.0"
    return (
        f"CAST(sum(CAST(floor({expr}) AS BIGINT)) "
        f"+ sum(CAST(round(({expr} - floor({expr})) * {scale}) AS BIGINT)) "
        f"/ {scale} AS DOUBLE)"
    )


def isum(col: Column) -> Column:
    """Exact sum of an integral-valued double column; returns double."""
    return F.sum(col.cast("long")).cast("double")


def isum_sql(expr: str) -> str:
    """DuckDB twin of :func:`isum`."""
    return f"CAST(sum(CAST({expr} AS BIGINT)) AS DOUBLE)"
