"""Deterministic numeric aggregation discipline.

Double-typed measures (prices, quantities) must aggregate identically in
Spark and the DuckDB oracle, but floating sums are order-dependent and a
32-way partial aggregate will not reduce in the oracle's order. The fix is
exactness, not tolerance (SURVEY.md §7.4 "oracle mismatch traps"):

1. cast the 2-dp measure to DECIMAL(18,2) (exact — the synthetic data is
   2-dp), 2. aggregate in decimal (exact, order-independent), 3. cast the
   result to double (correctly-rounded in both engines while the unscaled
   value fits in 2^53 — true through sf0.1 and far beyond).

Averages divide the exact decimal sum by the count *in double*, the same
single IEEE operation both sides.

The same discipline applies at 100 TB on a real cluster: decimal partial
aggregation is Tungsten-native and order-independent, so results are
reproducible run-to-run — floats would not be.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum / count, divided in double."""
    return F.sum(dec(col, scale)).cast("double") / F.count(F.lit(1))


# SQL-side twins for oracle strings (DuckDB).
def sql_dec(expr: str, scale: int = 2) -> str:
    return f"CAST({expr} AS DECIMAL(18,{scale}))"


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM({sql_dec(expr, scale)}) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"(CAST(SUM({sql_dec(expr, scale)}) AS DOUBLE) / COUNT(*))"
