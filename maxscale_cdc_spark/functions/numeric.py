"""Deterministic numeric aggregation helpers.

Floating-point sums depend on accumulation order, which differs between
engines (and between runs at different parallelism).  To make results
bit-identical across Spark and the DuckDB oracle — and run-to-run stable
at any partition count — money/measure columns are cast to
``DECIMAL(18,4)`` before summation (exact, order-independent) and the
exact decimal result is cast back to ``double``.  Derived values (avg =
sum/count) are then IEEE operations on identical operands, hence
identical.

The same idiom appears in the oracle SQL:
``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec(col: str | Column) -> Column:
    """Cast to the canonical exact decimal type."""
    return _c(col).cast(DEC)


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent exact sum, surfaced as double."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """avg = exact-sum / count, both sides computed identically."""
    return (
        F.sum(dec(col)).cast("double") / F.count(_c(col)).cast("double")
    ).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / "
        f"CAST(COUNT({expr}) AS DOUBLE) AS {alias}"
    )
