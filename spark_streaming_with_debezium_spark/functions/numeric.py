"""Bit-deterministic aggregates for cross-engine (DuckDB) equivalence.

Floating-point SUM/AVG depend on reduction order, which differs between
Spark partitions and DuckDB — and between two Spark runs. The fix used
across this engine: accumulate in DECIMAL (exact, order-independent),
then convert the final value to DOUBLE once. Per-row double arithmetic
(e.g. ``price * (1 - discount)``) is IEEE-deterministic and identical
in both engines, so casting the per-row result to decimal before the
sum yields bit-identical aggregates.

This also matters at 100 TB: a decimal sum is deterministic across
retries/speculative tasks, so a re-run of a failed stage can't change
results.

Spark side: :func:`dsum`, :func:`davg`, :func:`dstddev`.
DuckDB side: :func:`sql_dsum`, :func:`sql_davg`, :func:`sql_dstddev`
produce the equivalent SQL text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Order-independent SUM(double) -> double (exact decimal interior)."""
    return F.sum(_c(col).cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / count, one double div."""
    c = _c(col)
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def dstddev(col: Column | str) -> Column:
    """Sample stddev from exact decimal moments: deterministic both engines.

    sqrt((sum(x^2) - sum(x)^2 / n) / (n - 1)); x*x is computed in
    double per row (deterministic), both sums are exact decimals.
    """
    c = _c(col)
    n = F.count(c).cast("double")
    s1 = F.sum(c.cast(DEC)).cast("double")
    s2 = F.sum((c * c).cast(DEC)).cast("double")
    return F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1.0)))


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr}))"


def sql_dstddev(expr: str) -> str:
    s1 = sql_dsum(expr)
    s2 = f"CAST(SUM(CAST(({expr}) * ({expr}) AS DECIMAL(38,6))) AS DOUBLE)"
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    return f"SQRT(({s2} - {s1} * {s1} / {n}) / ({n} - 1.0))"
