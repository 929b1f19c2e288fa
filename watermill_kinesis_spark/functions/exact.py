"""Exact (order-independent) numeric aggregation helpers.

A plain ``SUM(double)`` is non-associative: the result depends on
partition count and merge order, so it is neither reproducible across
two Spark runs at different parallelism nor comparable bit-for-bit
against another engine. Every float aggregate this engine exposes for
oracle verification is therefore computed in decimal (exact,
associative) and cast back to double at the end — the decimal→double
conversion is a single IEEE-754 rounding, identical everywhere.

Precision discipline: operands are kept narrow (decimal(12,2) money,
decimal(4,2) factors) so chained products stay well under the
decimal(38) cap in BOTH Spark and DuckDB — neither engine hits
precision-loss rounding, so results are exact and identical.

At 100 TB this also buys reproducibility: the same query over the same
data gives the same bytes regardless of cluster size or AQE decisions.
Decimal aggregation is still whole-stage-codegen'd JVM work — no
Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def money(col: Column | str, scale: int = 2) -> Column:
    """Exact-decimal view of a 2-dp money-like double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(12,{scale})")


def factor(col: Column | str, sign: int = 1) -> Column:
    """(1 ± x) as a narrow exact decimal — e.g. (1 - l_discount)."""
    c = F.col(col) if isinstance(col, str) else col
    base = F.lit(1).cast("decimal(4,2)")
    x = c.cast("decimal(4,2)")
    return (base + x if sign > 0 else base - x).cast("decimal(4,2)")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM for double columns: decimal-sum → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(12,{scale})")).cast("double")


def dsum_expr(col: Column) -> Column:
    """SUM of an already-exact decimal expression, as double."""
    return F.sum(col).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(12,{scale})")).cast("double") / F.count(c)


# ---------------------------------------------------------------------------
# DuckDB-side templates mirroring the helpers above; oracle SQL strings
# interpolate these so both engines run the same exact arithmetic.


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(12,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(12,{scale}))) AS DOUBLE) / COUNT({expr})"
    )


def sql_money(expr: str, scale: int = 2) -> str:
    return f"CAST({expr} AS DECIMAL(12,{scale}))"


def sql_factor(expr: str, sign: str = "-") -> str:
    return (
        f"CAST(CAST(1 AS DECIMAL(4,2)) {sign} CAST({expr} AS DECIMAL(4,2)) AS DECIMAL(4,2))"
    )
