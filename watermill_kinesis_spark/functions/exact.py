"""Exact (order-independent) numeric aggregation helpers.

A plain ``SUM(double)`` is non-associative: the result depends on
partition count and merge order, so it is neither reproducible across
two Spark runs at different parallelism nor comparable bit-for-bit
against another engine. Every float aggregate this engine exposes for
oracle verification is therefore computed in decimal (exact,
associative) and cast back to double at the end — the decimal→double
conversion is a single IEEE-754 rounding, identical everywhere.

At 100 TB this also buys reproducibility: the same query over the same
data gives the same bytes regardless of cluster size or AQE decisions.
Decimal aggregation is still whole-stage-codegen'd JVM work — no
Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: enough integer headroom for sums over ~1e12 rows of ~1e5-magnitude values
_WIDE = "decimal(30,6)"


def money(col: Column | str, scale: int = 2) -> Column:
    """Exact-decimal view of a 2-dp money-like double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(15,{scale})")


def dmul(a: Column, b: Column) -> Column:
    """Exact decimal product, widened so later SUMs can't overflow."""
    return (a * b).cast(_WIDE)


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM for double columns: decimal-sum → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(15,{scale})").cast(_WIDE)).cast("double")


def dsum_expr(col: Column) -> Column:
    """SUM of an already-exact decimal expression, as double."""
    return F.sum(col).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(15,{scale})").cast(_WIDE)).cast("double")
        / F.count(c)
    )


# DuckDB-side templates mirroring the helpers above; oracle SQL strings
# interpolate these so both engines run the same exact arithmetic.
def sql_dsum(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST(CAST({expr} AS DECIMAL(15,{scale})) AS DECIMAL(30,6))) AS DOUBLE)"
    )


def sql_davg(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST(CAST({expr} AS DECIMAL(15,{scale})) AS DECIMAL(30,6))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
