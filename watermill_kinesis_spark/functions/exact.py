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

# ---------------------------------------------------------------------------
# Long fixed-point fast path.
#
# Spark's SUM over a decimal whose result precision exceeds 18 leaves the
# long-backed Decimal fast lane: every input row allocates a JVM Decimal
# and the merge runs on java.math.BigDecimal (measured 2-3× on TPC-H Q1 at
# sf0.1 vs double sums). Representing 2-dp money as LONG hundredths keeps
# the whole aggregate in primitive codegen — sums of longs are exact and
# associative, and the final long→double→÷10^scale conversion produces
# the *correctly rounded* double of the exact rational, i.e. bit-identical
# to DuckDB's CAST(SUM(DECIMAL) AS DOUBLE), as long as the integer sum
# stays below 2^53 (exact double conversion). Bounds at scale:
#   scale 2 (money sums):        2^53/10^2 ≈ $9.0e13 per group
#   scale 4 (price×factor sums): 2^53 units ≈ 9.0e15 → ~1e9 rows/group
#   scale 6 (triple products):   ~1e7 rows/group before 1-ulp drift
# Beyond those, the sum is still exact in the long (overflow at 2^63 —
# another 1000×); only the final double conversion can drift by 1 ulp.
# For truly unbounded groups use the decimal `money`/`dsum_expr` path
# below (the wide fallback this engine keeps for projections).


def lcents(col: Column | str, scale: int = 2) -> Column:
    """double → exact long in 10^-scale units, HALF_UP away from zero
    (the same rounding as a decimal cast in Spark AND DuckDB). floor
    rather than round(): Spark's Round on doubles goes through
    BigDecimal.setScale per value — floor stays primitive."""
    c = F.col(col) if isinstance(col, str) else col
    m = 10**scale
    pos = F.floor(c * m + F.lit(0.5))
    neg = -F.floor(-c * m + F.lit(0.5))
    return F.when(c >= 0, pos).otherwise(neg).cast("bigint")


def lfactor(col: Column | str, sign: int = 1) -> Column:
    """(1 ± x) in long hundredths — e.g. (1 - l_discount) → 100 - pct."""
    x = lcents(col)
    return F.lit(100) + x if sign > 0 else F.lit(100) - x


def lsum(expr: Column, scale: int) -> Column:
    """Order-independent SUM of a long fixed-point expression, reported
    as double in natural units."""
    return F.sum(expr).cast("double") / F.lit(float(10**scale))


def money(col: Column | str, scale: int = 2) -> Column:
    """Exact-decimal view of a 2-dp money-like double column (the wide
    path: projections / group keys / unbounded-group sums)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(12,{scale})")


def factor(col: Column | str, sign: int = 1) -> Column:
    """(1 ± x) as a narrow exact decimal — e.g. (1 - l_discount)."""
    c = F.col(col) if isinstance(col, str) else col
    base = F.lit(1).cast("decimal(4,2)")
    x = c.cast("decimal(4,2)")
    return (base + x if sign > 0 else base - x).cast("decimal(4,2)")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM for double columns via long fixed-point."""
    c = F.col(col) if isinstance(col, str) else col
    return lsum(lcents(c, scale), scale)


def dsum_expr(col: Column) -> Column:
    """SUM of an already-exact decimal expression, as double (wide
    fallback — prefer lsum(long_expr, scale) on hot paths)."""
    return F.sum(col).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG: exact long sum, double divisions."""
    c = F.col(col) if isinstance(col, str) else col
    return lsum(lcents(c, scale), scale) / F.count(c)


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
