"""Shared JVM-side text expressions.

One home for the adjacent-bigram generator so every operator that
mines bigrams (collocation PMI, LM count tables, Kneser–Ney
continuation counts) stays in lockstep on two load-bearing details:

- the empty/singleton guard (``size < 2`` → typed empty array, not a
  lambda over a negative-length sequence);
- the lambda-CSE hoist rule (SCALE.md round-9 wave 2): Spark's
  interpreted higher-order functions re-evaluate an inlined
  ``split(text, ...)`` on EVERY ``element_at`` call, so the token
  array must be a materialized column before any lambda indexes into
  it. These helpers therefore take the NAME of an array column, never
  a string expression.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def bigram_structs(arr_col: str) -> Column:
    """array<struct<x,y>> of adjacent (left, right) token pairs from
    the ALREADY-MATERIALIZED array column ``arr_col`` (hoist rule —
    pass a column name, not ``split(...)``)."""
    return F.when(
        F.size(arr_col) >= 2,
        F.expr(
            f"transform(sequence(0, size({arr_col}) - 2),"
            f" i -> struct(element_at({arr_col}, i + 1) AS x,"
            f" element_at({arr_col}, i + 2) AS y))"
        ),
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
