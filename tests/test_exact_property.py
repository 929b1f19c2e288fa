"""Property tests for the exact fixed-point arithmetic in
functions/exact.py — the layer every oracle-checked float aggregate
rests on. Pure-Python mirrors of the column semantics are checked
against Spark on whole batches (one job per example, like
test_codec_property)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from watermill_kinesis_spark.functions.exact import lcents

# 2-dp money values in the engine's operating range, as exact decimals
# rendered to the nearest double (what a parquet column holds)
MONEY = st.decimals(
    min_value=Decimal("-99999999.99"),
    max_value=Decimal("99999999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


def _py_lcents(d: Decimal) -> int:
    """The contract: HALF_UP away from zero at 2 dp."""
    return int(d.scaleb(2).quantize(Decimal(1), rounding=ROUND_HALF_UP))


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=st.lists(MONEY, min_size=1, max_size=50))
def test_lcents_matches_decimal_half_up(spark, vals):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i long, v double"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", lcents("v").alias("c")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == _py_lcents(v), (v, got[i])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=st.lists(MONEY, min_size=1, max_size=50))
def test_lcents_sum_is_partition_invariant(spark, vals):
    """The whole point of the fixed-point path: the aggregate is the
    same exact integer at ANY parallelism."""
    rows = [(float(v),) for v in vals]
    one = spark.createDataFrame(rows, "v double").coalesce(1)
    many = spark.createDataFrame(rows, "v double").repartition(13)
    s1 = one.agg(F.sum(lcents("v"))).first()[0]
    s2 = many.agg(F.sum(lcents("v"))).first()[0]
    expect = sum(_py_lcents(v) for v in vals)
    assert s1 == s2 == expect
