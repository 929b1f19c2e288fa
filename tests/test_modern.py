"""Tests for the Spark-4 modern-surface operators (modern.py)."""

from pyspark.sql import functions as F

from watermill_kinesis_spark.registry import queries
from watermill_kinesis_spark.sources.tables import load_table


def test_variant_shred_matches_raw_columns(spark, sf_dir):
    """The VARIANT round trip must be lossless: aggregates computed
    through parse_json/variant_get equal those from the raw columns."""
    got = {
        r["event_type"]: (r["n"], r["sum_cents"], r["max_k"])
        for r in queries()["variant_shred"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    from watermill_kinesis_spark.functions.exact import lcents

    truth = {
        r["event_type"]: (r["n"], r["s"], r["m"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(lcents("value")).alias("s"),
            F.max(F.get_json_object("props", "$.k").cast("bigint")).alias("m"),
        )
        .collect()
    }
    assert got == truth


def test_hll_sketch_estimates_within_tolerance(spark, sf_dir):
    got = {
        r["event_type"]: (r["n_days"], r["n_users_exact"], r["union_within_bound"])
        for r in queries()["hll_sketch_native"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    days = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct(F.to_date("ts")).alias("d"))
        .collect()
    }
    assert set(got) == set(exact)
    for t, (n_days, n_exact, within) in got.items():
        assert n_days == days[t]
        assert n_exact == exact[t]
        # HLL_4 at default lgK=12 is ~2% rse; the operator's own
        # verdict pins the ±5% envelope (oracle pins verdict = 1)
        assert within == 1
