"""Semantics + plan tests for the third-wave analytics operators
(operators/analytics.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from watermill_kinesis_spark.registry import queries
from watermill_kinesis_spark.sources.tables import load_table


def test_gapfill_grid_is_dense_and_lossless(spark, sf_dir):
    out = queries()["timeseries_gapfill"](spark, sf_dir).cache()
    try:
        n_hours = out.select("hour").distinct().count()
        n_types = out.select("event_type").distinct().count()
        assert out.count() == n_hours * n_types  # dense grid, no holes
        # zero-filled cells exist (the point of gap-filling)...
        assert out.where(F.col("n_events") == 0).count() > 0
        # ...and the filled series still sums to the raw totals
        ev = load_table(spark, sf_dir, "events")
        assert (
            out.agg(F.sum("n_events")).first()[0] == ev.count()
        )
    finally:
        out.unpersist()


def test_anomaly_zscore_flags_are_actual_outliers(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    flagged = queries()["anomaly_zscore"](spark, sf_dir)
    # every flagged value is beyond 2.5 sigma of a float recomputation
    # (loose bound: the operator uses exact 3-sigma arithmetic)
    stats = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(F.avg("value").alias("mu"), F.stddev_pop("value").alias("sd"))
        .collect()
    }
    rows = flagged.collect()
    assert rows, "expected at least one 3-sigma outlier in testdata"
    for r in rows:
        s = stats[r["event_type"]]
        assert abs(r["value"] - s["mu"]) > 2.5 * s["sd"]


def test_anomaly_zscore_no_fact_shuffle(spark, sf_dir):
    """The stats side must broadcast: the events scan feeds the join
    without an Exchange hashpartitioning on the fact side."""
    plan = queries()["anomaly_zscore"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_repetition_ratio_bounds(spark, sf_dir):
    out = queries()["repetition_ratio"](spark, sf_dir)
    bad = out.where(
        (F.col("rep_ratio") < 0)
        | (F.col("rep_ratio") >= 1)
        | (F.col("n_distinct") > F.col("n_tokens"))
    )
    assert bad.count() == 0
    # synthetic docs repeat heavily — the filter family has signal here
    assert out.where(F.col("rep_ratio") > 0.5).count() > 0


def test_ngram_counts_descending_unique(spark, sf_dir):
    rows = queries()["ngram_lm_counts"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert len({r["bigram"] for r in rows}) == len(rows)


def test_domain_mix_weights_form_a_distribution(spark, sf_dir):
    rows = queries()["domain_mix_weights"](spark, sf_dir).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    # weight × share = uniform target for every domain
    for r in rows:
        assert abs(r["mix_weight"] * r["share"] - 1.0 / len(rows)) < 1e-12
