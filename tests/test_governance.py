"""Invariant tests for the governance operators (governance.py)."""

from pyspark.sql import functions as F

from watermill_kinesis_spark.operators.governance import KANON_K, RTBF_MOD
from watermill_kinesis_spark.registry import queries
from watermill_kinesis_spark.sources.tables import load_table


def test_rtbf_cascade_counts_are_consistent(spark, sf_dir):
    rows = {r["table_name"]: r for r in queries()["rtbf_cascade_delete"](spark, sf_dir).collect()}
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    for r in rows.values():
        assert 0 <= r["n_deleted"] <= r["n_total"]
    # the cascade legs agree with direct anti-join recomputation
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    forget_orders = o.where(F.col("o_custkey") % RTBF_MOD == 0).select("o_orderkey")
    li_deleted = li.join(forget_orders, li.l_orderkey == forget_orders.o_orderkey).count()
    assert rows["lineitem"]["n_deleted"] == li_deleted
    assert rows["lineitem"]["n_total"] == li.count()
    # erasing then re-auditing would find zero: kept rows contain no
    # forgotten subject
    ev = load_table(spark, sf_dir, "events")
    kept = ev.where(F.col("user_id") % RTBF_MOD != 0)
    assert kept.count() == rows["events"]["n_total"] - rows["events"]["n_deleted"]
    assert kept.where(F.col("user_id") % RTBF_MOD == 0).count() == 0


def test_kanonymity_audit_matches_group_recount(spark, sf_dir):
    row = queries()["kanonymity_audit"](spark, sf_dir).first()
    c = load_table(spark, sf_dir, "customer")
    sizes = [
        r["sz"]
        for r in c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("sz"))
        .collect()
    ]
    assert row["n_groups"] == len(sizes)
    assert row["n_violating_groups"] == sum(1 for s in sizes if s < KANON_K)
    assert row["n_rows_at_risk"] == sum(s for s in sizes if s < KANON_K)
    assert row["min_group_size"] == min(sizes)
