"""Data-governance operators: right-to-be-forgotten cascade deletion
and k-anonymity auditing.

A 100 TB training-data platform owes these to its compliance pipeline:
erasure requests must propagate through every table that references a
subject (directly or transitively), and quasi-identifier combinations
must be checked for re-identification risk before a corpus ships. Both
are pure relational plans — anti-joins and aggregates — so they scale
exactly like the joins they are built from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from watermill_kinesis_spark.registry import query
from watermill_kinesis_spark.sources.tables import load_table

#: deterministic stand-in for the erasure request list: every customer
#: key divisible by 37 has asked to be forgotten
RTBF_MOD = 37


@query(
    "rtbf_cascade_delete",
    oracle=f"""
    WITH forget AS (SELECT c_custkey AS k FROM customer
                    WHERE c_custkey % {RTBF_MOD} = 0)
    SELECT * FROM (
        SELECT 'customer' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(COUNT_IF(c_custkey % {RTBF_MOD} = 0) AS BIGINT) AS n_deleted
        FROM customer
        UNION ALL
        SELECT 'orders',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT_IF(o_custkey % {RTBF_MOD} = 0) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'lineitem',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT_IF(o_custkey % {RTBF_MOD} = 0) AS BIGINT)
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        UNION ALL
        SELECT 'events',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT_IF(user_id % {RTBF_MOD} = 0) AS BIGINT)
        FROM events)
    """,
    tags=("governance", "join", "llm-pipeline"),
)
def rtbf_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade: given an erasure list (here the
    deterministic mod-37 (RTBF_MOD) subset of customers), report what a
    deletion pass would remove from every table that references the
    subject — directly (customer, orders, events) or transitively
    (lineitem has no customer key; its deletions propagate through the
    orders join). The engine expresses each leg as an aggregate over a
    membership predicate / key join, so the real deletion is the same
    plan with an anti-join writer. At 100 TB the forget-list is tiny ⇒
    broadcast; the lineitem leg is the standard fact-through-dimension
    cascade with no extra shuffle beyond the join itself."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def leg(df: DataFrame, name: str, cond) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(cond).alias("n_deleted"),
        ).select("table_name", "n_total", "n_deleted")

    li_o = li.join(o, li.l_orderkey == o.o_orderkey)
    return (
        leg(c, "customer", F.col("c_custkey") % RTBF_MOD == 0)
        .unionAll(leg(o, "orders", F.col("o_custkey") % RTBF_MOD == 0))
        .unionAll(leg(li_o, "lineitem", F.col("o_custkey") % RTBF_MOD == 0))
        .unionAll(leg(ev, "events", F.col("user_id") % RTBF_MOD == 0))
    )


#: k-anonymity threshold and the account-balance coarsening width
KANON_K = 5
KANON_BAL_BAND = 1000


@query(
    "kanonymity_audit",
    oracle=f"""
    WITH groups AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / {KANON_BAL_BAND}) AS BIGINT) AS bal_band,
               COUNT(*) AS sz
        FROM customer GROUP BY 1, 2, 3)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(COUNT_IF(sz < {KANON_K}) AS BIGINT) AS n_violating_groups,
           CAST(SUM(CASE WHEN sz < {KANON_K} THEN sz ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk,
           CAST(MIN(sz) AS BIGINT) AS min_group_size
    FROM groups
    """,
    tags=("governance", "agg", "llm-pipeline"),
)
def kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation,
    market segment, coarsened balance band): a released dataset is
    k-anonymous iff every QI combination covers ≥ k rows; groups below
    k are re-identification risks that must be suppressed or coarsened
    further. One map-side-combined aggregate to |QI-combos| rows, one
    tiny summary aggregate — the audit costs a single scan at any
    scale, which is why it belongs in the release gate rather than a
    sampled offline check."""
    c = load_table(spark, sf_dir, "customer")
    groups = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / KANON_BAL_BAND).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("sz"))
    small = F.col("sz") < KANON_K
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.count_if(small).alias("n_violating_groups"),
        F.sum(F.when(small, F.col("sz")).otherwise(F.lit(0))).alias(
            "n_rows_at_risk"
        ),
        F.min("sz").alias("min_group_size"),
    )
