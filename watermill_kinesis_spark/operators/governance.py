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

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from watermill_kinesis_spark.functions.localrel import local_relation
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


#: distinct-sensitive-value floor for the l-diversity release gate
LDIV_L = 3


@query(
    "l_diversity_audit",
    oracle=f"""
    WITH groups AS (
        SELECT c_nationkey,
               CAST(FLOOR(c_acctbal / {KANON_BAL_BAND}) AS BIGINT) AS bal_band,
               COUNT(*) AS sz,
               COUNT(DISTINCT c_mktsegment) AS n_sens
        FROM customer GROUP BY 1, 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(COUNT_IF(n_sens < {LDIV_L}) AS BIGINT) AS n_violating_groups,
           CAST(SUM(CASE WHEN n_sens < {LDIV_L} THEN sz ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk,
           CAST(MIN(n_sens) AS BIGINT) AS min_distinct_sensitive
    FROM groups
    """,
    tags=("governance", "agg", "llm-pipeline"),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's stronger sibling
    (Machanavajjhala et al. 2007): a QI group whose rows all share one
    sensitive value leaks that value even when the group is large, so
    the release gate also requires ≥ l DISTINCT sensitive values per
    quasi-identifier combination (here QI = (nation, coarsened balance
    band), sensitive = market segment). Same single-scan shape as
    ``kanonymity_audit``: one map-side-combined aggregate to
    |QI-combos| rows carrying (size, distinct-sensitive), one tiny
    summary — the distinct count rides the same shuffle because the
    sensitive attribute is part of the aggregate, not the key."""
    c = load_table(spark, sf_dir, "customer")
    groups = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / KANON_BAL_BAND)
        .cast("bigint")
        .alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("sz"),
        F.countDistinct("c_mktsegment").alias("n_sens"),
    )
    low = F.col("n_sens") < LDIV_L
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.count_if(low).alias("n_violating_groups"),
        F.sum(F.when(low, F.col("sz")).otherwise(F.lit(0))).alias(
            "n_rows_at_risk"
        ),
        F.min("n_sens").alias("min_distinct_sensitive"),
    )


#: t-closeness threshold, in permille of variational distance
TCLOSE_T_MILLE = 200


@query(
    "t_closeness_audit",
    oracle=f"""
    WITH cnt AS (
        SELECT c_nationkey,
               CAST(FLOOR(c_acctbal / {KANON_BAL_BAND}) AS BIGINT) AS bal_band,
               c_mktsegment AS seg, COUNT(*) AS g
        FROM customer GROUP BY 1, 2, 3),
    gl AS (SELECT c_mktsegment AS seg, COUNT(*) AS gn FROM customer GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM customer),
    per AS (
        SELECT cnt.c_nationkey, cnt.bal_band, cnt.g, gl.gn, tot.n,
               SUM(cnt.g) OVER (PARTITION BY cnt.c_nationkey, cnt.bal_band)
                   AS sz
        FROM cnt JOIN gl USING (seg) CROSS JOIN tot),
    qi AS (
        SELECT c_nationkey, bal_band, MAX(sz) AS sz, MAX(n) AS n,
               SUM(ABS(g * n - gn * sz) - gn * sz) + MAX(sz) * MAX(n) AS num
        FROM per GROUP BY 1, 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(COUNT_IF(num * 1000 > 2 * {TCLOSE_T_MILLE} * sz * n)
                AS BIGINT) AS n_violating_groups,
           CAST(SUM(CASE WHEN num * 1000 > 2 * {TCLOSE_T_MILLE} * sz * n
                         THEN sz ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
           CAST(MAX(CAST(1000 * num AS BIGINT) // CAST(2 * sz * n AS BIGINT))
                AS BIGINT) AS max_dist_permille
    FROM qi
    """,
    tags=("governance", "agg", "llm-pipeline"),
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the release-gate ladder
    (Li, Li & Venkatasubramanian 2007, ICDE): l-diversity is fooled by
    a group whose sensitive values are distinct but SKEWED relative to
    the corpus (e.g. 90% one segment where the corpus holds 20%), so
    the gate bounds each QI group's sensitive-value distribution to
    within t of the GLOBAL distribution. The sensitive attribute here
    (market segment) is nominal, so the distance is the variational
    distance ½·Σ|p_i − q_i| — an exact rational: the audit compares
    num = Σ_i |g_i·N − G_i·sz| (absent segments contribute G_i·sz,
    folded in closed form as sz·N − Σ_present G_i·sz so only PRESENT
    (group, segment) rows are ever materialized) against 2·t·sz·N by
    integer cross-multiplication — no float division anywhere, the
    ``rank_biased_overlap_exact`` discipline. Bigint bound: the largest
    product is num·1000 ≤ 2000·sz·N ≤ 2000·N², which stays inside
    int64 while N ≲ 6.8·10⁷ rows if one QI group dominates (sz ≈ N);
    beyond that lift the comparison to decimal(38,0) ↔ HUGEINT
    (exact to ~10¹⁷ rows).

    Plan: one map-side-combined aggregate to |QI×segment| rows, a
    broadcast join against the |segments| global table, a window sum
    over the (QI) partition (≤ |segments| rows per partition — NOT the
    raw-row enum-window shape), and a tiny summary. Single corpus scan
    at any scale, same as its two siblings."""
    c = load_table(spark, sf_dir, "customer")
    qi_cols = [
        F.col("c_nationkey"),
        F.floor(F.col("c_acctbal") / KANON_BAL_BAND)
        .cast("bigint")
        .alias("bal_band"),
    ]
    cnt = c.groupBy(*qi_cols, F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("g")
    )
    gl = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("gn")
    )
    tot = c.agg(F.count(F.lit(1)).alias("n"))
    szw = W.partitionBy("c_nationkey", "bal_band")
    per = (
        cnt.join(F.broadcast(gl), "seg")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            "bal_band",
            "g",
            "gn",
            "n",
            F.sum("g").over(szw).alias("sz"),
        )
    )
    num = (
        F.sum(
            F.abs(F.col("g") * F.col("n") - F.col("gn") * F.col("sz"))
            - F.col("gn") * F.col("sz")
        )
        + F.max("sz") * F.max("n")
    ).alias("num")
    qi = per.groupBy("c_nationkey", "bal_band").agg(
        F.max("sz").alias("sz"), F.max("n").alias("n"), num
    )
    viol = F.col("num") * 1000 > 2 * TCLOSE_T_MILLE * F.col("sz") * F.col("n")
    dist = F.expr("CAST(1000 * num AS BIGINT) div CAST(2 * sz * n AS BIGINT)")
    return qi.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.count_if(viol).alias("n_violating_groups"),
        F.sum(F.when(viol, F.col("sz")).otherwise(F.lit(0))).alias(
            "n_rows_at_risk"
        ),
        F.max(dist).cast("bigint").alias("max_dist_permille"),
    )


#: per-type retention policies (days kept, relative to the corpus's
#: own max event time — a fixed "now" would rot with the testdata)
TTL_POLICY = {
    "click": 7,
    "view": 7,
    "signup": 90,
    "purchase": 90,
    "error": 14,
}


@query(
    "ttl_retention_sweep",
    oracle=f"""
    WITH now_ AS (SELECT MAX(ts) AS now FROM events),
    policy(event_type, keep_days) AS (
        VALUES {", ".join(f"('{k}', {v})" for k, v in sorted(TTL_POLICY.items()))}),
    tagged AS (
        SELECT e.event_type, p.keep_days,
               CASE WHEN e.ts < (SELECT now FROM now_)
                             - to_days(p.keep_days) THEN 1 ELSE 0 END
                   AS expired
        FROM events e JOIN policy p USING (event_type))
    SELECT event_type,
           CAST(keep_days AS BIGINT) AS keep_days,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(expired) AS BIGINT) AS n_expired,
           CAST(SUM(1 - expired) AS BIGINT) AS n_retained,
           CAST(SUM(expired) * 1000 // COUNT(*) AS BIGINT)
               AS expired_permille
    FROM tagged GROUP BY event_type, keep_days
    """,
    tags=("governance", "retention"),
)
def ttl_retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy (TTL) sweep: per event type, how many rows
    fall outside the policy's keep-window — the dry-run report a
    governance job emits before the actual expiry DELETE (pair of
    ``rtbf_cascade_delete``: that one erases by SUBJECT, this one by
    AGE). The policy ships as a broadcast literal table; "now" is the
    corpus's own max timestamp so the report is deterministic; the
    sweep itself is one scan + map-side-combinable aggregate — at
    100 TB the real deletion would push these predicates down as
    partition drops, which is why the report groups by the partition
    key a time-partitioned table would use."""
    ev = load_table(spark, sf_dir, "events")
    now = ev.agg(F.max("ts")).first()[0]
    policy = local_relation(spark, 
        sorted(TTL_POLICY.items()), "event_type string, keep_days int"
    )
    tagged = (
        ev.join(F.broadcast(policy), "event_type")
        .select(
            "event_type",
            "keep_days",
            # lit(now) must stay NTZ: a bare datetime literal is
            # interpreted through the DRIVER's local timezone while the
            # NTZ column goes through the session tz — on a non-UTC
            # host the expiry boundary would shift by the UTC offset
            # and diverge from the oracle (r6 review, reproduced under
            # TZ=America/New_York)
            F.when(
                F.col("ts")
                < F.lit(now).cast("timestamp_ntz")
                - F.col("keep_days") * F.expr("INTERVAL 1 DAY"),
                1,
            )
            .otherwise(0)
            .alias("expired"),
        )
    )
    return (
        tagged.groupBy("event_type", F.col("keep_days").cast("bigint").alias("keep_days"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("expired").cast("bigint").alias("n_expired"),
            F.sum(F.lit(1) - F.col("expired")).cast("bigint").alias("n_retained"),
        )
        .selectExpr(
            "event_type",
            "keep_days",
            "n_rows",
            "n_expired",
            "n_retained",
            "CAST((n_expired * 1000) div n_rows AS BIGINT) AS expired_permille",
        )
    )
