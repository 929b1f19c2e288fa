"""Event-time operators: as-of join and tumbling/sliding/session windows.

These are the batch-verifiable faces of the streaming semantics in
SURVEY.md §2-C (`stream_*` rows run the same logic under Structured
Streaming in ``watermill_kinesis_spark/streaming``). ``events.ts`` plays
the reference's arrival timestamp (marshaller.go:40), upgraded to a real
timestamp column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from watermill_kinesis_spark.functions.exact import dsum, sql_dsum
from watermill_kinesis_spark.registry import query
from watermill_kinesis_spark.sources.tables import load_table


@query(
    "join_asof_events",
    oracle="""
    WITH ranked AS (
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey, o.o_orderdate, o.o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id,
           o_orderkey AS asof_orderkey,
           o_orderdate AS asof_orderdate,
           o_totalprice AS asof_totalprice
    FROM ranked WHERE rn = 1
    """,
    tags=("join", "asof", "event-time"),
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the user's most recent order at or
    before the event time (ties broken by max order key). DuckDB spells
    this ASOF JOIN; Spark lacks a native one.

    Implementation is the scale-correct union-scan pattern, not a range
    join: tag both sides, sort within user by (time, order-before-event),
    and carry the last seen order forward with
    ``last(..., ignorenulls)``. One shuffle on user_id, zero row
    explosion — an interval join would blow up as |orders per user|
    grows, this stays O(n log n) per key."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        "event_id",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("bigint").alias("event_id"),
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
    )
    # Orders sort before events at equal t (is_order DESC) so a same-
    # instant order is visible to the event; among equal-t orders the
    # last row wins ⇒ ascending o_orderkey picks the max key.
    w = (
        W.partitionBy("uid")
        .orderBy(F.col("t").asc(), F.col("is_order").desc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last(
        F.when(
            F.col("is_order") == 1,
            F.struct("o_orderkey", "o_orderdate", "o_totalprice"),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.unionByName(od)
        .withColumn("asof", carried)
        .where(F.col("is_order") == 0)
        .select(
            "event_id",
            F.col("uid").alias("user_id"),
            F.col("asof.o_orderkey").alias("asof_orderkey"),
            F.col("asof.o_orderdate").alias("asof_orderdate"),
            F.col("asof.o_totalprice").alias("asof_totalprice"),
        )
    )


@query(
    "stream_tumbling_window",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "event-time", "streaming-equivalent"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time window (batch face of the streaming
    aggregation; identical code runs under readStream + withWatermark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "stream_sliding_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS window_start,
           COUNT(*) AS n,
           {sql_dsum('value')} AS sum_value
    FROM events
    CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
    GROUP BY 1
    """,
    tags=("window", "event-time", "streaming-equivalent"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 minutes: each event lands in 4
    overlapping windows. Spark expands this internally exactly like the
    oracle's explicit k∈0..3 replication."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "n", "sum_value")
    )


@query(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
    tags=("window", "event-time", "streaming-equivalent"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap
    (``session_window`` in batch; the same expression works on a stream
    with a watermark). Session end = last event + gap, Spark's
    convention; the oracle reproduces it with lag/cumsum
    sessionization."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# interval overlap join (binned range-join strategy)

#: bin width for the overlap join's band replication. Interval spans
#: are ≤ 15 days by construction, so every interval covers at most two
#: 16-day bins — replication factor ≤ 2, bounded by design.
OVERLAP_BIN_DAYS = 16
#: calendar origin for integer day/bin arithmetic
OVERLAP_EPOCH = "1992-01-01"


@query(
    "interval_overlap_join",
    oracle=f"""
    WITH iv AS (
        SELECT l_suppkey,
               l_orderkey * 10 + l_linenumber AS item_key,
               datediff('day', DATE '{OVERLAP_EPOCH}', l_shipdate) AS s,
               datediff('day', DATE '{OVERLAP_EPOCH}', l_shipdate)
                   + (CAST(l_quantity AS INT) % 14) + 1 AS e
        FROM lineitem)
    SELECT a.l_suppkey AS suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs
    FROM iv a JOIN iv b
      ON a.l_suppkey = b.l_suppkey
     AND a.s <= b.e AND b.s <= a.e
     AND a.item_key < b.item_key
    GROUP BY suppkey
    """,
    tags=("join", "range", "event-time"),
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: per supplier, how many pairs of its
    shipments had overlapping in-transit windows ([shipdate, shipdate +
    quantity-derived span]) — the concurrency profile behind capacity
    planning, and the general *overlap join* shape (validity intervals,
    sessions × incidents, reservations × outages) that naive SQL
    evaluates as a quadratic theta-join.

    Scale design — **band replication + overlap-start ownership**:
    each interval explodes to the 16-day (OVERLAP_BIN_DAYS) bins it
    touches (≤2 by construction, so replication is bounded), candidate
    pairs form per (suppkey, bin) with an *equi*-join Catalyst can
    hash-partition, and each true pair is counted exactly once because
    only the bin containing max(a.start, b.start) — the overlap start —
    is allowed to emit it. No distinct, no second dedup shuffle, no
    quadratic blowup beyond each bin's local density. DuckDB evaluates
    the reference theta-join; results must match exactly."""
    from watermill_kinesis_spark.sources.tables import adaptive_partitions

    li = load_table(spark, sf_dir, "lineitem")
    epoch = F.to_date(F.lit(OVERLAP_EPOCH))
    iv = li.select(
        "l_suppkey",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("item_key"),
        F.datediff(F.col("l_shipdate"), epoch).alias("s"),
        (
            F.datediff(F.col("l_shipdate"), epoch)
            + F.col("l_quantity").cast("int") % 14
            + 1
        ).alias("e"),
    ).repartition(
        # fan the pair stage out of the input splits (optimization
        # round 14, guide §2.5): the per-bin pair emission is work AQE
        # and the scan splitter cannot see — the join stage ran as 3
        # tasks (one per lineitem split) with ~0.7 s of CPU each
        adaptive_partitions(spark, sf_dir, "lineitem", expand=2),
        "l_suppkey",
    )
    binned = iv.withColumn(
        "bin",
        F.explode(
            F.sequence(
                (F.col("s") / OVERLAP_BIN_DAYS).cast("int"),
                (F.col("e") / OVERLAP_BIN_DAYS).cast("int"),
            )
        ),
    )
    a, b = binned.alias("a"), binned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
        & (F.col("a.bin") == F.col("b.bin"))
        & (F.col("a.item_key") < F.col("b.item_key"))
        & (F.col("a.s") <= F.col("b.e"))
        & (F.col("b.s") <= F.col("a.e"))
        # overlap-start ownership: only the bin where the overlap
        # begins emits the pair (pairs sharing 2 bins count once)
        & (
            F.col("a.bin")
            == (
                F.greatest(F.col("a.s"), F.col("b.s")) / OVERLAP_BIN_DAYS
            ).cast("int")
        ),
    )
    return pairs.groupBy(F.col("a.l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap_pairs")
    )


@query(
    "session_window_dynamic_gap",
    oracle="""
    WITH iv AS (
        SELECT user_id, ts AS s,
               ts + CASE WHEN event_type = 'click'
                         THEN INTERVAL 10 MINUTE
                         ELSE INTERVAL 30 MINUTE END AS e
        FROM events WHERE user_id < 50),
    ord AS (
        SELECT user_id, s, e,
               CASE WHEN s > MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS brk
        FROM iv),
    isl AS (
        SELECT user_id, s, e,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY s
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM ord)
    SELECT user_id,
           MIN(s) AS session_start,
           MAX(e) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM isl GROUP BY user_id, grp
    """,
    tags=("event-time", "session", "spark4"),
)
def session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows whose inactivity gap is a PER-EVENT expression
    (Spark's dynamic-gap ``session_window``): a click keeps the
    session alive 10 minutes, anything else 30 — the real-world shape
    where engagement signals extend sessions differently. Semantics
    are interval-merge: each event spans [ts, ts+gap(event)) and
    overlapping spans coalesce; the oracle reproduces exactly that
    with a gaps-and-islands running MAX(end). Exact microsecond
    boundaries on both engines — the hash compare covers start, end,
    and counts."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    gap = F.when(F.col("event_type") == "click", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "sliding_distinct_users",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes'
               AS window_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
    GROUP BY 1
    """,
    tags=("window", "event-time", "streaming-equivalent"),
)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-entity sliding windows — the site-traffic / active-user
    dashboard shape: unique users per 1-hour window sliding every 15
    minutes. Each event replicates into its 4 covering windows (the
    sliding-window identity the oracle spells with the k-offset cross
    join) and the per-window COUNT DISTINCT is a two-phase exact
    distinct (partial per partition, merge on the window key) — at
    100 TB this swaps to approx_count_distinct with
    ``hll_accuracy_audit`` certifying the error envelope."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_users", "n_events"
        )
    )
