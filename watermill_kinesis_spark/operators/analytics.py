"""Time-series / corpus analytics, third wave: gap-filled resampling,
z-score anomaly detection, repetition-ratio quality filtering, bigram
language-model counts, and domain mixture weighting.

These extend the hypertable-style event-time surface (gap-fill is the
continuous-aggregate companion to ``rollup_incremental``) and the
LLM-pipeline layer (repetition filtering per Rae et al. "Gopher"
repetition heuristics; domain mix weights are the sampling-ratio table
a corpus-mixing job consumes; bigram counts are the classic count-based
LM / contamination-check primitive).

Same determinism discipline as pipeline2.py: every float that reaches
the oracle hash is either a projection of raw data, an exact-integer
ratio, or derived from exact long fixed-point sums via an expression
written token-for-token identically in the DuckDB oracle (IEEE-754
double ops are deterministic given identical operand order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from watermill_kinesis_spark.functions.exact import lcents, lsum, sql_dsum
from watermill_kinesis_spark.registry import query
from watermill_kinesis_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# gap-filled time-series resample


@query(
    "timeseries_gapfill",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS n, {sql_dsum('value')} AS s
        FROM events GROUP BY 1, 2),
    bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
        FROM events),
    grid AS (
        SELECT g.hour, t.event_type
        FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
              FROM bounds) g
        CROSS JOIN (SELECT DISTINCT event_type FROM events) t)
    SELECT grid.hour, grid.event_type,
           COALESCE(hourly.n, 0) AS n_events,
           COALESCE(hourly.s, 0.0) AS sum_value
    FROM grid LEFT JOIN hourly
      ON grid.hour = hourly.hour AND grid.event_type = hourly.event_type
    """,
    tags=("event-time", "rollup", "gapfill"),
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample — every (hour, event_type) cell of the
    observed time range is present, zero-filled where no events landed
    (the hypertable ``time_bucket_gapfill`` shape; downstream charting
    and forecasting ops need dense series). Scale posture: the raw scan
    aggregates straight down to |hours|x|types| partials; the dense grid
    is generated, not scanned — `sequence` on one bounds row times a
    distinct-types list — so the left join is partials-sized, never
    data-sized, and at 100 TB the only full-data pass is the first
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum(lcents("value")).alias("s_cents"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    grid = hours.crossJoin(F.broadcast(types))
    return (
        grid.join(F.broadcast(hourly), ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(
                F.col("s_cents").cast("double") / F.lit(100.0), F.lit(0.0)
            ).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# z-score anomaly detection

#: |z| threshold for flagging. Exactness bound: value <= ~1e4 so cents^2
#: <= ~1e12; the per-group sum of squares stays below 2^53 (exact as
#: double) up to ~1e3 rows/group at sf0.01 ... ~8e3x more at full scale;
#: beyond that switch s2 to decimal(38,0) — same plan shape.
Z_THRESHOLD = 3.0


@query(
    "anomaly_zscore",
    oracle=f"""
    WITH stats AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s1,
               SUM(CAST(ROUND(value * 100) AS BIGINT)
                   * CAST(ROUND(value * 100) AS BIGINT)) AS s2
        FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE ABS(
        (CAST(ROUND(e.value * 100) AS BIGINT) - CAST(s.s1 AS DOUBLE) / s.n)
        / SQRT(CAST(s.s2 AS DOUBLE) / s.n
               - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n))
    ) > {Z_THRESHOLD}
    """,
    tags=("agg", "anomaly", "event-time"),
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outlier flagging per event_type: events whose
    value sits more than 3 sigma from their group mean. Moments come
    from exact long fixed-point sums (count, sum-cents, sum-cents^2 —
    one map-side-combined pass), so mean/stddev are bit-identical
    across engines and partition orders; the z expression itself is
    written operand-for-operand the same here and in the oracle. The
    tiny stats table broadcasts back onto the fact scan — the 100 TB
    plan is scan + partial agg + broadcast-join filter, no fact
    shuffle. The 3-sigma comparison is safely away from any 1-ulp
    boundary for real data."""
    ev = load_table(spark, sf_dir, "events")
    cents = lcents("value")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s1"),
        F.sum(cents * cents).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    z = (cents - mean) / F.sqrt(var)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > Z_THRESHOLD)
        .select("event_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# repetition-ratio quality filter (Gopher-style repetition heuristic)


@query(
    "repetition_ratio",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS rep_ratio
    FROM documents
    """,
    tags=("text", "quality", "llm-pipeline"),
)
def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token repetition ratio per document — 1 - distinct/total tokens,
    the cheapest of the Gopher repetition family (its siblings swap the
    unit: duplicate lines, duplicate n-grams). High ratios mark
    boilerplate/spam for corpus filtering. Pure JVM array ops on an
    embarrassingly parallel projection: no shuffle at any scale, and
    the ratio is an exact-integer division (deterministic)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        nd.cast("bigint").alias("n_distinct"),
        (F.lit(1.0) - nd.cast("double") / n).alias("rep_ratio"),
    )


# ---------------------------------------------------------------------------
# corpus bigram counts (count-based LM / contamination primitive)

BIGRAM_TOP_N = 50


@query(
    "ngram_lm_counts",
    oracle=f"""
    WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
    idx AS (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i FROM toks),
    bi AS (SELECT w[i] || ' ' || w[i + 1] AS bigram FROM idx)
    SELECT bigram, COUNT(*) AS n
    FROM bi GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT {BIGRAM_TOP_N}
    """,
    tags=("text", "ngram", "llm-pipeline"),
)
def ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram frequency table, top-N — the count table a
    count-based LM, a contamination checker, or a collocation miner
    starts from. Bigrams are generated JVM-side with a higher-order
    transform over token indices (no Python), then one shuffle
    aggregates counts; top-N is a TakeOrdered, ties broken by bigram so
    the result SET is unique. At 100 TB the groupBy benefits from
    map-side partial aggregation; skew on stop-bigrams is absorbed by
    AQE."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(w) >= 2,
        F.expr(
            "transform(sequence(0, size(split(text, ' ')) - 2),"
            " i -> concat(element_at(split(text, ' '), i + 1), ' ',"
            " element_at(split(text, ' '), i + 2)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(BIGRAM_TOP_N)
    )


# ---------------------------------------------------------------------------
# domain mixture weights (corpus-mixing sampling ratios)


@query(
    "domain_mix_weights",
    oracle="""
    SELECT source, n_docs,
           CAST(n_docs AS DOUBLE) / total AS share,
           (1.0 / ndom) / (CAST(n_docs AS DOUBLE) / total) AS mix_weight
    FROM (SELECT source, COUNT(*) AS n_docs,
                 SUM(COUNT(*)) OVER () AS total,
                 COUNT(*) OVER () AS ndom
          FROM documents GROUP BY source)
    """,
    tags=("agg", "sampling", "llm-pipeline"),
)
def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights to rebalance a corpus toward a
    uniform domain mixture: weight = target_share / actual_share, the
    multiplier a mixing job applies when sampling each domain (Pile /
    DoReMi-style static mixture table). One full-data aggregate down to
    |domains| rows; the global total/count come from an unpartitioned
    window over that tiny aggregate (a single-partition exchange of 20
    rows, not data). Ratios are exact-integer divisions written
    identically in the oracle."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = W.partitionBy()
    total = F.sum("n_docs").over(w)
    ndom = F.count(F.lit(1)).over(w)
    share = F.col("n_docs").cast("double") / total
    return per.select(
        "source",
        "n_docs",
        share.alias("share"),
        ((F.lit(1.0) / ndom) / share).alias("mix_weight"),
    )
