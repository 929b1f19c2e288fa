"""Pipeline operators, second wave: incremental rollups, PII
redaction, embedding normalization/quantization, and the composite
corpus-cleaning query.

Complements operators/pipeline.py. Same determinism discipline: exact
fixed-point arithmetic for every float aggregate (functions/exact.py
rationale), no RNG, no Python in a hot path unless vectorized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from watermill_kinesis_spark.functions.exact import lcents, lsum, sql_dsum
from watermill_kinesis_spark.registry import query
from watermill_kinesis_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# incremental rollup (hypertable-style continuous aggregate)


@query(
    "rollup_incremental",
    oracle=f"""
    SELECT date_trunc('day', ts) AS day,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value,
           COUNT(DISTINCT user_id) AS n_users_max_hourly
    FROM events
    GROUP BY day
    """,
    tags=("agg", "rollup", "event-time"),
)
def rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style incremental rollup: raw events aggregate to
    HOURLY partials first, and the DAILY level is computed purely from
    those partials (sums of sums, never re-touching raw rows). At
    100 TB this is the continuous-aggregate pattern — the hourly layer
    is what you'd persist, and every coarser rollup (day/week/month) is
    a cheap re-aggregation of |hours|-sized input instead of a rescan.
    Counts and exact-cent sums re-aggregate losslessly; COUNT DISTINCT
    does NOT decompose over partials, so the daily distinct is computed
    against the hourly level's distinct sets (here: exact via the
    two-level groupBy carrying user_id through the hourly key — the
    rows between the two aggregations are |hours|×|users|, already tiny
    relative to raw; the sketch-mergeable alternative is
    approx_count_distinct)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), F.col("user_id")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lcents("value")).alias("sum_cents"),
    )
    return (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"))
        .agg(
            F.sum("n").alias("n_events"),
            lsum(F.col("sum_cents"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users_max_hourly"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\(\d{3}\) \d{3}-\d{4}"


@query(
    "pii_redact",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id,
               text || ' contact ' || source || '.' || CAST(doc_id AS VARCHAR)
                    || '@example.com or (555) 010-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS body
        FROM documents WHERE doc_id < 1000)
    SELECT doc_id,
           regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
           len(regexp_extract_all(body, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(body, '{_PHONE_RE}')) AS n_phones
    FROM raw
    """,
    tags=("pipeline", "text", "pii", "llm-pipeline"),
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the mandatory pre-training redaction pass:
    email- and phone-shaped spans are replaced with typed placeholder
    tokens and per-document redaction counts are emitted for audit.
    The testdata corpus contains no natural PII, so the query first
    plants a synthetic contact line per document (deterministic from
    doc_id) and then redacts it — the redaction logic itself is the
    operator under test. Everything is JVM regexp built-ins:
    partition-local, zero shuffle, linear scan at any scale. The
    patterns avoid backreferences/lookaround so the same regex runs
    identically on java.util.regex and RE2-family engines."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 1000)
    body = F.concat(
        F.col("text"),
        F.lit(" contact "),
        F.col("source"),
        F.lit("."),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or (555) 010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    raw = d.select("doc_id", body.alias("body"))
    return raw.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("body"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
        F.size(F.regexp_extract_all(F.col("body"), F.lit(_EMAIL_RE), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(F.col("body"), F.lit(_PHONE_RE), 0)).alias(
            "n_phones"
        ),
    )


# ---------------------------------------------------------------------------
# embedding normalization + quantization


@query(
    "embedding_normalize",
    oracle="""
    WITH m AS (
        SELECT vec_id,
               CAST(embedding AS DOUBLE[]) AS e,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS micro
        FROM embeddings WHERE vec_id < 500),
    n AS (
        SELECT vec_id, e,
               sqrt(CAST(list_sum(list_transform(micro, u -> u * u)) AS DOUBLE))
                   / 1000000.0 AS l2_norm
        FROM m)
    SELECT vec_id,
           round(l2_norm, 6) AS l2_norm,
           array_to_string(
               list_transform(e, x -> CAST(floor(x / l2_norm * 127.0) AS INT)),
               ',') AS q8
    FROM n
    """,
    tags=("pipeline", "embedding", "quantize", "llm-pipeline"),
)
def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize + int8-quantize an embedding column — the storage
    shrink (4 bytes → 1 byte/dim) every vector corpus applies before
    indexing. The norm is computed from EXACT integer arithmetic:
    components quantize to micro-units (floor(x·1e6) — exact on
    float32-origin doubles), squares sum as bigints (≤ 2^53, so the
    bigint→double conversion is exact), and one sqrt yields the norm —
    bit-identical on any engine and partition order, unlike a naive
    float sum-of-squares whose result depends on addition order. The
    quantized code floor(x/‖x‖·127) then divides exactly-equal doubles.
    Partition-local, zero shuffle, linear at 100 TB; the array HOFs stay
    JVM-side (for BLAS-speed batches see similarity.py's kernels).

    The q8 vector is emitted as a comma-joined STRING, not array<int>:
    the correctness harness canonicalizes by sorting raw pandas rows,
    and a top-level Python-list cell is unhashable there — a scalar
    column carries the same information and is hashable everywhere."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 500)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    micro = F.transform(F.col("e"), lambda x: F.floor(x * 1000000.0).cast("bigint"))
    sumsq = F.aggregate(
        F.transform(micro, lambda u: u * u), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    norm = F.sqrt(sumsq.cast("double")) / F.lit(1000000.0)
    n = e.select("vec_id", "e", norm.alias("l2_norm"))
    q8 = F.transform(
        F.col("e"), lambda x: F.floor(x / F.col("l2_norm") * 127.0).cast("int")
    )
    return n.select(
        "vec_id",
        F.round("l2_norm", 6).alias("l2_norm"),
        F.array_join(q8.cast("array<string>"), ",").alias("q8"),
    )


# ---------------------------------------------------------------------------
# composite corpus-cleaning pipeline


@query(
    "quality_filter_pipeline",
    oracle="""
    WITH staged AS (
        SELECT source, lang, n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_uniq,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g')) AS norm_text
        FROM documents),
    flagged AS (
        SELECT source, norm_text,
               (lang = 'en' AND n_tokens BETWEEN 10 AND 1000
                AND n_uniq * 10 >= n_tokens * 3) AS pass
        FROM staged)
    SELECT source,
           COUNT(*) AS n_input,
           COUNT(*) FILTER (pass) AS n_pass_filters,
           COUNT(DISTINCT norm_text) FILTER (pass) AS n_after_dedup
    FROM flagged
    GROUP BY source
    """,
    tags=("pipeline", "quality", "dedup", "llm-pipeline"),
)
def quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite corpus-cleaning funnel in ONE pass: language
    filter → length gate → lexical-diversity gate (unique-token ratio
    ≥ 0.3, the classic gopher-style repetition screen) → exact dedup on
    normalized text, reported as per-source survival counts. Expressed
    as conditional aggregates over a single scan, so the full funnel
    costs one shuffle (the groupBy) no matter how many stages — the
    shape to preserve at 100 TB, where each stage as a separate
    materialized pass would re-read the corpus. The diversity ratio
    compares n_uniq·10 ≥ n_tokens·3 in INTEGER space — no float
    division anywhere, so engines can't disagree on the boundary."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    staged = d.select(
        "source",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        norm.alias("norm_text"),
    )
    passes = (
        (F.col("lang") == "en")
        & F.col("n_tokens").between(10, 1000)
        & (F.col("n_uniq") * 10 >= F.col("n_tokens") * 3)
    )
    flagged = staged.select("source", "norm_text", passes.alias("pass"))
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_input"),
        F.count(F.when(F.col("pass"), 1)).alias("n_pass_filters"),
        F.countDistinct(F.when(F.col("pass"), F.col("norm_text"))).alias(
            "n_after_dedup"
        ),
    )


# ---------------------------------------------------------------------------
# embedding distribution drift (reference vs candidate corpus halves)

#: report the top-N drifted dimensions
DRIFT_TOP_DIMS = 8


@query(
    "embedding_drift_dims",
    oracle=f"""
    WITH m AS (
        SELECT vec_id, vec_id % 2 = 0 AS is_ref,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS micro
        FROM embeddings),
    d AS (
        SELECT CAST(r.dim AS INT) AS dim, is_ref, micro[CAST(r.dim AS INT)] AS val
        FROM m, unnest(range(1, len(micro) + 1)) AS r(dim)),
    s AS (
        SELECT dim,
               CAST(SUM(CASE WHEN is_ref THEN val END) AS BIGINT) AS s_ref,
               CAST(SUM(CASE WHEN NOT is_ref THEN val END) AS BIGINT) AS s_cand,
               CAST(COUNT(CASE WHEN is_ref THEN 1 END) AS BIGINT) AS n_ref,
               CAST(COUNT(CASE WHEN NOT is_ref THEN 1 END) AS BIGINT) AS n_cand
        FROM d GROUP BY dim),
    r AS (
        SELECT dim, n_ref, n_cand, s_ref, s_cand,
               CAST(n_cand * s_ref - n_ref * s_cand AS DOUBLE)
                   / (CAST(n_ref AS DOUBLE) * CAST(n_cand AS DOUBLE) * 1000000.0)
                   AS mean_diff,
               ROW_NUMBER() OVER (
                   ORDER BY abs(n_cand * s_ref - n_ref * s_cand) DESC, dim)
                   AS drift_rank
        FROM s)
    SELECT dim, n_ref, n_cand, s_ref, s_cand, mean_diff,
           CAST(drift_rank AS INT) AS drift_rank
    FROM r WHERE drift_rank <= {DRIFT_TOP_DIMS}
    """,
    tags=("pipeline", "embedding", "monitoring", "llm-pipeline"),
)
def embedding_drift_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: per-dimension mean shift
    between a reference corpus half and a candidate half (here: even
    vs odd vec_id — in production, last month's index vs this week's
    ingest), reporting the top-8 (DRIFT_TOP_DIMS) drifted dimensions.
    Per-dim mean difference IS the linear-kernel MMD witness function —
    the standard cheap drift alarm before re-training an index or a
    router.

    Exactness: components quantize to micro-units (floor(x·1e6), the
    embedding_normalize pattern) so per-dim sums are exact BIGINTs, and
    the ranking key |n_cand·s_ref − n_ref·s_cand| is an exact integer —
    no float comparison anywhere until the single closed-form division
    that renders the human-readable mean_diff. One explode + one
    (dim)-keyed aggregate: at 100 TB the shuffle is |dims| cells, and
    the window runs over a constant |dims|-row table."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("vec_id") % 2 == 0).alias("is_ref"),
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>),"
            " x -> CAST(floor(x * 1000000.0) AS BIGINT))"
        ).alias("micro"),
    )
    d = e.select(
        "is_ref", F.posexplode("micro").alias("dim0", "val")
    ).select((F.col("dim0") + 1).cast("int").alias("dim"), "is_ref", "val")
    s = d.groupBy("dim").agg(
        F.sum(F.when(F.col("is_ref"), F.col("val"))).cast("bigint").alias("s_ref"),
        F.sum(F.when(~F.col("is_ref"), F.col("val"))).cast("bigint").alias("s_cand"),
        F.count(F.when(F.col("is_ref"), 1)).cast("bigint").alias("n_ref"),
        F.count(F.when(~F.col("is_ref"), 1)).cast("bigint").alias("n_cand"),
    )
    from pyspark.sql import Window as W

    key = F.abs(F.col("n_cand") * F.col("s_ref") - F.col("n_ref") * F.col("s_cand"))
    r = s.withColumn(
        "drift_rank",
        F.row_number()
        .over(W.orderBy(key.desc(), F.asc("dim")))
        .cast("int"),
    )
    return r.where(F.col("drift_rank") <= DRIFT_TOP_DIMS).select(
        "dim",
        "n_ref",
        "n_cand",
        "s_ref",
        "s_cand",
        F.expr(
            "CAST(n_cand * s_ref - n_ref * s_cand AS DOUBLE)"
            " / (CAST(n_ref AS DOUBLE) * CAST(n_cand AS DOUBLE) * 1000000.0)"
        ).alias("mean_diff"),
        "drift_rank",
    )
