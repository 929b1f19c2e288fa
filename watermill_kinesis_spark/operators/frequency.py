"""Frequency analytics wave: corpus heavy hitters, weight-proportional
deterministic sampling, mergeable histogram quantile sketches, and an
inverted index build.

These fill the frequency/statistics family of the LLM-pipeline layer:
heavy hitters drive vocabulary pruning and boilerplate detection,
weighted sampling implements size-proportional corpus subsampling,
histogram sketches are the mergeable percentile primitive a rollup
store keeps per bucket (the quantile companion to
``sketch_distinct_mergeable``), and the inverted index is the retrieval
/ contamination-lookup structure built over the corpus.

Determinism discipline (same as analytics.py): every value that reaches
the oracle hash is integer arithmetic, an md5-derived integer, or a
double produced by the identical IEEE-754 expression on both engines —
no RNG, no float accumulation order dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from watermill_kinesis_spark.functions.localrel import local_relation
from watermill_kinesis_spark.registry import query
from watermill_kinesis_spark.sources.tables import load_table

TOP_TOKENS = 20

#: weighted sampling: 24-bit hash uniform vs n_chars capped at W_MAX
W_MAX = 600

#: histogram sketch: fixed bin width over events.value (range ~[0, 500])
BIN_WIDTH = 5.0


# ---------------------------------------------------------------------------
# corpus heavy hitters


@query(
    "heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
    freq AS (
        SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        FROM toks GROUP BY token)
    SELECT token, tf, df
    FROM freq
    ORDER BY tf DESC, token
    LIMIT {TOP_TOKENS}
    """,
    tags=("text", "frequency", "llm-pipeline"),
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most frequent tokens corpus-wide with term and document
    frequency — the vocabulary/boilerplate heavy-hitter report.

    Scale posture: explode → groupBy(token) partial-aggregates map-side
    (each task emits its local token counts, ≤ |vocab| rows), so the
    shuffle carries vocabulary-sized data, not corpus-sized; the final
    top-k is a TakeOrdered over |vocab| rows, never a global sort of
    the corpus. At 100 TB the exact pass stays viable because Zipf
    vocabularies are tiny relative to token streams; if vocabulary
    itself exploded (e.g. byte n-grams) this pivots to a space-saving
    sketch per partition merged driver-side — same contract, bounded
    state.
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    )
    freq = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    return freq.orderBy(F.col("tf").desc(), "token").limit(TOP_TOKENS)


# ---------------------------------------------------------------------------
# weight-proportional deterministic sampling


@query(
    "sample_weighted",
    oracle=f"""
    SELECT doc_id, n_chars,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
               AS draw
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
              * {W_MAX}
          < LEAST(n_chars, {W_MAX}) * 16777216
    """,
    tags=("pipeline", "sampling", "llm-pipeline"),
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling without RNG: accept a document iff
    its md5-derived 24-bit uniform draw falls under ``n_chars / W_MAX``
    — longer documents are kept proportionally more often (the
    size-proportional subsample a token-budgeted corpus build uses).

    The acceptance test is pure integer arithmetic
    (``draw·W_MAX < weight·2^24``) so it is exact, reproducible across
    engines/cluster sizes, and — critically at scale — safe under task
    retries, unlike ``rand()`` sampling which resamples on retry. The
    predicate is a codegen'd per-row filter on the scan: no shuffle, no
    state, embarrassingly parallel at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    draw = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    weight = F.least(F.col("n_chars"), F.lit(W_MAX))
    return (
        d.select("doc_id", "n_chars", draw.alias("draw"))
        .where(F.col("draw") * W_MAX < weight * (1 << 24))
    )


# ---------------------------------------------------------------------------
# mergeable histogram quantile sketch


@query(
    "quantile_sketch_mergeable",
    oracle=f"""
    WITH hourly AS (        -- per-hour sketches: (hour, bin) -> count
        SELECT date_trunc('hour', ts) AS hour,
               CAST(floor(value / {BIN_WIDTH}) AS INT) AS bin,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2),
    daily AS (              -- sketch MERGE = re-key to day, sum bins
        SELECT date_trunc('day', hour) AS day, bin,
               SUM(n) AS n
        FROM hourly GROUP BY 1, 2),
    cum AS (
        SELECT day, bin, n,
               SUM(n) OVER (PARTITION BY day ORDER BY bin) AS cum_n,
               SUM(n) OVER (PARTITION BY day) AS total_n
        FROM daily)
    SELECT day,
           MIN(CASE WHEN cum_n * 100 >= total_n * 50 THEN (bin + 1) * {BIN_WIDTH} END)
               AS p50_ub,
           MIN(CASE WHEN cum_n * 100 >= total_n * 90 THEN (bin + 1) * {BIN_WIDTH} END)
               AS p90_ub,
           MIN(CASE WHEN cum_n * 100 >= total_n * 99 THEN (bin + 1) * {BIN_WIDTH} END)
               AS p99_ub
    FROM cum GROUP BY day
    """,
    tags=("event-time", "sketch", "rollup"),
)
def quantile_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram quantile sketch with the mergeability contract: hourly
    fixed-bin histograms of ``events.value`` are the stored sketches;
    merging a day is binwise addition (associative, loss-free — unlike
    re-sketching raw data); daily p50/p90/p99 are read off the merged
    CDF as bin upper bounds. Error is bounded by BIN_WIDTH by
    construction.

    This is the percentile companion to ``sketch_distinct_mergeable``
    and the shape a continuous-aggregate store keeps: sketch size is
    O(range/width) per bucket regardless of row count, so at 100 TB the
    rollup tree (hour→day→month) touches kilobytes per merge, never raw
    data. Quantile extraction is integer-only (``cum·100 ≥ total·p``) —
    bit-identical on every engine.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.floor(F.col("value") / BIN_WIDTH).cast("int").alias("bin"),
        )
        .groupBy("hour", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    daily = (
        hourly.groupBy(
            F.date_trunc("day", F.col("hour")).alias("day"), F.col("bin")
        )
        .agg(F.sum("n").alias("n"))
    )
    wb = W.partitionBy("day").orderBy("bin")
    wd = W.partitionBy("day")
    cum = daily.select(
        "day",
        "bin",
        F.sum("n").over(wb).alias("cum_n"),
        F.sum("n").over(wd).alias("total_n"),
    )

    def pct(p: int, name: str):
        hit = F.when(
            F.col("cum_n") * 100 >= F.col("total_n") * p,
            (F.col("bin") + 1) * F.lit(BIN_WIDTH),
        )
        return F.min(hit).alias(name)

    return cum.groupBy("day").agg(pct(50, "p50_ub"), pct(90, "p90_ub"), pct(99, "p99_ub"))


# ---------------------------------------------------------------------------
# inverted index


@query(
    "inverted_index",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT token, doc_id FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents))
    SELECT token, COUNT(*) AS doc_freq,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM pairs
    GROUP BY token
    HAVING COUNT(*) >= 25
    """,
    tags=("text", "index", "llm-pipeline"),
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: token → document frequency + sorted
    posting list (doc ids, comma-joined), for tokens above a df
    threshold — the retrieval / decontamination-lookup structure.

    Scale posture: distinct (token, doc_id) pairs partial-aggregate
    map-side before the one shuffle on token; posting lists are built
    with ``collect_list`` AFTER the distinct, so each group holds ids,
    not text. At 100 TB posting lists for stopword-class tokens exceed
    single-row limits — production caps postings per row and chains
    overflow rows (same key, segment number); the df threshold here
    models the head/tail split that decides which tokens get segmented.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token"), "doc_id"
    ).distinct()
    return (
        pairs.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .where(F.col("doc_freq") >= 25)
    )


# ---------------------------------------------------------------------------
# BM25 ranking components

#: the standing query whose hits are scored
BM25_TERMS = ("table", "spark", "window")
#: BM25 shape parameters (k1, b) baked into the shared expression text
_BM25_TFNORM = (
    "CAST(tf AS DOUBLE) * (1.2 + 1.0)"
    " / (CAST(tf AS DOUBLE)"
    " + 1.2 * (1.0 - 0.75 + 0.75"
    " * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(total_dl AS DOUBLE))))"
)
_BM25_IDF = (
    "(CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)"
    " / (CAST(df AS DOUBLE) + 0.5)"
)


@query(
    "bm25_components",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    dls AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dls),
    tfs AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks
        WHERE term IN {BM25_TERMS!r} GROUP BY 1, 2),
    dfs AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tfs GROUP BY term)
    SELECT term, doc_id, CAST(tf AS BIGINT) AS tf, CAST(dl AS BIGINT) AS dl,
           CAST(df AS BIGINT) AS df,
           {_BM25_TFNORM} AS tf_norm,
           {_BM25_IDF} AS idf_rational
    FROM tfs JOIN dls USING (doc_id) JOIN dfs USING (term) CROSS JOIN corpus
    """,
    tags=("text", "ranking", "llm-pipeline"),
)
def bm25_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking components for a standing query: per (term, doc)
    term frequency, document length, document frequency, the
    length-normalized tf term (k1=1.2, b=0.75), and the idf rational
    (log-free — ln is the one libm call whose low bits differ across
    engines, so the engine exposes the exact rational and leaves the
    monotone log to the caller; ranking order is unaffected). One
    corpus scan builds tf/dl; df and the corpus scalars are tiny
    aggregates broadcast back — no float crosses rows, every division
    is shared expression text, so the components are bit-identical on
    both engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tfs = (
        toks.where(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dls = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    corpus = dls.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    dfs = tfs.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    joined = (
        tfs.join(dls, "doc_id")
        .join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(corpus))
    )
    return joined.select(
        "term",
        "doc_id",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("dl").cast("bigint").alias("dl"),
        F.col("df").cast("bigint").alias("df"),
        F.expr(_BM25_TFNORM).alias("tf_norm"),
        F.expr(_BM25_IDF).alias("idf_rational"),
    )


# ---------------------------------------------------------------------------
# mergeable MinHash signatures (the distributed-sketch algebra, exact)

#: 16 affine hash functions h_j(x) = (a_j·x + b_j) mod P over a
#: Mersenne prime — a_j < 2^31 and x < 2^31 keep every product inside
#: int64 in both engines, so the signature arithmetic is exact and
#: engine-portable (no xxhash dialect dependence)
MINHASH_P = 2_305_843_009_213_693_951  # 2^61 - 1
MINHASH_PARAMS = tuple(
    (j, 1_103_515_245 * (j + 1) % 2_147_483_647, 12_345 + 7_919 * j)
    for j in range(16)
)


@query(
    "minhash_signature_merge",
    oracle=f"""
    WITH params(j, a, b) AS (
        SELECT * FROM (VALUES {", ".join(f"({j}, {a}, {b})" for j, a, b in MINHASH_PARAMS)})),
    hashes AS (
        SELECT d.source, p.j,
               (p.a * d.doc_id + p.b) % {MINHASH_P} AS h
        FROM documents d CROSS JOIN params p)
    SELECT source, j AS hash_idx,
           CAST(MIN(h) AS BIGINT) AS sig_direct,
           CAST(MIN(h) AS BIGINT) AS sig_merged
    FROM hashes GROUP BY source, j
    """,
    tags=("sketch", "dedup", "llm-pipeline"),
)
def minhash_signature_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures are MERGEABLE — ``sig(A ∪ B) =
    elementwise_min(sig(A), sig(B))`` — which is the whole reason
    banded-LSH dedup scales: at 100 TB each partition computes partial
    signatures with map-side combine and one tiny merge produces the
    corpus signature; no data moves twice. This operator computes each
    per-source signature through BOTH routes — ``sig_direct`` in one
    groupBy, ``sig_merged`` by first reducing per (source, lang)
    sub-corpora and then min-merging the partials — and the oracle pins
    both to the exact signature values (affine hashes over a Mersenne
    prime, pure int64). Equality of the two columns IS the merge
    law, value-checked per (source, hash_idx)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    params = local_relation(spark, 
        list(MINHASH_PARAMS), "j int, a long, b long"
    )
    hashes = d.crossJoin(F.broadcast(params)).select(
        "source",
        "lang",
        F.col("j").alias("hash_idx"),
        ((F.col("a") * F.col("doc_id") + F.col("b")) % F.lit(MINHASH_P)).alias("h"),
    )
    direct = hashes.groupBy("source", "hash_idx").agg(
        F.min("h").cast("bigint").alias("sig_direct")
    )
    partials = hashes.groupBy("source", "lang", "hash_idx").agg(
        F.min("h").alias("partial_sig")
    )
    merged = partials.groupBy("source", "hash_idx").agg(
        F.min("partial_sig").cast("bigint").alias("sig_merged")
    )
    return direct.join(merged, ["source", "hash_idx"])


# ---------------------------------------------------------------------------
# approximate-quantile accuracy audit

#: relative-error budget handed to approx_percentile: the KLL/GK-style
#: sketch guarantees rank error ≤ ACCURACY⁻¹ of n
APPROX_Q_ACC = 100


@query(
    "approx_quantile_audit",
    oracle="""
    WITH q AS (
        SELECT quantile_disc(value, [0.10, 0.25, 0.50, 0.75, 0.90, 0.99]) AS qs
        FROM events)
    SELECT p.pct, CAST(qs[p.i] AS DOUBLE) AS exact_value,
           1 AS approx_within_bound
    FROM q, (VALUES (10, 1), (25, 2), (50, 3),
                    (75, 4), (90, 5), (99, 6)) p(pct, i)
    """,
    tags=("sketch", "statistics"),
)
def approx_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accuracy-audit pattern every sketch deployment needs: run
    the APPROXIMATE quantile (``approx_percentile``, the mergeable
    one-pass sketch you'd use at 100 TB) next to the exact quantile
    (discrete, one sort — affordable at audit scale) and emit whether
    the sketch landed within its guaranteed rank-error budget
    (±n/ACCURACY ranks). The oracle pins the exact values AND pins
    ``approx_within_bound`` to 1 — so a Spark upgrade that silently
    degrades the sketch, or an accuracy misconfiguration, turns the
    row red. The approx value itself never crosses the compare (it is
    engine-specific by construction); the audit VERDICT does.

    The exact order statistic is computed WITHOUT a global
    single-partition sort (the naive ``row_number() OVER (ORDER BY
    value)`` funnels the whole relation through one task): the data is
    range-partitioned and sorted in parallel, global rank =
    per-partition local rank + the broadcast prefix-offset of the
    partition — the textbook distributed selection, O(n log n) work at
    full parallelism."""
    ev = load_table(spark, sf_dir, "events").select("value")
    pcts = [10, 25, 50, 75, 90, 99]
    n = ev.count()
    approx = ev.agg(
        F.percentile_approx(
            "value", [p / 100 for p in pcts], APPROX_Q_ACC
        ).alias("aq")
    ).collect()[0].aq
    rows = []
    for p, av in zip(pcts, approx):
        # rank window the sketch promises: target rank ± n/accuracy
        target = int(p / 100 * n)
        lo, hi = target - n // APPROX_Q_ACC - 1, target + n // APPROX_Q_ACC + 1
        rows.append((p, float(av), lo, hi))
    audit = local_relation(spark, 
        rows, "pct int, approx_value double, lo long, hi long"
    )
    # the approx value's actual rank under ties is an INTERVAL
    # [count(<av)+1, count(<=av)] — a point check against count(<=av)
    # false-alarms whenever the quantile lands inside a heavy tie
    # mass (r13 fixture-suite find: a constant-valued corpus put
    # count(<=av)=n while the sketch was exactly right). The sketch
    # is within budget iff its rank interval OVERLAPS [lo, hi].
    le_counts = (
        ev.crossJoin(F.broadcast(audit))
        .groupBy("pct", "lo", "hi")
        .agg(
            F.sum(
                F.when(F.col("value") < F.col("approx_value"), 1).otherwise(0)
            ).alias("rank_lo_m1"),
            F.sum(
                F.when(F.col("value") <= F.col("approx_value"), 1).otherwise(0)
            ).alias("rank_hi"),
        )
    )
    # distributed exact selection: parallel range-partitioned sort +
    # per-partition local ranks + broadcast prefix offsets
    # localCheckpoint pins ONE materialization: range boundaries come
    # from sampling, so deriving sizes and ranks from separate
    # evaluations could see different partitionings
    parted = (
        ev.repartitionByRange(32, "value")
        .sortWithinPartitions("value")
        .select("value", F.spark_partition_id().alias("pid"))
        .localCheckpoint()
    )
    w_local = W.partitionBy("pid").orderBy("value")
    local = parted.select(
        "value", "pid", F.row_number().over(w_local).alias("lrk")
    )
    sizes = {
        r.pid: r.c
        for r in parted.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off = local_relation(spark, offsets, "pid int, off long")
    ranked = local.join(F.broadcast(off), "pid").select(
        "value", (F.col("off") + F.col("lrk")).alias("rk")
    )
    exact = (
        ranked.crossJoin(F.broadcast(audit.select("pct")))
        .where(
            # DuckDB quantile_disc's discrete index: floor(q·(n−1)) + 1
            F.col("rk")
            == F.floor(F.col("pct") / F.lit(100.0) * F.lit(n - 1)).cast("long") + 1
        )
        .select("pct", F.col("value").alias("exact_value"))
    )
    return (
        exact.join(le_counts, "pct")
        .select(
            "pct",
            "exact_value",
            F.when(
                (F.col("rank_lo_m1") + 1 <= F.col("hi"))
                & (F.col("rank_hi") >= F.col("lo")),
                1,
            )
            .otherwise(0)
            .alias("approx_within_bound"),
        )
    )


@query(
    "hll_accuracy_audit",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_exact,
           1 AS hll_within_bound
    FROM events GROUP BY event_type
    """,
    tags=("sketch", "statistics"),
)
def hll_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog accuracy audit, same pattern as
    ``approx_quantile_audit``: the native DataSketches HLL estimate
    (the mergeable structure you'd HLL-union across 100 TB of
    partitions) runs next to the exact COUNT DISTINCT, and the row
    carries the VERDICT — estimate within ±5% (or ±1 for tiny
    groups) — which the oracle pins to 1 alongside the exact counts.
    The engine-specific estimate never crosses the compare; its
    correctness envelope does."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_distinct_exact"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
    )
    slack = F.greatest(F.lit(1.0), F.col("n_distinct_exact") * F.lit(0.05))
    return agg.select(
        "event_type",
        "n_distinct_exact",
        F.when(
            F.abs(F.col("est") - F.col("n_distinct_exact")) <= slack, 1
        )
        .otherwise(0)
        .alias("hll_within_bound"),
    )


#: Count-Min parameters: over-estimate bounded by eps·N with
#: probability ≥ confidence; seed fixed ⇒ deterministic sketch
CMS_EPS = 0.005
CMS_CONFIDENCE = 0.99
CMS_SEED = 42


@query(
    "count_min_accuracy_audit",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS true_count,
           1 AS cms_within_bound
    FROM events WHERE user_id < 30 GROUP BY user_id
    """,
    tags=("sketch", "statistics"),
)
def count_min_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch audit: build the sketch distributed (one
    mergeable aggregate over the full stream — KB-sized at any corpus
    scale), then check its two-sided guarantee per audited key:
    never UNDER the true count, and over by at most eps·N. The oracle
    pins the true counts and the verdict; the sketch's estimates stay
    engine-side. The audited key set is a bounded filter (30 keys) so
    the driver-side estimate probing is constant work."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select("user_id")
    cms_bytes = bytes(
        keyed.agg(
            F.count_min_sketch(
                "user_id", F.lit(CMS_EPS), F.lit(CMS_CONFIDENCE), F.lit(CMS_SEED)
            ).alias("s")
        ).collect()[0].s
    )
    sketch = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        cms_bytes
    )
    total = keyed.count()
    est_rows = [(uid, int(sketch.estimateCount(uid))) for uid in range(30)]
    est = local_relation(spark, est_rows, "user_id long, est long")
    true = (
        keyed.where(F.col("user_id") < 30)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    slack = int(CMS_EPS * total) + 1
    return true.join(F.broadcast(est), "user_id").select(
        "user_id",
        "true_count",
        F.when(
            (F.col("est") >= F.col("true_count"))
            & (F.col("est") <= F.col("true_count") + F.lit(slack)),
            1,
        )
        .otherwise(0)
        .alias("cms_within_bound"),
    )


#: GK summary accuracy for the audit: rank error ≤ n/accuracy
APPROX_PCT_ACCURACY = 1000
#: audited percentiles (integer percent, exact-integer target ranks)
APPROX_PCT_PERCENTS = (50, 99)


@query(
    "approx_percentile_rank_audit",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           1 AS p50_within_guarantee,
           1 AS p99_within_guarantee
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
    tags=("sketch", "statistics", "audit"),
)
def approx_percentile_rank_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald–Khanna percentile-sketch audit (the
    ``hll_merge_accuracy_audit`` pattern for Spark's built-in
    ``approx_percentile``): the sketch's contract is a RANK guarantee —
    the returned value's exact rank sits within n/accuracy of the
    target rank — so the audit computes, per group, the exact rank
    interval each returned value occupies ([#strictly-below + 1,
    #at-or-below]) and pins the verdict that the interval is within
    the budget of ⌈p·n⌉ (integer ceiling; +1 cushion absorbs the
    target-rank convention). Approximate values stay engine-side; the
    oracle pins exact group counts and both verdicts. This is the
    distributed-percentile scale path: GK summaries are mergeable
    partial aggregates (one shuffle of KB-sized sketches, never a
    sort), the exact-rank confirm is two COUNT aggregates on a second
    scan — cheap enough to run as a release gate beside the sketch."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    pcts = ", ".join(f"{p / 100}" for p in APPROX_PCT_PERCENTS)
    approx = ev.groupBy("event_type").agg(
        F.expr(
            f"approx_percentile(value, array({pcts}), {APPROX_PCT_ACCURACY})"
        ).alias("ap")
    )
    probed = ev.join(F.broadcast(approx), "event_type")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, p in enumerate(APPROX_PCT_PERCENTS):
        v = F.element_at(F.col("ap"), i + 1)
        aggs += [
            F.count_if(F.col("value") < v).alias(f"lt_{p}"),
            F.count_if(F.col("value") <= v).alias(f"le_{p}"),
        ]
    counted = probed.groupBy("event_type").agg(*aggs)
    out_cols = [F.col("event_type"), F.col("n_rows")]
    n = F.col("n_rows")
    slack = F.expr(f"n_rows div {APPROX_PCT_ACCURACY}") + 1
    for p in APPROX_PCT_PERCENTS:
        target = F.expr(f"({p} * n_rows + 99) div 100")  # ceil(p%·n)
        lo = F.col(f"lt_{p}") + 1  # lowest exact rank the value holds
        hi = F.col(f"le_{p}")  # highest exact rank the value holds
        d = (
            F.when((lo <= target) & (target <= hi), F.lit(0))
            .when(lo > target, lo - target)
            .otherwise(target - hi)
        )
        out_cols.append(
            (d <= slack).cast("int").alias(f"p{p}_within_guarantee")
        )
    return counted.select(*out_cols)


#: Misra-Gries frequent-items audit: counter budget. Deliberately
#: SMALLER than this corpus' 31-token vocabulary so the sketch really
#: sketches — some tokens survive with a decremented counter, others
#: are absent, and BOTH branches of the guarantee get exercised.
MG_K = 16


def _mg_merge(agg: dict, other: dict, k: int) -> dict:
    """Pairwise Misra-Gries summary merge (Agarwal, Cormode, Huang,
    Phillips, Wei, Yi 2012, "Mergeable Summaries", Thm 1): sum matching
    counters, then subtract the (k+1)-th largest value and drop
    non-positives. Sequential folding keeps the TOTAL error at
    n/(k+1) — the same bound as a single-stream MG(k) — which is why
    the driver folds partition summaries one at a time instead of
    summing them all and cutting once (the all-at-once cut only
    guarantees 2n/(k+1))."""
    for tok, c in other.items():
        agg[tok] = agg.get(tok, 0) + c
    if len(agg) > k:
        d = sorted(agg.values(), reverse=True)[k]
        agg = {t: c - d for t, c in agg.items() if c - d > 0}
    return agg


@query(
    "heavy_hitters_audit",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS tf, 1 AS mg_within_bound
    FROM toks GROUP BY token
    """,
    tags=("sketch", "frequency", "audit", "llm-pipeline"),
)
def heavy_hitters_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries frequent-items audit — the frequent-items face of
    the mergeable-sketch family, beside the exact ``heavy_hitters``
    (VERDICT r8 task 7, the ``approx_quantile_audit`` pattern): a
    bounded-memory MG(k=16) summary is built DISTRIBUTED — each task
    folds its partition's exact per-batch counts into ≤k counters
    (per-batch ``value_counts`` is an error-free summary, so every
    fold step is a mergeable-summaries merge, keeping the cumulative
    bound tight) — then the ≤k-row partition summaries are folded
    driver-side with the same pairwise rule (bounded ⊙: P·k rows; at
    extreme partition counts the same rule tree-merges executor-side).

    The audited guarantee is MG's two-sided deterministic contract for
    EVERY token: ``est ≤ tf`` and ``tf − est ≤ n/(k+1)`` with
    ``est = 0`` for absent tokens — checked via exact integer
    cross-multiplication ``(tf − est)·(k+1) ≤ n``, no float division.
    The oracle pins the exact term frequencies and the verdict to 1;
    the engine-specific sketch estimates (which legitimately vary with
    partitioning) never cross the compare. A broken decrement/merge
    step overcounts or strands mass and turns rows red. On this
    corpus the vocabulary (31) exceeds k (16), so runs genuinely
    exercise both the absent-token and the decremented-counter branch
    of the bound."""
    import pandas as pd

    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .select("token", F.spark_partition_id().alias("pid"))
    )

    def mg_partition(batches):
        counters: dict[str, int] = {}
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["pid"].iloc[0])
            vc = pdf["token"].value_counts()
            counters = _mg_merge(
                counters, {t: int(c) for t, c in vc.items()}, MG_K
            )
        if pid is None:
            return
        yield pd.DataFrame(
            {
                "pid": pid,
                "token": list(counters),
                "cnt": list(counters.values()),
            }
        )

    summary_rows = toks.mapInPandas(
        mg_partition, "pid int, token string, cnt long"
    ).collect()
    per_part: dict[int, dict[str, int]] = {}
    for r in summary_rows:
        per_part.setdefault(r.pid, {})[r.token] = r.cnt
    merged: dict[str, int] = {}
    for pid in sorted(per_part):
        merged = _mg_merge(merged, per_part[pid], MG_K)
    est_df = local_relation(spark, 
        sorted(merged.items()) or [("", 0)], "token string, est long"
    )
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    tot = exact.agg(F.sum("tf").alias("n_tot"))
    est = F.coalesce(F.col("est"), F.lit(0))
    return (
        exact.join(F.broadcast(est_df), "token", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            (
                (est <= F.col("tf"))
                & ((F.col("tf") - est) * (MG_K + 1) <= F.col("n_tot"))
            )
            .cast("int")
            .alias("mg_within_bound"),
        )
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch: mergeable distinct-counting with set algebra

#: KMV size: k minimum hash values per sketch. Standard error of the
#: distinct estimate ≈ 1/√(k−2) ≈ 6.3% at 256; the audit bounds below
#: allow ~4σ.
KMV_K = 256

#: sign-bit rotation: unsigned 64-bit order == signed order of
#: (h XOR 2^63), so sketches sort/merge as plain BIGINTs and only the
#: final estimate expression shifts back to unsigned space (in
#: DECIMAL(38,0), where 2^64 fits comfortably)
_KMV_ROT = -(2**63)

#: shared estimate expression over a sorted rotated-key array column
#: `ks` (smallest-k unsigned hashes): if the sketch holds FEWER than k
#: values it IS the exact distinct set; otherwise the classic KMV
#: estimator (k−1)·2^64/(u_k+1) with u_k the k-th smallest unsigned
#: hash. Emitted ×1000 as an exact integer (truncating div; quotient
#: ≤ 1000·|universe seen| — int64-safe at any corpus).
def _kmv_est_x1000(ks: str, k: int = KMV_K) -> str:
    u_k = (
        f"CAST(element_at({ks}, {k}) AS DECIMAL(38,0))"
        f" + {2**63} + 1"
    )
    return (
        f"CASE WHEN size({ks}) < {k}"
        f"     THEN CAST(size({ks}) AS BIGINT) * 1000"
        f"     ELSE CAST(CAST({1000 * (k - 1)} AS DECIMAL(38,0))"
        f"               * {2**64} div ({u_k}) AS BIGINT) END"
    )


def _kmv_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, x, y) — the DISTINCT per-source token-bigram relation
    both the sketches and the exact audit legs are built over. Bigrams
    rather than unigrams deliberately: this corpus' unigram vocabulary
    (31) is far below any useful sketch size, so a unigram KMV would
    only ever exercise the exact-set branch; the bigram universe
    crosses k at sf0.01 and stays under it at sf0.001, so BOTH
    estimator branches run under the oracle gate across the standard
    scales."""
    from watermill_kinesis_spark.functions.textexpr import bigram_structs

    from watermill_kinesis_spark.sources.tables import adaptive_partitions

    return (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("source").isNotNull())
        # repartition before the bigram explode (optimization round 13):
        # the explode otherwise runs inside the single-split scan task
        # (profiled ~0.6 s serial per consumer); text bytes shuffle
        # once, the map-side distinct then uses every core.
        # Geometry-derived count (optimization round 14, VERDICT r13
        # task 1): expand=7 centers the measured sweep optimum
        # (tools/tune_fanout.py best-of-4 at sf0.1: 4→0.648 s,
        # 8→0.631, 16→0.647, 32→0.725 on kmv_distinct_audit)
        .repartition(
            adaptive_partitions(spark, sf_dir, "documents", expand=7),
            "doc_id",
        )
        .select("source", F.split("text", " ").alias("w"))
        .select("source", F.explode(bigram_structs("w")).alias("b"))
        .select("source", F.col("b.x").alias("x"), F.col("b.y").alias("y"))
        .distinct()
    )


def _kmv_sketches(
    spark: SparkSession, sf_dir: str, bi: DataFrame | None = None
) -> DataFrame:
    """(source, ks) — per-source KMV sketch over the DISTINCT bigram
    relation: ks is the ascending array of the ≤k smallest rotated
    bigram hashes. Built mergeable-summaries style (the
    ``heavy_hitters_audit`` shape): each task folds its partition into
    a ≤k-value summary per source with a numpy partial k-min (bounded
    memory no matter the vocabulary), and the final merge is one JVM
    aggregate over the bounded (tasks × k)-row summary relation —
    collect_set dedups, array_sort restores unsigned order, slice
    keeps k. No vocabulary-sized state ever concentrates anywhere."""
    import numpy as np
    import pandas as pd

    bi = _kmv_bigrams(spark, sf_dir) if bi is None else bi
    hashed = bi.select(
        "source",
        F.xxhash64("x", "y").bitwiseXOR(F.lit(_KMV_ROT)).alias("h"),
    )

    def kmin_partition(batches):
        acc: dict[str, np.ndarray] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for src, grp in pdf.groupby("source", sort=False):
                h = grp["h"].to_numpy(dtype=np.int64)
                prev = acc.get(src)
                allh = np.unique(h if prev is None else np.concatenate([prev, h]))
                acc[src] = allh[: KMV_K]  # unique() sorts ascending
        for src, h in acc.items():
            yield pd.DataFrame({"source": src, "h": h})

    partial = hashed.mapInPandas(kmin_partition, "source string, h long")
    return partial.groupBy("source").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, KMV_K).alias("ks")
    )


#: shared DuckDB CTE: the distinct per-source bigram relation
_KMV_BI_CTE = """
    WITH toks AS (
        SELECT source, string_split(text, ' ') AS w FROM documents
        WHERE text IS NOT NULL AND source IS NOT NULL),
    idx AS (SELECT source, w, unnest(generate_series(1, len(w) - 1)) AS i
            FROM toks),
    bi AS (SELECT DISTINCT source, w[i] AS x, w[i + 1] AS y FROM idx)
"""


@query(
    "kmv_distinct_audit",
    oracle=_KMV_BI_CTE
    + """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct_exact,
           1 AS kmv_within_bound
    FROM bi GROUP BY source
    """,
    tags=("sketch", "frequency", "audit", "llm-pipeline"),
)
def kmv_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count audit — the ORDER-STATISTIC
    member of the mergeable-sketch family (HLL counts leading zeros,
    KMV keeps the k smallest hashes; keeping VALUES is what buys the
    set algebra audited by ``theta_sketch_pair_audit``). The sketch is
    built distributed with bounded memory (numpy partial k-min per
    task, one bounded JVM merge — see ``_kmv_sketches``) and its
    estimate (k−1)·2^64/u_k is exact integer arithmetic in
    DECIMAL(38,0), ×1000. The audit pins |est − exact| ≤
    0.25·exact + 3 (≈4σ at k=256) per source; the oracle pins the
    exact distinct counts and the verdict — the hash-dependent
    estimate itself never crosses the compare (the
    ``hll_accuracy_audit`` convention). A sketch smaller than k IS
    the exact set, and the shared CASE pins est = size exactly, so
    small sources audit at zero slack... within the same bound."""
    # ONE materialization of the distinct-bigram relation feeds both
    # the sketch and the exact leg (optimization round 13): the two
    # legs otherwise re-plan the full scan→explode→distinct pipeline
    # each. localCheckpoint runs inside the timed region on every
    # invocation — a within-query intermediate, not a cross-run cache.
    bi = _kmv_bigrams(spark, sf_dir).localCheckpoint()
    sk = _kmv_sketches(spark, sf_dir, bi=bi).select(
        "source", F.expr(_kmv_est_x1000("ks")).alias("est_x1000")
    )
    exact = bi.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_exact")
    )
    return exact.join(F.broadcast(sk), "source").select(
        "source",
        "n_distinct_exact",
        (
            F.abs(F.col("est_x1000") - 1000 * F.col("n_distinct_exact"))
            <= 250 * F.col("n_distinct_exact") + 3000
        )
        .cast("int")
        .alias("kmv_within_bound"),
    )


@query(
    "theta_sketch_pair_audit",
    oracle=_KMV_BI_CTE
    + """,
    sz AS (SELECT source, COUNT(*) AS v FROM bi GROUP BY source),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
        FROM bi a JOIN bi b
          ON a.x = b.x AND a.y = b.y AND a.source < b.source
        GROUP BY 1, 2),
    pairs AS (
        SELECT sa.source AS src_a, sb.source AS src_b,
               sa.v AS v_a, sb.v AS v_b
        FROM sz sa JOIN sz sb ON sa.source < sb.source)
    SELECT p.src_a, p.src_b,
           CAST(p.v_a + p.v_b - COALESCE(i.n_inter, 0) AS BIGINT)
               AS exact_union,
           CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS exact_inter,
           1 AS union_within_bound,
           1 AS inter_within_bound
    FROM pairs p LEFT JOIN inter i
      ON p.src_a = i.src_a AND p.src_b = i.src_b
    """,
    tags=("sketch", "frequency", "audit", "llm-pipeline"),
)
def theta_sketch_pair_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra audit: the reason KMV keeps hash
    VALUES — two per-source sketches support UNION (k smallest of the
    merged value set — again a valid KMV sketch) and INTERSECTION (the
    theta estimator: ρ/k of the union's candidates present in both
    sketches, scaled by the union estimate) with NO second corpus
    pass. This is how 100 TB pipelines answer "how much vocabulary do
    sources A and B share?" for every pair at once from 20 KB of
    state. Per pair, both estimates are audited against exactly
    recomputed union/intersection sizes: union within 0.25·exact + 3
    (a union sketch is just KMV), intersection within
    0.15·exact_union + 3 ABSOLUTE in the union (the theta error is
    additive in the union, not relative in the intersection — tiny
    overlaps cannot be estimated to relative precision, and the bound
    says so honestly). Oracle pins exact sizes and both verdicts.

    Plan: sketches come from the shared bounded-memory build; the
    pair stage is a |sources|²-row crossJoin of KB arrays (array_union
    /array_intersect/slice — pure JVM); the exact legs reuse the
    ``vocab_jaccard_sources`` shape — ONE distinct over
    (source, token), a shuffle_hash-pinned vocab self-join (the
    corpus-dictionary class must never broadcast), a complete pair
    frame via the bounded size table so zero-overlap pairs audit as
    exact 0, not missing rows."""
    # one materialization of the distinct-bigram relation for all three
    # consumers (sketches, sizes, exact-intersection self-join) — see
    # kmv_distinct_audit; the self-join's two sides also read the same
    # checkpointed RDD instead of re-planning the corpus pipeline
    bi = _kmv_bigrams(spark, sf_dir).localCheckpoint()
    sk = _kmv_sketches(spark, sf_dir, bi=bi)
    a = sk.select(F.col("source").alias("src_a"), F.col("ks").alias("ks_a"))
    b = sk.select(F.col("source").alias("src_b"), F.col("ks").alias("ks_b"))
    pairs_sk = (
        a.crossJoin(b)
        .where(F.col("src_a") < F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            F.slice(
                F.array_sort(F.array_union("ks_a", "ks_b")), 1, KMV_K
            ).alias("ks"),
            F.col("ks_a").alias("ks_a"),
            F.col("ks_b").alias("ks_b"),
        )
        .select(
            "src_a",
            "src_b",
            F.expr(_kmv_est_x1000("ks")).alias("union_est_x1000"),
            F.size(
                F.array_intersect(F.array_intersect("ks", "ks_a"), "ks_b")
            ).alias("rho"),
            F.size("ks").alias("k_used"),
        )
        .select(
            "src_a",
            "src_b",
            "union_est_x1000",
            F.expr(
                "CAST(CAST(rho AS BIGINT) * union_est_x1000"
                " div k_used AS BIGINT)"
            ).alias("inter_est_x1000"),
        )
    )
    st = bi
    sz = st.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    sa, sb = st.alias("a"), st.alias("b")
    inter = (
        sa.join(sb.hint("shuffle_hash"), ["x", "y"])
        .where(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sz.select(F.col("source").alias("src_a"), F.col("v").alias("v_a"))
    zb = sz.select(F.col("source").alias("src_b"), F.col("v").alias("v_b"))
    pairs = za.crossJoin(zb).where(F.col("src_a") < F.col("src_b"))
    exact = (
        pairs.join(inter, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            (
                F.col("v_a") + F.col("v_b") - F.coalesce("n_inter", F.lit(0))
            )
            .cast("bigint")
            .alias("exact_union"),
            F.coalesce("n_inter", F.lit(0)).cast("bigint").alias("exact_inter"),
        )
    )
    return exact.join(F.broadcast(pairs_sk), ["src_a", "src_b"]).select(
        "src_a",
        "src_b",
        "exact_union",
        "exact_inter",
        (
            F.abs(F.col("union_est_x1000") - 1000 * F.col("exact_union"))
            <= 250 * F.col("exact_union") + 3000
        )
        .cast("int")
        .alias("union_within_bound"),
        (
            F.abs(F.col("inter_est_x1000") - 1000 * F.col("exact_inter"))
            <= 150 * F.col("exact_union") + 3000
        )
        .cast("int")
        .alias("inter_within_bound"),
    )


# ---------------------------------------------------------------------------
# Lincoln-Petersen / Chapman capture-recapture distinct estimation


@query(
    "lincoln_petersen_distinct",
    oracle="""
    WITH c1 AS (SELECT DISTINCT text FROM documents
                WHERE text IS NOT NULL AND doc_id % 2 = 0),
    c2 AS (SELECT DISTINCT text FROM documents
           WHERE text IS NOT NULL AND doc_id % 3 = 0),
    m AS (SELECT COUNT(*) AS m FROM c1 JOIN c2 USING (text)),
    tot AS (SELECT COUNT(DISTINCT text) AS n_exact FROM documents
            WHERE text IS NOT NULL)
    SELECT CAST((SELECT COUNT(*) FROM c1) AS BIGINT) AS n1,
           CAST((SELECT COUNT(*) FROM c2) AS BIGINT) AS n2,
           CAST(m.m AS BIGINT) AS n_recaptured,
           CAST((CAST((SELECT COUNT(*) FROM c1) AS HUGEINT) + 1)
                * ((SELECT COUNT(*) FROM c2) + 1) * 1000 // (m.m + 1)
                - 1000 AS BIGINT) AS chapman_est_x1000,
           CAST(tot.n_exact AS BIGINT) AS n_distinct_exact
    FROM m CROSS JOIN tot
    """,
    tags=("sketch", "frequency", "dedup", "llm-pipeline"),
)
def lincoln_petersen_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture estimation of the distinct-text population —
    the ecology estimator (Lincoln-Petersen, with Chapman's +1 bias
    correction) applied to corpus QA: when the full distinct count is
    too expensive to recompute on every ingest, two cheap overlapping
    samples (here the deterministic doc_id mod-2 and mod-3 marks,
    jointly hitting mod-6 — the independence the estimator assumes)
    give N̂ = (n₁+1)(n₂+1)/(m+1) − 1 from three bounded DISTINCT
    aggregates. Everything is exact integer arithmetic — the estimate
    is emitted ×1000 via one non-negative truncating division (m+1 ≥
    1 always, Chapman's whole point) — and the exact population rides
    along, so the row itself shows the estimator's accuracy; unlike
    the hash-based KMV audit this op is deterministic end-to-end and
    the ESTIMATE crosses the oracle compare, not just a verdict flag.

    Plan: three map-side-combinable distinct aggregates over one scan
    lineage (the two capture samples are doc_id-mod filters pushed to
    the scan); the recapture join is distinct-text-keyed —
    corpus-derived, so at scale it shuffles (never broadcasts) — and
    every output is a scalar."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    c1 = d.where(F.col("doc_id") % 2 == 0).select("text").distinct()
    c2 = d.where(F.col("doc_id") % 3 == 0).select("text").distinct()
    m = c1.join(c2.hint("shuffle_hash"), "text").agg(
        F.count(F.lit(1)).alias("m")
    )
    n1 = c1.agg(F.count(F.lit(1)).alias("n1"))
    n2 = c2.agg(F.count(F.lit(1)).alias("n2"))
    tot = d.select("text").distinct().agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return (
        m.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "CAST(n1 AS BIGINT) AS n1",
            "CAST(n2 AS BIGINT) AS n2",
            "CAST(m AS BIGINT) AS n_recaptured",
            "CAST((CAST(n1 AS DECIMAL(38,0)) + 1) * (n2 + 1) * 1000"
            " div (m + 1) - 1000 AS BIGINT) AS chapman_est_x1000",
            "CAST(n_exact AS BIGINT) AS n_distinct_exact",
        )
    )
