"""Retrieval-quality metrics over the embedding corpus — the
evaluation loop that sits on top of the similarity family: given the
exact cosine top-k (``similarity_topk``, the family's oracle-green
baseline), score it against ground-truth labels with the standard
ranking metrics (precision@k, recall@k, reciprocal rank).

A label match (``embeddings.label``) is the relevance judgment — the
usual proxy when explicit query relevance sets don't exist at corpus
scale. Everything that reaches the oracle hash is integer: counts,
ranks, permille quotients via truncating integer division (Spark
``div`` / DuckDB ``//``), and reciprocal ranks in exact lcm(1..k)
scaling — no float crosses the compare.

100 TB posture: the ranked top-k is |queries|·k rows (independent of
corpus size); metric computation broadcasts it against the label
table, so the only corpus-scale work is the scan inside
``similarity_topk`` itself, which is already batch-local-top-k shaped
(rows moved O(k·batches)). The label-count side is one
map-side-combinable aggregate to |labels| rows.

Reference parity note: the reference (a Go Kinesis Pub/Sub connector)
has no retrieval surface; this family belongs to the driver-mandated
LLM-pipeline layer (SURVEY.md §2-C "beyond-reference operators").
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from watermill_kinesis_spark.functions.localrel import local_relation
from watermill_kinesis_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    similarity_topk,
)
from watermill_kinesis_spark.registry import query
from watermill_kinesis_spark.sources.tables import load_table

#: lcm(1..TOP_K): scales every reciprocal rank 1/r (r ≤ TOP_K) to an
#: exact integer, so MRR numerators never touch floats
RR_SCALE = math.lcm(*range(1, TOP_K + 1))

#: the exact-top-k CTE shared with similarity_topk's oracle, extended
#: with the query's and neighbor's labels
_RANKED_ORACLE_CTE = f"""
    WITH q AS (SELECT vec_id AS query_id, label AS q_label,
                      CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, q.q_label, e.vec_id AS neighbor_id,
               e.label AS n_label,
               list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[]))
                   AS score
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id <> q.query_id),
    ranked AS (
        SELECT query_id, q_label, neighbor_id, n_label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS rank
        FROM scored)
"""


def _ranked_with_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, q_label, neighbor_id, n_label, rank): the exact
    top-k with both sides' relevance labels attached. The ranked set
    is |queries|·k rows — broadcast it; the label lookup then runs as
    a broadcast-hash join on the (big-at-scale) embeddings table with
    zero shuffle."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    ranked = similarity_topk(spark, sf_dir)
    q_labels = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    return (
        e.join(
            F.broadcast(ranked), e.vec_id == ranked.neighbor_id
        )
        .select("query_id", "neighbor_id", F.col("label").alias("n_label"), "rank")
        .join(F.broadcast(q_labels), "query_id")
    )


@query(
    "precision_recall_at_k",
    oracle=_RANKED_ORACLE_CTE
    + f""",
    rel AS (
        SELECT query_id,
               CAST(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_relevant_topk
        FROM ranked WHERE rank <= {TOP_K} GROUP BY query_id),
    corpus AS (
        SELECT q.query_id,
               CAST(COUNT(*) AS BIGINT) AS n_relevant_corpus
        FROM q JOIN embeddings e
          ON e.label = q.q_label AND e.vec_id <> q.query_id
        GROUP BY q.query_id)
    SELECT r.query_id,
           CAST({TOP_K} AS BIGINT) AS k,
           r.n_relevant_topk,
           coalesce(c.n_relevant_corpus, 0) AS n_relevant_corpus,
           1000 * r.n_relevant_topk // {TOP_K} AS precision_permille,
           1000 * r.n_relevant_topk
               // greatest(coalesce(c.n_relevant_corpus, 0), 1)
               AS recall_permille
    FROM rel r LEFT JOIN corpus c ON r.query_id = c.query_id
    """,
    tags=("retrieval", "evaluation", "similarity", "llm-pipeline"),
)
def precision_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@k and recall@k of the exact cosine top-k against
    label-match relevance — the standard retrieval scorecard (and the
    quality ceiling every ANN face is audited against: ANN recall ≤
    exact retrieval's label precision). Permille quotients use
    truncating integer division on both engines; the recall
    denominator (same-label corpus size excluding self) comes from one
    broadcast-joined aggregate."""
    r = _ranked_with_labels(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    q_labels = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    corpus = (
        e.join(
            F.broadcast(q_labels),
            (e.label == q_labels.q_label) & (e.vec_id != q_labels.query_id),
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_relevant_corpus"))
    )
    rel = (
        r.where(F.col("rank") <= TOP_K)
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_relevant_topk")
        )
    )
    # LEFT join + coalesce 0: a query whose label is unique in the
    # corpus has an EMPTY relevant set, not a missing row (the oracle
    # mirrors this exactly)
    return (
        rel.join(corpus, "query_id", "left")
        .withColumn(
            "n_relevant_corpus",
            F.coalesce(F.col("n_relevant_corpus"), F.lit(0)).cast("bigint"),
        )
        .select(
            "query_id",
            F.lit(TOP_K).cast("bigint").alias("k"),
            "n_relevant_topk",
            "n_relevant_corpus",
            F.expr(f"1000 * n_relevant_topk div {TOP_K}L").alias(
                "precision_permille"
            ),
            F.expr(
                "1000 * n_relevant_topk div greatest(n_relevant_corpus, 1L)"
            ).alias("recall_permille"),
        )
    )


@query(
    "mrr_at_k_exact",
    oracle=_RANKED_ORACLE_CTE
    + f"""
    SELECT query_id,
           CAST(coalesce(MIN(CASE WHEN n_label = q_label THEN rank END), 0)
                AS BIGINT) AS first_relevant_rank,
           CAST(coalesce({RR_SCALE}
                    // MIN(CASE WHEN n_label = q_label THEN rank END), 0)
                AS BIGINT) AS rr_scaled_{RR_SCALE}
    FROM ranked WHERE rank <= {TOP_K}
    GROUP BY query_id
    """,
    tags=("retrieval", "evaluation", "similarity", "llm-pipeline"),
)
def mrr_at_k_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the first relevant neighbor within the exact
    top-k, per query — summing ``rr_scaled`` / (queries · RR_SCALE)
    gives MRR@k. Reciprocal ranks are scaled by lcm(1..k) so every
    1/r is an exact integer: the whole metric is integer arithmetic,
    immune to float-accumulation order on either engine. Queries with
    no relevant neighbor in the top-k pin rank 0 / contribution 0
    explicitly rather than dropping the row."""
    r = _ranked_with_labels(spark, sf_dir)
    first = (
        r.where(F.col("rank") <= TOP_K)
        .groupBy("query_id")
        .agg(
            F.min(
                F.when(F.col("n_label") == F.col("q_label"), F.col("rank"))
            ).alias("fr")
        )
    )
    return first.select(
        "query_id",
        F.coalesce(F.col("fr"), F.lit(0)).cast("bigint").alias(
            "first_relevant_rank"
        ),
        F.coalesce(
            F.expr(f"{RR_SCALE} div fr"), F.lit(0)
        )
        .cast("bigint")
        .alias(f"rr_scaled_{RR_SCALE}"),
    )


#: ERR scaling: (1/r)·(1/2)^(m+1) × ERR_SCALE is an exact integer for
#: every rank r ≤ TOP_K and prior-relevant count m ≤ TOP_K−1
ERR_SCALE = RR_SCALE * (2 ** TOP_K)


@query(
    "expected_reciprocal_rank",
    oracle=_RANKED_ORACLE_CTE
    + f""",
    flagged AS (
        SELECT query_id, rank,
               CASE WHEN n_label = q_label THEN 1 ELSE 0 END AS rel,
               COALESCE(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
                            OVER (PARTITION BY query_id ORDER BY rank
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS m
        FROM ranked WHERE rank <= {TOP_K})
    SELECT query_id,
           CAST(SUM(rel) AS BIGINT) AS n_relevant_topk,
           CAST(SUM(rel * ({RR_SCALE} // rank)
                    * CAST(POW(2, {TOP_K} - 1 - m) AS BIGINT)) AS BIGINT)
               AS err_scaled_{ERR_SCALE}
    FROM flagged GROUP BY query_id
    """,
    tags=("retrieval", "evaluation", "similarity", "llm-pipeline"),
)
def expected_reciprocal_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERR@k under the cascade user model (Chapelle et al., CIKM'09):
    the user scans the ranking top-down and stops at each relevant
    result with probability R; ERR = Σ_r (1/r)·R_r·Π_{i<r}(1−R_i).
    Unlike MRR (first relevant only) and P@k (position-blind), ERR
    discounts a relevant result by how much relevance precedes it —
    the diversity-aware cascade metric. Binary grades (label match,
    gmax = 1 ⇒ R ∈ {{0, ½}}) make every term (1/r)·(1/2)^(m+1) with
    m = prior relevant count, so scaling by lcm(1..k)·2^k turns the
    whole metric into exact integers: term = rel·(lcm/r)·2^(k−1−m) —
    no float crosses the compare (the lcm-MRR / integer-RBO
    discipline). Summing err_scaled over queries and dividing by
    |queries|·ERR_SCALE yields ERR@k.

    Plan: reuses the SHARED exact-top-k ranking (broadcast-joined
    labels, |queries|·k rows); the cascade prefix count is a window
    over the query partition (k rows each), then one small aggregate.
    Corpus-scale work stays inside ``similarity_topk``."""
    r = _ranked_with_labels(spark, sf_dir)
    from pyspark.sql import Window as W

    rel = F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
    prior = W.partitionBy("query_id").orderBy("rank").rowsBetween(
        W.unboundedPreceding, -1
    )
    flagged = r.where(F.col("rank") <= TOP_K).select(
        "query_id",
        "rank",
        rel.alias("rel"),
        F.coalesce(F.sum(rel).over(prior), F.lit(0)).alias("m"),
    )
    return flagged.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("n_relevant_topk"),
        F.sum(
            F.col("rel")
            * F.expr(f"{RR_SCALE} div rank")
            * F.expr(f"CAST(POW(2, {TOP_K} - 1 - m) AS BIGINT)")
        )
        .cast("bigint")
        .alias(f"err_scaled_{ERR_SCALE}"),
    )


#: BM25 parameters (Robertson–Spärck Jones defaults) and the fixed
#: query; constants are spelled in e-notation inside the SHARED
#: expression text so BOTH engines parse them as DOUBLE (a bare `2.2`
#: is DECIMAL(2,1) in both SQL dialects — decimal·bigint arithmetic
#: would round differently from the double path)
BM25_TERMS = ("hash", "merge", "stream")
BM25_K = 10

#: per-term score: log-free rational idf (monotone in the RSJ idf —
#: the collocation_pmi policy) × the k1/b-damped tf, with avgdl folded
#: in as dl·N/sumdl so the whole expression is ONE deterministic chain
#: of double ops shared verbatim with the oracle
_BM25_TERM = (
    "((CAST(n AS DOUBLE) - df{i} + 0.5e0) / (df{i} + 0.5e0))"
    " * ((tf{i} * 2.2e0) / (tf{i} + 1.2e0 * (0.25e0 + 0.75e0"
    " * (CAST(dl AS DOUBLE) * CAST(n AS DOUBLE) / CAST(sumdl AS DOUBLE)))))"
)
_BM25_SCORE = " + ".join(
    _BM25_TERM.format(i=i + 1) for i in range(len(BM25_TERMS))
)


def _bm25_scored_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-collect stage of :func:`bm25_topk`: per-document tf/dl in
    the projection, ONE broadcast scalar-aggregate of corpus stats,
    the shared-text double score, and a TakeOrderedAndProject top-k —
    factored out so the distributed plan stays auditable after the
    registered fn folds the k winners driver-side."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    base = d.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            F.expr(f"size(filter(toks, x -> x = '{t}'))").alias(f"tf{i + 1}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    g = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sumdl"),
        *[
            F.count_if(F.col(f"tf{i + 1}") > 0).alias(f"df{i + 1}")
            for i in range(len(BM25_TERMS))
        ],
    )
    scored = base.crossJoin(F.broadcast(g)).selectExpr(
        "doc_id", f"{_BM25_SCORE} AS score"
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(BM25_K)


@query(
    "bm25_topk",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, len(toks) AS dl,
               {", ".join(f"len(list_filter(toks, x -> x = '{t}')) AS tf{i + 1}" for i, t in enumerate(BM25_TERMS))}
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents WHERE text IS NOT NULL)),
    g AS (
        SELECT COUNT(*) AS n, SUM(dl) AS sumdl,
               {", ".join(f"COUNT_IF(tf{i + 1} > 0) AS df{i + 1}" for i in range(len(BM25_TERMS)))}
        FROM base),
    scored AS (
        SELECT doc_id, {_BM25_SCORE} AS score
        FROM base CROSS JOIN g)
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rank
    FROM scored ORDER BY score DESC, doc_id LIMIT {BM25_K}
    """,
    tags=("retrieval", "text", "ranking", "llm-pipeline"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking for a fixed conjunctive query — the
    standard sparse-retrieval scorer (Robertson–Spärck Jones; k1=1.2,
    b=0.75) and the classic hybrid-search partner of the dense
    similarity family (see ``hybrid_rank_fusion_rrf``). The idf is the
    log-free rational (N−df+½)/(df+½) — strictly monotone in the usual
    log idf, so rankings are unchanged — and the whole per-document
    score is ONE double expression whose text is shared verbatim with
    the oracle (same IEEE-754 op sequence ⇒ bit-identical doubles);
    only (doc_id, rank) identities cross the compare, the family's
    float discipline. Scale shape: per-document tf/dl come from
    higher-order array functions in the projection (no explode, no
    per-token shuffle); the corpus statistics (N, Σdl, df per term)
    are ONE scalar aggregate broadcast back; ranking is
    TakeOrderedAndProject (top-k short-circuit, never a global sort);
    the k winners are ranked driver-side — a bounded-k collect, the
    distscan model-artifact pattern — so no single-partition window
    appears in the plan (the distributed stage's shape is pinned by
    tests/test_plans.py against :func:`_bm25_scored_topk`, since this
    fn's own returned relation is post-collect)."""
    from pyspark.sql.types import LongType, StructField, StructType

    rows = _bm25_scored_topk(spark, sf_dir).select("doc_id").collect()
    return local_relation(spark, 
        [(r.doc_id, i + 1) for i, r in enumerate(rows)],
        StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("rank", LongType(), False),
            ]
        ),
    )


#: RBO@10 with persistence p = 9/10, as EXACT scaled integers: the
#: per-depth weight w_d = 9^d · 10^(10−d) · (2520/d) clears both the
#: p^d geometric factor and the 1/d average (2520 = lcm(1..10)), so a
#: doc matched in both rankings with maxrank m contributes the exact
#: suffix Σ_{d≥m} w_d — one integer lookup per matched doc. The scale
#: constant is 10^10·2520; rbo = rbo_scaled·(1−p)/(p·scale) if anyone
#: wants the float back.
RBO_DEPTH = 10
RBO_SUFFIX = (
    53392439389752,
    30712439389752,
    20506439389752,
    14382839389752,
    10249409389752,
    7273339789752,
    5041287589752,
    3319418749752,
    1963447038252,
    878669669052,
)


def _tf_scored_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain term-frequency top-10 — RBO's comparison ranking, factored
    like :func:`_bm25_scored_topk` so its TakeOrdered shape stays
    plan-auditable (tests/test_plans.py pins it)."""
    base = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            *[
                F.expr(f"size(filter(toks, x -> x = '{t}'))").alias(
                    f"tf{i + 1}"
                )
                for i, t in enumerate(BM25_TERMS)
            ],
        )
    )
    score = sum(
        (F.col(f"tf{i + 1}") for i in range(1, len(BM25_TERMS))),
        F.col("tf1"),
    )
    return (
        base.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(RBO_DEPTH)
    )


@query(
    "rank_biased_overlap_exact",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, len(toks) AS dl,
               {", ".join(f"len(list_filter(toks, x -> x = '{t}')) AS tf{i + 1}" for i, t in enumerate(BM25_TERMS))}
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents WHERE text IS NOT NULL)),
    g AS (
        SELECT COUNT(*) AS n, SUM(dl) AS sumdl,
               {", ".join(f"COUNT_IF(tf{i + 1} > 0) AS df{i + 1}" for i in range(len(BM25_TERMS)))}
        FROM base),
    bm25 AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY ({_BM25_SCORE}) DESC, doc_id)
                   AS r1
        FROM base CROSS JOIN g),
    tfr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (
                   ORDER BY (tf1 + tf2 + tf3) DESC, doc_id) AS r2
        FROM base),
    matched AS (
        SELECT GREATEST(b.r1, t.r2) AS m
        FROM (SELECT * FROM bm25 WHERE r1 <= {RBO_DEPTH}) b
        JOIN (SELECT * FROM tfr WHERE r2 <= {RBO_DEPTH}) t USING (doc_id))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
           CAST(COALESCE(SUM(CASE m
               {" ".join(f"WHEN {i + 1} THEN {s}" for i, s in enumerate(RBO_SUFFIX))}
               END), 0) AS BIGINT) AS rbo_scaled
    FROM matched
    """,
    tags=("retrieval", "ranking", "evaluation", "llm-pipeline"),
)
def rank_biased_overlap_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between the BM25
    ranking and a plain term-frequency ranking, at depth 10 with
    persistence 0.9 — the top-weighted ranking-agreement metric used
    to compare retrieval variants (dense vs sparse, quantized vs full)
    where Kendall's τ over-weights the tail. Exact by construction:
    RBO = (1−p)/p · Σ_d p^d·|A∩B|_d/d decomposes per MATCHED document
    into a suffix of the depth weights starting at max(rank_A, rank_B),
    so the whole statistic is one integer lookup per matched doc —
    with p = 9/10 and lcm(1..10) scaling every term is integral
    (``RBO_SUFFIX``), and both engines sum identical bigints instead
    of drifting geometric floats. Cost, stated honestly: the two
    rankings are separate TakeOrdered top-10 jobs — two pruned passes
    over documents (the BM25 stage is the SHARED
    :func:`_bm25_scored_topk` helper, so the scorer cannot drift from
    ``bm25_topk``; the tf ranking is :func:`_tf_scored_topk`, plan-
    pinned alongside it) — and the RBO fold itself is a bounded
    ≤10-id driver computation."""
    r1 = [r.doc_id for r in _bm25_scored_topk(spark, sf_dir).collect()]
    r2 = [r.doc_id for r in _tf_scored_topk(spark, sf_dir).collect()]
    # bounded-k driver fold (both lists are ≤ RBO_DEPTH ids)
    pos2 = {d: i + 1 for i, d in enumerate(r2)}
    ms = [max(i + 1, pos2[d]) for i, d in enumerate(r1) if d in pos2]
    from pyspark.sql.types import LongType, StructField, StructType

    return local_relation(spark, 
        [(len(ms), sum(RBO_SUFFIX[m - 1] for m in ms))],
        StructType(
            [
                StructField("n_matched", LongType(), False),
                StructField("rbo_scaled", LongType(), False),
            ]
        ),
    )


#: NDCG discount weights as exact scaled integers: the only
#: transcendental in DCG = Σ rel_r / log2(r+1) is log2 of the RANK —
#: a constant for every r ≤ k — so the k discounts are precomputed
#: ONCE here (Python math.log2, correctly rounded, then scaled to
#: 10^12 units and rounded to integers) and spelled as literals in
#: BOTH engines' expressions. No engine evaluates a log anywhere:
#: DCG/IDCG are exact bigint sums of shared constants, the lcm-MRR /
#: integer-ERR discipline extended to graded discounts.
NDCG_SCALE = 10**12
NDCG_W = tuple(
    round(NDCG_SCALE / math.log2(r + 1)) for r in range(1, TOP_K + 1)
)
#: NDCG_CUM[m] = Σ_{r≤m} NDCG_W[r−1] — the ideal DCG for m relevant
#: docs (binary gains put them in the first m positions)
NDCG_CUM = tuple(
    sum(NDCG_W[:m]) for m in range(TOP_K + 1)
)

_NDCG_W_CASE = (
    "CASE rank "
    + " ".join(f"WHEN {r + 1} THEN {w}" for r, w in enumerate(NDCG_W))
    + " ELSE 0 END"
)
_NDCG_CUM_CASE = (
    "CASE least(n_relevant_corpus, {k}) ".format(k=TOP_K)
    + " ".join(f"WHEN {m} THEN {c}" for m, c in enumerate(NDCG_CUM))
    + " END"
)


@query(
    "ndcg_at_k",
    oracle=_RANKED_ORACLE_CTE
    + f""",
    dcg AS (
        SELECT query_id,
               CAST(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_relevant_topk,
               CAST(SUM(CASE WHEN n_label = q_label
                             THEN {_NDCG_W_CASE} ELSE 0 END) AS BIGINT)
                   AS dcg_scaled
        FROM ranked WHERE rank <= {TOP_K} GROUP BY query_id),
    corpus AS (
        SELECT q.query_id, CAST(COUNT(*) AS BIGINT) AS n_relevant_corpus
        FROM q JOIN embeddings e
          ON e.label = q.q_label AND e.vec_id <> q.query_id
        GROUP BY q.query_id),
    j AS (
        SELECT d.query_id, d.n_relevant_topk,
               coalesce(c.n_relevant_corpus, 0) AS n_relevant_corpus,
               d.dcg_scaled
        FROM dcg d LEFT JOIN corpus c ON d.query_id = c.query_id)
    SELECT query_id, n_relevant_topk, n_relevant_corpus, dcg_scaled,
           CAST({_NDCG_CUM_CASE} AS BIGINT) AS idcg_scaled,
           CAST(1000 * dcg_scaled
                // greatest({_NDCG_CUM_CASE}, 1) AS BIGINT)
               AS ndcg_permille
    FROM j
    """,
    tags=("retrieval", "evaluation", "similarity", "llm-pipeline"),
)
def ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@k of the exact cosine top-k against label-match relevance
    — the position-discounted completion of the retrieval scorecard
    (P/R@k are position-blind, MRR sees only the first hit, ERR is a
    stopping model; NDCG is what ranking papers and dashboards
    report). Binary gains, so DCG = Σ_{{r: relevant}} W_r with the
    log2 discounts precomputed as the shared integer constants
    ``NDCG_W`` (10^12 units) — every value that crosses the compare
    is an exact bigint, and the ideal DCG is a CASE lookup of
    ``NDCG_CUM`` at min(|relevant corpus|, k): with binary gains the
    ideal ranking simply fills the first min(R, k) slots. A query
    whose label is unique in the corpus has IDCG 0; its NDCG is
    pinned 0 via greatest(idcg, 1), not dropped or NULLed.

    Plan: reuses the SHARED exact-top-k ranking (|queries|·k rows,
    broadcast label joins) and the same corpus-relevant aggregate as
    ``precision_recall_at_k`` — the only corpus-scale work stays
    inside ``similarity_topk``'s batch-local top-k scan."""
    r = _ranked_with_labels(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    q_labels = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    corpus = (
        e.join(
            F.broadcast(q_labels),
            (e.label == q_labels.q_label) & (e.vec_id != q_labels.query_id),
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_relevant_corpus"))
    )
    rel = F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
    dcg = (
        r.where(F.col("rank") <= TOP_K)
        .groupBy("query_id")
        .agg(
            F.sum(rel).cast("bigint").alias("n_relevant_topk"),
            F.sum(
                F.when(
                    F.col("n_label") == F.col("q_label"),
                    F.expr(_NDCG_W_CASE),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("dcg_scaled"),
        )
    )
    return (
        dcg.join(corpus, "query_id", "left")
        .withColumn(
            "n_relevant_corpus",
            F.coalesce(F.col("n_relevant_corpus"), F.lit(0)).cast("bigint"),
        )
        .select(
            "query_id",
            "n_relevant_topk",
            "n_relevant_corpus",
            "dcg_scaled",
            F.expr(_NDCG_CUM_CASE).cast("bigint").alias("idcg_scaled"),
            F.expr(
                f"1000 * dcg_scaled div greatest({_NDCG_CUM_CASE}, 1L)"
            )
            .cast("bigint")
            .alias("ndcg_permille"),
        )
    )


@query(
    "map_at_k_exact",
    oracle=_RANKED_ORACLE_CTE
    + f""",
    flagged AS (
        SELECT query_id, rank,
               CASE WHEN n_label = q_label THEN 1 ELSE 0 END AS rel,
               SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
                   OVER (PARTITION BY query_id ORDER BY rank) AS prefix_rel
        FROM ranked WHERE rank <= {TOP_K}),
    ap AS (
        SELECT query_id,
               CAST(SUM(rel) AS BIGINT) AS n_relevant_topk,
               CAST(COALESCE(SUM(rel * prefix_rel * ({RR_SCALE} // rank)), 0)
                    AS BIGINT) AS ap_sum_scaled_{RR_SCALE}
        FROM flagged GROUP BY query_id)
    SELECT query_id, n_relevant_topk, ap_sum_scaled_{RR_SCALE},
           CAST(CASE WHEN n_relevant_topk = 0 THEN 0
                     ELSE 1000 * ap_sum_scaled_{RR_SCALE}
                          // (n_relevant_topk * {RR_SCALE}) END AS BIGINT)
               AS ap_permille
    FROM ap
    """,
    tags=("retrieval", "evaluation", "similarity", "llm-pipeline"),
)
def map_at_k_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average Precision@k per query — averaging these over queries is
    MAP, the last missing member of the retrieval scorecard (P/R@k
    position-blind, MRR first-hit-only, ERR a stopping model, NDCG
    graded-discount; AP is the area under the precision-recall curve
    and the metric ad-hoc retrieval evaluations default to). AP@k =
    (1/R_k)·Σ_{{r relevant}} P@r with P@r = prefix_rel_r/r — every
    term is (prefix_rel·lcm(1..k)/r), an exact integer under the
    family's lcm scaling, so the per-query AP numerator is an exact
    bigint and the final permille is one truncating division
    (normalized by the RETRIEVED relevant count R_k, the @k
    convention that keeps AP@k ≤ 1 without a corpus pass; queries
    with no relevant hit pin 0 explicitly). Plan: the shared
    exact-top-k ranking, one prefix window over k-row partitions, one
    aggregate — corpus-scale work stays inside ``similarity_topk``."""
    from pyspark.sql import Window as W

    r = _ranked_with_labels(spark, sf_dir)
    rel = F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
    pw = W.partitionBy("query_id").orderBy("rank").rowsBetween(
        W.unboundedPreceding, 0
    )
    flagged = r.where(F.col("rank") <= TOP_K).select(
        "query_id",
        "rank",
        rel.alias("rel"),
        F.sum(rel).over(pw).alias("prefix_rel"),
    )
    ap = flagged.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("n_relevant_topk"),
        F.coalesce(
            F.sum(
                F.col("rel")
                * F.col("prefix_rel")
                * F.expr(f"{RR_SCALE} div rank")
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias(f"ap_sum_scaled_{RR_SCALE}"),
    )
    return ap.selectExpr(
        "query_id",
        "n_relevant_topk",
        f"ap_sum_scaled_{RR_SCALE}",
        f"CAST(CASE WHEN n_relevant_topk = 0 THEN 0"
        f"          ELSE 1000 * ap_sum_scaled_{RR_SCALE}"
        f"               div (n_relevant_topk * {RR_SCALE}) END AS BIGINT)"
        " AS ap_permille",
    )
