"""Graph operators over the order-derived bipartite graph: degree
histogram (oracle-checked) and damped PageRank (iterative, rows-only).

The graph is customers ↔ suppliers, an edge wherever a customer's order
contains a supplier's lineitem — the entity-relationship graph a data
pipeline mines for influence/importance ranking (seller ranking,
spam-node discovery, sampling weights for graph-structured corpora).

Scale posture: edges are a DataFrame keyed by source node; every
PageRank iteration is one shuffle (join on src + groupBy dst) over
edges co-partitioned once up front. Model state (the rank vector) stays
distributed — nothing is collected to the driver, unlike the k·dim
models in clustering.py, because rank state is O(|nodes|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from watermill_kinesis_spark.registry import query
from watermill_kinesis_spark.sources.tables import load_table

PAGERANK_ITERS = 8
PAGERANK_DAMPING = 0.85
PAGERANK_TOP = 50


@query(
    "graph_degree_histogram",
    oracle="""
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (
        SELECT o.o_custkey, CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS degree
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_custkey)
    GROUP BY degree
    """,
    tags=("graph", "agg"),
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer→supplier graph — the first
    diagnostic over any entity graph (connectivity shape, skew, hub
    detection before running anything iterative). Two exact integer
    aggregates: per-customer distinct-supplier count, then the
    histogram over degrees. The distinct travels as (custkey, suppkey)
    pairs with map-side dedup; the histogram input is |customers| rows.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    deg = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.countDistinct("l_suppkey").alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_customers"))


def bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected customer↔supplier edges, materialized as
    both orientations with string node ids (``c:<k>`` / ``s:<k>``)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    c = F.concat(F.lit("c:"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s:"), F.col("l_suppkey").cast("string"))
    return pairs.select(c.alias("src"), s.alias("dst")).unionAll(
        pairs.select(s.alias("src"), c.alias("dst"))
    )


def pagerank(
    spark: SparkSession,
    sf_dir: str,
    iters: int = PAGERANK_ITERS,
    damping: float = PAGERANK_DAMPING,
) -> DataFrame:
    """Damped PageRank by power iteration on DataFrames. Each iteration
    is exactly one shuffle: contributions = edges ⋈ ranks on src (hash
    join co-partitioned on the node key), summed per dst. The bipartite
    construction guarantees no dangling nodes, so total rank mass is
    conserved at |nodes| · 1/|nodes| scaled by the damping identity.
    Iterations are persisted and the previous rank state released
    per step — lineage stays O(1) and at 100 TB each step is a single
    co-partitioned shuffle of |edges| rows."""
    edges = bipartite_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    edges_deg = edges.join(deg, "src").persist()
    n_nodes = deg.count()  # also materializes edges_deg's inputs
    base = (1.0 - damping) / n_nodes
    ranks = deg.select("src", F.lit(1.0 / n_nodes).alias("rank")).persist()
    for _ in range(iters):
        contribs = (
            edges_deg.join(ranks, "src")
            .select("dst", (F.col("rank") / F.col("degree")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = contribs.select(
            F.col("dst").alias("src"),
            (F.lit(base) + F.lit(damping) * F.col("contrib")).alias("rank"),
        ).persist()
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    edges_deg.unpersist()
    return ranks.select(F.col("src").alias("node"), "rank")


@query("pagerank_bipartite", tags=("graph", "iterative", "llm-pipeline"))
def pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 (PAGERANK_TOP) nodes of the customer↔supplier graph by
    damped PageRank (8 (PAGERANK_ITERS) power iterations). Iterative and
    therefore not ANSI-SQL-expressible — registered rows-only; the
    invariants the oracle can't check (rank-mass conservation, positive
    ranks, hub ordering vs degree) live in tests/test_graph.py."""
    ranks = pagerank(spark, sf_dir)
    return (
        ranks.select(
            F.substring("node", 1, 1).alias("node_type"),
            F.expr("CAST(substring(node, 3) AS BIGINT)").alias("node_key"),
            F.round("rank", 9).alias("rank"),
        )
        .orderBy(F.desc("rank"), F.asc("node_type"), F.asc("node_key"))
        .limit(PAGERANK_TOP)
    )
