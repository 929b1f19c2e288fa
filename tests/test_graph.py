"""Invariant tests for graph.py — the oracle can't check iterative
PageRank, so rank-mass conservation, positivity, and hub/degree
consistency are pinned here."""

from pyspark.sql import functions as F

from watermill_kinesis_spark.operators.graph import (
    PAGERANK_DAMPING,
    PAGERANK_TOP,
    bipartite_edges,
    pagerank,
)
from watermill_kinesis_spark.registry import queries
from watermill_kinesis_spark.sources.tables import load_table


def test_degree_histogram_accounts_for_every_customer(spark, sf_dir):
    out = queries()["graph_degree_histogram"](spark, sf_dir)
    n_customers_with_orders = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    rows = out.collect()
    assert sum(r["n_customers"] for r in rows) == n_customers_with_orders
    assert all(r["degree"] >= 1 for r in rows)


def test_pagerank_mass_conservation_and_positivity(spark, sf_dir):
    ranks = pagerank(spark, sf_dir, iters=4).cache()
    try:
        n = ranks.count()
        total = ranks.agg(F.sum("rank")).first()[0]
        # no dangling nodes ⇒ the damping identity keeps total mass at 1
        assert abs(total - 1.0) < 1e-6
        assert ranks.where(F.col("rank") <= 0).count() == 0
        # every node keeps at least the teleport floor
        floor = (1.0 - PAGERANK_DAMPING) / n
        assert ranks.where(F.col("rank") < floor * 0.999999).count() == 0
    finally:
        ranks.unpersist()


def test_pagerank_top_nodes_are_high_degree(spark, sf_dir):
    """PageRank on an undirected graph correlates strongly with degree;
    the top-ranked node must be among the highest-degree nodes."""
    top = queries()["pagerank_bipartite"](spark, sf_dir).collect()
    assert len(top) == PAGERANK_TOP
    assert top == sorted(top, key=lambda r: (-r["rank"], r["node_type"], r["node_key"]))
    edges = bipartite_edges(spark, sf_dir)
    deg = {
        r["src"]: r["d"]
        for r in edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).collect()
    }
    best = top[0]
    best_node = f"{best['node_type']}:{best['node_key']}"
    max_deg = max(deg.values())
    assert deg[best_node] >= 0.5 * max_deg
