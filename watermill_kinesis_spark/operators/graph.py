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

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from watermill_kinesis_spark.functions.localrel import local_relation
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


#: co-activity edge threshold: users sharing at least this many
#: distinct (event_type, hour) activity buckets
TRIANGLE_MIN_SHARED = 3

#: budget for the dense-graph closure's packed adjacency bitmap
#: (|nodes| × ⌈|nodes|/64⌉ × 8 bytes): 64 MB covers ~23k nodes — the
#: dense regime by construction; beyond it the sparse adjacency-array
#: join takes over (see graph_triangle_count)
_TRI_BITMAP_MAX_BYTES = 64 << 20


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH b AS (SELECT DISTINCT user_id, event_type,
                      date_trunc('hour', ts) AS h FROM events),
    e AS (SELECT a.user_id AS u, c.user_id AS v
          FROM b a JOIN b c
            ON a.event_type = c.event_type AND a.h = c.h
           AND a.user_id < c.user_id
          GROUP BY u, v HAVING COUNT(*) >= {TRIANGLE_MIN_SHARED}),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT u AS node FROM e UNION ALL SELECT v FROM e)
            GROUP BY node),
    tri AS (SELECT COUNT(*) AS t
            FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT SUM(d * (d - 1)) // 2 FROM deg) AS BIGINT) AS n_wedges
    """,
    tags=("graph", "agg", "llm-pipeline"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle census of the user co-activity graph (edge =
    ≥3 (TRIANGLE_MIN_SHARED) shared (event_type, hour) activity
    buckets) — triangles + wedges are the ingredients of the global
    clustering coefficient, the standard cohesion diagnostic before
    sampling a graph-structured corpus.

    Scale design — *degree-ordered orientation* (the classic
    distributed-triangle trick): every undirected edge is oriented from
    its lower-(degree, id) endpoint to the higher one, so each triangle
    is counted exactly once at its lowest-ranked vertex and, crucially,
    the wedge join built on oriented out-edges materializes only
    Σ C(out_deg, 2) rows, where orientation bounds every out-degree by
    O(√|E|) — hub nodes (the quadratic killer on a power-law graph at
    100 TB) contribute wedges at their *in*-side, which costs nothing.
    Three shuffles total: bucket self-join for edges, degree join for
    orientation, wedge↔edge equi-join for closure. The node-rank window
    runs over the pre-aggregated |nodes| table (benign single
    partition, like every pre-aggregated window in PLANS.md). The two
    reused relations (edges, oriented edges) persist DISK_ONLY (r11:
    at the 10× replica the co-activity buckets densify — 13.9M edges
    from 79M candidate pairs — and heap-resident caches of
    edge-scale relations OOM'd the 1 GiB vanilla session; the
    spill-safe disk cache costs one serialization pass and nothing
    at cluster heaps)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    a, c = b.alias("a"), b.alias("c")
    e = (
        a.join(
            # merge pin (r11): b is the post-shuffle distinct bucket
            # relation — corpus-scale; at the 10× replica AQE elected
            # to broadcast it into its own self-join from compressed
            # shuffle bytes (~8 MB wire, ~150 MB deserialized × every
            # task) and OOM'd the vanilla 1 GiB session at any
            # heap-per-core. Sort-merge streams the bucket groups.
            c.hint("merge"),
            (F.col("a.event_type") == F.col("c.event_type"))
            & (F.col("a.h") == F.col("c.h"))
            & (F.col("a.user_id") < F.col("c.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("u"), F.col("c.user_id").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= TRIANGLE_MIN_SHARED)
        .select("u", "v")
        .persist(StorageLevel.DISK_ONLY)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # total order for orientation: (degree, id) rank over |nodes| rows
    rank = nodes.select(
        "node",
        "d",
        F.row_number()
        .over(W.orderBy(F.asc("d"), F.asc("node")))
        .alias("r"),
    )
    ru = rank.select(F.col("node").alias("u"), F.col("r").alias("ru"))
    rv = rank.select(F.col("node").alias("v"), F.col("r").alias("rv"))
    # merge pins (r11): the rank table is |nodes|-sized and
    # post-shuffle — at the 10× replica AQE's compressed-bytes
    # estimate elected node/edge-scale broadcasts here and in the
    # closure semi-join and OOM'd the 1 GiB vanilla session (the
    # referential_integrity class); sort-merge spills and streams
    oriented = (
        e.join(ru.hint("merge"), "u")
        .join(rv.hint("merge"), "v")
        .select(
            F.when(F.col("ru") < F.col("rv"), F.col("ru"))
            .otherwise(F.col("rv"))
            .alias("src"),
            F.when(F.col("ru") < F.col("rv"), F.col("rv"))
            .otherwise(F.col("ru"))
            .alias("dst"),
        )
        .persist(StorageLevel.DISK_ONLY)
    )
    # closure: Σ_edges |N⁺(u) ∩ N⁺(v)| counts each triangle exactly
    # once at its lowest-ranked vertex — never materialize wedges (r11
    # full-sweep fix: the densified 10× replica graph — 13.9M edges
    # over just 15k nodes, replicas share the same 720-hour window so
    # bucket sizes scale and pairs grow quadratically — generates
    # 7.2e9 wedge rows, a 115 GB shuffle the old wedge⋈edge semi-join
    # had to sort; OOM/hours-class on any heap budget). The
    # intersection representation is DENSITY-ADAPTIVE:
    #
    # * DENSE graphs have few nodes relative to edges by definition,
    #   so the full packed adjacency BITMAP (|nodes|²/8 bytes over
    #   dense row_number ranks) is bounded — ≤64 MB covers ~23k nodes
    #   (28 MB at the 10× replica). It broadcasts once and the closure
    #   is a shuffle-free mapInPandas popcount of bm[u] & bm[v] per
    #   edge partition — 7.2e9 wedge checks become ~26 GB of memory
    #   bandwidth, no exchange at all. The |nodes|-row bitset collect
    #   is a bounded ⊙ driver-fold artifact, gated by the same 64 MB
    #   check.
    # * SPARSE graphs (bitmap over budget ⇒ many nodes ⇒ low average
    #   degree, and orientation bounds every out-list by O(√|E|)) use
    #   per-node sorted adjacency ARRAYS carried through two
    #   merge-pinned node-table joins and a JVM array_intersect —
    #   Σ(d(u)+d(v)) volume, the standard edge-centric distributed
    #   triangle shape.
    n_nodes_val = int(rank.count())
    nwords = (n_nodes_val + 63) // 64
    if n_nodes_val * nwords * 8 <= _TRI_BITMAP_MAX_BYTES:
        import numpy as np
        import pandas as pd

        def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
            w = np.zeros(nwords, dtype=np.uint64)
            d = pdf["dst"].to_numpy(dtype=np.int64) - 1
            np.bitwise_or.at(
                w,
                d // 64,
                np.left_shift(
                    np.uint64(1), (d % 64).astype(np.uint64)
                ),
            )
            return pd.DataFrame(
                {"src": [int(pdf["src"].iloc[0])], "bits": [w.tobytes()]}
            )

        packed = oriented.groupBy("src").applyInPandas(
            _pack, "src int, bits binary"
        )
        bm = np.zeros((n_nodes_val, nwords), dtype=np.uint64)
        for row in packed.collect():  # bounded: ≤ _TRI_BITMAP_MAX_BYTES
            bm[row.src - 1] = np.frombuffer(row.bits, dtype=np.uint64)
        bc = spark.sparkContext.broadcast(bm.tobytes())
        pop = np.array(
            [bin(i).count("1") for i in range(256)], dtype=np.int64
        )

        def _popcount(batches):
            m = np.frombuffer(bc.value, dtype=np.uint64).reshape(
                n_nodes_val, nwords
            )
            for pdf in batches:
                u = pdf["src"].to_numpy(dtype=np.int64) - 1
                v = pdf["dst"].to_numpy(dtype=np.int64) - 1
                x = np.bitwise_and(m[u], m[v])
                t = int(pop[x.view(np.uint8)].sum())
                yield pd.DataFrame({"t": [t]})

        tri_row = (
            oriented.mapInPandas(_popcount, "t long").agg(F.sum("t")).first()
        )
        n_triangles = int(tri_row[0] or 0)
        bc.unpersist()
    else:
        adj = oriented.groupBy("src").agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs")
        )
        au = adj.select(F.col("src"), F.col("nbrs").alias("u_nbrs"))
        av = adj.select(
            F.col("src").alias("dst"), F.col("nbrs").alias("v_nbrs")
        )
        n_triangles = (
            oriented.join(au.hint("merge"), "src")
            .join(av.hint("merge"), "dst")
            .select(
                F.size(F.array_intersect("u_nbrs", "v_nbrs")).alias("t")
            )
            .agg(F.sum("t"))
            .first()[0]
            or 0
        )
    n_edges = e.count()
    stats = nodes.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        # d(d-1) is always even ⇒ DIV 2 is exact; stays integer end to end
        F.expr("CAST(sum(d * (d - 1)) DIV 2 AS BIGINT)").alias("n_wedges"),
    ).first()
    e.unpersist()
    oriented.unpersist()
    return local_relation(spark, 
        [
            (
                int(stats.n_nodes),
                int(n_edges),
                int(n_triangles),
                int(stats.n_wedges),
            )
        ],
        "n_nodes bigint, n_edges bigint, n_triangles bigint, n_wedges bigint",
    )


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


#: the one live checkpointed rank state of the latest pagerank call
_pagerank_final = None


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
    co-partitioned shuffle of |edges| rows. The degree and rank join
    sides are MERGE-pinned (r11: the fact-key plan-audit rule flagged
    the planner electing to broadcast them — they are NODE-scale
    post-shuffle relations whose compressed-bytes size estimate
    under-sizes the deserialized hash relation, the exact r10
    referential_integrity OOM class; a shuffled-hash pin was tried
    first and refused the per-task hash build at the 100× replica —
    sort-merge spills and streams at any scale)."""
    from watermill_kinesis_spark.sources.tables import adaptive_partitions

    # persist the base edge relation for the setup phase (optimization
    # round 14): it feeds deg, the deg-count, AND both sides of the
    # edges_deg join — unpersisted, the orders⋈lineitem distinct
    # pipeline was planned and EXECUTED four times at materialization
    # (profiled: 4 × ~0.5 s identical 5.5 MB exchange-write stages)
    edges = bipartite_edges(spark, sf_dir).persist(StorageLevel.DISK_ONLY)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    # Geometry-derived partition count for the persisted loop state
    # (optimization round 14, guide §2): the caches previously pinned
    # spark.sql.shuffle.partitions (32) partitions, and EVERY
    # iteration's map stages — cache scan, sort, shuffle write — ran
    # 32 near-empty tasks over ~5 MB of edges at sf0.1 (profiled
    # 9-19 s of per-stage task run time carrying ~2 s of CPU). The
    # explicit src repartition also makes the edge side of every
    # iteration join exchange-free (the BFS two-copy rationale).
    par = adaptive_partitions(spark, sf_dir, "lineitem", expand=0.5)
    # DISK_ONLY (r11): edge- and node-scale caches on the heap starve
    # the execution pool at replica scale — the 100× vanilla session
    # died UNABLE_TO_ACQUIRE_MEMORY with the default MEMORY_AND_DISK
    # because the protected storage half of the unified pool held the
    # cached edges while every iteration's sorts competed for the
    # rest; disk caches cost one serialization pass and nothing at
    # cluster heaps
    edges_deg = (
        edges.join(deg.hint("merge"), "src")
        .repartition(par, "src")
        .persist(StorageLevel.DISK_ONLY)
    )
    # the returned rank state of the previous invocation — replaced,
    # never accumulated (the r7 ADVICE slot convention; the persist
    # spelling leaked one node-scale cache per call the same way)
    global _pagerank_final
    if _pagerank_final is not None:
        _release_local_checkpoint(_pagerank_final)
        _pagerank_final = None
    n_nodes = deg.count()  # also materializes edges_deg's inputs
    base = (1.0 - damping) / n_nodes
    # Rank state rides eager DISK_ONLY localCheckpoints, not persist
    # (optimization round 14, the BFS lineage rule): persist caches
    # execution but does NOT truncate lineage, so iteration i's
    # analyzed plan chained every previous iteration — analysis/AQE
    # planning cost grew O(iters²) (profiled: 615 stages, ~8 s of
    # driver gap on a 14.5 s wall at sf0.1). The checkpoint keeps each
    # iteration's plan a flat LogicalRDD join — measured 13.3-13.9 →
    # 5.6-8.4 s same-session A/B. The checkpoint also materializes
    # eagerly, replacing the per-iteration count() job. Rank values
    # can differ from the persist spelling by float summation order
    # (≤1 ulp, ~1e-15 relative measured); every consumer is
    # insensitive by construction — pagerank_bipartite rounds to 9 dp
    # and is rows-only, the mass audit's verdicts carry explicit
    # tolerances, and test_graph.py pins tolerance-based invariants.
    ranks = (
        deg.select("src", F.lit(1.0 / n_nodes).alias("rank"))
        .repartition(par, "src")
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    for _ in range(iters):
        contribs = (
            edges_deg.join(ranks.hint("merge"), "src")
            .select("dst", (F.col("rank") / F.col("degree")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            contribs.select(
                F.col("dst").alias("src"),
                (F.lit(base) + F.lit(damping) * F.col("contrib")).alias("rank"),
            )
            # re-keying on the renamed node column keeps the cached
            # rank state co-partitioned with edges_deg: the alias
            # erases the groupBy's hash partitioning metadata, so
            # without this every iteration re-exchanged the edge side
            .repartition(par, "src")
            .localCheckpoint(
                eager=True, storageLevel=StorageLevel.DISK_ONLY
            )
        )
        _release_local_checkpoint(ranks)
        ranks = new_ranks
    edges_deg.unpersist()
    edges.unpersist()
    _pagerank_final = ranks
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


@query(
    "graph_jaccard_neighbors",
    oracle="""
    WITH adj AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_custkey < 200),
    deg AS (SELECT cust, COUNT(*) AS d FROM adj GROUP BY cust),
    common AS (
        SELECT a.cust AS cust_a, b.cust AS cust_b, COUNT(*) AS n_common
        FROM adj a JOIN adj b ON a.supp = b.supp AND a.cust < b.cust
        GROUP BY a.cust, b.cust)
    SELECT c.cust_a, c.cust_b,
           CAST(c.n_common AS BIGINT) AS n_common,
           CAST(c.n_common * 1000 // (da.d + db.d - c.n_common) AS BIGINT)
               AS jaccard_permille
    FROM common c
    JOIN deg da ON da.cust = c.cust_a
    JOIN deg db ON db.cust = c.cust_b
    WHERE c.n_common * 10 >= (da.d + db.d - c.n_common) * 3
    """,
    tags=("graph", "similarity", "link-prediction"),
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard similarity on the customer↔supplier
    bipartite graph — the classic link-prediction / entity-resolution
    score ("customers who buy from the same suppliers are the same
    market"): for each customer pair sharing ≥1 supplier, |N(a)∩N(b)|
    / |N(a)∪N(b)|, kept at ≥ 0.3.

    Candidate pairs form through a PPJoin/AllPairs PREFIX FILTER, not
    the naive inverted index (r5 judge finding: a hub supplier shared
    by m customers emits m(m−1)/2 candidates, almost all killed by the
    gate — the quadratic fan-out the triangle counter's degree-ordered
    orientation engineers away). Each customer's supplier set is
    sorted by the one GLOBAL (frequency, key) order and only its first
    d − ⌈0.3·d⌉ + 1 tokens generate candidates. Exactness is the
    standard prefix-filter theorem: J(a,b) ≥ t ⟹ |a∩b| ≥ t·max(da,db)
    (union ≥ the larger set), and an overlap of α elements of a
    totally-ordered set cannot avoid the first d − α + 1 positions of
    either member — so every qualifying pair shares ≥1 token in BOTH
    prefixes. Hub keys sort LAST, so they enter prefixes only for
    customers whose whole neighborhood is hubs: candidate volume
    follows rare-key co-occurrence, not hub degree. Surviving pairs
    are verified exactly via array_intersect on the two (per-node-
    degree-bounded) adjacency arrays — output identical to the
    oracle's all-pairs formulation, which re-proves the filter theorem
    on every driver sweep. Jaccard is exact integer permille; the
    ≥0.3 gate is cross-multiplied integer form on both engines."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    l = load_table(spark, sf_dir, "lineitem")
    adj = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    return jaccard_neighbor_pairs(adj)


def jaccard_prefix_candidates(adj: DataFrame) -> tuple[DataFrame, DataFrame]:
    """PPJoin candidate generation for ``jaccard_neighbor_pairs``:
    returns (per-node sorted adjacency lists, candidate pairs formed
    only through prefix tokens). Exposed so tests can pin the
    candidate-volume bound on hub-heavy graphs directly."""
    # global canonical token order: (corpus frequency asc, key asc) —
    # the rarest-first order every set sorts by, shared engine-wide
    freq = adj.groupBy("supp").agg(F.count(F.lit(1)).alias("freq"))
    lists = (
        adj.join(freq, "supp")
        .groupBy("cust")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("freq", "supp"))),
                lambda s: s["supp"],
            ).alias("supps")
        )
        .select("cust", "supps", F.size("supps").alias("d"))
    )
    # prefix length d − ⌈0.3·d⌉ + 1 (⌈3d/10⌉ = (3d+9) div 10)
    prefix = lists.select(
        "cust",
        F.explode(
            F.slice("supps", 1, F.expr("CAST(d - (d * 3 + 9) div 10 + 1 AS INT)"))
        ).alias("tok"),
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .where(F.col("a.cust") < F.col("b.cust"))
        .select(F.col("a.cust").alias("cust_a"), F.col("b.cust").alias("cust_b"))
        .distinct()
    )
    return lists, cand


def jaccard_neighbor_pairs(adj: DataFrame) -> DataFrame:
    """Exact ≥0.3-Jaccard neighbor pairs over a bipartite adjacency
    ``(cust, supp)`` via prefix-filtered candidates + array_intersect
    verification (see ``graph_jaccard_neighbors``)."""
    lists, cand = jaccard_prefix_candidates(adj)
    la = lists.select(
        F.col("cust").alias("cust_a"),
        F.col("supps").alias("sa"),
        F.col("d").alias("da"),
    )
    lb = lists.select(
        F.col("cust").alias("cust_b"),
        F.col("supps").alias("sb"),
        F.col("d").alias("db"),
    )
    verified = (
        cand.join(la, "cust_a")
        .join(lb, "cust_b")
        .select(
            "cust_a",
            "cust_b",
            F.size(F.array_intersect("sa", "sb")).cast("bigint").alias("n_common"),
            "da",
            "db",
        )
    )
    union_size = F.col("da") + F.col("db") - F.col("n_common")
    return (
        verified.where(F.col("n_common") * 10 >= union_size * 3)
        .select(
            "cust_a",
            "cust_b",
            "n_common",
            F.expr("CAST(n_common * 1000 div (da + db - n_common) AS BIGINT)")
            .alias("jaccard_permille"),
        )
    )


@query(
    "pagerank_mass_audit",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
    SELECT CAST((SELECT COUNT(DISTINCT c) FROM pairs)
              + (SELECT COUNT(DISTINCT s) FROM pairs) AS BIGINT) AS n_nodes,
           1 AS mass_conserved,
           1 AS all_above_floor
    """,
    tags=("graph", "iterative", "audit"),
)
def pagerank_mass_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable audit twin of the rows-only
    ``pagerank_bipartite`` (the ``kmeans_assignment_audit`` pattern):
    after the power iteration, one scalar aggregate verifies the two
    defining invariants of damped PageRank on a dangling-free graph —
    (a) MASS CONSERVATION: the rank vector still sums to exactly 1
    (each step maps total mass S to (1−d) + d·S, a fixpoint at 1, so
    any drift means dropped or duplicated nodes), and (b) the
    (1−d)/n FLOOR: no node ever falls below the teleport mass.
    The oracle independently recomputes the bipartite node count from
    orders ⋈ lineitem — a rank vector that lost nodes (e.g. a join
    that silently dropped in-degree-0 rows) fails the count, and one
    that leaked mass fails verdict (a). Ranks themselves stay
    engine-internal (float iteration order); the audit adds one
    scalar aggregate on top of the iteration, no extra shuffle. The
    mass tolerance is DERIVED from the node count (1e-9 + n·2.5e-15 ≈
    a generous multiple of n·ε accumulated over the iterations'
    per-node roundings) — a fixed absolute bound would mechanically
    trip on a CORRECT rank vector once n grows past ~10⁷, the
    scale-sound-verdict rule; a real mass leak (a dropped or
    double-counted edge partition) moves mass by O(1/n_parts), orders
    of magnitude above the bound at any n."""
    ranks = pagerank(spark, sf_dir)
    agg = ranks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum("rank").alias("mass"),
        F.min("rank").alias("min_rank"),
    )
    floor = (1.0 - PAGERANK_DAMPING) / F.col("n_nodes")
    mass_tol = F.lit(1e-9) + F.col("n_nodes") * F.lit(2.5e-15)
    return agg.select(
        "n_nodes",
        (F.abs(F.col("mass") - F.lit(1.0)) < mass_tol).cast("int").alias(
            "mass_conserved"
        ),
        (F.col("min_rank") >= floor - F.lit(1e-15)).cast("int").alias(
            "all_above_floor"
        ),
    )


# ---------------------------------------------------------------------------
# BFS hop census (exact multi-hop traversal with a recursive oracle)

#: BFS depth — enough hops that the census shows the expansion curve
#: (bipartite graphs alternate node kinds per hop)
BFS_MAX_HOPS = 4

#: the per-level frontier checkpoints of the latest invocation — the
#: only BFS state that must outlive the call (the returned census
#: DataFrame reads their union lazily). The edge caches are released
#: before the function returns; the frontiers are disjoint, so the
#: total retained bytes equal ONE copy of the final visited set (the
#: pre-r14 loop retained the same bytes as a single checkpoint).
#: Replaced, never accumulated.
_bfs_final: list = []


def _release_local_checkpoint(df) -> None:
    """Free the block-manager storage behind a ``localCheckpoint``-ed
    DataFrame. ``DataFrame.unpersist`` only reaches CacheManager
    entries, not checkpoint blocks; the checkpointed RDD itself hangs
    off the LogicalRDD analyzed plan. After this the df is
    unusable by design — only ever called on generations no live plan
    references."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # session stopped / plan shape changed: nothing to free


@query(
    "graph_bfs_hops",
    oracle=f"""
    WITH RECURSIVE e AS (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    seed AS (SELECT MIN(l_suppkey) AS s0 FROM lineitem),
    walk(node, hop) AS (
        SELECT s0 * 2 + 1, 0 FROM seed
        UNION
        SELECT CASE WHEN w.node % 2 = 1 THEN e.p * 2 ELSE e.s * 2 + 1 END,
               w.hop + 1
        FROM walk w JOIN e
          ON (w.node % 2 = 1 AND e.s = w.node // 2)
          OR (w.node % 2 = 0 AND e.p = w.node // 2)
        WHERE w.hop < {BFS_MAX_HOPS}),
    first_seen AS (SELECT node, MIN(hop) AS hop FROM walk GROUP BY node)
    SELECT CAST(hop AS BIGINT) AS hop,
           CAST(COUNT_IF(node % 2 = 0) AS BIGINT) AS n_parts,
           CAST(COUNT_IF(node % 2 = 1) AS BIGINT) AS n_suppliers,
           CAST(COALESCE(SUM(CASE WHEN node % 2 = 0 THEN node // 2 END), 0)
                AS BIGINT) AS part_key_sum,
           CAST(COALESCE(SUM(CASE WHEN node % 2 = 1 THEN node // 2 END), 0)
                AS BIGINT) AS supp_key_sum
    FROM first_seen GROUP BY hop ORDER BY hop
    """,
    tags=("graph", "traversal"),
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact breadth-first traversal census over the part↔supplier
    bipartite graph (an edge wherever a lineitem sold part p from
    supplier s), seeded at the smallest supplier key: per hop, how
    many new parts/suppliers become reachable and their key checksums
    — the reachability/expansion profile that sizes any graph
    computation before running it, and the engine's first exact
    TRAVERSAL face (pagerank is fixed-iteration numeric, connected
    components is pointer-doubling; this is level-synchronous BFS
    with min-hop semantics). The oracle is a genuinely recursive
    DuckDB CTE — Spark-side, the ≤{BFS_MAX_HOPS}-level frontier is
    unrolled statically: frontier ⋈ edges → anti-join visited →
    next frontier, each level one declarative join pair, so Catalyst
    sees the whole lineage (no driver-side loop state).

    Scale shape (hardened at the 100× replica, where the naive form
    OOM'd a vanilla 1 GiB session in the FIRST stage): (1) the edge
    relation repartitions the raw (partkey, suppkey) projection by key
    BEFORE the distinct — the excise-pair input-parallelism rule: a
    60M-row lineitem arrives as a handful of fat parquet splits, and a
    map-side dedup hash table over a fat split exceeds any small
    heap-per-core budget, while the repartition exchange itself is a
    sort-free spill-safe write and the dedup then runs on post-shuffle
    partitions Catalyst co-locates with the agg's requirement; (2)
    each BFS level's FRONTIER is MATERIALIZED **and its lineage
    TRUNCATED** via ``localCheckpoint(eager=True)`` (VERDICT r10 task
    4; narrowed to frontier-only by r13 task 5): the
    declaratively-unrolled form references the frontier twice and
    visited once per level, so the lazy lineage — and Catalyst's
    re-analysis cost — grew O(hops²) even though persist+count
    materialized execution (the old PLANS.md row printed 689
    composed shuffles); checkpointing the full accumulated visited
    set per level in turn wrote O(levels·|V|) block-manager bytes,
    so only the per-level frontier (the genuinely new rows) is
    checkpointed and ``visited`` is the lazy union of the flat
    frontier RDDs — every level still plans against LogicalRDDs and
    the registered plan is a single aggregate over their union; (3) frontier/visited join sides are
    shuffle_hash-pinned: they are node-scale but corpus-derived, and
    AQE's size estimate must never elect to broadcast a node-scale
    relation at 100 TB. Checkpoint storage is scoped per invocation
    (ADVICE r10): the edge caches are released before returning, and
    only the disjoint per-level frontiers (whose union the returned
    census plan reads — one visited set's worth of bytes in total)
    survive the call, replaced on the next one.
    Output is ≤{BFS_MAX_HOPS + 1} census rows of exact integers."""
    global _bfs_final
    for df in _bfs_final:
        _release_local_checkpoint(df)
    _bfs_final = []

    from watermill_kinesis_spark.sources.tables import adaptive_partitions

    # AQE off for the LEVEL LOOP only (optimization round 14, guide
    # §1.2 "configuration after algorithm"): every exchange inside the
    # loop is already explicitly sized (geometry-derived ``par``) and
    # strategy-pinned (shuffle_hash hints), so adaptive re-planning
    # contributes nothing but one stage-materialization round trip per
    # exchange per level — a pure driver-latency tax on an iterative
    # operator (alternating A/B at sf0.1: 2.24/2.61 s AQE-on vs
    # 1.89/1.95 s off; identical plans otherwise). This is NOT a
    # local[32] tune: the loop's partition counts scale with input
    # geometry, and the conf is restored in the existing ``finally``
    # before the returned census plan compiles, so the corpus-facing
    # aggregate still runs under AQE.
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    li = load_table(spark, sf_dir, "lineitem")
    # edge-relation partition count derived from the input geometry
    # (optimization round 14, guide §2): the distinct (p, s) relation
    # shuffles ~0.5× the lineitem parquet bytes, and EVERY level join
    # stage iterates these partitions — a flat defaultParallelism
    # pinned 32 near-empty tasks per level at sf0.1 (profiled ~0.2 s
    # task-overhead wall per join stage for KB-scale frontiers)
    par = adaptive_partitions(spark, sf_dir, "lineitem", expand=0.5)
    dedup = (
        li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .repartition(F.col("p"), F.col("s"))
        .distinct()
    )
    # TWO persisted copies, pre-partitioned on each traversal key
    # (optimization round 13, guide §2.4 "two operations keyed the same
    # way share one exchange"): every BFS level joins the edge relation
    # once on s and once on p — with a single unkeyed persist each of
    # the ≤2·BFS_MAX_HOPS level joins re-shuffled the full edge relation
    # to its key; pre-partitioned copies make the edge side of every
    # level join exchange-free (only the tiny frontier still shuffles).
    # Memory cost is one extra edge copy — per-node-key partitioned, the
    # same layout any production BFS keeps resident. The p-copy derives
    # from the PERSISTED s-copy (optimization round 14): deriving both
    # from the lazy dedup plan ran the scan+distinct pipeline twice,
    # once per copy's materialization.
    edges_s = dedup.repartition(par, "s").persist()
    edges_p = edges_s.repartition(par, "p").persist()
    seed = li.agg(F.min("l_suppkey").alias("k")).select(
        (F.col("k") * 2 + 1).alias("node"), F.lit(0).alias("hop")
    )
    # Per-level FRONTIER checkpoints (optimization round 14, VERDICT
    # r13 task 5): the former loop checkpointed the full accumulated
    # visited set every level — O(levels·|V|) block-manager writes,
    # with each superseded generation released by hand. Now only each
    # level's frontier (the genuinely new rows) is materialized;
    # ``visited`` is the lazy union of the ≤BFS_MAX_HOPS+1 flat
    # checkpointed levels, so the anti-join and the final census read
    # the same bytes as before while each level's job writes only
    # frontier-sized data. Lineage still stays flat: every level plans
    # against LogicalRDDs, never a growing recursive plan.
    frontier = seed.localCheckpoint(eager=True)
    levels = [frontier]
    visited = frontier
    try:
        for hop in range(1, BFS_MAX_HOPS + 1):
            # bipartite PARITY (optimization round 14): the graph has
            # only supplier↔part edges and the seed is a supplier
            # (odd node), so by induction the hop-(h−1) frontier is
            # all-odd when h is odd and all-even when h is even — the
            # other side's join input is provably empty. The former
            # loop still planned, scheduled, and ran BOTH joins every
            # level: half the level-join stages were full-width scans
            # of an edge cache against an empty frontier.
            if hop % 2 == 1:
                expanded = edges_s.join(
                    frontier.select(F.expr("node div 2").alias("s")).hint(
                        "shuffle_hash"
                    ),
                    "s",
                ).select((F.col("p") * 2).alias("node"))
            else:
                expanded = edges_p.join(
                    frontier.select(F.expr("node div 2").alias("p")).hint(
                        "shuffle_hash"
                    ),
                    "p",
                ).select((F.col("s") * 2 + 1).alias("node"))
            # the level count rides the checkpoint materialization job
            # via observe() — no separate count() job per level (the
            # connected_components convention)
            obs = Observation(f"bfs_hop_{hop}")
            nxt = (
                expanded.distinct()
                .join(
                    visited.select("node").hint("shuffle_hash"),
                    "node",
                    "left_anti",
                )
                .select("node", F.lit(hop).alias("hop"))
                .observe(obs, F.count(F.lit(1)).alias("n"))
                .localCheckpoint(eager=True)
            )
            if obs.get["n"] == 0:
                _release_local_checkpoint(nxt)
                break  # frontier exhausted — the graph is fully reached
            levels.append(nxt)
            visited = visited.unionByName(nxt)
            frontier = nxt
    finally:
        edges_s.unpersist(False)
        edges_p.unpersist(False)
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    _bfs_final = levels
    return (
        visited.groupBy("hop")
        .agg(
            F.count_if(F.col("node") % 2 == 0).cast("bigint").alias("n_parts"),
            F.count_if(F.col("node") % 2 == 1)
            .cast("bigint")
            .alias("n_suppliers"),
            F.coalesce(
                F.sum(
                    F.when(F.col("node") % 2 == 0, F.expr("node div 2"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("part_key_sum"),
            F.coalesce(
                F.sum(
                    F.when(F.col("node") % 2 == 1, F.expr("node div 2"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("supp_key_sum"),
        )
        .select(
            F.col("hop").cast("bigint").alias("hop"),
            "n_parts",
            "n_suppliers",
            "part_key_sum",
            "supp_key_sum",
        )
        .orderBy("hop")
    )
