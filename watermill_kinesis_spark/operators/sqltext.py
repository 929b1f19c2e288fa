"""SQL-text interface: the engine's ANSI-SQL entry point.

The reference exposes no query language; Layer B gives the engine one
"for free" through Spark SQL. ``register_views`` publishes every test
table as a temp view, and ``run_sql`` executes a SQL string against
them — so a user can drive the engine with plain SQL instead of the
DataFrame API, and Catalyst plans it identically (one logical plan,
same optimizer).

The registered queries run the *same SQL text* on Spark and on the
DuckDB oracle — a direct dialect-parity check on the common ANSI
surface (CTEs, joins, grouping, HAVING, window functions)."""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

from watermill_kinesis_spark.registry import query
from watermill_kinesis_spark.sources.tables import TABLE_NAMES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Publish every engine table as a temp view (idempotent). Views
    resolve through load_table, so the events timestamp normalization
    and the table memo/cache apply to SQL users too."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Run an ANSI SQL string against the engine's tables."""
    register_views(spark, sf_dir)
    return spark.sql(sql)


#: one SQL text, two engines: CTE → 3-way join → group/HAVING → window
_SQL_PARITY = """
WITH nation_orders AS (
    SELECT n.n_name AS nation, o.o_orderpriority AS priority
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
)
SELECT nation, priority, n_orders,
       RANK() OVER (PARTITION BY nation ORDER BY n_orders DESC, priority) AS rk
FROM (
    SELECT nation, priority, COUNT(*) AS n_orders
    FROM nation_orders
    GROUP BY nation, priority
    HAVING COUNT(*) > 5
) t
"""


@query("sql_text_interface", oracle=_SQL_PARITY, tags=("sql", "api"))
def sql_text_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: the exact same SQL text runs on Spark (via
    temp views over the engine tables) and on the DuckDB oracle —
    byte-for-byte dialect parity on the shared ANSI surface. Catalyst
    receives the identical logical plan a DataFrame formulation would
    produce (broadcast dim joins, partial aggregation, one window
    shuffle), so the SQL path inherits every scale property of the
    DataFrame path."""
    return run_sql(spark, sf_dir, _SQL_PARITY)


#: second parity text: correlated scalar subquery + set op + CASE +
#: date function — the other half of the common ANSI surface
_SQL_PARITY_2 = """
WITH big AS (
    SELECT o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
),
segments AS (
    SELECT c.c_mktsegment AS segment,
           CASE WHEN b.o_totalprice IS NULL THEN 'regular' ELSE 'whale' END
               AS order_class
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN big b ON b.o_custkey = o.o_custkey
                   AND b.o_totalprice = o.o_totalprice
)
SELECT segment, order_class, CAST(COUNT(*) AS BIGINT) AS n
FROM segments
GROUP BY segment, order_class
"""


@query("sql_text_subqueries", oracle=_SQL_PARITY_2, tags=("sql", "api"))
def sql_text_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second shared-text parity query: uncorrelated scalar subquery in
    a predicate, LEFT JOIN null-classification CASE, and a two-level
    grouping — exercises the subquery-rewrite half of the ANSI surface
    the first parity text doesn't touch. The AVG threshold is a double
    whose low bits MAY differ between engines (each sums doubles in its
    own order); it only drives a comparison, never an output value, and
    no 2-dp price sits within the few-ulp band where the two engines'
    thresholds could disagree — the classification, and therefore the
    hash, is stable. (Outputs themselves are exact integers.)"""
    return run_sql(spark, sf_dir, _SQL_PARITY_2)


#: one memoized child session per parent session — the recursion-fuse
#: override lives on the child; WeakKey so a discarded parent frees it
_RECURSIVE_CHILD_MEMO: "weakref.WeakKeyDictionary[SparkSession, SparkSession]" = (
    weakref.WeakKeyDictionary()
)

#: one SQL text, two engines: WITH RECURSIVE chain traversal (Spark 4
#: added recursive CTEs; DuckDB has them natively)
_SQL_RECURSIVE = """
WITH RECURSIVE edges AS (
    SELECT o_custkey, o_orderkey,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS next_key,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders),
chain(o_orderkey, depth) AS (
    SELECT o_orderkey, 1 FROM edges WHERE rn = 1
    UNION ALL
    SELECT e.next_key, c.depth + 1
    FROM chain c JOIN edges e ON e.o_orderkey = c.o_orderkey
    WHERE e.next_key IS NOT NULL)
SELECT o_orderkey, CAST(depth AS BIGINT) AS chain_depth FROM chain
"""


@query("sql_recursive_cte", oracle=_SQL_RECURSIVE, tags=("sql", "recursive"))
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE parity: each customer's orders form a
    chronological chain (LEAD builds the successor edges); the
    recursive member walks every chain from its root, numbering depth
    — the linked-list traversal shape behind org hierarchies, BOM
    explosions, and event causality chains. The same ``WITH
    RECURSIVE`` text runs on Spark 4 (UnionLoop iterative execution)
    and DuckDB; the row_number identity (depth == chronological rank)
    makes the result independently checkable. Recursion depth = max
    orders per customer (~25 here) — each iteration is one
    co-partitioned hash join of the frontier against the edge table,
    so a 100 TB chain-walk parallelizes per key, bounded by chain
    length not table size. The chain RELATION, however, emits one row
    per order — corpus-scale — and Spark 4 guards recursive CTEs with
    a DEFAULT 1,000,000-row ceiling (``spark.sql.cteRecursionRowLimit``),
    a runaway-recursion fuse, not a semantic bound: the r11 full 10×
    replica sweep hit it at 1.5M orders (RECURSION_ROW_LIMIT_EXCEEDED
    on a vanilla session). The operator raises the fuse to INT_MAX —
    never lowers it — because its recursion is structurally terminating
    (each step follows LEAD successors; depth ≤ max chain length).
    The override is SCOPED: it is set on a dedicated child session
    (``spark.newSession()`` — same SparkContext, isolated SQLConf and
    temp-view namespace), so the caller's session keeps the default
    runaway-recursion fuse for every other query. The child is
    MEMOIZED per parent (WeakKeyDictionary, the tables.py memo
    pattern): a resident engine calling this repeatedly reuses one
    child SessionState instead of accumulating a JVM catalog +
    temp-view set per call with only GC to reclaim them."""
    child = _RECURSIVE_CHILD_MEMO.get(spark)
    if child is None:
        child = spark.newSession()
        _RECURSIVE_CHILD_MEMO[spark] = child
    cur = int(child.conf.get("spark.sql.cteRecursionRowLimit", "1000000"))
    if cur < 2**31 - 1:
        child.conf.set("spark.sql.cteRecursionRowLimit", 2**31 - 1)
    return run_sql(child, sf_dir, _SQL_RECURSIVE)


#: the same logical query twice: Spark runs the Spark-4 PIPE syntax
#: (SQL chained with |>, each stage reading top-to-bottom), DuckDB the
#: classic nested spelling — value parity proves the pipe surface is
#: sugar over the same plan, not a different engine path.
_SQL_PIPE = """
FROM lineitem
|> WHERE l_shipdate >= DATE '1995-01-01'
|> AGGREGATE COUNT(*) AS n_items,
             SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
   GROUP BY l_returnflag, l_linestatus
|> WHERE n_items > 100
|> SELECT l_returnflag, l_linestatus, n_items, sum_qty, revenue_cents
"""


@query(
    "sql_pipe_interface",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 100
    """,
    tags=("sql", "spark4"),
)
def sql_pipe_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL *pipe syntax* (`|>`): the filter→aggregate→having
    chain written as sequential stages instead of inside-out nesting.
    Each `|>` stage is parsed into the same logical operators as the
    classic spelling, so Catalyst plans (pushdown, partial aggregation)
    are identical — verified here by value-parity against the oracle's
    classic GROUP BY/HAVING form, exact-integer aggregates."""
    return run_sql(spark, sf_dir, _SQL_PIPE)


#: one dialect-extension text, two engines: GROUP BY ALL infers the
#: grouping keys from the non-aggregate select items; ORDER BY ALL
#: orders by every select item left-to-right — both Spark 4 and DuckDB
#: implement the same inference rule, checked here by value parity.
_SQL_GROUP_BY_ALL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_shipdate < DATE '1996-01-01'
GROUP BY ALL
ORDER BY ALL
"""


@query("sql_group_by_all", oracle=_SQL_GROUP_BY_ALL, tags=("sql", "spark4"))
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GROUP BY ALL` + `ORDER BY ALL` (Spark 4 / DuckDB shared dialect
    extension): grouping keys are inferred from the non-aggregate
    select items, so adding a dimension to the SELECT can never
    silently desync from the GROUP BY — the exact same SQL text runs
    on both engines. Plans identically to the explicit spelling
    (pushed-down date filter, partial aggregation), since inference
    happens at analysis time, before Catalyst ever sees the plan."""
    return run_sql(spark, sf_dir, _SQL_GROUP_BY_ALL)


#: one GROUPING SETS text, two engines: four explicit sets (the full
#: cross, each single axis, and the grand total) with GROUPING()
#: disambiguating a genuine NULL key from a rolled-up axis.
_SQL_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                        (l_linestatus), ())
"""


@query(
    "sql_grouping_sets", oracle=_SQL_GROUPING_SETS, tags=("sql", "agg")
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit `GROUPING SETS` beyond the rollup_agg/cube_agg faces:
    an arbitrary set list (full cross, each axis alone, grand total)
    with `GROUPING()` flags — the ANSI way to distinguish a rolled-up
    axis from a genuinely NULL key, and the shape reporting layers
    feed to cube browsers. The exact same SQL text runs on Spark and
    DuckDB. Scale shape: Spark expands grouping sets into a single
    Expand + hash aggregate — one shuffle regardless of how many sets,
    with partial aggregation below it (vs one job per set if a user
    unioned four GROUP BYs)."""
    return run_sql(spark, sf_dir, _SQL_GROUPING_SETS)


#: one WINDOW-clause text, two engines: a NAMED window shared by a
#: ranking and a running-sum measure, money floored to exact cents
#: BEFORE the bigint cast (Spark truncates double→bigint, DuckDB
#: rounds — FLOOR makes both exact), over a corpus-cardinality
#: partition key with a unique total order (RANGE peers are single
#: rows, so the default ANSI frame is deterministic on both engines).
_SQL_NAMED_WINDOW = """
SELECT o_custkey, o_orderkey,
       CAST(RANK() OVER w AS BIGINT) AS order_seq,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) OVER w
            AS BIGINT) AS run_cents
FROM orders
WHERE o_custkey < 1000
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("sql_named_window", oracle=_SQL_NAMED_WINDOW, tags=("sql", "window"))
def sql_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI ``WINDOW`` clause (named window definitions shared by
    several OVER references) — the dialect-parity face the window
    family was missing: one window spec text feeds both a RANK and a
    running SUM, so a consumer can't desync the two specs while
    editing one of them. Plans identically to inline OVER specs (the
    name is resolved at analysis time; Catalyst sees one Window node
    for both measures — no extra exchange or sort for the second
    function). Partitioned by the corpus-cardinality customer key,
    never an enum."""
    return run_sql(spark, sf_dir, _SQL_NAMED_WINDOW)
