"""SQL-frontend queries (SURVEY.md §2.4 "Multi-statement SQL / query
language frontend" row): the engine's thin ``spark.sql`` passthrough —
Catalyst's parser/analyzer do the work; our layer registers the fixture
tables as views and binds parameters safely (named args, SURVEY.md A11 —
the reference binds ``$providencia``-style Cypher params at
streamlit_app.py:61-70; Spark >= 3.4 parameterized SQL is the
injection-safe equivalent).

Also carries the relational surface rows not yet covered elsewhere:
GROUPING SETS, correlated EXISTS, scalar subqueries, date/time scalar
functions, approximate distinct (HLL; rows-only — sketch internals are
engine-specific by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table, register_views


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    # Catalyst rewrites the correlated EXISTS into a left-semi join.
    return spark.sql("""
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
          AND NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
    """)


_EXISTS_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
"""


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
        FROM customer
        WHERE c_acctbal > 2 * (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE)
                              / COUNT(c_acctbal) FROM customer)
    """)


_SCALAR_SUBQ_SQL = """
SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_acctbal > 2 * (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE)
                              / COUNT(c_acctbal) FROM customer)
"""


def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: named-parameter binding through the SQL frontend (the
    injection-safe twin of the reference's $-params)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice >= :floor
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "floor": 1000.0},
    )


_SQL_PARAM_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice >= 1000.0
GROUP BY o_orderpriority
"""


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.quarter("o_orderdate").cast("long").alias("o_quarter"),
            F.month("o_orderdate").cast("long").alias("o_month"),
            F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
            # dates serialized as ISO strings: Spark DATE -> datetime.date
            # but DuckDB DATE -> datetime64 in pandas; string output makes
            # the driver's value-hash representation-independent
            F.date_format(F.date_add(F.to_date("o_orderdate"), 30), "yyyy-MM-dd")
            .alias("due_date"),
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
            F.datediff(F.to_date(F.lit("2025-01-01")), F.to_date("o_orderdate"))
            .cast("long")
            .alias("days_to_2025"),
        )
        .filter(F.col("o_orderkey") < 500)
    )


_DATE_FUNCS_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
       CAST(month(o_orderdate) AS BIGINT) AS o_month,
       CAST(day(o_orderdate) AS BIGINT) AS o_day,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2025-01-01') AS days_to_2025
FROM orders
WHERE o_orderkey < 500
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct per event_type. Rows-only: sketch
    estimates are engine-specific; accuracy vs exact is property-tested
    in tests/test_sql_queries.py (rsd 5% default)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count("*").alias("n_events"),
    )


def q_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive reachability (min hop count <= 3 from node 7) over
    the similitud>=35 similarity graph via WITH RECURSIVE (Spark 4's
    recursive CTE — each iteration is a planned join, the fixed point
    handled by the engine; contrast operators.graph_algos.bfs_distances
    which drives the loop from Python). The edge build is the fully-
    distributed tile-blocked exact all-pairs path (per-task cost
    O(block^2), no driver-side corpus materialization); at 100 TB swap
    in the LSH-approximate edge set.

    The UNION ALL recursion enumerates paths, bounded by the hop cap;
    the outer MIN(hop) aggregate collapses them. On a sparse graph
    (avg degree ~1 at this threshold) the path count stays linear."""
    from providenciasbigdata_spark.operators.similarity import pairwise_cosine_blocked

    emb = load_table(spark, sf_dir, "embeddings")
    edges = pairwise_cosine_blocked(emb, threshold=35.0, scale=100.0, block_size=512).select(
        F.col("left_id").alias("src"), F.col("right_id").alias("dst")
    )
    # persist: the recursive join replays the view once per iteration,
    # and the O(n^2) tile-matmul edge build dominates the query —
    # caching it turns 3 rebuilds into 1 (2.6s -> 1.6s at sf0.1).
    # The tiny result is localCheckpoint'ed eagerly so the cache can be
    # released HERE instead of accumulating across a 157-query session.
    edges = edges.persist()
    try:
        edges.createOrReplaceTempView("sim_edges")
        out = spark.sql("""
            WITH RECURSIVE reach(dst, hop) AS (
              SELECT dst, 1 AS hop FROM sim_edges WHERE src = 7
              UNION ALL
              SELECT e.dst, r.hop + 1 FROM reach r JOIN sim_edges e ON e.src = r.dst
              WHERE r.hop < 3)
            SELECT CAST(dst AS BIGINT) AS dst, CAST(MIN(hop) AS BIGINT) AS min_hop
            FROM reach GROUP BY dst ORDER BY dst
        """).localCheckpoint(eager=True)
    finally:
        edges.unpersist()
    return out


_RECURSIVE_SQL = """
WITH RECURSIVE edges AS MATERIALIZED (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) * 100, 4) >= 35),
reach(dst, hop) AS (
  SELECT dst, 1 AS hop FROM edges WHERE src = 7
  UNION ALL
  SELECT e.dst, r.hop + 1 FROM reach r JOIN edges e ON e.src = r.dst WHERE r.hop < 3)
SELECT CAST(dst AS BIGINT) AS dst, CAST(MIN(hop) AS BIGINT) AS min_hop
FROM reach GROUP BY dst ORDER BY dst
"""


def q_sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language scalar UDF (SQL:2016 / Spark 4 ``CREATE FUNCTION
    ... RETURN expr``): the function body is a Catalyst expression, so
    unlike external UDFs it inlines into the caller's plan — pushdown,
    codegen and constant folding all still apply. The reusable-logic
    surface without the Python-worker tax."""
    register_views(spark, sf_dir)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION net_revenue(p DOUBLE, d DOUBLE, t DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d) * (1 + t)
    """)
    return spark.sql("""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(SUM(CAST(net_revenue(l_extendedprice, l_discount, l_tax)
                                   AS DECIMAL(28,10))) AS DOUBLE), 2) AS total_net
        FROM lineitem GROUP BY l_returnflag
    """)


_SQL_SCALAR_UDF_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           AS DECIMAL(28,10))) AS DOUBLE), 2) AS total_net
FROM lineitem GROUP BY l_returnflag
"""


def q_sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language TABLE function: a 24-hour spine generated by the
    function left-joined against per-hour event counts, so silent hours
    surface as zero rows (the gap-filling shape every ops dashboard
    needs). The function body is a plain subquery — planned and
    optimized like any view."""
    register_views(spark, sf_dir)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION hour_spine()
        RETURNS TABLE(hour INT)
        RETURN SELECT explode(sequence(0, 23)) AS hour
    """)
    return spark.sql("""
        SELECT s.hour, CAST(COALESCE(e.n, 0) AS BIGINT) AS n_events
        FROM hour_spine() s
        LEFT JOIN (
          SELECT hour(ts) AS hour, COUNT(*) AS n FROM events GROUP BY 1
        ) e ON s.hour = e.hour
    """)


_SQL_TABLE_UDF_SQL = """
SELECT s.hour, CAST(COALESCE(e.n, 0) AS BIGINT) AS n_events
FROM (SELECT CAST(unnest(generate_series(0, 23)) AS INTEGER) AS hour) s
LEFT JOIN (
  SELECT CAST(hour(ts) AS INTEGER) AS hour, COUNT(*) AS n FROM events GROUP BY 1
) e ON s.hour = e.hour
"""


def q_sql_identifier_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Injection-safe DYNAMIC IDENTIFIERS: the reference interpolates
    nothing (its params are values — A11), but a config-driven engine
    also needs table/column names as parameters. String-formatting
    identifiers into SQL is the injection vector; Spark 4's
    IDENTIFIER(:param) binds them like values, parsed as a single
    identifier or nothing."""
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT IDENTIFIER(:keycol) AS region_key, COUNT(*) AS n "
        "FROM IDENTIFIER(:tbl) GROUP BY IDENTIFIER(:keycol)",
        args={"tbl": "nation", "keycol": "n_regionkey"},
    )


_SQL_IDENTIFIER_SQL = """
SELECT n_regionkey AS region_key, COUNT(*) AS n FROM nation GROUP BY n_regionkey
"""


def q_sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``EXECUTE IMMEDIATE`` + session VARIABLES (round 6): the
    dynamic-SQL completion of the A11 binding story — the query TEXT
    itself arrives at runtime (stored-proc/config-driven shape), its
    parameters bind by name through USING from a declared session
    variable, so nothing is ever string-interpolated. The inner
    statement is planned exactly like the static form (same Catalyst
    plan, parameter folded as a literal)."""
    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE v_minqty DOUBLE")
    spark.sql("SET VAR v_minqty = 30.0")
    stmt = (
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS total_qty "
        "FROM lineitem WHERE l_quantity >= :minq "
        "GROUP BY l_returnflag"
    )
    return spark.sql(
        "EXECUTE IMMEDIATE :stmt USING v_minqty AS minq",
        args={"stmt": stmt},
    )


_SQL_EXEC_IMMEDIATE_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS total_qty
FROM lineitem WHERE l_quantity >= 30.0
GROUP BY l_returnflag
"""


def q_governance_mask_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking at the projection edge via the built-in ``mask``
    expression (upper->X, lower->x, digit->n): the column-level
    redaction a governed lakehouse applies before data leaves the
    trust boundary. Pure Catalyst expression — applies at scan speed,
    composes with column pruning."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.mask(F.col("c_name")).alias("masked_name"),
        F.mask(F.col("c_mktsegment")).alias("masked_segment"),
    )


_MASK_SQL = """
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(
           c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
           AS masked_name,
       regexp_replace(regexp_replace(regexp_replace(
           c_mktsegment, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
           AS masked_segment
FROM customer
"""




def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+/DuckDB shared sugar): every non-
    aggregate select item becomes a grouping key — the analyst
    shorthand, resolving to the identical hash-aggregate plan."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE), 2)
                   AS total
        FROM orders
        GROUP BY ALL
        """
    )


_SQL_GROUP_ALL_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE), 2) AS total
FROM orders
GROUP BY ALL
"""


_NOT_IN_SQL = """
SELECT c_custkey
FROM customer
WHERE NULLIF(c_nationkey, 3) NOT IN
      (SELECT n_nationkey FROM nation WHERE n_name LIKE 'NATION_1%')
  AND c_custkey < 500
"""


def q_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-aware NOT IN anti join — the three-valued-logic corner
    every naive anti-join rewrite gets wrong: rows whose probe key is
    NULL must NOT qualify (NULL NOT IN (...) is UNKNOWN, not TRUE).
    NULLIF plants NULLs on the outer side so the semantics are actually
    exercised; Catalyst plans the null-aware anti join variant. Same
    ANSI text runs on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_NOT_IN_SQL)


# one SQL text, two engines: Spark >= 3.5 and DuckDB share the ANSI
# LATERAL correlated-subquery grammar (incl. ORDER BY + LIMIT inside)
_LATERAL_SQL = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 9500) c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 2
) o
"""


def q_sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — the SQL-standard per-row top-k
    (each rich customer's 2 priciest orders). Catalyst decorrelates
    the LIMIT-ed lateral into a window-rank over one join, so the
    plan is the same shuffle-once shape as the DataFrame
    row_number formulation, written in portable ANSI SQL. The oracle
    runs the IDENTICAL text on DuckDB."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


def q_sql_pivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-syntax PIVOT (Spark's ``FROM ... PIVOT (agg FOR col IN
    (...))``) — the frontend form of the DataFrame pivot the engine
    already covers; the IN list is explicit, so Catalyst plans ONE
    aggregate with a conditional projection per pivot value (no
    second pass to discover values). Oracle expresses the identical
    result with portable FILTER aggregates."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT * FROM (
          -- PIVOT groups by every remaining column: project to exactly
          -- (group key, pivot column) or stray columns explode the grain
          SELECT o_orderpriority, o_orderstatus FROM orders
        )
        PIVOT (
          CAST(COUNT(*) AS BIGINT) AS n
          FOR o_orderstatus IN ('O' AS st_o, 'F' AS st_f, 'P' AS st_p)
        )
        ORDER BY o_orderpriority
    """)


_SQL_PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS st_o,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS st_f,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS st_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_sql_unpivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-syntax UNPIVOT (``FROM ... UNPIVOT (v FOR k IN (...))``):
    wide-to-long without the DataFrame stack() incantation; NULL
    measures are dropped by default per the standard (INCLUDE NULLS
    opts out). Oracle is the portable UNION ALL lowering — the exact
    relational definition of UNPIVOT."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, metric, CAST(amount AS DOUBLE) AS amount FROM (
          SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS balance,
                 CAST(c_nationkey AS DOUBLE) AS nation
          FROM customer WHERE c_custkey <= 200
        )
        UNPIVOT ( amount FOR metric IN (balance, nation) )
        ORDER BY c_custkey, metric
    """)


_SQL_UNPIVOT_SQL = """
WITH c AS (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS balance,
                  CAST(c_nationkey AS DOUBLE) AS nation
           FROM customer WHERE c_custkey <= 200)
SELECT c_custkey, 'balance' AS metric, balance AS amount FROM c
  WHERE balance IS NOT NULL
UNION ALL
SELECT c_custkey, 'nation' AS metric, nation AS amount FROM c
  WHERE nation IS NOT NULL
ORDER BY c_custkey, metric
"""


def q_sql_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause (SQL:2003 ``WINDOW w AS (...)``): one
    window definition shared by several functions — the frontend
    dedup of the repeated OVER spec; Catalyst plans a single Window
    operator for all three. DuckDB supports the same clause, so the
    oracle is nearly verbatim."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
               CAST(LAG(o_orderkey) OVER w AS BIGINT) AS prev_order,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
                 AS run_total
        FROM orders WHERE o_custkey <= 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """)


_SQL_NAMED_WINDOW_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(LAG(o_orderkey) OVER w AS BIGINT) AS prev_order,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
         AS run_total
FROM orders WHERE o_custkey <= 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0 SPIP, round 7): the sequential
    ``FROM … |> WHERE … |> AGGREGATE … |> …`` form — operators apply
    top-to-bottom in reading order instead of SQL's inside-out
    nesting. Resolves to the identical hash-aggregate plan as the
    nested form; the oracle is the plain-SQL equivalent (DuckDB has no
    pipe dialect — the comparison proves the pipe lowering, not the
    syntax)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= DATE '1994-01-01'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
                     ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10)))
                                AS DOUBLE), 2) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n > 0
        |> SELECT l_returnflag, l_linestatus, n, revenue
        """
    )


_SQL_PIPE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE), 2)
           AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1994-01-01'
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 0
"""


QUERIES = {
    "sql_pipe_syntax": (q_sql_pipe_syntax, _SQL_PIPE_SQL),
    "sql_pivot_syntax": (q_sql_pivot_syntax, _SQL_PIVOT_SQL),
    "sql_unpivot_syntax": (q_sql_unpivot_syntax, _SQL_UNPIVOT_SQL),
    "sql_named_window": (q_sql_named_window, _SQL_NAMED_WINDOW_SQL),
    "sql_lateral_topk": (q_sql_lateral_topk, _LATERAL_SQL),
    "sql_recursive_reachability": (q_recursive_reachability, _RECURSIVE_SQL),
    "sql_not_in_null_aware": (q_not_in_null_aware, _NOT_IN_SQL),
    "sql_scalar_udf": (q_sql_scalar_udf, _SQL_SCALAR_UDF_SQL),
    "sql_table_udf": (q_sql_table_udf, _SQL_TABLE_UDF_SQL),
    "sql_identifier_param": (q_sql_identifier_param, _SQL_IDENTIFIER_SQL),
    "sql_execute_immediate": (q_sql_execute_immediate, _SQL_EXEC_IMMEDIATE_SQL),
    "governance_mask_names": (q_governance_mask_names, _MASK_SQL),
    "sql_grouping_sets": (q_grouping_sets, _GROUPING_SETS_SQL),
    "sql_exists_subquery": (q_exists_subquery, _EXISTS_SQL),
    "sql_scalar_subquery": (q_scalar_subquery, _SCALAR_SUBQ_SQL),
    "sql_parameterized": (q_sql_parameterized, _SQL_PARAM_SQL),
    "date_functions": (q_date_functions, _DATE_FUNCS_SQL),
    "approx_distinct_users": (q_approx_distinct, None),
    "sql_group_by_all": (q_sql_group_by_all, _SQL_GROUP_ALL_SQL),
}

WHY_NO_ORACLE = {
    "approx_distinct_users": (
        "HyperLogLog++ estimate (approx_count_distinct) — engine-specific "
        "sketch, no cross-engine value identity; relative error vs exact "
        "COUNT(DISTINCT) pinned in pytest"
    ),
}
