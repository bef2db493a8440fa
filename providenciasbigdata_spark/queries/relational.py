"""Relational-surface queries (SURVEY.md §2.4 "driver" rows).

One oracle-checked query per operator category the reference lacks
(it has NO joins/aggs/windows — SURVEY.md §2.4) but the driver harness
and any real analytics workload needs, over the TPC-H-ish fixtures.

Cross-engine determinism rules (driver hash compare, see
queries/__init__.py):
- money sums go through DECIMAL(28,10) (exact, order-independent),
  then cast to DOUBLE and ROUND identically on both sides;
- averages divide the decimal sum cast to double by the count (same
  IEEE op both engines), then round;
- integer outputs cast to BIGINT; Spark ``year()``/``row_number()``
  return INT, DuckDB's return BIGINT;
- every LIMIT/top-k has a total-order tiebreak;
- timestamps compare via ``unix_micros`` (Spark) == ``epoch_us``
  (DuckDB) when arithmetic is involved.

Scale notes: dims (region/nation/supplier) are broadcast explicitly;
fact-fact joins rely on AQE for skew; window queries partition by the
natural key so state stays bounded per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators.joins import asof_join, range_join

_DEC = "decimal(28,10)"


def _dec_sum(col, digits=2):
    """Exact decimal sum -> double, rounded: order-independent and
    identical across engines."""
    return F.round(F.sum(col.cast(_DEC)).cast("double"), digits)


def _dec_avg(col, count_col, digits=6):
    return F.round(F.sum(col.cast(_DEC)).cast("double") / F.count(count_col), digits)


# SQL twins of the helpers above
def _sql_sum(expr, alias, digits=2):
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(28,10))) AS DOUBLE), {digits}) AS {alias}"


def _sql_avg(expr, cnt, alias, digits=6):
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(28,10))) AS DOUBLE) / COUNT({cnt}), {digits})"
        f" AS {alias}"
    )


# ---- aggregation: TPC-H Q1-shaped pricing summary ----------------------

def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity")).alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dec_sum(disc).alias("sum_disc_price"),
            _dec_sum(charge).alias("sum_charge"),
            _dec_avg(F.col("l_quantity"), "l_quantity").alias("avg_qty"),
            _dec_avg(F.col("l_extendedprice"), "l_extendedprice").alias("avg_price"),
            _dec_avg(F.col("l_discount"), "l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_AGG_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_sum('l_quantity', 'sum_qty')},
       {_sql_sum('l_extendedprice', 'sum_base_price')},
       {_sql_sum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {_sql_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {_sql_avg('l_quantity', 'l_quantity', 'avg_qty')},
       {_sql_avg('l_extendedprice', 'l_extendedprice', 'avg_price')},
       {_sql_avg('l_discount', 'l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---- join + agg + top-k: TPC-H Q3-shaped shipping priority -------------

def q_join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dec_sum(disc).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


_JOIN_Q3_SQL = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       {_sql_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ---- multi-join: TPC-H Q5-shaped revenue by nation ---------------------

def q_join_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dec_sum(disc).alias("revenue"), F.count("*").alias("n_items"))
    )


_JOIN_Q5_SQL = f"""
SELECT n_name, {_sql_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY n_name
"""


# ---- semi / anti joins -------------------------------------------------

def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---- window: ranking, analytics, running frames ------------------------

def q_window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


_WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_window_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta_value"),
    )


_WINDOW_LAG_SQL = """
SELECT event_id, user_id,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
       ROUND(value - LAG(value) OVER w, 6) AS delta_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round(F.sum(F.col("l_quantity").cast(_DEC)).over(w).cast("double"), 2).alias(
            "running_qty"
        ),
    )


_WINDOW_RUNNING_SQL = """
SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_qty
FROM lineitem
"""


# ---- rollup / cube -----------------------------------------------------

def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity")).alias("sum_qty"), F.count("*").alias("n")
    )


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        _dec_sum(F.col("o_totalprice")).alias("sum_price"), F.count("*").alias("n")
    )


# ---- set operations ----------------------------------------------------

def q_setops_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return o.union(f).distinct().intersect(f).subtract(p)


_SETOPS_SQL = """
SELECT o_custkey FROM (
  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
   UNION
   SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


def q_setops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — EXCEPT ALL / INTERSECT ALL keep
    multiplicities, the semantics `exceptAll`/`intersectAll` added
    that plain EXCEPT/INTERSECT can't express: a custkey with 5 orders
    over 200k of which 2 are over 400k survives EXCEPT ALL 3 times.
    Both engines implement the ANSI bag semantics; the count aggregate
    on top makes the multiplicity itself the checked value."""
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    huge = orders.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return (
        big.exceptAll(huge)
        .groupBy("o_custkey")
        .agg(F.count("*").cast("long").alias("multiplicity"))
    )


_SETOPS_MULTISET_SQL = """
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS multiplicity
FROM (
  SELECT o_custkey FROM orders WHERE o_totalprice > 200000
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_totalprice > 400000
)
GROUP BY o_custkey
"""


# ---- distinct aggregates ----------------------------------------------

def q_agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


# ---- sort / global top-k ----------------------------------------------

def q_sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # lowers to TakeOrderedAndProject: no full sort, per-partition heaps
    return orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(10).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# ---- scalar function sampler ------------------------------------------

def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return orders.select(
        "o_orderkey",
        F.lower(F.substring("o_orderpriority", 3, 20)).alias("prio_word"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.round(F.col("o_totalprice") * 1.1, 2).alias("price_with_tax"),
    )


_SCALAR_SQL = """
SELECT o_orderkey,
       lower(substr(o_orderpriority, 3)) AS prio_word,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
       CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
       ROUND(o_totalprice * 1.1, 2) AS price_with_tax
FROM orders WHERE o_orderkey <= 100
"""


# ---- JSON extraction (events.props) ------------------------------------

def q_json_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.sum(k).cast("double") / F.count(k), 6).alias("avg_k"),
        F.max("value").alias("max_value"),
    )


_JSON_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       ROUND(CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
       MAX(value) AS max_value
FROM events GROUP BY event_type
"""


# ---- pivot (conditional aggregation) -----------------------------------

def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_finished"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_pending"),
    )


_PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
FROM orders GROUP BY o_orderpriority
"""


# ---- as-of join (custom operator; DuckDB ASOF JOIN as oracle) ----------

def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.unix_micros("ts").alias("purchase_us")
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        on="ts",
        by="user_id",
        right_cols=["purchase_us"],
    )
    return joined.select("event_id", "user_id", "purchase_us")


_ASOF_SQL = """
SELECT e.event_id, e.user_id, epoch_us(p.ts) AS purchase_us
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


def q_asof_forward_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each event tagged with the user's NEXT
    purchase timestamp (>= its own) — the 'time until conversion'
    primitive; descending cumulative window over the same union plan
    as backward. DuckDB's ASOF only walks backward, so the oracle uses
    the reversed inequality form it does support."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.unix_micros("ts").alias("purchase_us")
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        on="ts",
        by="user_id",
        right_cols=["purchase_us"],
        direction="forward",
    )
    return joined.select("event_id", "user_id", "purchase_us")


_ASOF_FWD_SQL = """
SELECT e.event_id, e.user_id, epoch_us(p.ts) AS purchase_us
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts <= p.ts
"""


def q_asof_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: the closest purchase in either direction,
    exact ties preferring backward (pandas' rule) — both cumulative
    windows over one union, one pick expression. Oracle: correlated
    min-distance subqueries with the same tie rule."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.unix_micros("ts").alias("purchase_us")
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        on="ts",
        by="user_id",
        right_cols=["purchase_us"],
        direction="nearest",
    )
    return joined.select("event_id", "user_id", "purchase_us")


_ASOF_NEAREST_SQL = """
WITH p AS (SELECT user_id, ts, epoch_us(ts) AS purchase_us
           FROM events WHERE event_type = 'purchase'),
b AS (SELECT e.event_id, e.user_id, e.ts, MAX(p.purchase_us) AS back_us
      FROM events e LEFT JOIN p ON p.user_id = e.user_id AND p.ts <= e.ts
      GROUP BY 1, 2, 3),
f AS (SELECT e.event_id, MIN(p.purchase_us) AS fwd_us
      FROM events e LEFT JOIN p ON p.user_id = e.user_id AND p.ts >= e.ts
      GROUP BY 1)
SELECT b.event_id, b.user_id,
       CASE WHEN f.fwd_us IS NULL THEN b.back_us
            WHEN b.back_us IS NULL THEN f.fwd_us
            WHEN epoch_us(b.ts) - b.back_us <= f.fwd_us - epoch_us(b.ts)
              THEN b.back_us
            ELSE f.fwd_us END AS purchase_us
FROM b JOIN f USING (event_id)
"""


# ---- range join (bucketized; plain theta-join as oracle) ---------------

def q_range_clicks_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.unix_micros("ts").alias("lo_us"),
        (F.unix_micros("ts") + hour_us).alias("hi_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.unix_micros("ts").alias("click_us"),
    )
    joined = range_join(
        clicks,
        purchases,
        left_point="click_us",
        right_lo="lo_us",
        right_hi="hi_us",
        by=["user_id"],
        bucket_width=hour_us,
    )
    return joined.groupBy("purchase_id").agg(F.count("*").alias("n_clicks"))


_RANGE_SQL = """
SELECT p.purchase_id, COUNT(*) AS n_clicks
FROM (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS lo_us,
             epoch_us(ts) + 3600000000 AS hi_us
      FROM events WHERE event_type = 'purchase') p
JOIN (SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_us
      FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id AND c.click_us >= p.lo_us AND c.click_us <= p.hi_us
GROUP BY p.purchase_id
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp fixture -> unit prices from
    lineitem): for each part under 100, the supplier(s) whose minimum
    unit price hits that part's global minimum. The correlated
    'WHERE price = (SELECT MIN ...)' decorrelates into a per-part
    min-agg joined back on (partkey, price) — both sides prune to the
    same 100-part filter, and the min-agg side broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 100)
    supp = load_table(spark, sf_dir, "supplier")
    unit = F.round((F.col("l_extendedprice") / F.col("l_quantity")), 4)
    offers = (
        li.select("l_partkey", "l_suppkey", unit.alias("unit_price"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit_price").alias("best_offer"))
    )
    # part_min derives FROM offers — rename its columns so the
    # self-referential join condition stays unambiguous (Spark resolves
    # same-lineage refs to a trivially-true predicate otherwise)
    part_min = (
        offers.groupBy("l_partkey")
        .agg(F.min("best_offer").alias("min_price"))
        .withColumnRenamed("l_partkey", "pm_partkey")
    )
    return (
        offers.join(
            F.broadcast(part_min),
            (F.col("l_partkey") == F.col("pm_partkey"))
            & (F.col("best_offer") == F.col("min_price")),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("s_name").alias("supplier"),
            F.col("min_price"),
        )
    )


_MIN_COST_SQL = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(ROUND(l_extendedprice / l_quantity, 4)) AS best_offer
  FROM lineitem WHERE l_partkey < 100
  GROUP BY l_partkey, l_suppkey
)
SELECT o.l_partkey AS partkey, s.s_name AS supplier, o.best_offer AS min_price
FROM offers o JOIN supplier s ON o.l_suppkey = s.s_suppkey
WHERE o.best_offer = (SELECT MIN(best_offer) FROM offers i
                      WHERE i.l_partkey = o.l_partkey)
"""


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per nation, count + total balance of customers
    with above-average positive balance and NO orders. Scalar avg
    subquery (one-row broadcast cross join) + broadcast anti join on
    the distinct order keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(_DEC)).cast("double") / F.count("*")).alias(
            "avg_bal"
        )
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(
        orders.select("o_custkey").distinct(),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        _dec_sum(F.col("c_acctbal")).alias("total_balance"),
    )


_IDLE_RICH_SQL = """
SELECT c_nationkey, COUNT(*) AS n_customers,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE), 2)
         AS total_balance
FROM customer c
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE)
                          / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_nationkey
"""


def q_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: yearly trade volume between two nation pairs —
    supplier nation x customer nation x ship-year. A 4-way join where
    every dimension (nation twice, supplier, customer) broadcasts and
    the two fact tables (lineitem, orders) join on orderkey; the
    nation-pair filter prunes before the fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(_dec_sum(F.col("volume")).alias("revenue"))
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(28,10))) AS DOUBLE), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def q_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three composite
    (brand, size, quantity) predicates. One fact-dim join; the
    disjunction stays a single scan-level filter — Catalyst pushes the
    common l_quantity bounds and evaluates the OR post-scan without
    multiplying scans (no UNION rewrite)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    p = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#13") & (F.col("p_size").between(10, 25))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#25") & (F.col("p_size").between(20, 50))
           & (F.col("l_quantity").between(20, 30)))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(p).agg(
        _dec_sum(revenue).alias("revenue"), F.count("*").alias("n_lines")
    )


_Q19_SQL = """
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(28,10))) AS DOUBLE), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1  AND 15
       AND l.l_quantity BETWEEN 1  AND 11)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
"""


def q_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value analytic functions: each customer's first
    and most recent order price by date (full-partition frame so
    last_value sees the real last row, not the running current row)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey", "o_orderkey",
        F.first_value("o_totalprice").over(w).alias("first_price"),
        F.last_value("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


_FIRST_LAST_SQL = """
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER w AS last_price,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price
FROM orders WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of PROMO-part order volume
    sold into ASIA-region customers, per order year. Every dimension
    (part-filtered, supplier, customer, nation x2, region) broadcasts;
    the only shuffle is lineitem-orders on orderkey plus the final tiny
    per-year aggregate. Share = conditional decimal sum / total decimal
    sum, both cast to double before the divide (same IEEE op as the
    oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n_cust = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("s_nk"))
    )
    target = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        j.select(F.year("o_orderdate").cast("long").alias("o_year"),
                 volume.alias("vol"), target.alias("tvol"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.col("tvol").cast(_DEC)).cast("double")
                / F.sum(F.col("vol").cast(_DEC)).cast("double"),
                6,
            ).alias("mkt_share"),
            _dec_sum(F.col("vol")).alias("total_volume"),
        )
    )


_Q8_SQL = """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3'
                                THEN l.l_extendedprice * (1 - l.l_discount)
                                ELSE 0.0 END AS DECIMAL(28,10))) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,10))) AS DOUBLE), 6) AS mkt_share,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(28,10))) AS DOUBLE), 2) AS total_volume
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
GROUP BY 1
"""


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation x order year for parts
    whose name contains 'red'. The fixture set has no partsupp table,
    so unit cost is derived deterministically from the part dimension
    (10% of retail price) — the join/agg shape is Q9's: fact-fact on
    orderkey, three broadcast dims, two-level group."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.1 * F.col("l_quantity")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_dec_sum(F.col("amount")).alias("sum_profit"))
    )


_Q9_SQL = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           - p.p_retailprice * 0.1 * l.l_quantity
                           AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


def q_scd2_purchase_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 snapshot: each purchase event
    updates the user's profile value; output the validity intervals
    [valid_from, valid_to) per user with an is_current flag — the
    standard lead() build of an SCD2 table from a change stream. The
    window partitions by user_id, so state per task is one user's
    history; no global ordering anywhere."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        F.col("value").alias("profile_value"),
        nxt.isNull().cast("int").cast("long").alias("is_current"),
    )


_SCD2_SQL = """
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(LEAD(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
       value AS profile_value,
       CAST((LEAD(ts) OVER w IS NULL) AS BIGINT) AS is_current
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_pit_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: every click joins the SCD2
    profile interval valid AT CLICK TIME ([valid_from, valid_to), open
    current interval matches everything after valid_from) — the
    warehousing pattern behind feature-store lookups and as-of
    attribution. Equi-join on user_id with the interval predicate as a
    residual: per-user interval lists are small, so the shuffle is by
    user and each task scans its user's handful of intervals. Exact
    DECIMAL sum of the attributed profile values."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scd2 = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.col("value").alias("profile_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    j = clicks.join(
        scd2,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return j.groupBy("user_id").agg(
        F.count("*").alias("n_attributed_clicks"),
        F.round(
            F.sum(F.col("profile_value").cast("decimal(28,10)")).cast("double"), 4
        ).alias("sum_profile_value"),
    )


_PIT_JOIN_SQL = """
WITH scd2 AS (
  SELECT user_id AS p_user, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to,
         value AS profile_value
  FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_attributed_clicks,
       ROUND(CAST(SUM(CAST(profile_value AS DECIMAL(28,10))) AS DOUBLE), 4)
           AS sum_profile_value
FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
JOIN scd2 s
  ON c.user_id = s.p_user AND s.valid_from <= c.ts
 AND (s.valid_to IS NULL OR c.ts < s.valid_to)
GROUP BY c.user_id
"""


def q_cdc_latest_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-wins compaction: purchase events upsert a user's
    value, error events delete the user; output the surviving current
    state. One key-partitioned window (operators.cdc.latest_state) —
    the delete filter runs after the latest-row pick so an old upsert
    can't resurrect a deleted key."""
    from providenciasbigdata_spark.operators.cdc import latest_state

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    out = latest_state(
        ev,
        keys=["user_id"],
        order_cols=["ts", "event_id"],
        delete_predicate=F.col("event_type") == "error",
    )
    return out.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("updated_at"),
        F.col("value").alias("current_value"),
    )


_CDC_LATEST_SQL = """
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS updated_at,
       value AS current_value
FROM (
  SELECT user_id, ts, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_type IN ('purchase', 'error')
)
WHERE rn = 1 AND event_type <> 'error'
"""


def q_incremental_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the pre-1998 order-revenue rollup
    is the standing state; 1998+ orders arrive as the delta and are
    folded in via operators.cdc.merge_agg_state — history is never
    rescanned after its partial agg. The oracle aggregates the WHOLE
    table from scratch: incremental must equal batch exactly (decimal
    monoid sums, no float reordering)."""
    from providenciasbigdata_spark.operators.cdc import merge_agg_state, partial_agg

    orders = load_table(spark, sf_dir, "orders")
    hist = orders.filter(F.col("o_orderdate") < "1998-01-01")
    delta = orders.filter(F.col("o_orderdate") >= "1998-01-01")
    state = partial_agg(hist, ["o_orderstatus"], ["o_totalprice"], "n_orders")
    merged = merge_agg_state(state, delta, ["o_orderstatus"], ["o_totalprice"], "n_orders")
    return merged.select(
        "o_orderstatus",
        F.round(F.col("o_totalprice").cast("double"), 2).alias("sum_price"),
        "n_orders",
    )


_INCR_SQL = """
SELECT o_orderstatus,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_price,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


def q_merge_into_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI MERGE INTO over plain DataFrames (operators.cdc.merge_into):
    even-keyed customers are the target table, 1995 order revenue per
    customer is the (pre-aggregated, unique-keyed) source. Matched
    customers with >400k delta are deleted, other matches add the delta
    to their balance, odd-keyed spenders insert as new rows, untouched
    customers pass through. Exact DECIMAL arithmetic end to end; one
    full-outer shuffle join."""
    from providenciasbigdata_spark.operators.cdc import merge_into

    target = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select(
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("decimal(28,10)").alias("bal"),
        )
    )
    source = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        )
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,10)")).alias("delta"))
    )
    merged = merge_into(
        target,
        source,
        keys=["c_custkey"],
        update_set={"bal": F.col("t.bal") + F.col("s.delta")},
        insert_values={
            "c_custkey": F.col("s.c_custkey"),
            "c_name": F.lit("merged-insert"),
            "bal": F.col("s.delta"),
        },
        delete_condition=F.col("s.delta") > 400000,
        # join-riding multi-match validation (verdict-r5 wrong#3): the
        # count window shares the merge join's hashpartitioning, so the
        # G9 guarantee costs no extra pass over the source
        strict="join",
    )
    return merged.select(
        "c_custkey",
        "c_name",
        F.round(F.col("bal").cast("double"), 2).alias("bal"),
    )


_MERGE_SQL = """
WITH tgt AS (
  SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(28,10)) AS bal
  FROM customer WHERE c_custkey % 2 = 0
), src AS (
  SELECT o_custkey AS c_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS delta
  FROM orders
  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
  GROUP BY o_custkey
)
SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
       CASE WHEN t.c_custkey IS NULL THEN 'merged-insert'
            ELSE t.c_name END AS c_name,
       ROUND(CAST(CASE WHEN t.c_custkey IS NULL THEN s.delta
                       WHEN s.c_custkey IS NULL THEN t.bal
                       ELSE t.bal + s.delta END AS DOUBLE), 2) AS bal
FROM tgt t FULL JOIN src s ON t.c_custkey = s.c_custkey
WHERE NOT (t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
           AND s.delta > 400000)
"""


def q_ivm_incremental_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (round 6, operators/ivm.py): the
    orders⋈lineitem revenue rollup refreshed from a materialized
    pre-1997 join state plus 1997+ DELTAS on both sides — three
    delta-broadcast joins instead of re-joining history. The oracle is
    the FROM-SCRATCH full join, so the value hash IS the proof that
    (A∪dA)⋈(B∪dB) == A⋈B ∪ dA⋈B ∪ A⋈dB ∪ dA⋈dB on real data.
    Exact DECIMAL revenue; per-year grain."""
    from providenciasbigdata_spark.operators.ivm import refresh_join

    cutoff = "1997-01-01"
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderdate"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_shipdate", "l_extendedprice"
    )
    old_o, d_o = (
        orders.filter(F.col("o_orderdate") < cutoff),
        orders.filter(F.col("o_orderdate") >= cutoff),
    )
    old_l, d_l = (
        lineitem.filter(F.col("l_shipdate") < cutoff),
        lineitem.filter(F.col("l_shipdate") >= cutoff),
    )
    old_join = old_o.join(old_l, "okey", "inner")
    refreshed = refresh_join(old_join, old_o, old_l, d_o, d_l, on=["okey"])
    return refreshed.groupBy(
        F.year("o_orderdate").cast("long").alias("yr")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).cast("double"), 4
        ).alias("revenue"),
    )


_IVM_JOIN_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE), 4)
           AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY yr
"""


QUERIES = {
    "ivm_incremental_join_revenue": (q_ivm_incremental_join_revenue, _IVM_JOIN_SQL),
    "incremental_daily_revenue": (q_incremental_daily_revenue, _INCR_SQL),
    "merge_into_customers": (q_merge_into_customers, _MERGE_SQL),
    "agg_pricing_summary": (q_agg_pricing_summary, _AGG_Q1_SQL),
    "cdc_latest_user_value": (q_cdc_latest_user_value, _CDC_LATEST_SQL),
    "join_market_share": (q_market_share, _Q8_SQL),
    "agg_product_profit": (q_product_profit, _Q9_SQL),
    "scd2_purchase_history": (q_scd2_purchase_history, _SCD2_SQL),
    "join_point_in_time": (q_pit_join_clicks, _PIT_JOIN_SQL),
    "join_min_cost_supplier": (q_min_cost_supplier, _MIN_COST_SQL),
    "agg_idle_rich_customers": (q_idle_rich_customers, _IDLE_RICH_SQL),
    "join_nation_volume": (q_nation_volume_shipping, _Q7_SQL),
    "agg_disjunctive_predicates": (q_disjunctive_predicates, _Q19_SQL),
    "window_first_last_order": (q_first_last_order, _FIRST_LAST_SQL),
    "join_shipping_priority": (q_join_shipping_priority, _JOIN_Q3_SQL),
    "join_region_nation_revenue": (q_join_region_nation_revenue, _JOIN_Q5_SQL),
    "join_semi": (
        q_join_semi,
        "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')",
    ),
    "join_anti": (
        q_join_anti,
        "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')",
    ),
    "window_topk_per_customer": (q_window_topk_per_customer, _WINDOW_TOPK_SQL),
    "window_lag_gaps": (q_window_lag_gaps, _WINDOW_LAG_SQL),
    "window_running_total": (q_window_running_total, _WINDOW_RUNNING_SQL),
    "agg_rollup": (
        q_agg_rollup,
        f"SELECT l_returnflag, l_linestatus, {_sql_sum('l_quantity', 'sum_qty')}, "
        "COUNT(*) AS n FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",
    ),
    "agg_cube": (
        q_agg_cube,
        f"SELECT o_orderstatus, o_orderpriority, {_sql_sum('o_totalprice', 'sum_price')}, "
        "COUNT(*) AS n FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)",
    ),
    "setops_custkeys": (q_setops_custkeys, _SETOPS_SQL),
    "setops_multiset": (q_setops_multiset, _SETOPS_MULTISET_SQL),
    "agg_distinct_counts": (
        q_agg_distinct_counts,
        "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, "
        "COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows "
        "FROM lineitem GROUP BY l_returnflag",
    ),
    "sort_topk_orders": (
        q_sort_topk_orders,
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10",
    ),
    "scalar_functions": (q_scalar_functions, _SCALAR_SQL),
    "json_events_agg": (q_json_events_agg, _JSON_SQL),
    "pivot_status": (q_pivot_status, _PIVOT_SQL),
    "asof_last_purchase": (q_asof_last_purchase, _ASOF_SQL),
    "asof_forward_purchase": (q_asof_forward_purchase, _ASOF_FWD_SQL),
    "asof_nearest_purchase": (q_asof_nearest_purchase, _ASOF_NEAREST_SQL),
    "range_clicks_after_purchase": (q_range_clicks_after_purchase, _RANGE_SQL),
}
