"""Second relational pass: the remaining TPC-H query shapes expressible
over the fixture schema (SURVEY.md §2.4 "driver" rows, widened).

The fixtures lack ``partsupp``, ``l_commitdate``/``l_receiptdate``,
``l_shipmode`` and the comment columns, so Q4/Q12/Q13/Q21 are *adapted*:
the join/subquery structure (the part that exercises the engine) is
preserved; the missing column is replaced by a same-shaped predicate on
an existing column. Each docstring notes the substitution.

Shapes covered here: Q4, Q6, Q10, Q12, Q13, Q14, Q15, Q17, Q18, Q21, plus
Q11/Q16/Q20 over a deterministically DERIVED partsupp (_PARTSUPP_CTE —
pure integer arithmetic both engines evaluate bit-equally, so the
partsupp-dependent shapes become oracle-checkable without a fixture
table). (Q1/Q2/Q3/Q5/Q7/Q8/Q9/Q19/Q22 live in ``relational.py``.)

Determinism rules are the same as ``relational.py``: decimal sums →
rounded double, BIGINT casts for counts, total-order tiebreaks on
every LIMIT.

Scale notes (100 TB): every dim side (part, supplier, nation, customer
at 1/15 of orders) is broadcast; the fact-fact patterns (Q18's
having-sum, Q21's exists/not-exists) are expressed as aggregations and
semi/anti joins on the SAME key (l_orderkey) so Catalyst plans one
shuffle exchange per fact input and reuses it across the self-joins;
AQE handles skewed orderkeys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table

_DEC = "decimal(28,10)"


def _dec_sum(col, digits=2):
    return F.round(F.sum(col.cast(_DEC)).cast("double"), digits)


def _sql_sum(expr, alias, digits=2):
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(28,10))) AS DOUBLE), {digits}) AS {alias}"


# ---- Q6: forecast revenue change (pure pushdown scan + agg) ------------

def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table filtered agg. The whole query should
    compile to one Parquet scan with every predicate pushed down and a
    partial+final agg — no shuffle of raw rows (verified in
    test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.04, 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        _dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
    )


_Q6_SQL = f"""
SELECT {_sql_sum('l_extendedprice * l_discount', 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
"""


# ---- Q4: order priority checking (EXISTS -> left-semi join) ------------

def q_order_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: count orders per priority where EXISTS a
    qualifying lineitem. Fixture has no l_commitdate/l_receiptdate, so
    "received later than committed" becomes "shipped > 60 days after
    order date" — still a correlated EXISTS comparing a lineitem column
    to an orders column, lowered to a left-semi join on the join key
    with the correlated predicate folded into the join condition."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---- Q10: returned-item reporting --------------------------------------

def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returns per customer in one quarter.
    customer and nation are dims -> broadcast; the orders⋈lineitem
    fact-fact join shuffles on orderkey once."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dec_sum(disc).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, {_sql_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---- Q12: shipping-mode / priority mix (conditional agg over join) -----

def q_shipping_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join orders→lineitem, then a conditional
    (CASE-WHEN) aggregation. Fixture has no l_shipmode, so the grouping
    column is l_linestatus — same cardinality class, same plan shape."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---- Q13: customer order-count distribution ----------------------------

def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: two-level aggregation over a LEFT OUTER join — orders
    per customer, then customers per order-count. Fixture has no
    o_comment, so the excluded-orders predicate is on o_orderpriority.
    Customers with zero qualifying orders must appear (c_count = 0),
    which is why the outer join cannot be reordered into an inner."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---- Q14: promotion effect (ratio of conditional sums) -----------------

def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from PROMO parts.
    part is a dim -> broadcast. Both sums are exact decimals; the final
    ratio is one double division rounded identically on both sides."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast(_DEC)))
    total = F.sum(disc)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(F.lit(100.0) * promo.cast("double") / total.cast("double"), 6).alias(
                "promo_revenue_pct"
            )
        )
    )


_Q14_SQL = """
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))
             ELSE CAST(0 AS DECIMAL(28,10)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 6)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# ---- Q15: top supplier (scalar-subquery max over an agg view) ----------

def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: suppliers whose quarterly revenue equals the maximum.
    The max-equality compare happens on the EXACT decimal sum (safe
    equality), rounded to double only for output. The global max is a
    1-row aggregate broadcast back onto the per-supplier agg — no
    single-partition window, so the plan holds at any |supplier|."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    rev = li.groupBy("l_suppkey").agg(F.sum(disc).alias("_rev_dec"))
    max_rev = rev.agg(F.max("_rev_dec").alias("_max_dec"))
    top = rev.crossJoin(F.broadcast(max_rev))
    return (
        top.filter(F.col("_rev_dec") == F.col("_max_dec"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.round(F.col("_rev_dec").cast("double"), 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, ROUND(CAST(rev_dec AS DOUBLE), 2) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)
ORDER BY s_suppkey
"""


# ---- Q17: small-quantity-order revenue (correlated avg subquery) -------

def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from lineitems whose quantity is below half
    the part's average quantity. The correlated AVG subquery is
    decorrelated into a per-part aggregate joined back to the fact —
    one extra shuffle on l_partkey instead of a per-row subquery.
    The avg threshold compare uses the raw double avg on both engines
    (same IEEE division of an exact decimal sum by a count)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    li_b = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = li_b.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.sum(F.col("l_quantity").cast(_DEC)).cast("double") / F.count("l_quantity")).alias(
            "_avg_qty"
        )
    )
    return (
        li_b.join(F.broadcast(per_part), li_b.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("_avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


_Q17_SQL = """
WITH li_b AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'),
per_part AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
  FROM li_b GROUP BY l_partkey)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM li_b JOIN per_part ON l_partkey = pk
WHERE l_quantity < 0.5 * avg_qty
"""


# ---- Q18: large-volume customers (HAVING over fact self-agg) -----------

def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold, with
    customer attribution. The HAVING-sum and the per-order re-join both
    key on l_orderkey/o_orderkey, so AQE reuses one exchange; customer
    is broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("_sum_qty_dec"))
        .filter(F.col("_sum_qty_dec") > 200)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("_sum_qty_dec").cast("double"), 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       ROUND(CAST(sum_qty_dec AS DOUBLE), 2) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(28,10))) AS sum_qty_dec
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(28,10))) > 200)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# ---- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) ------

def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: for finished orders, suppliers who shipped late
    while some OTHER supplier on the same order shipped on time and NO
    other supplier shipped late. Fixture lacks receipt/commit dates, so
    "late" is pinned as l_shipdate > o_orderdate + 90 days. The dual
    correlated EXISTS / NOT EXISTS lower to a left-semi and a left-anti
    join, all keyed on l_orderkey (one exchange, reused)."""
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    li_f = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias(
            "_late"
        ),
    )
    pairs = li_f.select("l_orderkey", "l_suppkey", "_late").distinct()
    late = pairs.filter(F.col("_late")).select("l_orderkey", "l_suppkey")
    other = pairs.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk"),
        F.col("_late").alias("_other_late"),
    )
    cand = late.join(
        other,
        (late.l_orderkey == F.col("_ok")) & (late.l_suppkey != F.col("_sk")),
        "left_semi",
    )
    sole_late = cand.join(
        other.filter(F.col("_other_late")),
        (cand.l_orderkey == F.col("_ok")) & (cand.l_suppkey != F.col("_sk")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(supp), sole_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


_Q21_SQL = """
WITH pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F')
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM pairs l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM pairs l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM pairs l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the one join type the registry lacked: big
    spenders (by order volume) against rich customers (by balance);
    the two predicates select different customer sets, so both
    null-extension directions appear. Both sides pre-aggregate/filter
    BEFORE the join (the scale rule: shuffle the reduced sets), and
    the join keys are high-cardinality custkeys — hash-partitioned,
    AQE-skew-safe."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    big = orders.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n_big_orders")
    )
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )
    return (
        big.join(rich, big.o_custkey == rich.c_custkey, "full_outer")
        .select(
            F.coalesce("o_custkey", "c_custkey").alias("custkey"),
            F.coalesce("n_big_orders", F.lit(0)).cast("bigint").alias("n_big_orders"),
            "acctbal",
        )
    )


_FULL_OUTER_SQL = """
WITH big AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_big_orders
  FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey
), rich AS (
  SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
  FROM customer WHERE c_acctbal > 9000
)
SELECT COALESCE(b.o_custkey, r.c_custkey) AS custkey,
       CAST(COALESCE(b.n_big_orders, 0) AS BIGINT) AS n_big_orders,
       r.acctbal
FROM big b FULL OUTER JOIN rich r ON b.o_custkey = r.c_custkey
"""


def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction ahead of a shuffle join: the selective
    dim (one market segment's high-balance customers) is compressed
    into a packed-word bloom bitmap — built distributively, broadcast
    as a tiny words table — and fact rows that cannot match are
    dropped BEFORE the exact join's exchange. No false negatives, and
    the exact join removes false positives, so the result is exactly
    the plain join (the oracle). The final join is hinted shuffle_hash
    to model the production case the operator exists for: a dim whose
    ROWS are too big to broadcast but whose KEY SET fits a bloom.
    """
    from providenciasbigdata_spark.operators.bloomjoin import bloom_prefilter_join

    dim = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 5000))
        .select("c_custkey")
        .hint("shuffle_hash")
    )
    fact = load_table(spark, sf_dir, "orders")
    joined = bloom_prefilter_join(fact, dim, "o_custkey", "c_custkey", n_bits=1 << 16)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            _dec_sum(F.col("o_totalprice")).alias("sum_totalprice"),
        )
    )


_BLOOM_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000
GROUP BY o_orderpriority
"""


# ---- derived partsupp: the fixture lacks TPC-H's partsupp table, so it
# is SYNTHESIZED deterministically from part x {0..3} with pure integer
# arithmetic both engines evaluate identically (verified bit-equal) —
# unlocking the partsupp-dependent shapes Q11/Q16. The supplier count
# arrives as a scalar subquery, so the same text runs at any sf.
_PARTSUPP_CTE = """
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         CAST((p_partkey * 7 + t.i * 13) % (SELECT COUNT(*) FROM supplier) AS BIGINT) AS ps_suppkey,
         CAST((p_partkey * 5 + t.i * 11) % 9999 + 1 AS BIGINT) AS ps_availqty,
         ROUND(((p_partkey * 31 + t.i * 17) % 100000) / 100.0 + 1.0, 2) AS ps_supplycost
  FROM part CROSS JOIN (VALUES (0),(1),(2),(3)) AS t(i)
)
"""

# TPC-H Q11 shape (important stock identification): per-part inventory
# value for one nation's suppliers, kept when above a fraction of that
# nation's total. Group-level decimal-exact sums; the threshold compare
# happens in DOUBLE on identically-derived values on both engines.
_Q11_SQL = f"""
WITH {_PARTSUPP_CTE},
national AS (
  SELECT ps_partkey,
         CAST(ps_supplycost AS DECIMAL(28,10)) * ps_availqty AS v
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT ps_partkey, ROUND(CAST(SUM(v) AS DOUBLE), 2) AS part_value
FROM national
GROUP BY ps_partkey
HAVING CAST(SUM(v) AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) * 0.002 FROM national)
ORDER BY part_value DESC, ps_partkey ASC
LIMIT 50
"""


def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 over the derived partsupp (docstring at _PARTSUPP_CTE).
    One SQL text runs on both engines; Catalyst plans the supplier/
    nation dims as broadcasts and the HAVING threshold as a scalar
    subquery over the reused `national` aggregate."""
    from providenciasbigdata_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q11_SQL)


# TPC-H Q16 shape (parts/supplier relationship): supplier counts per
# (brand, type, size) bucket, excluding one brand, one type prefix, and
# "complained-about" suppliers — the fixture lacks comment text, so the
# stand-in predicate is s_acctbal < 0 (same NOT IN anti-join structure).
_Q16_SQL = f"""
WITH {_PARTSUPP_CTE}
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#3'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 11, 17, 23, 27, 33, 43, 9)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
LIMIT 60
"""


# TPC-H Q20 shape (potential part promotion): suppliers in one nation
# holding MORE stock of some part than half of what they shipped of it
# in 1996 — semi join through the derived partsupp against a shipped-
# quantity aggregate. Exact decimal SUM; the half-compare runs in
# DOUBLE on identically-derived values.
_Q20_SQL = f"""
WITH {_PARTSUPP_CTE},
shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
  AND s_suppkey IN (
    SELECT ps_suppkey
    FROM partsupp JOIN shipped
      ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    WHERE ps_availqty > 0.5 * qty
  )
ORDER BY s_suppkey ASC
"""


def q_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 over the derived partsupp: the IN-subquery lowers to a
    left-semi join; shipped quantities pre-aggregate BEFORE the join so
    the semi probe is (part, supplier)-grained, not line-grained."""
    from providenciasbigdata_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q20_SQL)


def q_supplier_part_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 over the derived partsupp: distinct-supplier counts by
    part bucket with a NOT IN supplier exclusion (anti join; the NULL-
    free subquery keeps it a plain anti join, cf. sql_not_in_null_aware
    for the null-aware variant)."""
    from providenciasbigdata_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q16_SQL)


def q_window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) balance quartiles per market segment — the remaining
    ranking window function (rank/dense_rank/row_number/percent_rank
    are covered elsewhere). The tile assignment is deterministic ONLY
    under a total order, so c_custkey breaks acctbal ties; DuckDB's
    NTILE uses the identical SQL-standard big-tiles-first split.
    Per-(segment, quartile): member count + boundary balances."""
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("q", F.ntile(4).over(w))
        .groupBy("c_mktsegment", F.col("q").cast("long").alias("quartile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("c_acctbal").cast("double").alias("lo_bal"),
            F.max("c_acctbal").cast("double").alias("hi_bal"),
        )
    )


_NTILE_SQL = """
WITH t AS (
  SELECT c_mktsegment, c_acctbal,
         NTILE(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal ASC, c_custkey ASC) AS q
  FROM customer)
SELECT c_mktsegment, CAST(q AS BIGINT) AS quartile,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(c_acctbal) AS DOUBLE) AS lo_bal,
       CAST(MAX(c_acctbal) AS DOUBLE) AS hi_bal
FROM t GROUP BY c_mktsegment, q
"""


QUERIES = {
    "window_ntile_quartiles": (q_window_ntile_quartiles, _NTILE_SQL),
    "agg_forecast_revenue": (q_forecast_revenue, _Q6_SQL),
    "join_important_stock": (q_important_stock, _Q11_SQL),
    "agg_supplier_part_buckets": (q_supplier_part_buckets, _Q16_SQL),
    "join_excess_stock_suppliers": (q_excess_stock_suppliers, _Q20_SQL),
    "join_bloom_prefilter": (q_bloom_prefilter_join, _BLOOM_JOIN_SQL),
    "join_full_outer_spenders": (q_full_outer_join, _FULL_OUTER_SQL),
    "agg_order_priority_late": (q_order_priority_late, _Q4_SQL),
    "join_returned_items": (q_returned_items, _Q10_SQL),
    "agg_shipping_priority_mix": (q_shipping_priority_mix, _Q12_SQL),
    "agg_customer_order_distribution": (q_customer_order_distribution, _Q13_SQL),
    "agg_promo_revenue": (q_promo_revenue, _Q14_SQL),
    "join_top_supplier": (q_top_supplier, _Q15_SQL),
    "agg_small_qty_revenue": (q_small_qty_revenue, _Q17_SQL),
    "join_large_volume_customers": (q_large_volume_customers, _Q18_SQL),
    "join_waiting_suppliers": (q_waiting_suppliers, _Q21_SQL),
}
