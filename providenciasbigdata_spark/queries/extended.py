"""Extended relational surface: skew-resistant operators wired to the
oracle gate (they must produce EXACTLY the plain-plan answers), plus
reshape (unpivot/explode) and exact percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from providenciasbigdata_spark.functions.text import tokenize
from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators import skew


def q_skew_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) top-3 lineitems per supplier — the oracle is
    the PLAIN window top-k: salting must not change the answer."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        # total order -> deterministic survivors on both plans
        (F.col("l_extendedprice") * 100000 + F.col("l_orderkey") * 10
         + F.col("l_linenumber")).alias("v"),
    )
    return skew.two_phase_topk(li, key="l_suppkey", order_by="v", k=3, buckets=8)


_SKEW_TOPK_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber, v, rank FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber,
         l_extendedprice * 100000 + l_orderkey * 10 + l_linenumber AS v,
         CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY
              l_extendedprice * 100000 + l_orderkey * 10 + l_linenumber DESC)
              AS BIGINT) AS rank
  FROM lineitem
) WHERE rank <= 3
"""


def q_skew_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return skew.salted_distinct_count(events, key="event_type", value="user_id", buckets=16)


_SKEW_DISTINCT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type
"""


def q_unpivot_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long reshape over per-nation aggregates (melt)."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    wide = (
        cust.groupBy("c_nationkey")
        .agg(
            F.round(F.sum(F.col("c_acctbal").cast("decimal(28,10)")).cast("double"), 2)
            .alias("cust_bal")
        )
        .withColumnRenamed("c_nationkey", "nationkey")
        .join(
            supp.groupBy("s_nationkey")
            .agg(
                F.round(F.sum(F.col("s_acctbal").cast("decimal(28,10)")).cast("double"), 2)
                .alias("supp_bal")
            )
            .withColumnRenamed("s_nationkey", "nationkey"),
            "nationkey",
        )
    )
    return wide.unpivot(
        ids=["nationkey"], values=["cust_bal", "supp_bal"],
        variableColumnName="side", valueColumnName="balance",
    )


_UNPIVOT_SQL = """
WITH wide AS (
  SELECT c.nationkey, c.cust_bal, s.supp_bal
  FROM (SELECT c_nationkey AS nationkey,
               ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE), 2) AS cust_bal
        FROM customer GROUP BY 1) c
  JOIN (SELECT s_nationkey AS nationkey,
               ROUND(CAST(SUM(CAST(s_acctbal AS DECIMAL(28,10))) AS DOUBLE), 2) AS supp_bal
        FROM supplier GROUP BY 1) s USING (nationkey)
)
SELECT nationkey, 'cust_bal' AS side, cust_bal AS balance FROM wide
UNION ALL
SELECT nationkey, 'supp_bal' AS side, supp_bal AS balance FROM wide
"""


def q_explode_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode of the tokenized text -> corpus-wide top-20
    tokens. The generate (explode) stage feeds a two-phase count and a
    TakeOrdered top-k — the wordcount shape, all JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


_EXPLODE_SQL = r"""
SELECT token, COUNT(*) AS n
FROM (
  SELECT unnest(list_filter(string_split_regex(strip_accents(lower(text)), '\W+'),
                            x -> x <> '')) AS token
  FROM documents
)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles of order totals per status (continuous
    interpolation — matches DuckDB quantile_cont)."""
    orders = load_table(spark, sf_dir, "orders")
    pct = F.percentile("o_totalprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return orders.groupBy("o_orderstatus").agg(
        F.round(pct[0], 4).alias("p25"),
        F.round(pct[1], 4).alias("p50"),
        F.round(pct[2], 4).alias("p75"),
        F.count("*").alias("n"),
    )


_PERCENTILES_SQL = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
"""


def q_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state quartiles via percentile_approx (Greenwald-Khanna
    sketch) — the 100 TB path for agg_percentiles: exact percentiles
    need the full sorted group in memory, the sketch holds
    O(accuracy) state per group, merges across partitions, and bounds
    rank error by n/accuracy. Rows-only: the sketch is engine-specific
    (DuckDB's approx_quantile uses t-digest — different estimates);
    rank-error vs the exact quartiles is pinned in pytest."""
    orders = load_table(spark, sf_dir, "orders")
    pct = F.percentile_approx(
        "o_totalprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(1000)
    )
    return orders.groupBy("o_orderstatus").agg(
        F.round(pct[0], 4).alias("p25"),
        F.round(pct[1], 4).alias("p50"),
        F.round(pct[2], 4).alias("p75"),
        F.count("*").alias("n"),
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup -> purchase funnel per user: first-touch timestamps, did
    the purchase follow the signup, and within 7 days? One shuffle
    (groupBy user) + a one-row summary — the sequence-analytics shape."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("signup_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("purchase_ts"),
    )
    converted = (F.col("purchase_ts") > F.col("signup_ts")).cast("int")
    within_7d = (
        (F.col("purchase_ts") > F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS"))
    ).cast("int")
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("signup_ts").alias("n_signed_up"),
        F.sum(F.when(F.col("signup_ts").isNotNull(), converted).otherwise(0)).alias(
            "n_converted"
        ),
        F.sum(F.when(F.col("signup_ts").isNotNull(), within_7d).otherwise(0)).alias(
            "n_converted_7d"
        ),
    )


_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS purchase_ts
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(signup_ts) AS n_signed_up,
       CAST(COALESCE(SUM(CASE WHEN purchase_ts > signup_ts THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_converted,
       CAST(COALESCE(SUM(CASE WHEN purchase_ts > signup_ts
                          AND purchase_ts <= signup_ts + INTERVAL '7 days'
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_converted_7d
FROM per_user
"""


def q_array_agg_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: the sorted distinct user set per event type —
    collect_set is unordered by contract, so sort_array pins a
    deterministic output. The array is serialized to a CSV string at
    the edge: the driver's pandas canonicalizer cannot factorize
    list-typed cells (r03 harness crash), and a scalar column hashes
    identically on both sides."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.array_join(F.sort_array(F.collect_set("user_id")), ",").alias("users"),
        F.count("*").alias("n_events"),
    )


_ARRAY_AGG_SQL = """
SELECT event_type,
       array_to_string(list_sort(list_distinct(array_agg(user_id))), ',') AS users,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def q_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: each user's trailing-24h event-value sum
    at every event (value-based frame bounds, not row counts — rows
    with equal timestamps share a frame, and gaps shrink it)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    day = 24 * 3600
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-day, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("trailing_24h_value"),
    )


# frame bounds on whole epoch seconds BOTH sides (Spark unix_timestamp
# truncates; an interval-typed oracle frame would disagree on rows
# landing within the truncated fraction of the 24h boundary)
_RANGE_FRAME_SQL = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (
         PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
         RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW
       ), 4) AS trailing_24h_value
FROM events WHERE event_id < 2000
"""


def q_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family over one window: rank / dense_rank /
    percent_rank / cume_dist / ntile(4)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


_RANKING_SQL = """
SELECT o_orderkey, o_orderstatus,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile
FROM orders WHERE o_orderkey < 1000
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


_STRAT_RATES = {"O": 0.1, "F": 0.5, "P": 1.0}
_STRAT_SALT = "strat"


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling, fully deterministic and oracle-checkable:
    per-status rates decided by comparing a fixed-width md5 prefix of
    the key against each stratum's hex threshold (operators.mix
    pattern) — identical across runs, partitions, task retries, and
    engines, unlike sampleBy's partition-layout-dependent Bernoulli
    draw (kept as the rows-only sibling ``sample_stratified_bernoulli``).
    Map-only filter; one aggregate pass for sampled-vs-total counts."""
    from providenciasbigdata_spark.operators.mix import rate_threshold_hex

    orders = load_table(spark, sf_dir, "orders")
    bucket = F.substring(
        F.md5(F.concat(F.lit(_STRAT_SALT), F.col("o_orderkey").cast("string"))),
        1, 15,
    )
    keep = F.lit(True)  # rate >= 1.0 strata keep every row
    for status, rate in _STRAT_RATES.items():
        if rate < 1.0:
            keep = F.when(
                F.col("o_orderstatus") == status,
                bucket < F.lit(rate_threshold_hex(rate)),
            ).otherwise(keep)
    return orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_total"),
        F.sum(keep.cast("long")).alias("n_sampled"),
    )


def _stratified_sql() -> str:
    from providenciasbigdata_spark.operators.mix import rate_threshold_hex

    arms = " ".join(
        f"WHEN o_orderstatus = '{s}' THEN "
        f"(substring(md5('{_STRAT_SALT}' || CAST(o_orderkey AS VARCHAR)), 1, 15)"
        f" < '{rate_threshold_hex(r)}')"
        for s, r in _STRAT_RATES.items()
        if r < 1.0
    )
    return f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN (CASE {arms} ELSE TRUE END) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sampled
FROM orders GROUP BY o_orderstatus
"""


_STRATIFIED_SQL = _stratified_sql()


def q_stratified_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampleBy variant (seeded Bernoulli draw): deterministic only for
    a fixed partition layout, so rows-only — the pytest property pins
    the sampled fraction within binomial tolerance instead."""
    orders = load_table(spark, sf_dir, "orders")
    sampled = orders.sampleBy("o_orderstatus", _STRAT_RATES, seed=42)
    full = orders.groupBy("o_orderstatus").agg(F.count("*").alias("n_total"))
    samp = sampled.groupBy("o_orderstatus").agg(F.count("*").alias("n_sampled"))
    return (
        full.join(samp, "o_orderstatus", "left")
        .select(
            "o_orderstatus",
            "n_total",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        )
    )


def q_udtf_event_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE-ARGUMENT Python UDTF (Spark 4): the UDTF consumes the
    whole partitioned + ordered relation — ``event_streaks(
    TABLE(events) PARTITION BY user_id ORDER BY ts, event_id)`` — and
    emits each user's longest consecutive same-type run (earliest on
    ties). Per-partition streaming state the lateral form can't
    express; the oracle rebuilds the runs as gaps-and-islands SQL."""
    from providenciasbigdata_spark.functions.udx import event_streaks_udtf

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_streaks_in")
    spark.udtf.register("event_streaks", event_streaks_udtf())
    return spark.sql(
        """
        SELECT user_id, event_type, streak_len
        FROM event_streaks(TABLE(events_streaks_in)
                           PARTITION BY user_id ORDER BY (ts, event_id))
        """
    )


_UDTF_STREAKS_SQL = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), isl AS (
  SELECT user_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
), runs AS (
  SELECT user_id, island, ANY_VALUE(event_type) AS event_type,
         COUNT(*) AS len
  FROM isl GROUP BY user_id, island
)
SELECT user_id, event_type, CAST(len AS BIGINT) AS streak_len
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY len DESC, island ASC) AS rn
      FROM runs)
WHERE rn = 1
"""


def q_udtf_polymorphic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4): the output schema
    (part0..part2) is computed at PLAN TIME by the UDTF's analyze()
    from the constant arity argument — a surface no fixed-returnType
    UDTF or SQL function has. Each ruling id is recast as a 3-field
    code ('SENT-<anio>-<doc_id>') and split back through the UDTF; the
    oracle reproduces the split with split_part, so the analyze-time
    path is value-hash-checked end to end."""
    from providenciasbigdata_spark.functions.udx import split_fixed_udtf

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    codes = docs.select(
        "doc_id",
        F.concat_ws(
            "-", F.lit("SENT"), (F.lit(2000) + F.col("doc_id") % 25), F.col("doc_id")
        ).alias("code"),
    )
    return codes.lateralJoin(
        split_fixed_udtf()(F.col("code").outer(), F.lit(3))
    ).select("doc_id", "part0", "part1", "part2")


_UDTF_POLY_SQL = """
SELECT doc_id,
       'SENT' AS part0,
       CAST(2000 + doc_id % 25 AS VARCHAR) AS part1,
       CAST(doc_id AS VARCHAR) AS part2
FROM documents WHERE doc_id < 100
"""


def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via lateralJoin: per-document sentence rows. The
    REAL Python-UDTF execution path runs on the Spark side; the oracle
    reproduces the lookbehind split ``(?<=[.!?])\\s+`` (which RE2-based
    engines can't run directly) with an equivalent replace-then-split:
    rewrite each punctuation+whitespace boundary to a sentinel char,
    split on the sentinel, zip-unnest with the element index — so even
    the non-SQL UDTF surface is hash-checked."""
    from providenciasbigdata_spark.functions.udx import split_sentences

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    out = split_sentences(docs)
    return out.select(
        "doc_id",
        F.col("sentence_id").cast("long").alias("sentence_id"),
        "sentence",
        F.col("sentence_chars").cast("long").alias("sentence_chars"),
    )


_UDTF_SENTENCES_SQL = r"""
WITH t AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(text, '^\s+|\s+$', '', 'g'),
                        '([.!?])\s+', '\1' || chr(30), 'g') AS s
  FROM documents WHERE doc_id < 50
), parts AS (
  SELECT doc_id, string_split(s, chr(30)) AS p FROM t WHERE s <> ''
), ex AS (
  SELECT doc_id,
         unnest(range(len(p))) AS sentence_id,
         trim(unnest(p)) AS sentence
  FROM parts
)
SELECT doc_id, CAST(sentence_id AS BIGINT) AS sentence_id, sentence,
       CAST(length(sentence) AS BIGINT) AS sentence_chars
FROM ex WHERE sentence <> ''
"""


def q_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched grouped-agg pandas UDF (UDAF surface): geometric
    mean of positive event values per type — oracle = exp(avg(ln x)),
    proving the vectorized Python path computes what SQL says."""
    from providenciasbigdata_spark.functions.udx import geo_mean_udaf

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    # NB: a grouped-agg pandas UDF cannot share an agg() with built-in
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — keep it solo
    return ev.groupBy("event_type").agg(
        F.round(geo_mean_udaf()(F.col("value")), 6).alias("geo_mean_value"),
    )


_UDAF_GEOMEAN_SQL = """
SELECT event_type,
       ROUND(EXP(AVG(LN(value))), 6) AS geo_mean_value
FROM events WHERE value > 0
GROUP BY event_type
"""


def q_setops_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): customers'
    order-priority multisets on 'F' vs 'O' status orders — duplicates
    preserved, unlike the distinct set ops in setops_custkeys."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey", "o_orderpriority")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey", "o_orderpriority")
    both = f.intersectAll(o).withColumn("op", F.lit("intersect_all"))
    only_f = f.exceptAll(o).withColumn("op", F.lit("except_all"))
    return (
        both.unionByName(only_f)
        .groupBy("op")
        .agg(F.count("*").alias("n_rows"),
             F.countDistinct("o_custkey").alias("n_customers"))
    )


_SETOPS_BAG_SQL = """
WITH f AS (SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'),
     o AS (SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'),
     both_rows AS (
       SELECT *, 'intersect_all' AS op FROM (SELECT * FROM f INTERSECT ALL SELECT * FROM o)
     ),
     only_f AS (
       SELECT *, 'except_all' AS op FROM (SELECT * FROM f EXCEPT ALL SELECT * FROM o)
     )
SELECT op, COUNT(*) AS n_rows, COUNT(DISTINCT o_custkey) AS n_customers
FROM (SELECT * FROM both_rows UNION ALL SELECT * FROM only_f)
GROUP BY op
"""


def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=>): events self-matched on the
    (nullable) props payload — NULL props pair with NULL props, which a
    plain equi-join silently drops. Spark lowers <=> to a hash join
    key, so this stays a shuffled hash join, not a nested loop."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "props")
    a = ev.filter(F.col("event_id") < 100).alias("a")
    b = ev.filter(F.col("event_id") >= 100).alias("b")
    j = a.join(b, F.col("a.props").eqNullSafe(F.col("b.props")))
    return j.agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("a.props").isNull().cast("long")).alias("n_null_pairs"),
    )


_JOIN_NULL_SAFE_SQL = """
SELECT COUNT(*) AS n_pairs,
       CAST(SUM(CAST(a.props IS NULL AS BIGINT)) AS BIGINT) AS n_null_pairs
FROM (SELECT * FROM events WHERE event_id < 100) a
JOIN (SELECT * FROM events WHERE event_id >= 100) b
  ON a.props IS NOT DISTINCT FROM b.props
"""


def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-random sample: top-64 orders by md5 of the
    key — reproducible across engines and runs (md5 agrees between
    Spark and DuckDB), uniform-ish because md5 scrambles key order.
    The pattern for stable eval-set carving at 100 TB: no rand() seed
    drift across retries/partitions, and TakeOrdered keeps it a
    per-partition heap, never a global sort."""
    orders = load_table(spark, sf_dir, "orders")
    h = F.md5(F.col("o_orderkey").cast("string"))
    return (
        orders.select("o_orderkey", "o_totalprice", h.alias("h"))
        .orderBy("h")
        .limit(64)
        .select("o_orderkey", "o_totalprice")
    )


_SAMPLE_DET_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY md5(CAST(o_orderkey AS VARCHAR))
LIMIT 64
"""


def q_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2023 conditional/boolean aggregate surface: count_if,
    bool_and, bool_or, plus FILTER-style conditional sums — all
    deterministic (unlike any_value/mode) and identical in Spark and
    DuckDB. One two-phase hash aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
    )


_COND_AGG_SQL = """
SELECT o_orderstatus,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
           AS n_urgent
FROM orders GROUP BY o_orderstatus
"""


def q_window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value + lead-with-default analytic windows: 3rd-cheapest
    order price per customer (NULL for customers with fewer) and the
    next price with a -1 sentinel default. Deterministic total order
    inside each partition (price, then key)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            F.nth_value("o_totalprice", 3).over(wall).alias("third_price"),
            F.lead("o_totalprice", 1, -1.0).over(w).alias("next_price"),
        )
    )


_NTH_VALUE_SQL = """
SELECT o_custkey, o_orderkey,
       nth_value(o_totalprice, 3) OVER
         (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS third_price,
       COALESCE(lead(o_totalprice, 1) OVER
         (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), -1.0)
         AS next_price
FROM orders WHERE o_custkey < 200
"""


def q_sample_fixed_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reservoir-style FIXED-SIZE per-stratum sample, deterministically:
    the 8 smallest-md5(key) customers per market segment — exactly what
    per-group reservoir sampling yields, but with no RNG state, so the
    sample is reproducible across engines, runs, retries, and
    partitionings (the property classic reservoir sampling loses under
    Spark task retry). One window keyed on the stratum; rank-k over a
    hash order stays a per-partition heap at scale."""
    cust = load_table(spark, sf_dir, "customer")
    h = F.md5(F.col("c_custkey").cast("string"))
    w = Window.partitionBy("c_mktsegment").orderBy(h.asc())
    return (
        cust.select("c_mktsegment", "c_custkey", h.alias("__h"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 8)
        .select("c_mktsegment", "c_custkey")
    )


_SAMPLE_STRATUM_SQL = """
SELECT c_mktsegment, c_custkey FROM (
  SELECT c_mktsegment, c_custkey,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY md5(CAST(c_custkey AS VARCHAR))) AS rn
  FROM customer)
WHERE rn <= 8
"""


def q_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-statistic + moment aggregates per group: exact interpolated
    median, sample stddev, Pearson correlation. Median is Spark's exact
    ``percentile`` (same lower+frac*(upper-lower) interpolation as
    DuckDB ``median``). stddev/corr are derived from exact DECIMAL sums
    (sum, sum-of-squares, cross-sum) through one shared closed form on
    both engines — native double moment aggregates are accumulation-
    order-dependent and can flip the ROUND digit at a boundary."""
    li = load_table(spark, sf_dir, "lineitem")

    def dec(c):
        return F.sum(c.cast("decimal(28,10)")).cast("double")

    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    raw = li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        F.count("*").cast("double").alias("_n"),
        dec(x).alias("_sx"),
        dec(x * x).alias("_sxx"),
        dec(y).alias("_sy"),
        dec(y * y).alias("_syy"),
        dec(x * y).alias("_sxy"),
    )
    n, sx, sxx = F.col("_n"), F.col("_sx"), F.col("_sxx")
    sy, syy, sxy = F.col("_sy"), F.col("_syy"), F.col("_sxy")
    sd = F.sqrt((n * sxx - sx * sx) / (n * (n - F.lit(1.0))))
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return raw.select(
        "l_returnflag",
        "median_qty",
        F.round(sd, 6).alias("sd_qty"),
        F.round(corr, 6).alias("corr_qty_price"),
        n.cast("bigint").alias("n"),
    )


_ROBUST_STATS_SQL = """
WITH s AS (
  SELECT l_returnflag,
         ROUND(median(l_quantity), 6) AS median_qty,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, median_qty,
       ROUND(SQRT((n * sxx - sx * sx) / (n * (n - 1.0))), 6) AS sd_qty,
       ROUND((n * sxy - sx * sy)
             / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
         AS corr_qty_price,
       CAST(n AS BIGINT) AS n
FROM s
"""


def q_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step STRICTLY-ORDERED funnel (view -> click -> purchase):
    step N counts users whose earliest qualifying step-N event falls
    strictly after their step-(N-1) anchor — the sequential-dependency
    shape the first-touch funnel (q_funnel) can't express. Each step is
    one filtered aggregate joined to the previous anchor set; anchors
    shrink monotonically, so joins 2 and 3 broadcast the surviving-user
    side at scale and the events scan is reread, never shuffled on the
    full corpus."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.lit(1).cast("long").alias("step_no"),
               F.lit("view").alias("step"),
               F.count("*").cast("long").alias("n_users"))
        .unionByName(
            s2.agg(F.lit(2).cast("long").alias("step_no"),
                   F.lit("click").alias("step"),
                   F.count("*").cast("long").alias("n_users")))
        .unionByName(
            s3.agg(F.lit(3).cast("long").alias("step_no"),
                   F.lit("purchase").alias("step"),
                   F.count("*").cast("long").alias("n_users")))
    )


_FUNNEL_ORDERED_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT CAST(1 AS BIGINT) AS step_no, 'view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
UNION ALL
SELECT CAST(2 AS BIGINT), 'click', CAST(COUNT(*) AS BIGINT) FROM s2
UNION ALL
SELECT CAST(3 AS BIGINT), 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnosis for lineitem.l_suppkey (operators.skew.
    skew_report): the one-row measurement that justifies (or rules
    out) salting before a join/agg on the key."""
    from providenciasbigdata_spark.operators.skew import skew_report

    return skew_report(load_table(spark, sf_dir, "lineitem"), "l_suppkey")


_SKEW_REPORT_SQL = """
WITH c AS (SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MAX(n) AS BIGINT) AS max_n,
       ROUND(quantile_cont(n, 0.5), 4) AS p50_n,
       ROUND(quantile_cont(n, 0.99), 4) AS p99_n,
       ROUND(MAX(n) / (CAST(SUM(n) AS DOUBLE) / COUNT(*)), 6) AS skew_ratio
FROM c
"""


def q_hist_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order totals — the optimizer-statistics
    shape (what ANALYZE builds); complements the fixed-width
    q_price_histogram. Deliberately NOT a global-window ntile: a
    ``Window.orderBy`` with no partitionBy funnels the table through
    ONE task. Instead the exact global rank comes from the two-phase
    distributed prefix sum (operators.pack.packed_positions with unit
    sizes: range partitioning + per-partition offsets broadcast —
    every stage parallel), and bucket = rank*8 div n in exact integer
    arithmetic. Deterministic total order via the (price, orderkey)
    tie-break; bucket sizes differ by at most 1."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    from providenciasbigdata_spark.operators.pack import packed_positions

    ranked = packed_positions(
        orders.withColumn("_one", F.lit(1)),
        order_col=["o_totalprice", "o_orderkey"],
        size_col="_one",
        capacity=1,
    )
    total = orders.agg(F.count("*").alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("bucket", F.expr("(cum_before * 8) div _n"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
        .orderBy("bucket")
    )


_HIST_EQUI_DEPTH_SQL = """
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(MIN(o_totalprice), 4) AS lo, ROUND(MAX(o_totalprice), 4) AS hi
FROM (
  SELECT ((ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) - 1) * 8)
           // (SELECT COUNT(*) FROM orders) AS bucket,
         o_totalprice
  FROM orders
) GROUP BY bucket ORDER BY bucket
"""


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram of order totals — binning via an explicit
    floor formula (identical arithmetic on both engines; no reliance on
    engine-specific width_bucket edge conventions). Two-phase agg over
    one scan."""
    lo, hi, nbins = 0.0, 600000.0, 20
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor((F.col("o_totalprice") - lo) / ((hi - lo) / nbins)).cast("bigint"),
        F.lit(nbins - 1),
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .orderBy("bucket")
    )


_HISTOGRAM_SQL = """
SELECT LEAST(CAST(FLOOR((o_totalprice - 0.0) / 30000.0) AS BIGINT), 19) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY 1
ORDER BY 1
"""


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join: customer-name pairs within Levenshtein
    distance 1. Blocking on the leading digits of the name's numeric
    suffix turns O(n^2) into an equi-join over ~100-row blocks — the
    standard entity-resolution pattern; at 100 TB the blocking key is a
    phonetic/sorted-token key instead, the join shape is unchanged."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a = cust.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.substring("c_name", 10, 4).alias("_blk"),
    )
    b = cust.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.substring("c_name", 10, 4).alias("_blk"),
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.levenshtein("name_a", "name_b") == 1)
        .select("id_a", "id_b", "name_a", "name_b")
    )


_FUZZY_SQL = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       a.c_name AS name_a, b.c_name AS name_b
FROM customer a JOIN customer b
  ON substring(a.c_name, 10, 4) = substring(b.c_name, 10, 4)
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) = 1
"""




def q_arrow_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInArrow grouped-map: per-event-type quartiles computed in
    Arrow kernels (no pandas on either side). Oracle: DuckDB
    quantile_cont (both linear interpolation over the sorted group)."""
    from providenciasbigdata_spark.functions.udx import arrow_group_quantiles

    return arrow_group_quantiles(load_table(spark, sf_dir, "events"))


_ARROW_QUANTILES_SQL = """
SELECT event_type AS key,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(quantile_cont(value, 0.25), 6) AS q25,
       ROUND(quantile_cont(value, 0.50), 6) AS q50,
       ROUND(quantile_cont(value, 0.75), 6) AS q75
FROM events
GROUP BY event_type
"""

_PROFILE_COLS = (
    "o_orderkey o_custkey o_orderstatus o_totalprice o_orderdate o_orderpriority"
).split()


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler (the ANALYZE/stats-collection shape):
    row count + per-column null and EXACT distinct counts for every
    orders column, computed in a SINGLE aggregate over a single scan —
    Catalyst rewrites the multi-column COUNT(DISTINCT) into one Expand
    + two-phase aggregate (one shuffle, data widened x columns), which
    is the exact-stats trade; the 100 TB default swaps
    approx_count_distinct into the same shape. The wide result row is
    unpivoted to one row per column with stack()."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"dist_{c}"))
    wide = orders.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nulls_{c}, dist_{c}" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS (column_name, n_nulls, n_distinct)",
        "n_rows",
    ).select(
        "column_name",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


_PROFILE_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS column_name, "
    f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls, "
    f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
    f"CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders"
    for c in _PROFILE_COLS
)


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over per-user event-type baskets (the
    2-itemset slice of market-basket mining): support, confidence and
    lift for every co-occurring type pair above 2% support. One
    distinct (user, type) collapse, one self-equi-join on user_id
    producing ordered pairs (type_a < type_b counts each unordered
    pair once), then broadcast joins of the tiny per-type and total
    counts. Ratios are written with IDENTICAL operation order on both
    engines (double(n_ab)·n_users / (double(n_a)·n_b)) — two exact
    integer-valued multiplies below 2^53, one correctly-rounded
    division — so the doubles value-hash unrounded."""
    ev = load_table(spark, sf_dir, "events")
    ue = ev.select("user_id", "event_type").distinct()
    n_users = ue.agg(F.countDistinct("user_id").alias("n_users"))
    counts = ue.groupBy("event_type").agg(F.count("*").alias("n"))
    b = ue.select(F.col("user_id"), F.col("event_type").alias("type_b"))
    pairs = (
        ue.select("user_id", F.col("event_type").alias("type_a"))
        .join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_ab"))
    )
    out = (
        pairs.join(
            F.broadcast(counts.select(F.col("event_type").alias("type_a"),
                                      F.col("n").alias("n_a"))), "type_a")
        .join(
            F.broadcast(counts.select(F.col("event_type").alias("type_b"),
                                      F.col("n").alias("n_b"))), "type_b")
        .crossJoin(F.broadcast(n_users))
    )
    support = F.col("n_ab").cast("double") / F.col("n_users")
    confidence = F.col("n_ab").cast("double") / F.col("n_a")
    lift = (F.col("n_ab").cast("double") * F.col("n_users")) / (
        F.col("n_a").cast("double") * F.col("n_b")
    )
    return (
        out.select(
            "type_a", "type_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            support.alias("support"),
            confidence.alias("confidence"),
            lift.alias("lift"),
        )
        .filter(F.col("support") >= 0.02)
        .orderBy("type_a", "type_b")
    )


_ASSOC_SQL = """
WITH ue AS (SELECT DISTINCT user_id, event_type FROM events),
tot AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ue),
cnt AS (SELECT event_type, COUNT(*) AS n FROM ue GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_ab
  FROM ue a JOIN ue b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT p.type_a, p.type_b,
       CAST(p.n_ab AS BIGINT) AS n_ab,
       CAST(ca.n AS BIGINT) AS n_a,
       CAST(cb.n AS BIGINT) AS n_b,
       CAST(p.n_ab AS DOUBLE) / t.n_users AS support,
       CAST(p.n_ab AS DOUBLE) / ca.n AS confidence,
       (CAST(p.n_ab AS DOUBLE) * t.n_users) / (CAST(ca.n AS DOUBLE) * cb.n) AS lift
FROM pairs p
JOIN cnt ca ON ca.event_type = p.type_a
JOIN cnt cb ON cb.event_type = p.type_b
CROSS JOIN tot t
WHERE CAST(p.n_ab AS DOUBLE) / t.n_users >= 0.02
ORDER BY p.type_a, p.type_b
"""


def q_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (two-sided grouped-map UDF): per-user
    as-of merge — each purchase picks the user's latest click value
    at-or-before its timestamp, computed by pandas.merge_asof inside
    one co-partitioned task per key group. The click side is
    pre-aggregated to one row per (user, ts) — pandas' and DuckDB's
    as-of TIE rules on duplicate right timestamps differ, so the
    query removes the tie class rather than pinning either engine's
    arbitrary pick. Values pass through unchanged (no arithmetic), so
    the doubles hash exactly; oracle is DuckDB's native ASOF JOIN."""
    from providenciasbigdata_spark.functions.udx import cogroup_asof_prices

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = cogroup_asof_prices(purchases, clicks)
    return out.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value", "ref_value"
    ).orderBy("user_id", "ts_us")


_COGROUP_ASOF_SQL = """
WITH p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, MAX(value) AS ref_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT p.user_id, epoch_us(p.ts) AS ts_us, p.value, c.ref_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.user_id, ts_us
"""


QUERIES = {
    "assoc_rules_event_pairs": (q_assoc_rules, _ASSOC_SQL),
    "udx_cogroup_asof": (q_cogroup_asof, _COGROUP_ASOF_SQL),
    "profile_table_stats": (q_profile_table, _PROFILE_SQL),
    "agg_robust_stats": (q_robust_stats, _ROBUST_STATS_SQL),
    "agg_price_histogram": (q_price_histogram, _HISTOGRAM_SQL),
    "join_fuzzy_name_pairs": (q_fuzzy_name_pairs, _FUZZY_SQL),
    "setops_bag_semantics": (q_setops_bag, _SETOPS_BAG_SQL),
    "join_null_safe": (q_join_null_safe, _JOIN_NULL_SAFE_SQL),
    "sample_deterministic_hash": (q_sample_deterministic, _SAMPLE_DET_SQL),
    "sample_fixed_per_stratum": (q_sample_fixed_per_stratum, _SAMPLE_STRATUM_SQL),
    "agg_conditional_bools": (q_conditional_aggregates, _COND_AGG_SQL),
    "window_nth_value": (q_window_nth_value, _NTH_VALUE_SQL),
    "window_range_frame": (q_range_frame_trailing, _RANGE_FRAME_SQL),
    "sample_stratified": (q_stratified_sample, _STRATIFIED_SQL),
    "sample_stratified_bernoulli": (q_stratified_bernoulli, None),
    "udtf_split_sentences": (q_udtf_sentences, _UDTF_SENTENCES_SQL),
    "udtf_polymorphic_split": (q_udtf_polymorphic_split, _UDTF_POLY_SQL),
    "udtf_event_streaks": (q_udtf_event_streaks, _UDTF_STREAKS_SQL),
    "udaf_geomean": (q_udaf_geomean, _UDAF_GEOMEAN_SQL),
    "udx_arrow_group_quantiles": (q_arrow_group_quantiles, _ARROW_QUANTILES_SQL),
    "window_ranking_functions": (q_ranking_functions, _RANKING_SQL),
    "funnel_signup_purchase": (q_funnel, _FUNNEL_SQL),
    "funnel_ordered_steps": (q_funnel_ordered, _FUNNEL_ORDERED_SQL),
    "hist_equi_depth": (q_hist_equi_depth, _HIST_EQUI_DEPTH_SQL),
    "skew_report_lineitem": (q_skew_report, _SKEW_REPORT_SQL),
    "array_agg_users": (q_array_agg_users, _ARRAY_AGG_SQL),
    "skew_topk_per_supplier": (q_skew_topk, _SKEW_TOPK_SQL),
    "skew_distinct_count": (q_skew_distinct_count, _SKEW_DISTINCT_SQL),
    "unpivot_balances": (q_unpivot_balances, _UNPIVOT_SQL),
    "explode_top_tokens": (q_explode_top_tokens, _EXPLODE_SQL),
    "agg_percentiles": (q_percentiles, _PERCENTILES_SQL),
    "agg_percentiles_approx": (q_percentiles_approx, None),
}

WHY_NO_ORACLE = {
    "sample_stratified_bernoulli": (
        "sampleBy's seeded Bernoulli draw depends on partition layout; no SQL "
        "engine reproduces it — sampled fraction pinned within binomial "
        "tolerance in tests/test_sampling.py"
    ),
    "agg_percentiles_approx": (
        "Greenwald-Khanna sketch estimates are engine-specific (DuckDB's "
        "approx_quantile is t-digest — different values); rank error vs the "
        "exact oracle-checked agg_percentiles pinned in tests/test_sampling.py"
    ),
}
