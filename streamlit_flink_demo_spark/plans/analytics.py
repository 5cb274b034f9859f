"""Analytic breadth: windows, set ops, as-of join, sessionization,
rollup, time buckets, anti-joins, top-k — the SURVEY.md §2.5 categories
the reference doesn't exercise but a complete engine must provide.

Everything here is pure Catalyst (no UDFs): window functions and
aggregations stay in whole-stage codegen; sums inside windows use the
decimal-exact pattern so results hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.functions.numeric import dsum, dsum_sql
from streamlit_flink_demo_spark.plans import register
from streamlit_flink_demo_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# Top-K per group (ranking window)
# --------------------------------------------------------------------------


@register(
    "topk_orders_per_customer",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT c_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM customer JOIN orders ON c_custkey = o_custkey
) t
WHERE rk <= 3
""",
    tags=("window",),
    expose=False,
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer. ROW_NUMBER with an o_orderkey
    tiebreak for determinism. One shuffle on c_custkey; at scale the
    rank filter happens inside the window exec before any further
    shuffle (Spark pushes limit-like rank filters since 3.5)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


# --------------------------------------------------------------------------
# Running (cumulative) aggregate — RANGE frame for tie determinism
# --------------------------------------------------------------------------


@register(
    "supplier_running_revenue",
    oracle="""
SELECT l_suppkey,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
       CAST(SUM(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))))
            OVER (PARTITION BY l_suppkey ORDER BY l_shipdate
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_revenue
FROM lineitem
GROUP BY l_suppkey, l_shipdate
""",
    tags=("window",),
    expose=False,
)
def supplier_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per supplier by ship day: pre-aggregate per
    (suppkey, day) first — shrinks the window input by the per-day fan-in
    before the sort — then a RANGE-frame cumulative sum (decimal-exact).

    r13 (guide §2.4 "two operations keyed the same way can share one
    exchange"): groupBy(suppkey, day) hash-distributes by BOTH keys,
    which does NOT satisfy the window's partitionBy(suppkey) — the
    plan paid a second full exchange between the aggregate and the
    window. An explicit repartition("l_suppkey") up front satisfies
    the clustering requirement of both (partition keys ⊆ grouping
    keys), so one exchange serves the aggregate AND the window:
    2 Exchanges → 1, measured 1.56 → 0.73 s at sf0.1. The trade is
    losing map-side partial aggregation — a no-op here anyway, since
    (suppkey, day) barely collapses (~500k groups from 600k rows);
    only the four needed columns ship. Skew note: rows per supplier
    are uniform in this schema; a hot-supplier corpus would salt the
    repartition key and two-phase the window instead."""
    l = load_table(spark, sf_dir, "lineitem")
    day_rev = (
        l.select("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
        .repartition("l_suppkey")
        .groupBy("l_suppkey", "l_shipdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "DECIMAL(18,6)"
                )
            ).alias("day_rev_dec")
        )
    )
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    return day_rev.select(
        "l_suppkey",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
        F.sum("day_rev_dec").over(w).cast("double").alias("running_revenue"),
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@register(
    "nation_setops",
    oracle="""
SELECT 'both' AS side, n FROM (
  SELECT c_nationkey AS n FROM customer
  INTERSECT
  SELECT s_nationkey AS n FROM supplier
) a
UNION ALL
SELECT 'customer_only' AS side, n FROM (
  SELECT c_nationkey AS n FROM customer
  EXCEPT
  SELECT s_nationkey AS n FROM supplier
) b
""",
    tags=("setops",),
    expose=False,
)
def nation_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one plan. Spark lowers these to
    semi/anti aggregate joins — distinct-on-key first keeps the shuffle
    payload to the key column only."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n")
    )
    both = c.intersect(s).select(F.lit("both").alias("side"), "n")
    # subtract == SQL EXCEPT (distinct); exceptAll would keep multiplicity
    cust_only = c.subtract(s).select(F.lit("customer_only").alias("side"), "n")
    return both.unionAll(cust_only)


# --------------------------------------------------------------------------
# Anti join (NOT EXISTS)
# --------------------------------------------------------------------------


@register(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    tags=("join", "anti"),
    expose=False,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join; the orders side is reduced to its
    join key before the shuffle (column pruning does this for free)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# Correlated aggregate subquery (orders above their customer's average)
# --------------------------------------------------------------------------


@register(
    "orders_above_cust_avg",
    oracle="""
WITH cust_avg AS (
  SELECT o_custkey AS k,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
           AS avg_price
  FROM orders GROUP BY o_custkey
)
SELECT o_orderkey, o_custkey, o_totalprice, avg_price
FROM orders JOIN cust_avg ON o_custkey = k
WHERE o_totalprice > avg_price
""",
    tags=("join", "subquery"),
    expose=False,
)
def orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape, decorrelated into agg + self-join —
    what Catalyst does to the correlated form anyway; writing it
    explicitly shares one shuffle on o_custkey between agg and join."""
    o = load_table(spark, sf_dir, "orders")
    cust_avg = o.groupBy(F.col("o_custkey").alias("k")).agg(
        (
            F.sum(F.col("o_totalprice").cast("DECIMAL(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_price")
    )
    return (
        o.join(cust_avg, o.o_custkey == cust_avg.k)
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "avg_price")
    )


# --------------------------------------------------------------------------
# ROLLUP (grouping sets)
# --------------------------------------------------------------------------


@register(
    "order_priority_rollup",
    oracle=f"""
SELECT
  COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n_orders,
  {dsum_sql('o_totalprice', 'total_price')}
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    tags=("agg", "rollup"),
    expose=False,
)
def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP: Spark expands grouping sets inside a single
    aggregate exec (one shuffle), same as the SQL form."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum(F.col("o_totalprice"), "total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


# --------------------------------------------------------------------------
# Time-bucketed aggregation (tumbling window, batch form)
# --------------------------------------------------------------------------


@register(
    "events_hourly_stats",
    oracle=f"""
SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
  event_type,
  COUNT(*) AS n_events,
  {dsum_sql('value', 'sum_value')}
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    tags=("agg", "time"),
    expose=False,
)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour bucket aggregation — the batch twin of the
    streaming window(ts, '1 hour') query (streaming/ runs that form).
    date_trunc keeps the bucket key a plain timestamp → normal partial
    aggregation, no struct shuffle key."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"), dsum(F.col("value"), "sum_value"))
        .select(
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# Sessionization (gap-based) — lag + conditional cumsum
# --------------------------------------------------------------------------


@register(
    "events_sessionized",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM sessions
GROUP BY user_id, session_id
""",
    tags=("window", "session"),
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session
    flag → running sum = session id. One shuffle on user_id shared by
    both window steps and the final group (same partitioning)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            # microsecond-exact gap, matching the oracle's INTERVAL compare
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


# --------------------------------------------------------------------------
# As-of join (each click → most recent prior purchase by the same user)
# --------------------------------------------------------------------------


@register(
    "asof_click_purchase",
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  -- one row per (user_id, ts): keep the max-event_id purchase, the
  -- same tie-break the Spark side's ORDER BY (ts, is_click, event_id)
  -- + last() applies — ASOF JOIN's pick among equal-ts rows is
  -- otherwise arbitrary
  SELECT user_id, ts,
         MAX(event_id) AS p_event_id,
         arg_max(value, event_id) AS p_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT c.event_id AS click_id,
       c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       p.p_event_id AS purchase_id,
       p.p_value AS purchase_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
    tags=("join", "asof"),
)
def asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — Spark has no native one (SURVEY §2.5); implemented
    scalably as the union-sort-last_value composition: union both event
    sets, sort within user by (ts, side) with purchases first on ties,
    and carry the last purchase forward with last(ignorenulls). One
    shuffle + one sort regardless of skew — no per-group pandas, no
    cross join, works at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    # ONE scan with conditional projections instead of two filtered
    # scans + union: the In(click,purchase) predicate pushes into the
    # parquet scan, and the window shuffle consumes the scan output
    # directly — at 100 TB this halves the events I/O and drops a
    # union exchange-input.
    both = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_click"),
        F.when(
            F.col("event_type") == "purchase", F.col("event_id")
        ).alias("p_event_id"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "p_value"
        ),
    )
    # purchases sort before clicks at equal ts (is_click asc) so an
    # equal-timestamp purchase is visible to the click (ts >= semantics).
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_click", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = both.select(
        "event_id",
        "user_id",
        "ts",
        "is_click",
        F.last("p_event_id", ignorenulls=True).over(w).alias("purchase_id"),
        F.last("p_value", ignorenulls=True).over(w).alias("purchase_value"),
    )
    return merged.filter(F.col("is_click") == 1).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        "purchase_id",
        "purchase_value",
    )


# --------------------------------------------------------------------------
# Range (interval) join — clicks within 30 min before each purchase
# --------------------------------------------------------------------------

_RANGE_US = 30 * 60 * 1_000_000  # 30 min in microseconds


@register(
    "range_join_clicks_before_purchase",
    oracle="""
SELECT p.event_id AS purchase_id,
       COUNT(c.event_id) AS n_clicks,
       CAST(MAX(c.event_id) AS BIGINT) AS last_click_id
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
LEFT JOIN (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts < p.ts
GROUP BY p.event_id
""",
    tags=("join", "range", "interval"),
    expose=False,
)
def range_join_clicks_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Range (interval) join — Spark has no native one (SURVEY §2.5;
    Flink calls it an interval join). Naive form: equi-join on user_id
    then filter the time range — one hash join whose groups are each
    user's FULL history crossed per purchase; a hot user makes it
    quadratic. Scalable form used here: bucketize time by the range
    width W, explode each purchase to its two covering buckets
    (a click's single bucket must be the purchase's own or the
    previous), equi-join on (user_id, bucket) + exact range filter —
    each join group is now one user-bucket, bounded by local density,
    never a full history. A click matches exactly one of the two
    exploded buckets, so no dedup is needed. LEFT semantics (purchases
    with zero clicks) come from re-joining counts onto the purchase
    set by purchase_id (broadcast-free, key-partitioned)."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        us.alias("p_us"),
        (us / _RANGE_US).cast("bigint").alias("bucket"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        us.alias("c_us"),
        (us / _RANGE_US).cast("bigint").alias("c_bucket"),
    )
    pb = purchases.withColumn(
        "jb", F.explode(F.array(F.col("bucket") - 1, F.col("bucket")))
    )
    matched = (
        pb.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("jb") == F.col("c_bucket"))
            & (F.col("c_us") >= F.col("p_us") - _RANGE_US)
            & (F.col("c_us") < F.col("p_us")),
        )
        .groupBy("purchase_id")
        .agg(
            F.count("*").alias("mn"),
            F.max("click_id").alias("mlast"),
        )
    )
    return purchases.join(matched, "purchase_id", "left").select(
        "purchase_id",
        F.coalesce("mn", F.lit(0)).alias("n_clicks"),
        F.col("mlast").alias("last_click_id"),
    )


# --------------------------------------------------------------------------
# Conditional-aggregation pivot (event matrix per user)
# --------------------------------------------------------------------------


@register(
    "user_event_matrix",
    oracle="""
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events
GROUP BY user_id
""",
    tags=("agg", "pivot"),
)
def user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation (the scale-safe form: no
    distinct-values collection on the driver, unlike df.pivot without
    an explicit value list)."""
    e = load_table(spark, sf_dir, "events")

    def n(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(
            f"n_{t}"
        )

    return e.groupBy("user_id").agg(
        n("click"), n("view"), n("purchase"), n("signup"), n("error")
    )


# --------------------------------------------------------------------------
# ORDER BY + LIMIT (top-k global)
# --------------------------------------------------------------------------


@register(
    "top_revenue_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    tags=("sort", "limit"),
    expose=False,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark executes orderBy+limit as TakeOrderedAndProject
    — per-partition heaps, no global sort, O(k) driver memory."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# DISTINCT projection
# --------------------------------------------------------------------------


@register(
    "distinct_part_kinds",
    oracle="SELECT DISTINCT p_brand, p_type FROM part",
    tags=("distinct",),
    expose=False,
)
def distinct_part_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = groupBy on all columns; partial dedup map-side."""
    return load_table(spark, sf_dir, "part").select("p_brand", "p_type").distinct()


@register(
    "user_event_unpivot",
    oracle="""
SELECT user_id, etype, CAST(n AS BIGINT) AS n
FROM (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase,
         SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_signup,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error
  FROM events
  GROUP BY user_id
) UNPIVOT (n FOR etype IN (n_click, n_view, n_purchase, n_signup, n_error))
""",
    tags=("agg", "unpivot"),
    expose=False,
)
def user_event_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the inverse of user_event_matrix's conditional-
    aggregation pivot, via the native DataFrame.unpivot — wide matrix
    back to (user_id, etype, n) long form. Like the pivot, no
    driver-side distinct-value collection; the value-column list is
    explicit in the plan."""
    m = user_event_matrix(spark, sf_dir)
    return m.unpivot(
        ["user_id"],
        ["n_click", "n_view", "n_purchase", "n_signup", "n_error"],
        "etype",
        "n",
    ).select("user_id", "etype", F.col("n").cast("bigint").alias("n"))


# --------------------------------------------------------------------------
# Sequence / funnel detection (the MATCH_RECOGNIZE shape, CEP-lite)
# --------------------------------------------------------------------------


@register(
    "events_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT v.user_id,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 ELSE 1 END AS BIGINT) AS reached_stage,
       (epoch_us(p.t_purchase) - epoch_us(v.t_view)) / 1000000.0
         AS sec_to_convert
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
""",
    tags=("funnel", "sequence", "cep"),
    expose=False,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence (funnel) detection: the earliest
    view -> click -> purchase chain per user, where each stage must
    strictly follow the previous one in event time — the shape SQL
    engines express with MATCH_RECOGNIZE (absent from both the
    reference and Spark SQL; SURVEY.md §2.5). Composition: one staged
    conditional-MIN aggregation per funnel step, each a groupBy on the
    type-filtered slice joined to the previous stage's timestamps.
    At 100 TB each pass is filter-pruned to one event type, shuffles
    only (user_id, ts), and the stage joins are aggregate-sized — no
    per-user event arrays are ever materialized, which is what keeps
    a hot user (millions of events) from becoming a memory spike."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c.select("user_id", F.lit(1).alias("_c")), "user_id", "left")
        .join(p.select("user_id", "t_purchase"), "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("_c").isNotNull(), 2)
            .otherwise(1)
            .cast("bigint")
            .alias("reached_stage"),
            # exact µs integers, ONE rounding at the division — the
            # epoch-seconds double subtraction loses ULP-level bits
            (
                (F.unix_micros("t_purchase") - F.unix_micros("t_view"))
                / 1_000_000.0
            ).alias("sec_to_convert"),
        )
    )


# --------------------------------------------------------------------------
# Time-series gap filling + forward fill (the timeseries-DB staple)
# --------------------------------------------------------------------------


@register(
    "events_gapfill",
    oracle=f"""
WITH h AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type,
         COUNT(*) AS n, {dsum_sql('value', 'sum_value')}
  FROM events GROUP BY 1, 2
),
b AS (
  SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx FROM h GROUP BY 1
),
spine AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
  FROM b
)
SELECT strftime(s.bucket, '%Y-%m-%d %H:%M:%S') AS hour_start,
       s.event_type,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
       CAST(CASE WHEN h.n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS gap_filled,
       last_value(h.sum_value IGNORE NULLS)
         OVER (PARTITION BY s.event_type ORDER BY s.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry_sum
FROM spine s
LEFT JOIN h ON h.event_type = s.event_type AND h.bucket = s.bucket
""",
    tags=("time", "gapfill"),
    expose=False,
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-spine gap filling with forward fill — the timeseries-DB
    staple (TimescaleDB time_bucket_gapfill + locf): build each
    series' full hourly spine with sequence(min, max, 1 hour), left
    join the sparse hourly aggregate, zero-fill counts, and carry the
    last seen sum forward with last(ignorenulls) over a
    series-partitioned window. At 100 TB the spine is |series| ×
    |buckets| rows — generated, never scanned — and both the join and
    the fill window partition by series key, so no global sort and no
    skew beyond a series' own length (bound the spine with explicit
    range predicates when a series is unbounded)."""
    e = load_table(spark, sf_dir, "events")
    h = (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n"), dsum(F.col("value"), "sum_value"))
    )
    spine = (
        h.groupBy("event_type")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 hour"))
            ).alias("bucket"),
        )
    )
    joined = spine.join(h, ["event_type", "bucket"], "left")
    win = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        F.when(F.col("n").isNull(), 1).otherwise(0).cast("bigint").alias(
            "gap_filled"
        ),
        F.last("sum_value", ignorenulls=True).over(win).alias("carry_sum"),
    )


# --------------------------------------------------------------------------
# Retention cohorts (the classic product-analytics shape)
# --------------------------------------------------------------------------

_RET_EPOCH0 = 1704067200  # 2024-01-01T00:00:00Z — the corpus origin
_RET_WEEK = 7 * 24 * 3600


@register(
    "events_retention_cohorts",
    oracle=f"""
WITH wk AS (
  SELECT DISTINCT user_id,
         (CAST(floor(epoch(ts)) AS BIGINT) - {_RET_EPOCH0})
           // {_RET_WEEK} AS week
  FROM events
),
cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id
),
sizes AS (
  SELECT cohort_week, COUNT(*)::BIGINT AS cohort_size
  FROM cohort GROUP BY cohort_week
)
SELECT c.cohort_week,
       w.week - c.cohort_week AS week_offset,
       COUNT(DISTINCT w.user_id)::BIGINT AS n_active,
       s.cohort_size,
       ROUND(COUNT(DISTINCT w.user_id)::DOUBLE / s.cohort_size, 6)
         AS retention_r
FROM wk w
JOIN cohort c USING (user_id)
JOIN sizes s ON s.cohort_week = c.cohort_week
GROUP BY c.cohort_week, w.week - c.cohort_week, s.cohort_size
""",
    tags=("events", "window", "analytics"),
    expose=False,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week,
    each later week's active share of the cohort — the triangle every
    product dashboard draws. Plan shape: one distinct (user, week)
    projection feeds BOTH the cohort min and the activity join (Spark
    reuses the exchange — the aggregations share the user_id
    partitioning), then one grouped count per (cohort, offset);
    fractions are exact integer ratios rounded once."""
    e = load_table(spark, sf_dir, "events")
    wk = e.select(
        "user_id",
        # floor, not truncate-toward-zero: the oracle's // floors, so
        # a ts before _RET_EPOCH0 must land in week -1, not week 0.
        F.floor(
            (F.unix_timestamp("ts") - F.lit(_RET_EPOCH0))
            / F.lit(_RET_WEEK)
        )
        .cast("bigint")
        .alias("week"),
    ).distinct()
    cohort = wk.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    sizes = cohort.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    return (
        wk.join(cohort, "user_id")
        .withColumn("week_offset", F.col("week") - F.col("cohort_week"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"),
                6,
            ).alias("retention_r"),
        )
    )
