"""Second TPC-H-style pack: correlated subqueries, nation-pair trade,
market share, distributions, HAVING against global aggregates — the
harder relational shapes (Q2/Q7/Q8/Q11/Q13/Q22 analogs adapted to the
testdata schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.functions.numeric import dsum, dsum_sql
from streamlit_flink_demo_spark.plans import register
from streamlit_flink_demo_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# Q2 shape — row(s) matching a correlated per-group minimum
# --------------------------------------------------------------------------


@register(
    "cheapest_order_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders o
WHERE o_totalprice = (
  SELECT MIN(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
""",
    tags=("tpch2", "subquery"),
    expose=False,
)
def cheapest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-min shape: per-partition window MIN then
    filter — ONE scan and ONE shuffle of the fact table (the agg +
    self-join decorrelation scans it twice). No sort: the unbounded
    MIN frame doesn't need one. Ties (several orders at the min price)
    are all kept — same as the correlated form."""
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "min_price", F.min("o_totalprice").over(W.partitionBy("o_custkey"))
        )
        .filter(F.col("o_totalprice") == F.col("min_price"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# Q7 shape — trade volume between nation pairs
# --------------------------------------------------------------------------


@register(
    "nation_pair_trade",
    oracle=f"""
SELECT c.c_nationkey AS cust_nation,
       s.s_nationkey AS supp_nation,
       EXTRACT(YEAR FROM l.l_shipdate) AS yr,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 'volume')}
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE c.c_nationkey <> s.s_nationkey
  AND c.c_nationkey < 5 AND s.s_nationkey < 5
GROUP BY c.c_nationkey, s.s_nationkey, EXTRACT(YEAR FROM l.l_shipdate)
""",
    tags=("tpch2", "join"),
    expose=False,
)
def nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year. The nation
    filters are applied on the dimension sides before the fact joins
    (pushdown), the pair inequality is a cheap post-join filter."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 5)
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("cust_nation"),
            F.col("s_nationkey").alias("supp_nation"),
            F.year("l_shipdate").cast("bigint").alias("yr"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "volume"))
    )


# --------------------------------------------------------------------------
# Q8 shape — market share of one supplier-nation inside a region market
# --------------------------------------------------------------------------


@register(
    "asia_market_share",
    oracle="""
SELECT EXTRACT(YEAR FROM o.o_orderdate) AS yr,
  CAST(SUM(CAST(CASE WHEN s.s_nationkey = n.n_nationkey
        THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
        AS DECIMAL(18,6))) AS DOUBLE)
  / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
        AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE r.r_name = 'ASIA'
GROUP BY EXTRACT(YEAR FROM o.o_orderdate)
""",
    tags=("tpch2", "join"),
    expose=False,
)
def asia_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the share of Asian customers' purchase volume
    where the supplier sits in the customer's own nation. Fixed-
    cardinality dims broadcast; the share is a conditional/total
    decimal-sum ratio (deterministic)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    s = load_table(spark, sf_dir, "supplier")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    local = F.when(F.col("s_nationkey") == F.col("n_nationkey"), vol).otherwise(
        F.lit(0.0)
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(
            (
                F.sum(local.cast("DECIMAL(18,6)")).cast("double")
                / F.sum(vol.cast("DECIMAL(18,6)")).cast("double")
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q13 shape — distribution of orders-per-customer
# --------------------------------------------------------------------------


@register(
    "customer_order_distribution",
    oracle="""
SELECT n_orders, COUNT(*) AS n_customers
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) t
GROUP BY n_orders
""",
    tags=("tpch2", "agg"),
    expose=False,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: two-level aggregation (per-customer count, then
    histogram of counts). LEFT JOIN keeps orderless customers in the
    0-bucket; second aggregation runs on |customers| rows only."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


# --------------------------------------------------------------------------
# Q11 shape — HAVING against a global scalar aggregate
# --------------------------------------------------------------------------


@register(
    "supplier_value_concentration",
    oracle=f"""
WITH per_supp AS (
  SELECT l_suppkey, {dsum_sql('l_extendedprice', 'supp_value')}
  FROM lineitem GROUP BY l_suppkey
),
total AS (
  SELECT CAST(SUM(CAST(supp_value AS DECIMAL(18,6))) AS DOUBLE) AS grand
  FROM per_supp
)
SELECT l_suppkey, supp_value
FROM per_supp, total
WHERE supp_value > 0.011 * grand
""",
    tags=("tpch2", "subquery"),
    expose=False,
)
def supplier_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups exceeding a fraction of the global
    total. The global total is an unpartitioned window SUM over the
    already-aggregated |suppliers| rows — ONE scan of the fact table
    (an agg + cross-join formulation scans it twice; measured 1.5 s →
    0.5 s at sf0.1). The single-partition window is safe because its
    input is post-aggregation (|suppliers| rows, never fact-sized)."""
    from pyspark.sql.window import Window as W

    l = load_table(spark, sf_dir, "lineitem")
    per_supp = l.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice"), "supp_value")
    )
    grand = (
        F.sum(F.col("supp_value").cast("DECIMAL(18,6)"))
        .over(W.partitionBy())
        .cast("double")
    )
    return (
        per_supp.withColumn("grand", grand)
        .filter(F.col("supp_value") > 0.011 * F.col("grand"))
        .select("l_suppkey", "supp_value")
    )


# --------------------------------------------------------------------------
# Q22 shape — above-average-balance customers with no orders
# --------------------------------------------------------------------------


@register(
    "dormant_rich_customers",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
    AS a
  FROM customer WHERE c_acctbal > 0
)
SELECT substr(c_name, 1, 9) AS name_prefix,
       COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY substr(c_name, 1, 9)
""",
    tags=("tpch2", "anti", "subquery"),
    expose=False,
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average balances, no orders, grouped by
    a name prefix. Global average broadcast; NOT EXISTS as anti-join
    against the pruned orders key column."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("DECIMAL(18,6)")).cast("double")
                / F.count("*")
            ).alias("a")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 1, 9).alias("name_prefix"))
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("DECIMAL(18,6)"))
            .cast("double")
            .alias("total_bal"),
        )
    )
