"""Second breadth pack — the dialect corners the first pack skipped:
multiset set operations (INTERSECT ALL / EXCEPT ALL), explicit
GROUPING SETS, date arithmetic (datediff), and the null-handling
scalar family (NULLIF / COALESCE / GREATEST / LEAST).

All absent from the reference (SURVEY.md §2.5); inherited from Spark
SQL and pinned here with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.functions.numeric import dsum, dsum_sql
from streamlit_flink_demo_spark.plans import register
from streamlit_flink_demo_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# Multiset set operations (bag semantics)
# --------------------------------------------------------------------------


@register(
    "priority_setops_all",
    oracle="""
SELECT 'common' AS side, o_orderpriority FROM (
  SELECT o_orderpriority FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
  INTERSECT ALL
  SELECT o_orderpriority FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
) a
UNION ALL
SELECT 'surplus_96' AS side, o_orderpriority FROM (
  SELECT o_orderpriority FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
  EXCEPT ALL
  SELECT o_orderpriority FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
) b
""",
    tags=("setops", "all"),
    expose=False,
)
def priority_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — bag semantics with multiplicity
    (per priority: min(n96, n97) common rows, max(n96-n97, 0) surplus).
    Spark lowers both to a count-aggregate + generate replay, so the
    shuffle carries (value, count) pairs, never the expanded multiset."""
    o = load_table(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_orderpriority")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_orderpriority")
    common = y96.intersectAll(y97).select(
        F.lit("common").alias("side"), "o_orderpriority"
    )
    surplus = y96.exceptAll(y97).select(
        F.lit("surplus_96").alias("side"), "o_orderpriority"
    )
    return common.unionAll(surplus)


# --------------------------------------------------------------------------
# Explicit GROUPING SETS
# --------------------------------------------------------------------------


@register(
    "order_grouping_sets",
    oracle=f"""
SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority, o_orderstatus) AS gid,
       COUNT(*) AS n,
       {dsum_sql('o_totalprice', 'revenue')}
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderstatus), ())
""",
    tags=("agg", "grouping-sets"),
    expose=False,
)
def order_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — an asymmetric set list neither ROLLUP
    nor CUBE expresses ((priority,status), (status), ()): one Expand,
    one shuffle, grouping_id disambiguates the all-NULL rows. Built
    with DataFrame.groupingSets (Spark 4) rather than a session-global
    temp view: createOrReplaceTempView("orders_gs") + spark.sql raced
    under the threaded facade — a concurrent build for another sf_dir
    could swap the view between registration and analysis, permanently
    caching a plan bound to the wrong dataset."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.grouping_id("o_orderpriority", "o_orderstatus").alias("gid"),
        F.count("*").alias("n"),
        dsum(F.col("o_totalprice"), "revenue"),
    )


# --------------------------------------------------------------------------
# Date arithmetic — ship latency
# --------------------------------------------------------------------------


@register(
    "order_ship_latency",
    oracle="""
SELECT o_orderpriority,
       MIN(date_diff('day', o_orderdate, l_shipdate)) AS min_days,
       MAX(date_diff('day', o_orderdate, l_shipdate)) AS max_days,
       CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE)
         / COUNT(*) AS avg_days
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
    tags=("scalar", "date", "join"),
    expose=False,
)
def order_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic: order→ship latency in days, min/max/avg
    per priority. datediff counts calendar-day boundaries in both
    engines; the sums are exact integer arithmetic, so avg is
    order-independent without the decimal detour."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.min(days).cast("bigint").alias("min_days"),
            F.max(days).cast("bigint").alias("max_days"),
            (F.sum(days).cast("double") / F.count("*")).alias("avg_days"),
        )
    )


# --------------------------------------------------------------------------
# Null-handling scalar family
# --------------------------------------------------------------------------


@register(
    "customer_null_funcs",
    oracle=f"""
SELECT c_nationkey,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_building,
       {dsum_sql("COALESCE(NULLIF(c_acctbal, 0.0), -1.0)", 'bal_or_flag')},
       {dsum_sql('GREATEST(c_acctbal, 1000.0)', 'bal_floor')},
       {dsum_sql('LEAST(c_acctbal, 5000.0)', 'bal_cap')}
FROM customer
GROUP BY c_nationkey
""",
    tags=("scalar", "null"),
    expose=False,
)
def customer_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLIF / COALESCE / GREATEST / LEAST — the null-plumbing scalar
    family, aggregated per nation so every branch executes. All pure
    codegen expressions."""
    c = load_table(spark, sf_dir, "customer")
    building = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).isNull()
    return c.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.sum(F.when(building, 1).otherwise(0)).alias("n_building"),
        dsum(
            F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0)),
            "bal_or_flag",
        ),
        dsum(F.greatest(F.col("c_acctbal"), F.lit(1000.0)), "bal_floor"),
        dsum(F.least(F.col("c_acctbal"), F.lit(5000.0)), "bal_cap"),
    )
