"""Window-function and multi-dimensional aggregation pack: ranking
(rank / dense_rank / ntile / percent_rank), lead/lag, sliding row
frames, first/last_value, CUBE + grouping_id, sliding event-time
windows, and array unnest-with-position.

None of these appear in the reference (SURVEY.md §2.5 — no window
functions, frames, or grouping sets anywhere in
`/root/reference/dashboard.py`); they complete the analytic-SQL
surface a reference user would expect from the engine.

Determinism note: every ORDER BY inside a window carries a unique
tie-break key (orderkey / custkey / linenumber) — rank() is stable
under ties but ntile()/lead()/lag()/row frames are NOT, and the
DuckDB oracle comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from streamlit_flink_demo_spark.functions.numeric import dsum, dsum_sql
from streamlit_flink_demo_spark.plans import register, track_persist
from streamlit_flink_demo_spark.sources.catalog import load_spread, load_table

# --------------------------------------------------------------------------
# Ranking family over one partitioned sort
# --------------------------------------------------------------------------


@register(
    "order_rank_quartiles",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey)
""",
    tags=("window", "rank"),
    expose=False,
)
def order_rank_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking family over a single partitioned sort — one
    shuffle on o_orderpriority, one sort, all four functions evaluated
    in the same window pass (Spark collapses same-window functions
    into one physical Window operator). o_orderkey tie-break makes
    ntile deterministic."""
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


# --------------------------------------------------------------------------
# lead / lag neighbors
# --------------------------------------------------------------------------


@register(
    "customer_balance_leadlag",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       LAG(c_acctbal) OVER w AS prev_bal,
       LEAD(c_acctbal) OVER w AS next_bal,
       c_acctbal - LAG(c_acctbal) OVER w AS gap_to_prev
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""",
    tags=("window", "leadlag"),
    expose=False,
)
def customer_balance_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag over the per-nation balance ladder. Both offsets and
    the derived gap reuse one Window operator; NULL at partition edges
    (no default argument) matches ANSI."""
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.lag("c_acctbal").over(w).alias("prev_bal"),
        F.lead("c_acctbal").over(w).alias("next_bal"),
        (F.col("c_acctbal") - F.lag("c_acctbal").over(w)).alias("gap_to_prev"),
    )


# --------------------------------------------------------------------------
# Sliding ROWS frame (moving aggregate)
# --------------------------------------------------------------------------


@register(
    "supplier_moving_qty",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(AVG(l_quantity) OVER w AS DOUBLE) AS qty_ma5,
       CAST(SUM(l_quantity) OVER w AS DOUBLE) AS qty_sum5
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber,
                      l_quantity, l_partkey
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "frame"),
    expose=False,
)
def supplier_moving_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row moving average/sum per supplier — a bounded ROWS frame,
    the shape behind smoothing and rate-of-change features. l_quantity
    is integral so the double arithmetic is order-exact. One shuffle
    on l_suppkey; the frame is evaluated streaming over the sorted run
    (O(1) per row for sum/avg).

    ORDER BY must be a TOTAL order for a bounded ROWS frame to be
    well-defined: (orderkey, linenumber) is not unique in the synthetic
    data (sf0.1 carries one duplicated (suppkey, shipdate, orderkey,
    linenumber) pair with differing quantities), so quantity+partkey
    complete the key — without them the two engines may legally order
    the tie differently and produce different moving sums."""
    w = (
        W.partitionBy("l_suppkey")
        .orderBy(
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_partkey",
        )
        .rowsBetween(-4, 0)
    )
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.avg("l_quantity").over(w).cast("double").alias("qty_ma5"),
        F.sum("l_quantity").over(w).cast("double").alias("qty_sum5"),
    )


# --------------------------------------------------------------------------
# first_value / last_value over an unbounded frame
# --------------------------------------------------------------------------


@register(
    "customer_first_last_order",
    oracle="""
SELECT DISTINCT o_custkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
       LAST_VALUE(o_orderkey) OVER w AS last_orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER w AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window", "firstlast"),
    expose=False,
)
def customer_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value across each customer's full order
    history (unbounded frame — without it LAST_VALUE sees only the
    default frame's current row). DISTINCT collapses the per-row
    window output to one row per customer; Catalyst reuses the window
    shuffle for the distinct."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_orderkey"),
            F.last("o_orderkey").over(w).alias("last_orderkey"),
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
        )
        .distinct()
    )


# --------------------------------------------------------------------------
# CUBE + grouping_id
# --------------------------------------------------------------------------


@register(
    "part_type_size_cube",
    oracle="""
SELECT p_type, p_size // 10 AS size_band,
       GROUPING(p_type, p_size // 10) AS gid,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS total_retail
FROM part
GROUP BY CUBE (p_type, p_size // 10)
""",
    tags=("agg", "cube"),
    expose=False,
)
def part_type_size_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (type, size-band) with grouping_id — all four grouping
    sets in one pass: Spark expands the cube with an Expand operator
    (4× the input rows pre-aggregation, |sets|·|groups| after partial
    agg), still a single shuffle. gid bit order (left column = high
    bit) matches ANSI GROUPING()."""
    p = load_table(spark, sf_dir, "part").withColumn(
        "size_band", (F.col("p_size") / 10).cast("int")
    )
    return (
        p.cube("p_type", "size_band")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("DECIMAL(18,6)"))
            .cast("double")
            .alias("total_retail"),
        )
        .select("p_type", "size_band", "gid", "n_parts", "total_retail")
    )


# --------------------------------------------------------------------------
# Sliding event-time windows (1 h window, 30 min slide)
# --------------------------------------------------------------------------


@register(
    "events_sliding_windows",
    oracle=f"""
WITH exploded AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE AS ws, value
  FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events,
       {dsum_sql('value', 'sum_value')}
FROM exploded
GROUP BY ws
""",
    tags=("agg", "time", "window"),
    expose=False,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows: width 1 h, slide 30 min — each event
    lands in exactly 2 epoch-aligned windows. F.window generates the
    assignments JVM-side (same operator the streaming twin uses with a
    watermark); the oracle models it as a union of two shifted
    tumbling bucketings."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum(F.col("value"), "sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# Multi-resolution time rollup (hypertable continuous-aggregate shape)
# --------------------------------------------------------------------------

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "events_multires_rollup",
    oracle=f"""
SELECT 'rollup_1m' AS resolution,
       strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
       COUNT(*) AS n_events, {dsum_sql('value', 'sum_value')}
FROM events GROUP BY date_trunc('minute', ts)
UNION ALL
SELECT 'rollup_1h', strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'),
       COUNT(*), {dsum_sql('value', 'sum_value')}
FROM events GROUP BY date_trunc('hour', ts)
UNION ALL
SELECT 'rollup_1d', strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'),
       COUNT(*), {dsum_sql('value', 'sum_value')}
FROM events GROUP BY date_trunc('day', ts)
""",
    tags=("agg", "time", "rollup"),
    expose=False,
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup (minute/hour/day
    continuous aggregates) computed HIERARCHICALLY: the fact table is
    scanned and shuffled ONCE to minute grain, then hour and day
    derive by re-aggregating the minute partials (|minutes| rows, then
    |hours|) — at 100 TB that's one fact shuffle instead of three, and
    the decimal partials re-sum exactly, so the result is
    bit-identical to aggregating each resolution from raw (which is
    precisely what the oracle does)."""
    e = load_table(spark, sf_dir, "events")
    minute = e.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("b")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("DECIMAL(18,6)")).alias("sv"),
    )
    # Without this, each UNION branch recomputes its lineage — three
    # fact scans instead of one. The persisted frame is |minutes| rows
    # (tiny relative to the fact table at any scale).
    minute = track_persist(minute)

    def level(src: DataFrame, grain: str) -> DataFrame:
        return src.groupBy(F.date_trunc(grain, F.col("b")).alias("b")).agg(
            F.sum("n_events").alias("n_events"), F.sum("sv").alias("sv")
        )

    hour = level(minute, "hour")
    day = level(hour, "day")

    def out(src: DataFrame, tag: str) -> DataFrame:
        return src.select(
            F.lit(tag).alias("resolution"),
            F.date_format("b", _TS_FMT).alias("bucket_start"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("sv").cast("double").alias("sum_value"),
        )

    return (
        out(minute, "rollup_1m")
        .unionAll(out(hour, "rollup_1h"))
        .unionAll(out(day, "rollup_1d"))
    )


# --------------------------------------------------------------------------
# Array unnest with position → per-dimension statistics
# --------------------------------------------------------------------------


@register(
    "embedding_dim_stats",
    oracle="""
WITH flat AS (
  SELECT unnest(embedding)::DOUBLE AS val,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
)
SELECT pos,
       COUNT(*) AS n,
       MIN(val) AS dim_min,
       MAX(val) AS dim_max,
       CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) AS dim_sum
FROM flat
GROUP BY pos
""",
    tags=("array", "explode", "agg"),
    expose=False,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the embedding column → per-dimension min/max/sum
    (the scan a feature-normalization pipeline runs before scaling).
    Explode is a narrow transform — 64× the rows flow into a partial
    aggregate that collapses to 64 groups per partition before the
    one shuffle. Decimal-sum keeps the float accumulation
    order-independent."""
    e = load_spread(spark, sf_dir, "embeddings")
    flat = e.select(F.posexplode("embedding").alias("pos0", "valf")).select(
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )
    return flat.groupBy("pos").agg(
        F.count("*").alias("n"),
        F.min("val").alias("dim_min"),
        F.max("val").alias("dim_max"),
        F.sum(F.col("val").cast("DECIMAL(18,6)")).cast("double").alias("dim_sum"),
    )
