"""Scalar-function and join breadth (SURVEY.md §2.5's "free from
Spark" surface, made checkable): JSON extraction, exact percentiles,
COUNT(DISTINCT), outer joins, string and date function families.

Every query sticks to constructs whose semantics are bit-identical in
Spark and DuckDB (or normalized where they aren't — see comments), so
each has a strict value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.functions.numeric import dsum, dsum_sql
from streamlit_flink_demo_spark.plans import register
from streamlit_flink_demo_spark.sources.catalog import load_spread, load_table

# --------------------------------------------------------------------------
# JSON extraction (events.props is a JSON string)
# --------------------------------------------------------------------------


@register(
    "events_json_extract",
    oracle=f"""
SELECT
  CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
  COUNT(*) AS n,
  {dsum_sql('value', 'sum_value')}
FROM events
GROUP BY CAST(json_extract_string(props, '$.k') AS INT) % 10
""",
    tags=("json", "agg"),
    expose=False,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction feeding an aggregate — from_json with an
    explicit one-field schema, so Jackson parses each document once
    and materializes ONLY field k (schema pruning); get_json_object
    re-tokenizes per path expression and was measured slower at sf0.1.
    All JVM-side, no Python in the row path."""
    e = load_spread(spark, sf_dir, "events")
    k_mod = (F.from_json("props", "k INT")["k"] % 10).alias("k_mod")
    return e.groupBy(k_mod).agg(
        F.count("*").alias("n"), dsum(F.col("value"), "sum_value")
    )


# --------------------------------------------------------------------------
# Exact percentiles (continuous interpolation)
# --------------------------------------------------------------------------


@register(
    "order_price_percentiles",
    oracle="""
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 6) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75
FROM orders
GROUP BY o_orderpriority
""",
    tags=("agg", "percentile"),
    expose=False,
)
def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (sort-based, same linear-
    interpolation definition in both engines; ROUND(…,6) absorbs the
    1-ulp difference between their interpolation formulas — true
    values land on the 6-decimal grid, so rounding never ties).
    All three quantiles come from ONE percentile(array(...)) buffer:
    three scalar percentile aggregates each keep their own copy of
    every group value (measured 8.6 s → 0.5 s at sf0.1)."""
    o = load_table(spark, sf_dir, "orders")
    pq = F.percentile(
        F.col("o_totalprice"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(pq.alias("ps"))
        .select(
            "o_orderpriority",
            F.round(F.col("ps")[0], 6).alias("p25"),
            F.round(F.col("ps")[1], 6).alias("p50"),
            F.round(F.col("ps")[2], 6).alias("p75"),
        )
    )


# --------------------------------------------------------------------------
# COUNT(DISTINCT) per group (TPC-H Q16 shape)
# --------------------------------------------------------------------------


@register(
    "supplier_part_diversity",
    oracle="""
SELECT l_suppkey,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY l_suppkey
""",
    tags=("agg", "distinct"),
    expose=False,
)
def supplier_part_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT)s in one GROUP BY. Spark's native plan
    for n distinct aggregates is an Expand that replicates every input
    row n+1 times before a two-phase aggregate — measured 1.46 s at
    sf0.1 vs 0.76 s for the decomposed form used here: each distinct
    count becomes its own pair-level pre-aggregation (map-side partial
    agg shrinks the exchange to the DISTINCT pair count, not the row
    count ×3) and the three ~|suppkey|-row results join back on the
    group key. Same result, same oracle; at 100 TB the Expand form
    shuffles 3× the fact table while this shuffles each distinct pair
    set once.

    r13 (guide §2.4 shared exchange): one explicit
    repartition("l_suppkey") feeds all three branches —
    HashPartitioning(suppkey) satisfies the clustering of BOTH levels
    of every branch (suppkey ⊆ each grouping key) and of the two
    suppkey joins, so the pair dedups, the per-suppkey counts and the
    joins all run exchange-free and the fact ships exactly once
    (7 Exchanges → 5 statically, the 3 residual repartition subtrees
    are identical and reused at runtime; 0.76 → 0.49 s at sf0.1).
    The single-pass collect_set form was measured too (0.57 s) and
    rejected: per-group set state is unbounded in the distinct
    cardinality, the wrong trade at corpus scale."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_orderkey"
    ).repartition("l_suppkey")
    parts = (
        l.groupBy("l_suppkey", "l_partkey")
        .agg(F.lit(1))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_parts"))
    )
    orders = (
        l.groupBy("l_suppkey", "l_orderkey")
        .agg(F.lit(1))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_orders"))
    )
    items = l.groupBy("l_suppkey").agg(F.count("*").alias("n_items"))
    return (
        parts.join(orders, "l_suppkey")
        .join(items, "l_suppkey")
        .select("l_suppkey", "n_parts", "n_orders", "n_items")
    )


# --------------------------------------------------------------------------
# FULL OUTER join of two aggregates
# --------------------------------------------------------------------------


@register(
    "nation_customer_supplier_balance",
    oracle=f"""
WITH c AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n_cust,
         {dsum_sql('c_acctbal', 'cust_bal')}
  FROM customer GROUP BY c_nationkey
),
s AS (
  SELECT s_nationkey AS nk, COUNT(*) AS n_supp,
         {dsum_sql('s_acctbal', 'supp_bal')}
  FROM supplier GROUP BY s_nationkey
)
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(cust_bal, 0.0) AS cust_bal,
       COALESCE(n_supp, 0) AS n_supp,
       COALESCE(supp_bal, 0.0) AS supp_bal
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""",
    tags=("join", "outer"),
    expose=False,
)
def nation_customer_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated sides (aggregate before
    join: the join input is |nations|, not |customers|)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"), dsum(F.col("c_acctbal"), "cust_bal"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count("*").alias("n_supp"), dsum(F.col("s_acctbal"), "supp_bal"))
    )
    return c.join(s, c.nk == s.snk, "full_outer").select(
        F.coalesce("nk", "snk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
    )


# --------------------------------------------------------------------------
# String-function family
# --------------------------------------------------------------------------


@register(
    "part_name_string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       lower(p_type) AS type_lower,
       length(p_name) AS name_len,
       replace(p_name, ' ', '_') AS name_snake,
       substr(p_name, 1, 8) AS name_prefix,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       concat_ws('|', p_brand, p_type) AS brand_type,
       CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS is_green,
       split_part(p_name, ' ', 1) AS first_word
FROM part
""",
    tags=("scalar", "string"),
    expose=False,
)
def part_name_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string-function surface in one projection (all codegen'd
    built-ins; split_part/lpad/replace behave identically in DuckDB)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("is_green"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
    )


# --------------------------------------------------------------------------
# Date/time-function family
# --------------------------------------------------------------------------


@register(
    "order_date_parts",
    oracle=f"""
SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
       EXTRACT(MONTH FROM o_orderdate) AS mo,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice', 'revenue')},
       strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_day,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_day
FROM orders
WHERE EXTRACT(DOW FROM o_orderdate) NOT IN (0, 6)  -- weekdays only
GROUP BY EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate)
""",
    tags=("scalar", "date"),
    expose=False,
)
def order_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + weekday filter + monthly rollup.
    DOW normalization: DuckDB EXTRACT(DOW) is 0=Sunday..6=Saturday;
    Spark dayofweek() is 1=Sunday..7 — (dayofweek-1) aligns them."""
    o = load_table(spark, sf_dir, "orders")
    dow = F.dayofweek("o_orderdate") - 1
    return (
        o.filter(~dow.isin(0, 6))
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), "revenue"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_day"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_day"),
        )
    )


# --------------------------------------------------------------------------
# Array functions over embeddings (element-wise surface)
# --------------------------------------------------------------------------


@register(
    "embedding_quantize",
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_aggregate([abs(embedding[i+1]::DOUBLE) for i in range(64)],
                        'max') / 127.0 AS scale,
         [embedding[i+1]::DOUBLE for i in range(64)] AS v
  FROM embeddings
)
SELECT vec_id,
       ROUND(scale, 9) AS scale,
       CAST(len(list_filter(
           [round(v[i+1] / scale) for i in range(64)],
           x -> abs(x) >= 127)) AS BIGINT) AS n_saturated,
       ROUND(list_aggregate(
           [pow(v[i+1] - round(v[i+1] / scale) * scale, 2)
            for i in range(64)], 'sum') / 64.0, 12) AS recon_mse
FROM q
WHERE scale > 0
""",
    tags=("scalar", "array", "quantize"),
    expose=False,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    compression step before shipping vectors to an ANN index at
    100 TB (4 bytes→1 byte per dim). Per-vector absmax scale,
    round-to-nearest quantized values, saturation count, and
    reconstruction MSE, all as JVM higher-order functions over the
    array (zero shuffles, zero UDFs). Spark's ROUND and DuckDB's
    round() both round half away from zero on doubles, and the
    per-row double arithmetic is IEEE-identical, so the oracle is
    exact (outputs rounded to fixed scales to absorb formatting, not
    value, differences). Driver-checked inside scalar_funcs_suite
    (family quantize).

    spread: ~6 interpreted HOF passes × 64 elements is the heaviest
    per-row array kernel in the suite — a single-row-group scan runs
    it on one core (measured 2.1 s → 0.2 s at sf0.1)."""
    e = load_spread(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(dbl, lambda x: F.abs(x))) / 127.0
    q = F.transform(dbl, lambda x: F.round(x / scale))
    sat = F.size(F.filter(q, lambda x: F.abs(x) >= 127))
    err2 = F.zip_with(dbl, q, lambda x, qi: F.pow(x - qi * scale, 2))
    mse = F.aggregate(err2, F.lit(0.0), lambda a, x: a + x) / 64.0
    # Filter on the UNROUNDED scale (matching the oracle's WHERE, which
    # binds to the subquery column, not the ROUND alias): a near-zero
    # vector with scale in (0, 5e-10) rounds to 0.0 but must be kept.
    return e.filter(scale > 0).select(
        "vec_id",
        F.round(scale, 9).alias("scale"),
        sat.cast("bigint").alias("n_saturated"),
        F.round(mse, 12).alias("recon_mse"),
    )


@register(
    "embedding_array_stats",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       ROUND(list_aggregate([embedding[i+1]::DOUBLE for i in range(64)], 'sum'), 6)
         AS el_sum,
       ROUND(list_aggregate([abs(embedding[i+1]::DOUBLE) for i in range(64)], 'max'), 6)
         AS el_absmax
FROM embeddings
""",
    tags=("scalar", "array"),
    expose=False,
)
def embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: per-row fold (sum) and max over
    the embedding — the element-wise surface similarity search builds
    on, all JVM-side."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    el_sum = F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x)
    el_absmax = F.array_max(F.transform(dbl, lambda x: F.abs(x)))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(el_sum, 6).alias("el_sum"),
        F.round(el_absmax, 6).alias("el_absmax"),
    )
