"""Skew-resilient aggregation — the salting pattern, made concrete.

At 100 TB a handful of hot keys (one mega-customer, one dominant
event type) can pin a whole groupBy on a single reducer. Two escapes:

1. AQE skew handling (``spark.sql.adaptive.skewJoin.enabled``, on in
   session.py) — splits oversized partitions at runtime for JOINS.
2. Two-phase salted aggregation for AGGREGATES — this module: spread
   each key over S salt buckets, aggregate partially per (key, salt),
   then combine per key. The second shuffle carries ≤ |keys|·S rows,
   so the hot key's work is spread across S reducers.

The decimal-sum pattern survives both phases exactly (decimal partials
re-sum exactly), so the salted plan is bit-identical to the direct
groupBy — which is exactly what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.functions.numeric import DEC, dsum, dsum_sql
from streamlit_flink_demo_spark.plans import register
from streamlit_flink_demo_spark.sources.catalog import load_table

_SALTS = 16


def salted_agg(
    df: DataFrame,
    key: str,
    value_expr,
    n_salts: int = _SALTS,
) -> DataFrame:
    """SUM(value_expr) + COUNT(*) per key, via (key, salt) partials.

    Phase 1 shuffles on (key, salt) — the hot key spreads over
    n_salts reducers; phase 2 shuffles ≤ |keys|·n_salts tiny partial
    rows. Returns columns (key, total, n).

    The salt is PER-ROW (hash of monotonically_increasing_id), not
    per-partition: a spark_partition_id salt collapses to one value
    per input split, so a hot key physically clustered in few splits
    (sorted/compacted parquet — exactly the layouts that skew) would
    still land on that few reducers. The salt value never reaches the
    result (phase 2 folds it away), so the nondeterministic id is
    safe."""
    salted = df.select(
        F.col(key),
        value_expr.cast(DEC).alias("_v"),
        F.pmod(
            F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)
        ).alias("_salt"),
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.sum("_v").alias("_pv"), F.count("*").alias("_pn")
    )
    return partial.groupBy(key).agg(
        F.sum("_pv").cast("double").alias("total"),
        F.sum("_pn").alias("n"),
    )


@register(
    "skew_salted_event_type_agg",
    oracle=f"""
SELECT event_type,
       {dsum_sql('value', 'total')},
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
    tags=("skew", "agg"),
    expose=False,
)
def skew_salted_event_type_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over event_type (5 hot keys). For
    ALGEBRAIC aggregates like this SUM/COUNT, Spark's map-side partial
    aggregation already bounds each reducer's input to one partial row
    per task, so the salt mostly demonstrates the pattern; the salt
    earns its keep on aggregates withOUT partial pushdown — exact
    COUNT(DISTINCT x) per hot key, collect_list/set, percentile_approx
    with large state — where the un-salted plan really does ship every
    hot-key row to one reducer. The oracle is the DIRECT group-by: the
    salted plan must be value-identical, proving the rewrite is
    semantics-preserving."""
    e = load_table(spark, sf_dir, "events")
    return salted_agg(e, "event_type", F.col("value")).select(
        "event_type", "total", "n"
    )


# --------------------------------------------------------------------------
# Salted join — replicate the small side over salt buckets
# --------------------------------------------------------------------------


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = _SALTS,
) -> DataFrame:
    """Skew-proof equi-join: every fact row gets a per-row salt (hash
    of monotonically_increasing_id — a spark_partition_id salt would
    collapse to one value per input split and leave a physically
    clustered hot key on 1-2 reducers), the dim side is exploded
    n_salts× with every salt value, and the join key becomes
    (key, salt) — a hot fact key now spreads over n_salts reducers.
    The dim replication is n_salts×|dim| rows, which is the
    deliberate trade: use it when AQE's skew split can't help (e.g.
    the skew is in the JOIN key itself and the dim is modest). Result
    is row-identical to the plain join for ANY salt assignment, which
    is why the nondeterministic id is safe (oracle-checked)."""
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)
        ).cast("int"),
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    # key columns qualified via the parent frames (like the _salt
    # columns): an unqualified F.col(fact_key) == F.col(dim_key) is
    # ambiguous — or trivially self-referential — whenever both sides
    # share the key column name, a common case for a generic helper.
    joined = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["_salt"] == salted_dim["_salt"]),
    ).drop(salted_fact["_salt"]).drop(salted_dim["_salt"])
    if fact_key == dim_key:
        # equi-join on a shared name: keep one copy so downstream
        # selects by name aren't ambiguous
        joined = joined.drop(salted_dim[dim_key])
    return joined


@register(
    "skew_salted_join_revenue",
    oracle=f"""
SELECT n_name,
       {dsum_sql('o_totalprice', 'revenue')},
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    tags=("skew", "join"),
    expose=False,
)
def skew_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join (orders⋈customer on custkey, salted over
    16 buckets) feeding a per-nation rollup. The oracle is the PLAIN
    join — the salted plan must be row-identical, proving the rewrite
    only changes physical distribution. At 100 TB this is the escape
    hatch when one customer owns 10% of all orders and the dim is too
    large to broadcast but small enough to replicate 16×."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    joined = salted_join(o, c, "o_custkey", "c_custkey")
    return (
        joined.join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("o_totalprice"), "revenue"), F.count("*").alias("n_orders"))
    )
