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

from streamlit_flink_demo_spark.functions.numeric import DEC, dsum_sql
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
    rows. Returns columns (key, total, n)."""
    salted = df.select(
        F.col(key),
        value_expr.cast(DEC).alias("_v"),
        (F.spark_partition_id() % n_salts).alias("_salt"),
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
)
def skew_salted_event_type_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over event_type (5 hot keys — the
    worst case for a naive groupBy at scale: 5 reducers do all the
    work). The oracle is the DIRECT group-by: the salted plan must be
    value-identical, proving the rewrite is semantics-preserving."""
    e = load_table(spark, sf_dir, "events")
    return salted_agg(e, "event_type", F.col("value")).select(
        "event_type", "total", "n"
    )
