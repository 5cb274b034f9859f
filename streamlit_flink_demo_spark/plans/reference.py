"""The reference dashboard's three queries, re-expressed on the testdata.

The reference (``/root/reference/dashboard.py``) runs exactly three
continuous Flink SQL statements over the Kafka-backed ``user`` table:

1. eye-color grouped count           (``dashboard.py:83``)
2. map locations with RAND() jitter  (``dashboard.py:100``)
3. CTE + CASE age buckets + AVG over ``CAST(substring(balance FROM 2)
   AS DOUBLE)``                      (``dashboard.py:118-132``)

The driver's testdata has no ``user`` table, so the batch-correctness
versions here run the *same operator shapes* against ``events`` /
``customer`` (the streaming versions over a generated ``user`` stream
live in tests/test_streaming_retract.py).  The RAND() query gets two
registrations: a deterministic md5-uniform variant with a DuckDB
oracle, and the true RAND() variant (rows-only check, range-asserted
in tests — nondeterminism per SURVEY.md §2.2 P4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.functions.numeric import davg_sql, davg
from streamlit_flink_demo_spark.plans import register
from streamlit_flink_demo_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# 1. Grouped count — SELECT eyeColor, count(*) FROM user GROUP BY eyeColor
#    (dashboard.py:83), event_type standing in for eyeColor.
# --------------------------------------------------------------------------


@register(
    "ref_groupby_count",
    oracle="""
SELECT event_type, COUNT(*) AS type_count
FROM events
GROUP BY event_type
""",
    tags=("reference", "agg"),
)
def ref_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference query 1 (dashboard.py:83) shape: low-cardinality
    grouped count. Map-side partial aggregation collapses each input
    partition to ≤|groups| rows before the single shuffle."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("type_count"))
    )


# --------------------------------------------------------------------------
# 2. Map locations — projection + arithmetic + uniform jitter
#    (dashboard.py:100).  Deterministic variant: uniform-in-[0,1) derived
#    from md5 (available in both Spark and DuckDB) instead of RAND().
# --------------------------------------------------------------------------

_TWO60 = float(1 << 60)

# NB: every literal is cast to DOUBLE — DuckDB parses bare numeric
# literals as DECIMAL, and `37.77 - 37.7` in decimal (exactly 0.07)
# differs from the double subtraction Spark performs by 1 ulp.
_LOC_ORACLE = f"""
SELECT
  event_id,
  37.7::DOUBLE + (('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':lat'), 1, 15))::UBIGINT
          / {_TWO60!r}) * (37.77::DOUBLE - 37.7::DOUBLE) AS latitude,
  -122.50::DOUBLE + (('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':lon'), 1, 15))::UBIGINT
          / {_TWO60!r}) * (-122.39::DOUBLE - (-122.50::DOUBLE)) AS longitude
FROM events
"""


def _md5_uniform(col, salt: str):
    """Deterministic uniform double in [0,1): top 60 bits of
    md5(value||salt) / 2^60.  Identical in Spark and DuckDB — md5 is
    the one hash both engines share bit-for-bit."""
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") / F.lit(_TWO60)


@register("ref_map_locations", oracle=_LOC_ORACLE, tags=("reference", "project"))
def ref_map_locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference query 2 (dashboard.py:100) shape: stateless projection
    with arithmetic incl. unary minus/parens (SURVEY §2.2 P1-P4).
    Narrow transform — no shuffle, scales embarrassingly."""
    e = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    return e.select(
        "event_id",
        (F.lit(37.7) + _md5_uniform(eid, ":lat") * (F.lit(37.77) - F.lit(37.7))).alias(
            "latitude"
        ),
        (
            F.lit(-122.50)
            + _md5_uniform(eid, ":lon") * (F.lit(-122.39) - F.lit(-122.50))
        ).alias("longitude"),
    )


@register(
    "ref_map_locations_rand",
    oracle=None,
    tags=("reference", "nondeterministic"),
    # Not on the ≤50-name driver surface: nondeterministic by design,
    # so the driver could only ever record a rows-only row for it; the
    # deterministic md5 twin (ref_map_locations) carries the oracle
    # check and tests/test_oracle_parity.py pins this one's ranges.
    # The freed slot goes to dedup_connected_clusters (hash-checked).
    expose=False,
)
def ref_map_locations_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The literal reference query (dashboard.py:100): true RAND().
    No oracle possible (fresh per row); tests assert the ranges
    latitude ∈ [37.7, 37.77], longitude ∈ [-122.50, -122.39]."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        (F.lit(37.7) + F.rand() * (F.lit(37.77) - F.lit(37.7))).alias("latitude"),
        (
            F.lit(-122.50) + F.rand() * (F.lit(-122.39) - F.lit(-122.50))
        ).alias("longitude"),
    )


# --------------------------------------------------------------------------
# 3. Age-group averages — CTE + searched CASE + BETWEEN +
#    CAST(substring(x FROM 2) AS DOUBLE) (dashboard.py:118-132).
#    c_acctbal stands in for age; the balance string is reconstructed
#    with '$'+thousands-commas so the comma-cast-null path is exercised
#    exactly like the JR data (SURVEY §2.2 P5: ANSI off → NULL).
# --------------------------------------------------------------------------

# Reconstruct the JR-style '$1,234.56' balance string with manual
# comma insertion (valid for |bal| < 1e6 — acctbal tops out ~10k):
# identical string logic in both engines, no locale formatting.
# (str_type differs: Spark spells it STRING, DuckDB VARCHAR.)


def _bal_str(str_type: str) -> str:
    num = f"CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS {str_type})"
    return f"""(
  '$' || CASE WHEN abs(c_acctbal) >= 1000
    THEN substr({num}, 1, length({num}) - 6) || ','
         || substr({num}, length({num}) - 5, 6)
    ELSE {num} END
)"""


_BAL_STR = _bal_str("VARCHAR")

_AGE_ORACLE = f"""
WITH customers_with_groups AS (
  SELECT
    CASE
      WHEN c_acctbal BETWEEN 0 AND 2499.99 THEN '0-2499'
      WHEN c_acctbal BETWEEN 2500 AND 4999.99 THEN '2500-4999'
      WHEN c_acctbal BETWEEN 5000 AND 7499.99 THEN '5000-7499'
      WHEN c_acctbal BETWEEN 7500 AND 9999.99 THEN '7500-9999'
      ELSE 'other'
    END AS balance_group,
    TRY_CAST(substring({_BAL_STR} FROM 2) AS DOUBLE)
      AS balance_double
  FROM customer
)
SELECT
  balance_group,
  {davg_sql('balance_double', 'avg_balance')},
  COUNT(*) AS n_customers,
  COUNT(balance_double) AS n_parsed
FROM customers_with_groups
GROUP BY balance_group
"""


@register("ref_case_groups_avg", oracle=_AGE_ORACLE, tags=("reference", "agg"))
def ref_case_groups_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference query 3 (dashboard.py:118-132) shape: CTE + searched
    CASE/BETWEEN bucketing + substring-FROM + CAST-to-DOUBLE with
    Flink's null-on-failure semantics (values ≥ 1000 get a thousands
    comma and fail the cast → NULL → excluded from AVG, exactly like
    the reference's '$1,234.56' balances).  Requires
    spark.sql.ansi.enabled=false (session.py)."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    group = (
        F.when(bal.between(0, 2499.99), "0-2499")
        .when(bal.between(2500, 4999.99), "2500-4999")
        .when(bal.between(5000, 7499.99), "5000-7499")
        .when(bal.between(7500, 9999.99), "7500-9999")
        .otherwise("other")
    )
    # '$1,234.56' reconstruction (same manual comma logic as the
    # oracle); substring(x FROM 2) strips the '$', the comma survives
    # and the non-ANSI cast yields NULL (P5/P6) — exactly the
    # reference's JR-balance behavior.
    balance_double = F.expr(
        f"CAST(substring({_bal_str('STRING')} FROM 2) AS DOUBLE)"
    )
    cte = c.select(
        group.alias("balance_group"), balance_double.alias("balance_double")
    )
    return cte.groupBy("balance_group").agg(
        davg(F.col("balance_double"), "avg_balance"),
        F.count("*").alias("n_customers"),
        F.count("balance_double").alias("n_parsed"),
    )
