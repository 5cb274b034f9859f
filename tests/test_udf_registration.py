"""UDF / UDAF / UDTF registration surface (SURVEY.md §2.5).

The reference has no user-function registration at all; this engine
inherits all three flavors from Spark. These tests pin that each
flavor works THROUGH the SQL surface (registered name callable from a
plain SQL string — the way a statements-façade user would reach them),
not just as DataFrame-API calls:

- scalar pandas UDF (Arrow-batched, the fast flavor),
- UDAF via applyInPandas-style grouped agg pandas UDF,
- Python UDTF (table function, Spark 3.5+),
- SQL lambda (higher-order function) needing no registration at all.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_scalar_pandas_udf_via_sql(spark):
    @F.pandas_udf("double")
    def rel_diff(a: pd.Series, b: pd.Series) -> pd.Series:
        return (a - b).abs() / a.abs().clip(lower=1e-12)

    spark.udf.register("rel_diff", rel_diff)
    rows = spark.sql(
        "SELECT rel_diff(10.0, 9.0) AS r, rel_diff(-2.0, -2.0) AS z"
    ).collect()
    assert abs(rows[0].r - 0.1) < 1e-12 and rows[0].z == 0.0


def test_grouped_agg_pandas_udaf_via_sql(spark):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.clip(lower=1e-300)).mean()))

    spark.udf.register("geo_mean", geo_mean)
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 3.0)], "k string, v double"
    )
    df.createOrReplaceTempView("gm_in")
    got = {
        r.k: r.g
        for r in spark.sql(
            "SELECT k, geo_mean(v) AS g FROM gm_in GROUP BY k"
        ).collect()
    }
    assert abs(got["a"] - 4.0) < 1e-9 and abs(got["b"] - 3.0) < 1e-9


def test_python_udtf_via_sql(spark):
    try:
        from pyspark.sql.functions import udtf
    except ImportError:
        pytest.skip("Python UDTF requires Spark 3.5+")

    @udtf(returnType="word: string, n: int")
    class Explode:
        def eval(self, text: str):
            for w in (text or "").split():
                yield (w, len(w))

    spark.udtf.register("split_words", Explode)
    rows = spark.sql("SELECT * FROM split_words('spark flink duck')").collect()
    assert [(r.word, r.n) for r in rows] == [
        ("spark", 5), ("flink", 5), ("duck", 4),
    ]


def test_sql_lambda_needs_no_registration(spark):
    rows = spark.sql(
        "SELECT aggregate(array(1.0D, 2.0D, 3.0D), 0.0D, (a, x) -> a + x) AS s"
    ).collect()
    assert rows[0].s == 6.0


def test_registered_udf_through_statements_facade(spark, sf_dir):
    """The full loop: register a function, then submit SQL using it
    through the statements façade and read typed results back — what
    a reference-dashboard user would do if Flink SQL had their UDF."""
    @F.pandas_udf("bigint")
    def char_bucket(n: pd.Series) -> pd.Series:
        return (n // 100).astype("int64")

    spark.udf.register("char_bucket", char_bucket)

    from streamlit_flink_demo_spark.sources.catalog import register_tables
    from streamlit_flink_demo_spark.statements import StatementsService

    register_tables(spark, sf_dir)
    svc = StatementsService(spark)
    env = svc.create(
        "SELECT char_bucket(n_chars) AS bucket, COUNT(*) AS n "
        "FROM documents GROUP BY char_bucket(n_chars)"
    )
    assert svc.wait_for_status(env, "completed", timeout=60) is not None
    rows = [r for r in svc.results(env["name"]) if r is not None]
    assert rows, "no result rows through the facade"
    buckets = {r["row"][0] for r in rows}
    assert buckets and all(isinstance(b, int) for b in buckets)
