"""salted_join correctness — including the shared-key-name case the
generic helper must survive (ADVICE: unqualified F.col conditions are
ambiguous/self-referential when fact_key == dim_key)."""

from __future__ import annotations

from streamlit_flink_demo_spark.operators.skew import salted_join


def test_salted_join_same_key_name(spark):
    fact = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0), (3, 1.0)], ["k", "v"]
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "name"])
    got = salted_join(fact, dim, "k", "k", n_salts=4)
    assert got.columns == ["k", "v", "name"]  # one k, no _salt
    rows = sorted(tuple(r) for r in got.collect())
    assert rows == [(1, 10.0, "a"), (1, 20.0, "a"), (2, 5.0, "b")]


def test_salted_join_distinct_key_names(spark):
    fact = spark.createDataFrame([(1, 10.0), (2, 5.0)], ["fk", "v"])
    dim = spark.createDataFrame([(1, "a"), (2, "b"), (9, "z")], ["dk", "name"])
    got = salted_join(fact, dim, "fk", "dk", n_salts=4)
    rows = sorted(tuple(r) for r in got.collect())
    assert rows == [(1, 10.0, 1, "a"), (2, 5.0, 2, "b")]
