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


def test_containment_asymmetric_catch(spark, sf_dir):
    """dedup_containment invariants: containment >= jaccard on every
    pair and bounded by 1; intersection bounded by the smaller set;
    and the operator actually catches asymmetric pairs Jaccard-style
    thresholds miss (rows with high containment but sub-threshold
    jaccard exist in the corpus)."""
    from streamlit_flink_demo_spark.plans import load_all

    REG = load_all(exposed_only=False)
    rows = REG["dedup_containment"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["n_common"] <= min(r["n_a"], r["n_b"])
        assert 0.5 <= r["containment"] <= 1.0 + 1e-12
        assert r["containment"] >= r["jaccard_sim"]
        want = r["n_common"] / min(r["n_a"], r["n_b"])
        assert abs(r["containment"] - want) < 1e-12
    # the synthetic corpus's duplicated docs are similar-length (no
    # true subset pairs), so full asymmetry (containment 1, jaccard
    # < 0.5) can't occur here — but the score separation that defines
    # the operator must still be visible
    assert any(
        r["containment"] > r["jaccard_sim"] + 0.05 for r in rows
    )
