"""Distributed logistic regression (operators/pipeline.py).

Oracle parity (bit-exact training replay in DuckDB) is covered by
tests/test_oracle_parity.py; these pin the two claims parity alone
does not: the classifier actually LEARNS the gate it distills, and
training is bit-reproducible under a different partitioning.
"""

from __future__ import annotations

from streamlit_flink_demo_spark.plans import REGISTRY, load_all

load_all(exposed_only=False)  # populate REGISTRY


def _run(spark, sf_dir):
    return sorted(
        tuple(r)
        for r in REGISTRY["docs_logreg_classifier"]
        .fn.__wrapped__(spark, sf_dir)
        .collect()
    )


def test_logreg_learns_the_quality_gate(spark, sf_dir):
    """Distilling the rule gate must beat the all-positive baseline:
    strictly better overall accuracy AND nonzero recall on the
    negative class (the all-positive classifier scores 0 there)."""
    rows = _run(spark, sf_dir)
    # (doc_id, split, label, score_q, pred)
    n = len(rows)
    base = sum(1 for r in rows if r[2] == 1) / n  # predict-all-1 accuracy
    acc = sum(1 for r in rows if r[4] == r[2]) / n
    negs = [r for r in rows if r[2] == 0]
    neg_recall = sum(1 for r in negs if r[4] == 0) / max(len(negs), 1)
    assert negs, "corpus has no gate-failing docs; label is degenerate"
    assert acc > base, (acc, base)
    assert neg_recall >= 0.5, neg_recall
    # scores must actually spread (not a constant-output collapse)
    scores = {r[3] for r in rows}
    assert len(scores) > n // 10


def test_logreg_training_is_partitioning_invariant(spark, sf_dir):
    """The fixed-point gradient quantization makes every GD step an
    exact integer sum, so a different shuffle partitioning (different
    partial-sum order) must produce IDENTICAL weights and scores."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        a = _run(spark, sf_dir)
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = _run(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b
