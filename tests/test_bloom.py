"""Bloom-filter cross-snapshot dedup (operators/dedup.py round 9).

The fixture corpus has no cross-slice duplicates and a ~2%-full
filter, so its oracle row (tests/test_oracle_parity.py) proves replay
equality but never exercises the hit branches; these tests plant them:
an exact duplicate must bloom-hit with exact_dup=1 (no false negative
— a Bloom filter's defining guarantee), a saturated (shrunk) filter
must produce observable false_positive rows, and clean docs through
the production-sized filter stay clean.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamlit_flink_demo_spark.functions.hashing import u60
from streamlit_flink_demo_spark.operators.dedup import (
    _BLOOM_K,
    bloom_dedup_frame,
)


def _split_ids(spark, n=400):
    """doc_ids partitioned by the operator's own u60 split."""
    rows = spark.range(n).select(
        "id", (u60(F.col("id").cast("string")) % 100).alias("s")
    ).collect()
    corpus = [r.id for r in rows if r.s < 90]
    new = [r.id for r in rows if r.s >= 90]
    return corpus, new


def test_no_false_negatives_on_planted_duplicate(spark):
    corpus_ids, new_ids = _split_ids(spark)
    dup_text = "this exact document exists in both snapshots verbatim"
    rows = [(i, f"corpus doc {i} unique words") for i in corpus_ids]
    rows[0] = (corpus_ids[0], dup_text)
    rows += [(new_ids[0], dup_text)]  # replanted in the new slice
    rows += [(i, f"fresh doc {i} never seen") for i in new_ids[1:5]]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in bloom_dedup_frame(d).collect()}
    planted = out[new_ids[0]]
    assert planted.bloom_hit == 1  # Bloom never misses a member
    assert planted.exact_dup == 1
    assert planted.false_positive == 0
    for i in new_ids[1:5]:
        assert out[i].exact_dup == 0


def test_saturated_filter_shows_false_positives(spark):
    """Shrink the filter to 2 words (126 bits) under ~360 corpus keys:
    every bit is set, so every clean probe bloom-hits and is counted a
    false positive — the accounting column demonstrably works."""
    corpus_ids, new_ids = _split_ids(spark)
    rows = [(i, f"corpus doc {i} distinct content") for i in corpus_ids]
    rows += [(i, f"new doc {i} clean content") for i in new_ids[:10]]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = bloom_dedup_frame(d, n_words=2).collect()
    assert len(out) == 10
    for r in out:
        assert r.bloom_hit == 1  # saturated filter hits everything
        assert r.exact_dup == 0
        assert r.false_positive == 1


def test_production_filter_mostly_clean(spark):
    """At the production sizing the planted-clean probes pass: with
    ~360 keys x {k} bits in 64512, the fill is ~2% and the FP chance
    per probe is ~(0.02)^{k} — effectively zero at this scale."""
    corpus_ids, new_ids = _split_ids(spark)
    rows = [(i, f"corpus doc {i} distinct content") for i in corpus_ids]
    rows += [(i, f"new doc {i} clean content") for i in new_ids[:10]]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = bloom_dedup_frame(d).collect()
    assert sum(r.false_positive for r in out) == 0
    assert all(r.exact_dup == 0 for r in out)
    assert _BLOOM_K >= 2
