"""Property-based pins for the gram-probe family: the Spark operators'
counting semantics equal a pure-Python brute force on arbitrary
hypothesis-generated corpora (the oracle parity tests pin them against
DuckDB on the real tables; this pins the SEMANTICS on adversarial
inputs — overlapping occurrences, repeated grams, short docs)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# small alphabet forces collisions/overlaps; lengths straddle the
# gram widths so the boundary cases (len == W-1, W, W+1) occur
_texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=8
)


def _brute_occurrences(texts: list[str], pat: str) -> tuple[int, int]:
    """(occurrences incl. overlaps, docs containing) of pat."""
    occ, docs = 0, 0
    for t in texts:
        n = sum(
            1
            for i in range(len(t) - len(pat) + 1)
            if t[i : i + len(pat)] == pat
        )
        occ += n
        docs += 1 if n else 0
    return occ, docs


@settings(max_examples=12, deadline=None)
@given(_texts, st.integers(2, 5))
def test_gram_probe_counts_equal_brute_force(spark, texts, w):
    """The corpus_gram_lookup plan shape (position gram -> broadcast
    probe -> two-level count agg) on arbitrary texts and width w: every
    w-gram that occurs anywhere gets exactly its brute-force
    (occurrences, doc-frequency)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pos = docs.filter(F.length("text") >= w).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.length("text") - w)).alias("p"),
        "text",
    ).select(
        "doc_id", F.col("text").substr(F.col("p") + 1, F.lit(w)).alias("gram")
    )
    per_doc = pos.groupBy("gram", "doc_id").agg(F.count("*").alias("c"))
    got = {
        r["gram"]: (r["n_occ"], r["n_docs"])
        for r in per_doc.groupBy("gram")
        .agg(
            F.sum("c").cast("bigint").alias("n_occ"),
            F.count("*").cast("bigint").alias("n_docs"),
        )
        .collect()
    }
    # every gram the engine reports must match brute force, and the
    # engine must report every gram that occurs
    want_keys = {
        t[i : i + w] for t in texts for i in range(len(t) - w + 1)
    }
    assert set(got) == want_keys
    for g, (occ, nd) in got.items():
        assert (occ, nd) == _brute_occurrences(texts, g)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.text(alphabet="xy z", min_size=0, max_size=60),
             min_size=1, max_size=6),
    st.lists(st.text(alphabet="xy z", min_size=0, max_size=60),
             min_size=1, max_size=4),
)
def test_contamination_batch_equals_brute_force(spark, train, evals):
    """contamination_flags_batch on arbitrary train/eval corpora: a doc
    is contaminated iff it shares a >=T-char exact span with some train
    doc, and the position count is exact (T=24 from the module)."""
    from streamlit_flink_demo_spark.streaming.contamination_ingest import (
        _T,
        contamination_flags_batch,
        corpus_train_grams,
    )

    train_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(evals)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_contaminated_positions"], r["contaminated"])
        for r in contamination_flags_batch(
            eval_df, corpus_train_grams(train_df)
        ).collect()
    }
    train_grams = {
        t[i : i + _T] for t in train for i in range(len(t) - _T + 1)
    }
    for i, t in enumerate(evals):
        hits = sum(
            1
            for k in range(len(t) - _T + 1)
            if t[k : k + _T] in train_grams
        )
        assert got[1000 + i] == (hits, hits > 0)
