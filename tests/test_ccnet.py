"""Properties of the CCNet perplexity-bucket gate
(operators/pipeline.docs_ccnet_buckets) that must hold on ANY corpus —
the oracle row only proves engine agreement on this one."""

from __future__ import annotations

from streamlit_flink_demo_spark.operators.pipeline import (
    _CCNET_K,
    docs_ccnet_buckets,
)


def test_ccnet_bucket_structure(spark, sf_dir):
    rows = {r["bucket"]: r for r in docs_ccnet_buckets(spark, sf_dir).collect()}
    assert set(rows) == {"head", "middle", "tail"}
    sizes = [rows[b]["n_docs"] for b in ("head", "middle", "tail")]
    # exact NTILE quotas: sizes differ by at most 1, larger first
    assert max(sizes) - min(sizes) <= 1
    assert sorted(sizes, reverse=True) == sizes
    # terciles are ordered by NLL: head's max <= middle's min, etc.
    assert rows["head"]["max_nll"] <= rows["middle"]["min_nll"]
    assert rows["middle"]["max_nll"] <= rows["tail"]["min_nll"]
    # keep policy: head keeps everything; middle/tail keep strict subsets
    assert rows["head"]["n_kept"] == rows["head"]["n_docs"]
    assert 0 < rows["middle"]["n_kept"] < rows["middle"]["n_docs"]
    assert rows["tail"]["n_kept"] < rows["middle"]["n_kept"]
    assert _CCNET_K == 3
