"""docs_pagerank semantic verification — an independent numpy power
iteration over the same pair graph (dense matrix formulation, no
shared code with the DataFrame loop), plus the invariants PageRank
must satisfy: probability-mass conservation and the uniform floor for
dangling vertices."""

from __future__ import annotations

import numpy as np
import pytest

from streamlit_flink_demo_spark.plans import load_all

_S = float(1 << 40)


@pytest.fixture(scope="module")
def registry():
    return load_all(exposed_only=False)


def _reference_pr(pairs, doc_ids, iters: int) -> dict[int, float]:
    idx = {d: i for i, d in enumerate(doc_ids)}
    n = len(doc_ids)
    nbrs: dict[int, list[int]] = {i: [] for i in range(n)}
    for a, b in pairs:
        nbrs[idx[a]].append(idx[b])
        nbrs[idx[b]].append(idx[a])
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dang = 0.0
        for i in range(n):
            if nbrs[i]:
                share = r[i] / len(nbrs[i])
                for j in nbrs[i]:
                    nxt[j] += share
            else:
                dang += r[i]
        r = 0.15 / n + 0.85 * (nxt + dang / n)
    return {d: r[idx[d]] for d in doc_ids}


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir, registry):
    from streamlit_flink_demo_spark.operators.dedup import _PR_ITERS

    got = registry["docs_pagerank"].fn(spark, sf_dir).toPandas()
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in registry["dedup_minhash_lsh"]
        .fn(spark, sf_dir)
        .select("doc_a", "doc_b")
        .collect()
    ]
    want = _reference_pr(pairs, list(got.doc_id), _PR_ITERS)
    err = max(
        abs(row.pr_q / _S - want[row.doc_id]) for row in got.itertuples()
    )
    # the operator quantizes to 2^-40 between iterations; three rounds
    # of quantization + the float reference leave ~1e-10 slack
    assert err < 1e-9, err


def test_pagerank_invariants(spark, sf_dir, registry):
    got = registry["docs_pagerank"].fn(spark, sf_dir).toPandas()
    # probability mass conserved (up to per-vertex rounding)
    assert abs(got.pr_q.sum() / _S - 1.0) < 1e-6
    # dangling vertices all share one uniform score; linked vertices
    # exist and the graph pulled rank onto at least one of them
    dang = got[got.deg == 0].pr_q
    assert dang.nunique() == 1
    linked = got[got.deg > 0]
    assert len(linked) > 0
    assert linked.pr_q.max() > dang.iloc[0]
