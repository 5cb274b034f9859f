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


# --------------------------------------------------------------------------
# docs_host_rank: weighted host-graph PageRank (crawl prioritization)
# --------------------------------------------------------------------------


def _reference_host_pr(doc_ids, iters: int):
    """Pure-Python weighted PageRank over the synthesized host graph —
    no shared code with the DataFrame loop OR the canonicalizer: the
    edge rules are re-derived from the synthesis spec (ring / mult /
    relative hub / every-13th mirror, self-loops dropped)."""
    from collections import Counter

    edges: Counter = Counter()
    for d in doc_ids:
        src = f"site{d % 61}.example.org"
        for dst in (
            f"site{(d + 1) % 61}.example.org",
            f"site{(d * 7) % 61}.example.org",
            "example.com",
        ):
            if dst != src:
                edges[(src, dst)] += 1
        if d % 13 == 0:
            edges[(src, "mirror.example.com")] += 1
    hosts = sorted({h for e in edges for h in e})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    outw = Counter()
    for (s, _), w in edges.items():
        outw[s] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dang = 0.0
        for h in hosts:
            if outw[h] == 0:
                dang += r[idx[h]]
        for (s, t), w in edges.items():
            nxt[idx[t]] += r[idx[s]] * w / outw[s]
        r = 0.15 / n + 0.85 * (nxt + dang / n)
    return {h: r[idx[h]] for h in hosts}, edges, outw


def test_host_rank_matches_weighted_power_iteration(
    spark, sf_dir, registry
):
    from streamlit_flink_demo_spark.operators.extract import _HR_ITERS

    got = registry["docs_host_rank"].fn(spark, sf_dir).toPandas()
    doc_ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    want, edges, outw = _reference_host_pr(doc_ids, _HR_ITERS)
    assert set(got.host) == set(want)
    err = max(
        abs(row.pr_q / _S - want[row.host]) for row in got.itertuples()
    )
    assert err < 1e-9, err
    # out weights match the independent edge derivation (self-loops
    # dropped: doc_id % 61 == 0 docs' multiplier link is a self-loop)
    byhost = {row.host: row for row in got.itertuples()}
    for h, row in byhost.items():
        assert row.out_w == outw[h], h
    inw = {}
    for (s, t), w in edges.items():
        inw[t] = inw.get(t, 0) + w
    for h, row in byhost.items():
        assert row.in_w == inw.get(h, 0), h


def test_host_rank_invariants(spark, sf_dir, registry):
    got = registry["docs_host_rank"].fn(spark, sf_dir).toPandas()
    # probability mass conserved up to per-vertex quantization
    assert abs(got.pr_q.sum() / _S - 1.0) < 1e-6
    hub = got[got.host == "example.com"]
    assert len(hub) == 1
    # the hub is target-only (dangling) and every doc links it once,
    # so it carries the max in-weight AND the max rank
    assert hub.out_w.iloc[0] == 0
    assert hub.in_w.iloc[0] == got.in_w.max()
    assert hub.pr_q.iloc[0] == got.pr_q.max()
    mirror = got[got.host == "mirror.example.com"]
    assert len(mirror) == 1 and mirror.out_w.iloc[0] == 0
    sites = got[got.host.str.startswith("site")]
    assert (sites.out_w > 0).all()
