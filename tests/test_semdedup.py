"""docs_semdedup semantic verification — an INDEPENDENT pandas/numpy
reimplementation of the cluster-then-prune pipeline (assignment via
plain numpy argmax, ranking via pandas sort, the W-window prune via an
explicit per-pair double loop restricted to the rank window), compared
against the distributed operator's summary. The oracle-parity harness
already pins Spark == DuckDB; this pins both against a third
formulation that shares no code with the applyInPandas kernel."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from streamlit_flink_demo_spark.plans import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all(exposed_only=False)


def _reference_summary(sf_dir: str, cents: np.ndarray, w: int, tau: float):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    E = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    cl = np.argmax(En @ Cn.T, axis=1)
    rows = []
    for c in sorted(set(cl.tolist())):
        m = cl == c
        e, i = E[m], ids[m]
        cc = (e @ cents[c]) / (
            np.linalg.norm(e, axis=1) * np.linalg.norm(cents[c])
        )
        order = np.lexsort((i, -cc))
        e, i = e[order], i[order]
        n = len(i)
        dropped = np.zeros(n, dtype=bool)
        for a in range(n):
            for b in range(a + 1, min(a + w, n - 1) + 1):
                cs = float(e[a] @ e[b]) / (
                    np.linalg.norm(e[a]) * np.linalg.norm(e[b])
                )
                if cs >= tau:
                    dropped[b] = True
        ds = int(i[dropped].sum())
        rows.append(
            dict(
                cluster=c,
                n_members=n,
                n_dropped=int(dropped.sum()),
                dropped_checksum=ds,
                kept_checksum=int(i.sum()) - ds,
            )
        )
    return pd.DataFrame(rows)


def test_semdedup_matches_independent_reimplementation(
    spark, sf_dir, registry
):
    from streamlit_flink_demo_spark.operators.similarity import (
        _SEM_TAU,
        _SEM_W,
        _kmeans_centroids_np,
    )
    from streamlit_flink_demo_spark.sources.catalog import load_table

    cents = _kmeans_centroids_np(load_table(spark, sf_dir, "embeddings"))
    got = (
        registry["docs_semdedup"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    want = _reference_summary(sf_dir, cents, _SEM_W, _SEM_TAU).sort_values(
        "cluster"
    ).reset_index(drop=True)
    # float-tolerant comparison is deliberately NOT used: every output
    # column is integral, and the reimplementation must agree exactly
    # (the threshold compare is the only float decision; numpy's
    # pairwise-summed dot may disagree with the fold only on an exact
    # tie at tau — absent from the fixture corpus).
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_semdedup_keeps_most_central(spark, sf_dir, registry):
    """Invariants: checksums partition the id sum; a cluster never
    drops its rank-1 member (the exemplar closest to the centroid is
    never the HIGHER-ranked side of any pair)."""
    df = registry["docs_semdedup"].fn(spark, sf_dir).toPandas()
    assert (df.n_members >= 1).all()
    assert (df.n_dropped < df.n_members).all()  # rank 1 always survives
    assert (df.n_dropped >= 0).all()
    assert df.n_dropped.sum() > 0  # the prune is actually exercised


def test_kmeans_artifact_roundtrip_bit_exact(spark, sf_dir):
    """The build-once kmeans artifact (r9) must return centroids
    bit-identical to a fresh training run — JSON floats round-trip
    exactly, and the oracle replay depends on it."""
    from streamlit_flink_demo_spark.operators.similarity import (
        _kmeans_centroids_cached,
        _kmeans_centroids_np,
        build_kmeans_model,
    )
    from streamlit_flink_demo_spark.sources.catalog import load_table

    build_kmeans_model(spark, sf_dir, force=True)
    cached = _kmeans_centroids_cached(spark, sf_dir)
    fresh = _kmeans_centroids_np(load_table(spark, sf_dir, "embeddings"))
    assert cached.shape == fresh.shape
    assert (cached == fresh).all(), "artifact centroids diverge from fresh training"


def test_kmeans_artifact_fresh_no_retrain(spark, sf_dir, tmp_path, monkeypatch):
    """A fresh artifact short-circuits training entirely (the probe
    path runs zero distributed training jobs)."""
    from streamlit_flink_demo_spark.operators import similarity as sim

    sim.build_kmeans_model(spark, sf_dir)  # ensure fresh

    def boom(*a, **k):
        raise AssertionError("training ran despite fresh artifact")

    monkeypatch.setattr(sim, "_kmeans_centroids_np", boom)
    cents = sim._kmeans_centroids_cached(spark, sf_dir)
    assert cents.shape[0] == sim._KM_K
