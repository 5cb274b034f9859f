"""Incremental ANN index maintenance (operators/incremental.py).

Oracle parity for the registered queries lives in
tests/test_oracle_parity.py (ann_lsh_incremental_topk /
ann_ivf_incremental_topk — the append ≡ rebuild proof); these tests
pin the DELTA MECHANICS the oracle can't see: idempotent replay,
crash-debris invisibility, force-rebuild compaction, and frozen-
quantizer probe parity against an inline fresh build.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.operators import incremental as inc
from streamlit_flink_demo_spark.operators.similarity import (
    _IVF_CLUSTERS,
    _IVF_NPROBE,
    _N_QUERIES,
    _TOPK,
    _cents_df,
    _ivf_assign_arrow,
    _ivf_centroids_np,
    _ivf_probe,
)
from streamlit_flink_demo_spark.sources.catalog import load_table


@pytest.fixture()
def artifact_root(tmp_path, monkeypatch):
    root = str(tmp_path / "artifacts")
    import streamlit_flink_demo_spark.operators.similarity as sim

    # _index_dir reads the module global at call time, so patching it
    # redirects every build/append in this test to the tmp root
    monkeypatch.setattr(sim, "_ARTIFACT_ROOT", root)
    return root


def _live_meta(path: str) -> dict:
    with open(os.path.join(os.path.realpath(path), "meta.json")) as fh:
        return json.load(fh)


def test_append_is_idempotent_by_key(spark, sf_dir, artifact_root):
    path = inc.append_ivf_index(spark, sf_dir)
    m1 = _live_meta(path)
    assert len(m1["deltas"]) == 1
    # replay: same fingerprint => same key => nothing new committed
    inc.append_ivf_index(spark, sf_dir)
    m2 = _live_meta(path)
    assert m2["deltas"] == m1["deltas"]


def test_crash_debris_is_invisible(spark, sf_dir, artifact_root):
    path = inc.append_lsh_index(spark, sf_dir)
    live = os.path.realpath(path)
    n_before = inc.read_index_data(spark, path).count()
    # simulate an append that died after writing files but before the
    # meta commit: a dot-tmp staging dir full of parquet
    debris = os.path.join(live, ".tmp-delta-99-dead")
    os.makedirs(debris)
    inc.read_index_data(spark, path).limit(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(debris, "band=0"))
    assert inc.read_index_data(spark, path).count() == n_before


def test_force_rebuild_drops_deltas(spark, sf_dir, artifact_root):
    path = inc.append_ivf_index(spark, sf_dir)
    assert len(_live_meta(path)["deltas"]) == 1
    inc.build_ivf_base_index(spark, sf_dir, force=True)
    assert _live_meta(path).get("deltas", []) == []


def test_ivf_append_probe_parity_with_fresh_build(spark, sf_dir, artifact_root):
    """base-build + append probed == inline fresh assign of the FULL
    corpus under the same frozen quantizer — the invariant, checked
    end-to-end in Spark (the SQL oracle proves the same equivalence
    against DuckDB)."""
    path = inc.append_ivf_index(spark, sf_dir)
    meta = _live_meta(path)
    cents_np = np.array(meta["centroids"], dtype=np.float64)

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cents = _cents_df(spark, cents_np)

    via_artifact = _ivf_probe(
        q, cents, inc.read_index_data(spark, path), _IVF_NPROBE, _TOPK
    )
    fresh_inv = _ivf_assign_arrow(e, cents_np, with_embedding=True)
    via_fresh = _ivf_probe(q, cents, fresh_inv, _IVF_NPROBE, _TOPK)

    got = sorted(map(tuple, via_artifact.collect()))
    want = sorted(map(tuple, via_fresh.collect()))
    assert got == want and len(got) > 0


def test_base_quantizer_trained_on_base_slice_only(spark, sf_dir, artifact_root):
    """The recorded centroids must equal training on the 90% slice —
    never on the appended rows (retraining is the bug the frozen
    contract exists to prevent)."""
    path = inc.build_ivf_base_index(spark, sf_dir)
    meta = _live_meta(path)
    base = load_table(spark, sf_dir, "embeddings").filter(
        inc._split_col() < inc._NEW_PCT
    )
    want = _ivf_centroids_np(base, _IVF_CLUSTERS)
    got = np.array(meta["centroids"], dtype=np.float64)
    assert got.shape == want.shape
    assert np.array_equal(got, want)  # exact: JSON float64 round-trip


def test_compaction_folds_deltas_probe_identical(spark, sf_dir, artifact_root):
    """compact_index folds base + deltas into a fresh version: delta
    list empties, the frozen quantizer carries over verbatim, probe
    results are bit-identical, and a second compaction is a no-op."""
    path = inc.append_ivf_index(spark, sf_dir)
    before_meta = _live_meta(path)
    assert len(before_meta["deltas"]) == 1
    before = sorted(map(tuple, inc.read_index_data(spark, path).collect()))

    assert inc.compact_index(spark, path, ("cluster",)) is True
    after_meta = _live_meta(path)
    assert after_meta.get("deltas", []) == []
    assert after_meta["centroids"] == before_meta["centroids"]
    after = sorted(map(tuple, inc.read_index_data(spark, path).collect()))
    assert after == before

    assert inc.compact_index(spark, path, ("cluster",)) is False  # no-op


def test_pq_append_codes_match_fresh_encode(spark, sf_dir, artifact_root):
    """base-build + append codes == one fresh encode of the FULL
    corpus under the frozen base codebooks — byte-identical code
    arrays per vec_id (PQ shares the LSH/IVF delta machinery; this
    pins the frozen-codebook contract)."""
    from streamlit_flink_demo_spark.operators.similarity import (
        _pq_encode_arrow,
    )

    path = inc.append_pq_index(spark, sf_dir)
    meta = _live_meta(path)
    books = np.array(meta["codebooks"], dtype=np.float64)

    got = {
        r["vec_id"]: list(r["code"])
        for r in inc.read_index_data(spark, path).collect()
    }
    e = load_table(spark, sf_dir, "embeddings")
    want = {
        r["vec_id"]: list(r["code"])
        for r in _pq_encode_arrow(e, books).collect()
    }
    assert got == want and len(got) > 0


# --------------------------------------------------------------------------
# Tombstone deletion (round 11): takedowns without rebuild
# --------------------------------------------------------------------------


def test_tombstone_probe_matches_fresh_live_build(
    spark, sf_dir, artifact_root
):
    """A∪B build + tombstone(B) probed == fresh build over A alone —
    the probe-parity contract (the SQL oracle proves the same against
    DuckDB)."""
    from streamlit_flink_demo_spark.operators.similarity import (
        _banded_sigs_arrow,
        _N_BANDS,
        _PLANES_PER_BAND,
        lsh_probe_topk,
    )

    path = inc.tombstone_new_slice(spark, sf_dir)
    e_live = load_table(spark, sf_dir, "embeddings").filter(
        inc._split_col() < inc._NEW_PCT
    )
    got = sorted(
        map(
            tuple,
            lsh_probe_topk(
                e_live, inc.read_live_index(spark, path)
            ).collect(),
        )
    )
    fresh = _banded_sigs_arrow(e_live, _N_BANDS, _PLANES_PER_BAND)
    want = sorted(map(tuple, lsh_probe_topk(e_live, fresh).collect()))
    assert got == want and len(got) > 0


def test_tombstone_replay_is_noop(spark, sf_dir, artifact_root):
    path = inc.tombstone_new_slice(spark, sf_dir)
    m1 = _live_meta(path)
    assert len(m1["deltas"]) == 1 and m1["deltas"][0]["tombstone"]
    inc.tombstone_new_slice(spark, sf_dir)  # replayed takedown
    assert _live_meta(path)["deltas"] == m1["deltas"]


def test_compaction_drops_tombstoned_rows_probe_identical(
    spark, sf_dir, artifact_root
):
    """compact_index physically removes tombstoned rows and clears
    the tombstone entries; the live probe is bit-identical before and
    after, and the deleted keys are GONE from the data files (not
    just masked)."""
    path = inc.tombstone_new_slice(spark, sf_dir)
    ts, key_col = inc.read_tombstones(spark, path)
    assert key_col == "vec_id"
    dead = {r["vec_id"] for r in ts.collect()}
    assert dead  # the 10% slice is non-empty at every SF
    before = sorted(
        map(tuple, inc.read_live_index(spark, path).collect())
    )

    assert inc.compact_index(spark, path, ("band", "bsig")) is True
    meta = _live_meta(path)
    assert meta.get("deltas", []) == []
    after_all = inc.read_index_data(spark, path)
    assert (
        after_all.filter(F.col("vec_id").isin(list(dead))).count() == 0
    )  # physically dropped
    after = sorted(
        map(tuple, inc.read_live_index(spark, path).collect())
    )
    assert after == before


def test_gram_index_doc_takedown(spark, artifact_root, tmp_path):
    """Deleting a corpus document from the gram index removes its
    positions from every later rewrite's view: rewrite against
    (A∪B index with B tombstoned) == rewrite against an A-only
    index."""
    from streamlit_flink_demo_spark.operators.suffix import (
        gram_index_rows,
        init_gram_index,
        read_gram_index,
        span_rewrite_batch,
    )

    block = "TAKEDOWN-REPEATED-BLOCK-9876543210-FEDCBA"  # 41 chars
    a = spark.createDataFrame(
        [(1, "document a with only unshared words")],
        "doc_id bigint, text string",
    )
    b = spark.createDataFrame(
        [(2, f"document b carrying {block} in the body")],
        "doc_id bigint, text string",
    )
    art = str(tmp_path / "gram_idx")
    init_gram_index(a.unionByName(b), art)
    batch = spark.createDataFrame(
        [(10, f"arrival that reuses {block} verbatim")],
        "doc_id bigint, text string",
    )
    # pre-takedown: the block is cut (doc 2 holds it)
    pre = span_rewrite_batch(batch, read_gram_index(spark, art)).collect()
    assert pre[0]["chars_removed"] >= len(block) - 1

    inc.tombstone_keys(
        art,
        "del:doc2",
        spark.createDataFrame([(2,)], "doc_id bigint"),
        key_col="doc_id",
    )
    got = sorted(
        map(
            tuple,
            span_rewrite_batch(
                batch, read_gram_index(spark, art)
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            span_rewrite_batch(batch, gram_index_rows(a)).collect(),
        )
    )
    assert got == want
    assert got[0][3] == 0  # n_spans_removed: nothing left to credit


def test_ivf_tombstone_frozen_quantizer_survives_compaction(
    spark, sf_dir, artifact_root
):
    """IVF deletion semantics: the probe after tombstoning equals the
    probe over live rows under the SAME centroids, and compaction
    drops the rows physically while the frozen quantizer carries over
    verbatim (retraining on the survivors would shift every surviving
    vector's cell — the bug the frozen contract prevents)."""
    import json as _json

    from streamlit_flink_demo_spark.plans import REGISTRY

    before = sorted(
        map(
            tuple,
            REGISTRY["ann_ivf_tombstone_topk"]
            .fn.__wrapped__(spark, sf_dir)
            .collect(),
        )
    )
    path = inc._index_dir("ivf_ts", sf_dir)
    cents_before = _live_meta(path)["centroids"]
    assert inc.compact_index(spark, path, ("cluster",)) is True
    meta = _live_meta(path)
    assert meta.get("deltas", []) == []
    assert meta["centroids"] == cents_before  # frozen, verbatim
    ts, _ = inc.read_tombstones(spark, path)
    assert ts is None  # tombstones retired
    import numpy as _np

    cents = _cents_df(spark, _np.array(cents_before, dtype=_np.float64))
    q = (
        load_table(spark, sf_dir, "embeddings")
        .filter(inc._split_col() < inc._NEW_PCT)
        .filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
    )
    after = sorted(
        map(
            tuple,
            _ivf_probe(
                q,
                cents,
                inc.read_live_index(spark, path),
                _IVF_NPROBE,
                _TOPK,
            ).collect(),
        )
    )
    assert after == before and len(after) > 0


def test_maintenance_lock_reentrant_same_thread(tmp_path):
    """A thread already holding the maintenance lock passes straight
    through a nested acquisition (compact_index publishing via
    _publish_artifact, which now takes the lock around its swap)."""
    from streamlit_flink_demo_spark.operators.incremental import (
        maintenance_lock,
    )

    path = str(tmp_path / "artifact")
    with maintenance_lock(path):
        with maintenance_lock(path):  # must not deadlock
            pass
    # and the lock is actually released afterwards: a second thread
    # can take it without blocking
    import threading

    acquired = threading.Event()

    def taker():
        with maintenance_lock(path):
            acquired.set()

    t = threading.Thread(target=taker)
    t.start()
    t.join(timeout=10)
    assert acquired.is_set()


def test_publish_artifact_blocks_on_maintenance_lock(tmp_path):
    """A builder's publish waits for a running maintenance pass: the
    bench --force vs compaction scenario the round-12 advice flagged."""
    import threading
    import time

    from streamlit_flink_demo_spark.operators.incremental import (
        maintenance_lock,
    )
    from streamlit_flink_demo_spark.operators.similarity import (
        _publish_artifact,
    )

    out = str(tmp_path / "artifact")
    tmp1 = str(tmp_path / "artifact.tmp-1")
    os.makedirs(tmp1)
    with open(os.path.join(tmp1, "meta.json"), "w") as f:
        f.write("{}")
    published = threading.Event()

    def builder():
        _publish_artifact(tmp1, out)
        published.set()

    with maintenance_lock(out):
        t = threading.Thread(target=builder)
        t.start()
        time.sleep(0.5)
        # the publish must still be waiting on the maintenance lock
        assert not published.is_set()
    t.join(timeout=10)
    assert published.is_set()
    assert os.path.islink(out)
