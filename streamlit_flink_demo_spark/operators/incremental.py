"""Incremental ANN index maintenance — append without rebuild.

A growing 100 TB corpus appends vectors daily; rebuilding an ANN
artifact per ingest is a corpus-wide job, while appending is
batch-sized. The invariant that makes appends SOUND is a FROZEN
quantizer: the trained state (IVF centroids; LSH hyperplanes are
md5-derived constants and need no training) is fixed at base-build
time and recorded in the artifact's meta.json, so a new vector's
cell/bucket assignment is a pure function of the vector — appending
slice B to a base-A artifact yields bit-for-bit the index a fresh
A∪B build under the same quantizer would produce. That equivalence
IS the oracle here: the registered queries build on the stable 90%
hash-slice, append the 10% "newly ingested" slice, and probe — while
the DuckDB oracle replays a single fresh build with the quantizer
trained on the 90% slice. A hash match proves append ≡ rebuild.

Delta mechanics (the ``docs_bloom_dedup`` snapshot discipline applied
to artifacts): each append lands as a ``delta-*`` directory inside
the LIVE artifact version, written first to a dot-tmp staging dir,
renamed, and only then recorded in meta.json (atomic tmp+replace
under the artifact flock). Readers union base ``data/`` with
COMMITTED deltas only — a crashed append leaves invisible debris,
and re-appending the same delta key is a no-op (idempotent by key).
A ``force`` rebuild of the base publishes a fresh version and drops
all deltas, exactly like a table-format major compaction.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.functions.hashing import u60, u60_sql
from streamlit_flink_demo_spark.operators.similarity import (
    _banded_sigs_arrow,
    _cents_df,
    _artifact_is_fresh,
    _embeddings_fingerprint,
    _index_dir,
    _ivf_assign_arrow,
    _ivf_centroids_np,
    _ivf_oracle_sql,
    _ivf_probe,
    _publish_artifact,
    _write_meta,
    _DIM,
    _IVF_CLUSTERS,
    _IVF_NPROBE,
    _IVF_TRAIN_SAMPLE,
    _N_BANDS,
    _N_QUERIES,
    _PLANES_PER_BAND,
    _TOPK,
    _sigs_sql,
    cosine_sql,
    lsh_probe_topk,
)
from streamlit_flink_demo_spark.plans import register
from streamlit_flink_demo_spark.sources.catalog import load_spread, load_table

# Same hash-mod convention as dedup_incremental: bucket >= _NEW_PCT
# plays the "newly ingested batch", bucket < _NEW_PCT the existing
# corpus the base artifact was built on.
_NEW_PCT = 90
_BASE_WHERE_SQL = f"({u60_sql('CAST(vec_id AS VARCHAR)')} % 100) < {_NEW_PCT}"
_NEW_WHERE_SQL = f"({u60_sql('CAST(vec_id AS VARCHAR)')} % 100) >= {_NEW_PCT}"


def _split_col() -> F.Column:
    return u60(F.col("vec_id").cast("string")) % 100


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as fh:
        return json.load(fh)


def _rewrite_meta_atomic(path: str, meta: dict) -> None:
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "meta.json"))


def read_index_data(
    spark: SparkSession, path: str, meta: dict | None = None
) -> DataFrame:
    """Base ``data/`` plus every COMMITTED data delta, as one frame
    (tombstone deltas carry deleted KEYS, not rows — excluded here;
    ``read_live_index`` additionally subtracts them). Partition
    pruning applies per directory root, so probes stay bucket-pruned
    across base and deltas alike. ``meta`` lets a caller that must
    see ONE consistent artifact state (compaction.read_index_with_tail)
    pass its own meta.json snapshot instead of re-reading it here."""
    live = os.path.realpath(path)
    if meta is None:
        meta = _read_meta(live)
    dirs = [os.path.join(live, "data")] + [
        os.path.join(live, d["dir"])
        for d in meta.get("deltas", [])
        if not d.get("tombstone")
    ]
    # one scan per root, unioned: a multi-root read would make Spark
    # infer partitioning from the paths' common prefix and reject
    # data/ vs delta-*/ as conflicting structures; per-root scans keep
    # partition discovery (and pruning) local to each root.
    out = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        out = out.unionByName(spark.read.parquet(d))
    return out


import contextlib
import threading

# Thread-local set of artifact paths whose maintenance lock THIS thread
# already holds — makes maintenance_lock re-entrant per thread, so
# _publish_artifact can take it during its swap without deadlocking
# compact_index's own publish (flock conflicts are per open file
# description, so a naive re-open would block against ourselves).
_MAINT_HELD = threading.local()


@contextlib.contextmanager
def maintenance_lock(path: str):
    """Serialize MAINTENANCE operations (fold_sink_into_index,
    compact_index, standalone tail truncation) AND artifact publishes
    (_publish_artifact takes this lock around its symlink swap) on one
    artifact: a fold landing between a compaction's meta snapshot and
    its publish would have its delta rows and fold-ledger entries
    silently dropped by the version swap (lost update) — with a
    truncating tail that is data loss, not just re-fold work — and a
    force rebuild republishing mid-compaction would mix version A's
    delta list with version B's directory root. Readers stay lock-free
    (they get snapshot semantics from the single meta read);
    commit_delta's own short lock (``path + ".lock"``) is a different
    file, so appends from the live stream still interleave with a
    long-running compaction's Spark job — only maintenance/maintenance
    and maintenance/publish overlap is excluded.

    Re-entrant per thread (a thread already holding the lock for
    ``path`` passes straight through), so maintenance operations can
    publish under their own lock. SCOPE: fcntl.flock is single-host —
    it serializes processes and threads sharing one filesystem view on
    one machine (the bench --force vs pytest scenario). Multi-host
    artifact maintenance needs an external coordinator; at 100 TB the
    equivalent is a catalog/lake transaction, not a file lock."""
    import fcntl

    held = getattr(_MAINT_HELD, "paths", None)
    if held is None:
        held = _MAINT_HELD.paths = set()
    key = os.path.abspath(path)
    if key in held:
        yield
        return
    with open(path + ".maint.lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        held.add(key)
        try:
            yield
        finally:
            held.discard(key)
            fcntl.flock(lk, fcntl.LOCK_UN)


def tombstone_keys(
    path: str,
    delta_key: str,
    ids: DataFrame,
    key_col: str = "vec_id",
) -> bool:
    """Commit a DELETION to the live artifact version: ``ids`` (a
    one-column frame of ``key_col`` values) lands as a tombstone
    delta — takedowns are as real as appends at 100 TB, and a
    corpus-wide rebuild per deletion is exactly the cost appends
    already avoid. Probes subtract tombstones via ``read_live_index``
    (broadcast anti-join — the tombstone set is small next to the
    index); ``compact_index`` physically drops the rows and clears
    the tombstones. Same idempotency as appends: a replayed
    ``delta_key`` is a no-op (returns False), so a crashed-and-retried
    takedown never stacks."""

    def write(staging: str) -> None:
        ids.select(F.col(key_col)).write.mode("overwrite").parquet(
            staging
        )

    return commit_delta(
        path,
        delta_key,
        write,
        extra={"tombstone": True, "key_col": key_col},
    )


def read_tombstones(
    spark: SparkSession, path: str, meta: dict | None = None
) -> tuple[DataFrame | None, str | None]:
    """(deleted-keys frame, key_col) across the live version's
    tombstone deltas, or (None, None) when there are none. One
    key_col per artifact — mixing is a caller bug and asserts.
    ``meta`` lets a caller share ONE meta.json snapshot with its
    other reads (read_live_index)."""
    live = os.path.realpath(path)
    if meta is None:
        meta = _read_meta(live)
    entries = [d for d in meta.get("deltas", []) if d.get("tombstone")]
    if not entries:
        return None, None
    key_cols = {d["key_col"] for d in entries}
    assert len(key_cols) == 1, f"mixed tombstone key_cols: {key_cols}"
    key_col = key_cols.pop()
    out = spark.read.parquet(os.path.join(live, entries[0]["dir"]))
    for d in entries[1:]:
        out = out.unionByName(
            spark.read.parquet(os.path.join(live, d["dir"]))
        )
    return out.distinct(), key_col


def read_live_index(
    spark: SparkSession, path: str, meta: dict | None = None
) -> DataFrame:
    """The SERVING view: base + data deltas MINUS tombstoned keys
    (broadcast left-anti join; a no-op plan when no tombstones
    exist). This is what tombstone-aware probes read — bit-identical
    to a fresh build over the undeleted rows, which is the oracle
    (ann_lsh_tombstone_topk). The version's meta.json is read ONCE
    and drives both the data-delta and tombstone enumeration (or pass
    ``meta`` to share an even wider snapshot, as compact_index does)."""
    if meta is None:
        meta = _read_meta(os.path.realpath(path))
    data = read_index_data(spark, path, meta=meta)
    ts, key_col = read_tombstones(spark, path, meta=meta)
    if ts is None:
        return data
    return data.join(F.broadcast(ts), key_col, "left_anti")


def commit_delta(
    path: str,
    delta_key: str,
    write_fn,
    extra: dict | None = None,
) -> bool:
    """Idempotently append one delta to the live artifact version:
    ``write_fn(staging_dir)`` materializes the delta's parquet into a
    dot-tmp dir inside the version (crash debris stays invisible —
    parquet readers never list it because meta.json never names it),
    then the dir is renamed and recorded in meta.json atomically under
    the artifact lock. Returns False when ``delta_key`` was already
    committed (replay — nothing written), True when this call
    committed it; the docs_bloom_dedup snapshot discipline plus the
    IdempotentParquetSink replay contract, applied to index artifacts."""
    import fcntl

    live = os.path.realpath(path)
    with open(path + ".lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            meta = _read_meta(live)
            deltas = meta.setdefault("deltas", [])
            if any(d["key"] == delta_key for d in deltas):
                return False
            name = f"delta-{len(deltas)}"
            staging = os.path.join(live, f".tmp-{name}-{os.getpid()}")
            write_fn(staging)
            os.rename(staging, os.path.join(live, name))
            # ``extra`` rides the delta entry (e.g. compaction's
            # folded_batches ledger) — JSON-serializable only.
            deltas.append({"dir": name, "key": delta_key, **(extra or {})})
            _rewrite_meta_atomic(live, meta)
            return True
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)


def compact_index(
    spark: SparkSession,
    path: str,
    partition_cols: tuple[str, ...],
    sort_cols: tuple[str, ...] = ("vec_id",),
) -> bool:
    """Major compaction: fold base ``data/`` plus every committed
    delta into a FRESH artifact version (one well-partitioned layout,
    no delta list) and publish it atomically via the symlink swap —
    the compact_sink discipline applied to index artifacts. Daily
    appends accumulate small delta directories whose per-probe listing
    and open cost grows with delta count; compaction restores the
    build-once layout without retraining anything (meta.json — and
    with it the frozen quantizer — carries over verbatim, minus the
    folded deltas). Returns False when there is nothing to fold.

    Runs under the artifact's ``maintenance_lock``: the whole
    operation works from ONE meta.json snapshot (both the merged rows
    and the carried fold ledger derive from it), and a concurrent
    fold is excluded for the duration — a fold landing between
    snapshot and publish would otherwise have its delta rows and
    ledger entries silently dropped by the version swap."""
    with maintenance_lock(path):
        live = os.path.realpath(path)
        meta = _read_meta(live)
        if not meta.get("deltas"):
            return False
        # read_live_index on the SAME snapshot AND the same resolved
        # version root (`live`, not `path` — re-realpathing the
        # symlink inside the read could land on a version published
        # mid-call and mix version A's delta list with version B's
        # directory root): compaction is where tombstoned rows are
        # PHYSICALLY dropped (the fresh version has no tombstone
        # entries, so probes stop paying the anti-join). The publish
        # race itself is also excluded now that _publish_artifact
        # takes the maintenance lock, but reading one resolved root
        # keeps the snapshot self-consistent regardless.
        merged = read_live_index(spark, live, meta=meta)
        # The fold ledger (compaction.py) rides delta entries;
        # compaction folds those deltas away, so the accumulated
        # ledger must carry forward at the TOP level of the fresh
        # version's meta — otherwise folded_ids() goes empty and the
        # next fold_sink_into_index re-folds every still-committed
        # sink batch, duplicating rows.
        fb: set = set(meta.get("folded_batches", []))
        fc: set = set(meta.get("folded_compactions", []))
        for d in meta.get("deltas", []):
            fb.update(d.get("folded_batches", []))
            fc.update(d.get("folded_compactions", []))
        tmp = f"{path}.tmp-compact-{os.getpid()}"
        if partition_cols:
            out_df = merged.repartition(*partition_cols).sortWithinPartitions(
                *sort_cols
            )
            writer = out_df.write.mode("overwrite").partitionBy(
                *partition_cols
            )
        else:
            # unpartitioned artifacts (e.g. the rank-contiguous suffix
            # index) keep their range layout on the sort key instead
            out_df = merged.repartitionByRange(*sort_cols).sortWithinPartitions(
                *sort_cols
            )
            writer = out_df.write.mode("overwrite")
        writer.parquet(os.path.join(tmp, "data"))
        new_meta = {k: v for k, v in meta.items() if k != "deltas"}
        if fb or fc:
            new_meta["folded_batches"] = sorted(fb)
            new_meta["folded_compactions"] = sorted(fc)
        _write_meta(tmp, new_meta)
        _publish_artifact(tmp, path)
        return True


# --------------------------------------------------------------------------
# LSH: base build on the 90% slice + signature-only append
# --------------------------------------------------------------------------


def build_lsh_base_index(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> str:
    """Top-k LSH signature artifact over the STABLE 90% hash-slice
    (the base corpus an incremental deployment built last week). Same
    banding and layout as ``build_lsh_index``; the hyperplanes are
    md5-derived constants, so there is no trained state to freeze."""
    out = _index_dir("lsh_topk_base", sf_dir)
    fp = _embeddings_fingerprint(sf_dir)
    params = {
        "n_bands": _N_BANDS,
        "planes_per_band": _PLANES_PER_BAND,
        "slice": f"base{_NEW_PCT}",
    }
    if not force and _artifact_is_fresh(out, fp, params):
        return out
    e = load_spread(spark, sf_dir, "embeddings").filter(
        _split_col() < _NEW_PCT
    )
    sigs = _banded_sigs_arrow(e, _N_BANDS, _PLANES_PER_BAND)
    tmp = f"{out}.tmp-{os.getpid()}"
    (
        sigs.repartition("band", "bsig")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("band", "bsig")
        .parquet(os.path.join(tmp, "data"))
    )
    _write_meta(tmp, {"fingerprint": fp, **params})
    _publish_artifact(tmp, out)
    return out


def append_lsh_index(spark: SparkSession, sf_dir: str) -> str:
    """Sign the 10% "newly ingested" slice with the SAME banding and
    commit it as a delta — per-ingest cost scales with the batch, not
    the corpus. Idempotent per (fingerprint, slice) key."""
    path = build_lsh_base_index(spark, sf_dir)
    fp = _embeddings_fingerprint(sf_dir)

    def write(staging: str) -> None:
        e = load_spread(spark, sf_dir, "embeddings").filter(
            _split_col() >= _NEW_PCT
        )
        sigs = _banded_sigs_arrow(e, _N_BANDS, _PLANES_PER_BAND)
        (
            sigs.repartition("band", "bsig")
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .partitionBy("band", "bsig")
            .parquet(staging)
        )

    commit_delta(path, f"new{_NEW_PCT}:{fp}", write)
    return path


@register(
    "ann_lsh_incremental_topk",
    # the equivalence claim IS the oracle: base-build + append must
    # reproduce the single fresh full-corpus build bit-for-bit (LSH
    # banding has no trained state), so the oracle is the SAME fresh
    # full pipeline ann_lsh_topk replays.
    oracle=f"""
WITH sigs AS (
{_sigs_sql(_N_BANDS, _PLANES_PER_BAND)}
),
q AS (
  SELECT vec_id AS q_id, embedding AS q_emb, band, bsig
  FROM sigs WHERE vec_id < {_N_QUERIES}
),
cand AS (
  SELECT q.q_id, s.vec_id,
         MAX({cosine_sql('q.q_emb', 's.embedding', _DIM)}) AS cos_sim
  FROM q JOIN sigs s
    ON s.band = q.band AND s.bsig = q.bsig AND s.vec_id <> q.q_id
  GROUP BY q.q_id, s.vec_id
),
ranked AS (
  SELECT q_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id) AS rk
  FROM cand
)
SELECT q_id, vec_id, cos_sim, rk FROM ranked WHERE rk <= {_TOPK}
""",
    tags=("similarity", "ann", "lsh", "incremental"),
    expose=False,
)
def ann_lsh_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH top-k probed against a base-90% artifact with the 10%
    slice APPENDED as a committed delta (never rebuilt). The oracle is
    the fresh full-corpus pipeline — a hash match proves the append
    path reproduces a rebuild exactly."""
    path = append_lsh_index(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    return lsh_probe_topk(e, read_index_data(spark, path))


# --------------------------------------------------------------------------
# IVF: quantizer trained on the base slice, FROZEN for appends
# --------------------------------------------------------------------------


def build_ivf_base_index(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> str:
    """IVF inverted-list artifact over the stable 90% slice, with the
    coarse quantizer trained on THAT slice only and recorded frozen in
    meta.json — appends must never retrain (retraining would reassign
    the base corpus and silently invalidate every existing list)."""
    out = _index_dir("ivf_base", sf_dir)
    fp = _embeddings_fingerprint(sf_dir)
    params = {
        "n_clusters": _IVF_CLUSTERS,
        "train_sample": _IVF_TRAIN_SAMPLE,
        "slice": f"base{_NEW_PCT}",
    }
    if not force and _artifact_is_fresh(out, fp, params):
        return out
    base = load_spread(spark, sf_dir, "embeddings").filter(
        _split_col() < _NEW_PCT
    )
    cents_np = _ivf_centroids_np(base, _IVF_CLUSTERS)
    inv = _ivf_assign_arrow(base, cents_np, with_embedding=True)
    tmp = f"{out}.tmp-{os.getpid()}"
    (
        inv.repartition("cluster")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(os.path.join(tmp, "data"))
    )
    _write_meta(
        tmp,
        {
            "fingerprint": fp,
            **params,
            "centroids": [[float(v) for v in row] for row in cents_np],
        },
    )
    _publish_artifact(tmp, out)
    return out


def append_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Assign the 10% new slice with the FROZEN base quantizer (read
    back from meta.json — exact float64 JSON round-trip) and commit
    the new inverted-list rows as a delta partitioned by the same
    cluster ids. Idempotent per (fingerprint, slice) key."""
    path = build_ivf_base_index(spark, sf_dir)
    meta = _read_meta(os.path.realpath(path))
    cents_np = np.array(meta["centroids"], dtype=np.float64)
    fp = _embeddings_fingerprint(sf_dir)

    def write(staging: str) -> None:
        new = load_spread(spark, sf_dir, "embeddings").filter(
            _split_col() >= _NEW_PCT
        )
        inv = _ivf_assign_arrow(new, cents_np, with_embedding=True)
        (
            inv.repartition("cluster")
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .partitionBy("cluster")
            .parquet(staging)
        )

    commit_delta(path, f"new{_NEW_PCT}:{fp}", write)
    return path


# --------------------------------------------------------------------------
# PQ: codebooks trained on the base slice, FROZEN for appends
# --------------------------------------------------------------------------


def build_pq_base_index(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> str:
    """PQ code artifact over the stable 90% slice with the codebooks
    trained on THAT slice and frozen in meta.json — appends encode
    with the stored books, never retrain (retrained books would remap
    every existing code silently). Same commit/read machinery as the
    LSH/IVF paths; probe parity under the frozen books is pinned in
    tests/test_incremental.py (the oracle-level append ≡ rebuild proof
    lives on the LSH/IVF queries, which exercise the identical delta
    mechanism)."""
    from streamlit_flink_demo_spark.operators.similarity import (
        _PQ_DSUB,
        _PQ_KSUB,
        _PQ_M,
        _PQ_TRAIN_SAMPLE,
        _pq_codebooks_np,
        _pq_encode_arrow,
    )

    out = _index_dir("pq_base", sf_dir)
    fp = _embeddings_fingerprint(sf_dir)
    params = {
        "m": _PQ_M,
        "ksub": _PQ_KSUB,
        "dsub": _PQ_DSUB,
        "train_sample": _PQ_TRAIN_SAMPLE,
        "slice": f"base{_NEW_PCT}",
    }
    if not force and _artifact_is_fresh(out, fp, params):
        return out
    base = load_spread(spark, sf_dir, "embeddings").filter(
        _split_col() < _NEW_PCT
    )
    books = _pq_codebooks_np(base)
    tmp = f"{out}.tmp-{os.getpid()}"
    (
        _pq_encode_arrow(base, books)
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(os.path.join(tmp, "data"))
    )
    _write_meta(tmp, {"fingerprint": fp, **params, "codebooks": books.tolist()})
    _publish_artifact(tmp, out)
    return out


def append_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """Encode the 10% new slice with the FROZEN base codebooks (exact
    float64 JSON round-trip) and commit the codes as a delta."""
    from streamlit_flink_demo_spark.operators.similarity import (
        _pq_encode_arrow,
    )

    path = build_pq_base_index(spark, sf_dir)
    meta = _read_meta(os.path.realpath(path))
    books = np.array(meta["codebooks"], dtype=np.float64)
    fp = _embeddings_fingerprint(sf_dir)

    def write(staging: str) -> None:
        new = load_spread(spark, sf_dir, "embeddings").filter(
            _split_col() >= _NEW_PCT
        )
        (
            _pq_encode_arrow(new, books)
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .parquet(staging)
        )

    commit_delta(path, f"new{_NEW_PCT}:{fp}", write)
    return path


def _ivf_inc_oracle_sql() -> str:
    """Fresh-build replay with the quantizer trained on the 90% base
    slice: seeds are the first k base vectors BY vec_id (numpy sorts
    and slices; here ROW_NUMBER — the base slice need not contain
    vec_ids 0..k-1), one Lloyd step over the bounded base sample, then
    assignment of the FULL corpus and the standard nprobe probe. The
    Spark side never runs this as one build — it probes base+delta —
    so a hash match is the append ≡ rebuild proof."""
    cos = lambda a, b: cosine_sql(a, b, _DIM)
    train_n = _IVF_CLUSTERS * _IVF_TRAIN_SAMPLE
    return f"""
WITH train AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE {_BASE_WHERE_SQL} AND vec_id < {train_n}
),
seeds AS (
  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS c_id,
         embedding AS s_emb
  FROM train ORDER BY vec_id LIMIT {_IVF_CLUSTERS}
),
tassign AS (
  SELECT vec_id, c_id, embedding FROM (
    SELECT t.vec_id, s.c_id, t.embedding,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id
                              ORDER BY {cos('t.embedding', 's.s_emb')} DESC,
                                       s.c_id) AS rk
    FROM train t CROSS JOIN seeds s
  ) WHERE rk = 1
),
cmeans AS (
  SELECT s.c_id,
         coalesce(m.c_emb, list_transform(s.s_emb, x -> x::DOUBLE))
           AS c_emb
  FROM seeds s LEFT JOIN (
    SELECT c_id, list(avg_v ORDER BY dim) AS c_emb
    FROM (
      SELECT a.c_id, d.dim, AVG(a.embedding[d.dim+1]::DOUBLE) AS avg_v
      FROM tassign a CROSS JOIN range({_DIM}) d(dim)
      GROUP BY a.c_id, d.dim
    )
    GROUP BY c_id
  ) m USING (c_id)
),
inv AS (
  SELECT vec_id, c_id AS cluster, embedding FROM (
    SELECT e.vec_id, c.c_id, e.embedding,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos('e.embedding', 'c.c_emb')} DESC,
                                       c.c_id) AS rk
    FROM embeddings e CROSS JOIN cmeans c
  ) WHERE rk = 1
),
q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {_N_QUERIES}
),
probes AS (
  SELECT q_id, q_emb, c_id FROM (
    SELECT q.q_id, q.q_emb, c.c_id,
           ROW_NUMBER() OVER (PARTITION BY q.q_id
                              ORDER BY {cos('q.q_emb', 'c.c_emb')} DESC,
                                       c.c_id) AS prk
    FROM q CROSS JOIN cmeans c
  ) WHERE prk <= {_IVF_NPROBE}
),
scored AS (
  SELECT p.q_id, i.vec_id, {cos('p.q_emb', 'i.embedding')} AS cos_sim
  FROM probes p JOIN inv i ON i.cluster = p.c_id AND i.vec_id <> p.q_id
),
ranked AS (
  SELECT q_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id) AS rk
  FROM scored
)
SELECT q_id, vec_id, cos_sim, rk FROM ranked WHERE rk <= {_TOPK}
"""


@register(
    "ann_ivf_incremental_topk",
    oracle=_ivf_inc_oracle_sql(),
    tags=("similarity", "ann", "ivf", "incremental"),
    expose=False,
)
def ann_ivf_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k probed against a base-90% inverted list with the 10%
    slice appended under the FROZEN base quantizer. The oracle replays
    ONE fresh build (quantizer trained on the base slice, full corpus
    assigned) — a hash match proves append ≡ rebuild under a frozen
    quantizer, the invariant incremental IVF maintenance rests on."""
    path = append_ivf_index(spark, sf_dir)
    meta = _read_meta(os.path.realpath(path))
    cents_np = np.array(meta["centroids"], dtype=np.float64)
    inv = read_index_data(spark, path)
    cents = _cents_df(spark, cents_np)
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    return _ivf_probe(q, cents, inv, _IVF_NPROBE, _TOPK)


# --------------------------------------------------------------------------
# Tombstone deletion: takedowns without rebuild
# --------------------------------------------------------------------------


def build_lsh_full_index(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> str:
    """Full-corpus (A∪B) LSH signature artifact under its own kind —
    the deletion scenario's starting state, isolated from the
    append-path artifacts so tombstones never leak into their
    queries."""
    out = _index_dir("lsh_topk_ts", sf_dir)
    fp = _embeddings_fingerprint(sf_dir)
    params = {
        "n_bands": _N_BANDS,
        "planes_per_band": _PLANES_PER_BAND,
        "slice": "full",
    }
    if not force and _artifact_is_fresh(out, fp, params):
        return out
    e = load_spread(spark, sf_dir, "embeddings")
    sigs = _banded_sigs_arrow(e, _N_BANDS, _PLANES_PER_BAND)
    tmp = f"{out}.tmp-{os.getpid()}"
    (
        sigs.repartition("band", "bsig")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("band", "bsig")
        .parquet(os.path.join(tmp, "data"))
    )
    _write_meta(tmp, {"fingerprint": fp, **params})
    _publish_artifact(tmp, out)
    return out


def tombstone_new_slice(spark: SparkSession, sf_dir: str) -> str:
    """Tombstone the 10% hash-slice (the 'taken down' set B) in the
    full-corpus artifact — idempotent per (fingerprint, slice) key,
    the ids land distributed (no driver collect)."""
    path = build_lsh_full_index(spark, sf_dir)
    fp = _embeddings_fingerprint(sf_dir)
    ids = (
        load_spread(spark, sf_dir, "embeddings")
        .filter(_split_col() >= _NEW_PCT)
        .select("vec_id")
    )
    tombstone_keys(path, f"del:new{_NEW_PCT}:{fp}", ids)
    return path


@register(
    "ann_lsh_tombstone_topk",
    # probe-parity oracle: the A∪B build with B tombstoned must
    # hash-match ONE fresh A-only build — signatures are per-row, so
    # subtracting B's rows is exactly rebuilding without B.
    oracle=f"""
WITH emb_live AS (
  SELECT * FROM embeddings WHERE {_BASE_WHERE_SQL}
),
sigs AS (
{_sigs_sql(_N_BANDS, _PLANES_PER_BAND, src="emb_live")}
),
q AS (
  SELECT vec_id AS q_id, embedding AS q_emb, band, bsig
  FROM sigs WHERE vec_id < {_N_QUERIES}
),
cand AS (
  SELECT q.q_id, s.vec_id,
         MAX({cosine_sql('q.q_emb', 's.embedding', _DIM)}) AS cos_sim
  FROM q JOIN sigs s
    ON s.band = q.band AND s.bsig = q.bsig AND s.vec_id <> q.q_id
  GROUP BY q.q_id, s.vec_id
),
ranked AS (
  SELECT q_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id) AS rk
  FROM cand
)
SELECT q_id, vec_id, cos_sim, rk FROM ranked WHERE rk <= {_TOPK}
""",
    tags=("similarity", "ann", "lsh", "incremental", "tombstone"),
    expose=False,
)
def ann_lsh_tombstone_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH top-k probed against the full-corpus artifact AFTER the 10%
    slice is TOMBSTONED (takedown without rebuild): the probe reads
    ``read_live_index`` — base rows minus the deleted keys via a
    broadcast anti-join — and must hash-match the oracle's fresh
    build over the surviving 90% alone. Queries are drawn from the
    live slice (a deleted document cannot query its own index).
    ``compact_index`` later drops the rows physically and retires the
    anti-join; tests pin that the probe is identical before and after
    (tests/test_incremental.py)."""
    path = tombstone_new_slice(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").filter(
        _split_col() < _NEW_PCT
    )
    return lsh_probe_topk(e, read_live_index(spark, path))


def build_ivf_full_index(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> str:
    """Full-corpus IVF artifact under its own kind ('ivf_ts') — the
    deletion scenario's starting state, isolated from the shared
    probe artifact. Quantizer trained on the full-corpus sample and
    recorded frozen in meta.json (deletion never retrains)."""
    from streamlit_flink_demo_spark.operators.similarity import (
        _ivf_centroids_np as _cents,
    )

    out = _index_dir("ivf_ts", sf_dir)
    fp = _embeddings_fingerprint(sf_dir)
    params = {
        "n_clusters": _IVF_CLUSTERS,
        "train_sample": _IVF_TRAIN_SAMPLE,
        "slice": "full",
    }
    if not force and _artifact_is_fresh(out, fp, params):
        return out
    e = load_spread(spark, sf_dir, "embeddings")
    cents_np = _cents(e, _IVF_CLUSTERS)
    inv = _ivf_assign_arrow(e, cents_np, with_embedding=True)
    tmp = f"{out}.tmp-{os.getpid()}"
    (
        inv.repartition("cluster")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(os.path.join(tmp, "data"))
    )
    _write_meta(
        tmp,
        {
            "fingerprint": fp,
            **params,
            "centroids": [[float(v) for v in row] for row in cents_np],
        },
    )
    _publish_artifact(tmp, out)
    return out


@register(
    "ann_ivf_tombstone_topk",
    # deletion under a FROZEN quantizer: unlike LSH (where tombstone ≡
    # fresh rebuild, signatures being per-row), an IVF rebuild on the
    # survivors would RETRAIN and reassign everything — the correct
    # takedown semantics is "same centroids, B's rows gone", and the
    # oracle replays exactly that: full-corpus training, live-only
    # assignment and queries.
    oracle=_ivf_oracle_sql(live_where=_BASE_WHERE_SQL),
    tags=("similarity", "ann", "ivf", "incremental", "tombstone"),
    expose=False,
)
def ann_ivf_tombstone_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k probed after the 10% slice is TOMBSTONED in the
    full-corpus inverted list: probes read ``read_live_index`` (base
    rows minus deleted keys) under the artifact's FROZEN centroids —
    deletion must never retrain, or every surviving vector's cell
    assignment silently shifts. The oracle replays the full-corpus
    quantizer with live-only assignment/queries; a hash match proves
    tombstone ≡ remove-rows-keep-quantizer, the takedown invariant
    incremental IVF maintenance rests on."""
    path = build_ivf_full_index(spark, sf_dir)
    fp = _embeddings_fingerprint(sf_dir)
    ids = (
        load_spread(spark, sf_dir, "embeddings")
        .filter(_split_col() >= _NEW_PCT)
        .select("vec_id")
    )
    tombstone_keys(path, f"del:new{_NEW_PCT}:{fp}", ids)
    meta = _read_meta(os.path.realpath(path))
    cents_np = np.array(meta["centroids"], dtype=np.float64)
    cents = _cents_df(spark, cents_np)
    q = (
        load_table(spark, sf_dir, "embeddings")
        .filter(_split_col() < _NEW_PCT)
        .filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
    )
    return _ivf_probe(
        q, cents, read_live_index(spark, path), _IVF_NPROBE, _TOPK
    )
