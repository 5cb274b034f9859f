"""Training-shard writer: deterministic layout, one file per shard,
within-shard order identical to the docs_shuffle_shard oracle."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from streamlit_flink_demo_spark.sinks import (
    read_shard,
    with_shard,
    write_training_shards,
)
from streamlit_flink_demo_spark.sources.catalog import load_table

N_SHARDS = 8


@pytest.fixture(scope="module")
def shard_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("shards") / "docs")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    write_training_shards(docs, path, key_col="doc_id", n_shards=N_SHARDS)
    return path


def shard_files(path: str) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for d in glob.glob(os.path.join(path, "shard=*")):
        k = int(d.rsplit("=", 1)[1])
        out[k] = sorted(glob.glob(os.path.join(d, "*.parquet")))
    return out


def test_one_file_per_shard(shard_path):
    files = shard_files(shard_path)
    assert sorted(files) == list(range(N_SHARDS))
    for k, fs in files.items():
        assert len(fs) == 1, f"shard {k} has {len(fs)} files"


def test_within_shard_order_matches_sort_key(spark, sf_dir, shard_path):
    """Each shard file's physical row order is (sort_key, doc_id) —
    the ROW_NUMBER() ordering the docs_shuffle_shard oracle pins."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    expect = {
        k: [r.doc_id for r in rows]
        for k, rows in (
            (k, with_shard(docs, "doc_id", N_SHARDS)
                .filter(f"shard = {k}")
                .orderBy("sort_key", "doc_id")
                .collect())
            for k in range(N_SHARDS)
        )
    }
    files = shard_files(shard_path)
    total = 0
    for k, fs in files.items():
        got = pq.read_table(fs[0], columns=["doc_id"])["doc_id"].to_pylist()
        assert got == expect[k], f"shard {k} order mismatch"
        total += len(got)
    n_docs = docs.count()
    assert total == n_docs


def test_rewrite_is_byte_deterministic_rowwise(spark, sf_dir, shard_path, tmp_path):
    """A second run over the same input produces identical row
    sequences per shard (the resumable-loader contract)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    path2 = str(tmp_path / "docs2")
    write_training_shards(docs, path2, key_col="doc_id", n_shards=N_SHARDS)
    f1, f2 = shard_files(shard_path), shard_files(path2)
    assert sorted(f1) == sorted(f2)
    for k in f1:
        t1 = pq.read_table(f1[k][0]).to_pylist()
        t2 = pq.read_table(f2[k][0]).to_pylist()
        assert t1 == t2, f"shard {k} differs between runs"


def test_read_shard_prunes_partitions(spark, shard_path):
    df = read_shard(spark, shard_path, 3)
    rows = df.collect()
    assert rows and all(r.shard == 3 for r in rows)
    # Partition pruning: the files actually read are shard=3's only
    # (inputFiles() lists the pre-pruning relation, so ask at runtime).
    from pyspark.sql import functions as F

    read = {
        r[0]
        for r in df.select(F.input_file_name()).distinct().collect()
    }
    dirs = {"/" + os.path.dirname(f).removeprefix("file:").lstrip("/") for f in read}
    assert dirs == {os.path.join(shard_path, "shard=3")}


def test_empty_input_writes_success_marker_only(spark, sf_dir, tmp_path):
    """Zero-row input: the write succeeds (a _SUCCESS marker, no shard
    dirs — dynamic partitioning only creates populated partitions);
    reading it back raises Spark's schema-inference error, which is
    the caller's signal that the corpus was empty."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = str(tmp_path / "empty")
    write_training_shards(docs.filter("doc_id < 0"), out, n_shards=4)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not [d for d in os.listdir(out) if d.startswith("shard=")]


def test_sparse_input_creates_only_populated_shards(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = str(tmp_path / "one")
    write_training_shards(docs.limit(1), out, n_shards=4)
    dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert len(dirs) == 1


# --------------------------------------------------------------------------
# IdempotentParquetSink: exactly-once on at-least-once foreachBatch
# --------------------------------------------------------------------------


def test_idempotent_sink_skips_replayed_batch(spark, tmp_path):
    from streamlit_flink_demo_spark.sinks import IdempotentParquetSink

    sink = IdempotentParquetSink(str(tmp_path / "out"))
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    sink(b0, 0)
    # replay of batch 0 with DIFFERENT content must be ignored
    b0_replay = spark.createDataFrame([(9, "X")], "id long, v string")
    sink(b0_replay, 0)
    sink(spark.createDataFrame([(3, "c")], "id long, v string"), 1)
    rows = sorted(
        (r["id"], r["v"]) for r in sink.read_committed(spark).collect()
    )
    assert rows == [(1, "a"), (2, "b"), (3, "c")]
    assert sink.committed_ids() == [0, 1]


def test_idempotent_sink_uncommitted_crash_is_invisible_then_recovered(
    spark, tmp_path
):
    import os

    from streamlit_flink_demo_spark.sinks import IdempotentParquetSink

    out = str(tmp_path / "out")
    sink = IdempotentParquetSink(out)
    sink(spark.createDataFrame([(1, "a")], "id long, v string"), 0)
    # simulate a crash AFTER the parquet write, BEFORE the commit:
    # write the directory by hand without touching the manifest
    spark.createDataFrame([(7, "zz")], "id long, v string").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "batch_id=1"))
    assert sink.committed_ids() == [0]
    rows = {r["id"] for r in sink.read_committed(spark).collect()}
    assert rows == {1}  # debris invisible
    # recovery replays batch 1 (possibly different but authoritative)
    sink(spark.createDataFrame([(8, "y")], "id long, v string"), 1)
    rows = sorted(
        (r["id"], r["v"]) for r in sink.read_committed(spark).collect()
    )
    assert rows == [(1, "a"), (8, "y")]


def test_idempotent_sink_end_to_end_stream(spark, tmp_path):
    """Through a real StreamingQuery: feed 3 microbatches, then restart
    the query from the same checkpoint and feed one more — every source
    row lands exactly once."""
    import os

    from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
    from streamlit_flink_demo_spark.sources.stream_fixtures import (
        user_row,
        write_user_batch,
    )

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    from streamlit_flink_demo_spark.sources.stream_fixtures import user_stream

    sink = IdempotentParquetSink(out)

    def start():
        return (
            user_stream(spark, spool)
            .select("guid", "eyeColor")
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    for b in range(3):
        write_user_batch(
            spark, spool, b, [user_row(b * 10 + i) for i in range(5)]
        )
        q.processAllAvailable()
    q.stop()
    q = start()  # restart from checkpoint (may replay the last batch)
    write_user_batch(spark, spool, 3, [user_row(100 + i) for i in range(5)])
    q.processAllAvailable()
    q.stop()
    import uuid

    got = sorted(r["guid"] for r in sink.read_committed(spark).collect())
    want = sorted(
        str(uuid.UUID(int=n))
        for n in [b * 10 + i for b in range(3) for i in range(5)]
        + [100 + i for i in range(5)]
    )
    assert got == want


def test_compact_sink_preserves_rows_and_stays_readable(spark, tmp_path):
    from streamlit_flink_demo_spark.sinks import (
        IdempotentParquetSink,
        compact_sink,
    )

    out = str(tmp_path / "out")
    sink = IdempotentParquetSink(out)
    for b in range(5):
        sink(
            spark.createDataFrame(
                [(b * 10 + i, f"v{b}_{i}") for i in range(4)],
                "id long, v string",
            ),
            b,
        )
    before = sorted(
        (r["id"], r["v"]) for r in sink.read_committed(spark).collect()
    )
    folded = compact_sink(spark, out, target_partitions=2)
    assert folded == 5
    # compacted data lives outside Spark's batch-id space: no live
    # streaming batches, folded-through watermark covers 0..4
    assert sink.committed_ids() == []
    assert sink._read_manifest()["watermark"] == 4
    after = sorted(
        (r["id"], r["v"]) for r in sink.read_committed(spark).collect()
    )
    assert after == before
    # THE collision case: after a restart Spark's checkpoint assigns
    # batchId 5 next (the id the old max+1 design claimed for the
    # compacted directory, silently dropping this batch) — it must
    # append normally.
    sink(spark.createDataFrame([(999, "tail")], "id long, v string"), 5)
    assert sink.committed_ids() == [5]
    assert len(sink.read_committed(spark).collect()) == len(before) + 1
    # ...while a replay of a batch already folded into the compaction
    # (sink-committed, WAL commit lost) must still be skipped, not
    # duplicated.
    sink(spark.createDataFrame([(40, "dup")], "id long, v string"), 4)
    assert len(sink.read_committed(spark).collect()) == len(before) + 1
    # a second compaction folds the first compaction + the new batch
    assert compact_sink(spark, out, target_partitions=2) == 2
    assert sink._read_manifest() == {
        "batch_ids": [],
        "compactions": [1],
        "watermark": 5,
    }
    assert len(sink.read_committed(spark).collect()) == len(before) + 1


def test_compact_sink_carries_over_mid_compaction_commit(
    spark, tmp_path, monkeypatch
):
    """A batch the live sink commits WHILE compaction is writing the
    consolidated file must survive the manifest repoint (the blind
    batch_ids=[] rewrite dereferenced it: data dir present, invisible
    forever, never replayed). The hook commits batch 3 between
    compaction's snapshot read and its write."""
    # Spark 4: patch the CONCRETE class (pyspark.sql.DataFrame is the
    # abstract base; compact_sink's df is a classic.dataframe.DataFrame)
    from pyspark.sql.classic.dataframe import DataFrame

    from streamlit_flink_demo_spark.sinks import (
        IdempotentParquetSink,
        compact_sink,
    )

    out = str(tmp_path / "out")
    sink = IdempotentParquetSink(out)
    for b in range(3):
        sink(
            spark.createDataFrame([(b, f"v{b}")], "id long, v string"), b
        )
    orig = DataFrame.coalesce
    fired = []

    def hooked(self, n):
        if not fired:
            fired.append(True)
            sink(
                spark.createDataFrame([(99, "late")], "id long, v string"),
                3,
            )
        return orig(self, n)

    monkeypatch.setattr(DataFrame, "coalesce", hooked)
    assert compact_sink(spark, out, target_partitions=1) == 3
    m = sink._read_manifest()
    assert m["batch_ids"] == [3]  # carried over, not dereferenced
    assert m["compactions"] == [0] and m["watermark"] == 2
    rows = sorted((r["id"], r["v"]) for r in sink.read_committed(spark).collect())
    assert rows == [(0, "v0"), (1, "v1"), (2, "v2"), (99, "late")]


def test_run_on_committed_batch_durable_path(spark, tmp_path):
    """Happy path: the action runs over the durable batch directory."""
    from streamlit_flink_demo_spark.sinks import IdempotentParquetSink

    sink = IdempotentParquetSink(str(tmp_path / "out"))
    rows = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    sink(rows, 0)
    # fallback with DIFFERENT content proves the durable dir was read
    fallback = spark.createDataFrame([(9, "X")], "id long, v string")
    n = sink.run_on_committed_batch(
        spark, 0, fallback, lambda df: df.count()
    )
    assert n == 2


def test_run_on_committed_batch_missing_dir_uses_fallback(spark, tmp_path):
    import shutil

    from streamlit_flink_demo_spark.sinks import IdempotentParquetSink

    sink = IdempotentParquetSink(str(tmp_path / "out"))
    rows = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    sink(rows, 0)
    shutil.rmtree(sink.batch_dir(0))  # compaction folded it away
    n = sink.run_on_committed_batch(spark, 0, rows, lambda df: df.count())
    assert n == 2


def test_run_on_committed_batch_closes_toctou_window(spark, tmp_path):
    """The ADVICE race: isdir passes, then a compaction truncates the
    directory BEFORE the action's Spark read executes — the action must
    be retried on the fallback plan instead of killing the stream."""
    import shutil

    from streamlit_flink_demo_spark.sinks import IdempotentParquetSink

    sink = IdempotentParquetSink(str(tmp_path / "out"))
    rows = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    sink(rows, 0)
    calls = []

    def action(df):
        if not calls:
            calls.append("first")
            # simulate the concurrent compaction landing after the
            # isdir check but before the aggregation executes
            shutil.rmtree(sink.batch_dir(0))
        return df.count()

    n = sink.run_on_committed_batch(spark, 0, rows, action)
    assert n == 2
    assert calls == ["first"]  # first attempt saw the durable read fail


def test_run_on_committed_batch_unrelated_error_propagates(spark, tmp_path):
    from streamlit_flink_demo_spark.sinks import IdempotentParquetSink

    sink = IdempotentParquetSink(str(tmp_path / "out"))
    rows = spark.createDataFrame([(1, "a")], "id long, v string")
    sink(rows, 0)

    def action(df):
        raise ValueError("not a missing-path problem")

    with pytest.raises(ValueError):
        sink.run_on_committed_batch(spark, 0, rows, action)
