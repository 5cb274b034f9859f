"""Recrawl-state door-check (streaming/recrawl_ingest.py): counter
updates across batches, stream ≡ batch twin via a lag-window
recompute, base-artifact seeding, exactly-once restart replay, and
bucket-pruned state probes."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.sinks import IdempotentParquetSink
from streamlit_flink_demo_spark.streaming.recrawl_ingest import (
    attach_recrawl_stream,
    fetch_obs_batch,
    init_recrawl_index,
    latest_state,
    schedule_from_state,
    update_state_batch,
)

_A = "http://example.com/a"
_B = "http://example.com/b"
_C = "https://other.net/c"

# Batch 0: first fetches. Batch 1: A changed, B unchanged, C is new.
# Batch 2: A unchanged, C changed. A messy variant of A in batch 1
# must update A's canonical row, and the duplicate fetch of B inside
# batch 0 must count as ONE observation.
_B0 = [(_A, "d1"), (_B, "x1"), (_B, "x1")]
_B1 = [("HTTP://Example.COM:80/a?utm_source=f", "d2"), (_B, "x1"), (_C, "z1")]
_B2 = [(_A, "d2"), (_C, "z2")]


def _write_batch(spark, spool, n, rows):
    df = spark.createDataFrame(rows, "url string, digest string")
    staging = os.path.join(spool, f"_stage_{n}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(
        os.path.join(staging, part), os.path.join(spool, f"b{n:04d}.parquet")
    )


def _stream(spark, spool):
    return (
        spark.readStream.schema("url string, digest string")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )


def _final_state(spark, out):
    return {
        r["url"]: r
        for r in latest_state(
            IdempotentParquetSink(out).read_committed(spark)
        ).collect()
    }


def _twin(spark, epochs):
    """Batch recompute over the full fetch history: one observation
    per (canonical url, epoch), change = digest differs from the
    lag — a window formulation sharing no code with the incremental
    update path."""
    from streamlit_flink_demo_spark.operators.extract import (
        canonicalize_url,
    )

    rows = [
        (e, url, d) for e, batch in enumerate(epochs) for url, d in batch
    ]
    per_epoch = (
        spark.createDataFrame(rows, "epoch int, url string, digest string")
        .select(
            "epoch",
            canonicalize_url(F.col("url")).alias("url"),
            "digest",
        )
        .groupBy("epoch", "url")
        .agg(F.max("digest").alias("digest"))
    )
    w = Window.partitionBy("url").orderBy("epoch")
    chg = F.lag("digest").over(w).isNotNull() & (
        F.lag("digest").over(w) != F.col("digest")
    )
    agg = (
        per_epoch.withColumn("chg", chg.cast("bigint"))
        .groupBy("url")
        .agg(
            F.count("*").cast("bigint").alias("n_fetches"),
            F.sum("chg").cast("bigint").alias("n_changes"),
            F.max_by("digest", "epoch").alias("last_digest"),
        )
    )
    return {r["url"]: r for r in agg.collect()}


def test_obs_batch_collapses_and_canonicalizes(spark):
    obs = {
        r["url"]: r
        for r in fetch_obs_batch(
            spark.createDataFrame(
                [
                    ("HTTP://Example.COM:80/a?utm_source=f", "d2"),
                    (_A, "d1"),
                    (_B, "x1"),
                    (_B, "x1"),
                ],
                "url string, digest string",
            )
        ).collect()
    }
    # messy variant collapses onto the canonical row; duplicate
    # fetches pick max digest; one observation per URL
    assert set(obs) == {_A, _B}
    assert obs[_A]["digest"] == "d2"
    assert obs[_B]["digest"] == "x1"


def test_update_state_batch_increments(spark):
    obs = fetch_obs_batch(
        spark.createDataFrame(
            [(_A, "d2"), (_B, "x1"), (_C, "z1")],
            "url string, digest string",
        )
    )
    prior = spark.createDataFrame(
        [(_A, 1, 0, "d1", 0), (_B, 2, 1, "x1", 0)],
        "url string, n_fetches bigint, n_changes bigint,"
        " last_digest string, seq bigint",
    ).select(
        F.expr("crc32(url) % 64").cast("int").alias("b"),
        "url", "n_fetches", "n_changes", "last_digest", "seq",
    )
    upd = {
        r["url"]: r
        for r in update_state_batch(obs, prior, seq=1).collect()
    }
    assert upd[_A]["n_fetches"] == 2 and upd[_A]["n_changes"] == 1
    assert upd[_B]["n_fetches"] == 3 and upd[_B]["n_changes"] == 1
    assert upd[_C]["n_fetches"] == 1 and upd[_C]["n_changes"] == 0
    assert all(r["seq"] == 1 for r in upd.values())


def test_counters_update_across_batches(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "state")
    summaries: list[dict] = []
    q = attach_recrawl_stream(
        _stream(spark, spool),
        out,
        on_summary=summaries.append,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    try:
        for n, rows in enumerate((_B0, _B1, _B2)):
            _write_batch(spark, spool, n, rows)
            q.processAllAvailable()
    finally:
        q.stop()

    st = _final_state(spark, out)
    assert st[_A]["n_fetches"] == 3  # messy variant hit the canon row
    assert st[_A]["n_changes"] == 1  # d1 -> d2, then stable
    assert st[_A]["last_digest"] == "d2"
    assert st[_B]["n_fetches"] == 2  # in-batch duplicate = 1 obs
    assert st[_B]["n_changes"] == 0
    assert st[_C]["n_fetches"] == 2
    assert st[_C]["n_changes"] == 1 and st[_C]["last_digest"] == "z2"

    assert [s["batch_id"] for s in summaries] == [0, 1, 2]
    assert summaries[0]["n_new"] == 2 and summaries[0]["n_urls"] == 2
    assert summaries[1]["n_new"] == 1  # only C
    assert summaries[2]["n_changed_ever"] == 2  # A and C

    # stream ≡ batch twin: a lag-window recompute over the full
    # history agrees with the incrementally-maintained state
    want = _twin(spark, (_B0, _B1, _B2))
    assert set(want) == set(st)
    for url, w in want.items():
        got = st[url]
        assert (
            got["n_fetches"],
            got["n_changes"],
            got["last_digest"],
        ) == (w["n_fetches"], w["n_changes"], w["last_digest"]), url


def test_base_index_seeds_state(spark, tmp_path):
    base = str(tmp_path / "base")
    out = str(tmp_path / "state")
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    init_recrawl_index(
        spark.createDataFrame(
            [(_A, 3, 2, "d0")],
            "url string, n_fetches bigint, n_changes bigint,"
            " last_digest string",
        ),
        base,
    )
    q = attach_recrawl_stream(
        _stream(spark, spool),
        out,
        index_path=base,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    try:
        _write_batch(spark, spool, 0, [(_A, "d1"), (_B, "x1")])
        q.processAllAvailable()
    finally:
        q.stop()
    st = _final_state(spark, out)
    # A continues from the artifact's counters; B starts fresh
    assert st[_A]["n_fetches"] == 4 and st[_A]["n_changes"] == 3
    assert st[_A]["last_digest"] == "d1"
    assert st[_B]["n_fetches"] == 1 and st[_B]["n_changes"] == 0


def test_restart_replay_is_exactly_once(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    summaries: list[dict] = []

    q = attach_recrawl_stream(
        _stream(spark, spool), out,
        on_summary=summaries.append, checkpoint_dir=ck,
    )
    try:
        _write_batch(spark, spool, 0, _B0)
        q.processAllAvailable()
    finally:
        q.stop()

    q2 = attach_recrawl_stream(
        _stream(spark, spool), out,
        on_summary=summaries.append, checkpoint_dir=ck,
    )
    try:
        q2.processAllAvailable()  # replays committed batch 0
        _write_batch(spark, spool, 1, _B1)
        q2.processAllAvailable()
    finally:
        q2.stop()

    st = _final_state(spark, out)
    assert st[_A]["n_fetches"] == 2 and st[_A]["n_changes"] == 1
    assert [s["batch_id"] for s in summaries] == [0, 1]
    # no duplicate delta rows for any (url, seq)
    rows = IdempotentParquetSink(out).read_committed(spark).collect()
    keys = [(r["url"], r["seq"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_state_probe_prunes_partitions(spark, tmp_path):
    base = str(tmp_path / "base")
    init_recrawl_index(
        spark.createDataFrame(
            [(f"http://example.com/p{i}", 1, 0, "d") for i in range(50)],
            "url string, n_fetches bigint, n_changes bigint,"
            " last_digest string",
        ),
        base,
    )
    probe = spark.read.parquet(base).where(F.col("b").isin([2, 9]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "b#" in plan
    assert {r["b"] for r in probe.collect()} <= {2, 9}


def test_schedule_formulas_match_batch_operator(spark):
    """schedule_from_state applies the oracle-checked batch formulas:
    interval floor(budget/(changes+1))+1 and p over n_fetches-1
    intervals."""
    st = spark.createDataFrame(
        [
            (0, _A, 5, 4, "d", 3),
            (1, _B, 3, 0, "x", 3),
            (2, _C, 1, 0, "z", 3),
        ],
        "b int, url string, n_fetches bigint, n_changes bigint,"
        " last_digest string, seq bigint",
    )
    got = {r["url"]: r for r in schedule_from_state(st).collect()}
    assert got[_A]["p_change_r"] == 1.0
    assert got[_A]["interval_i"] == 8 // 5 + 1
    assert got[_B]["p_change_r"] == 0.0 and got[_B]["interval_i"] == 9
    # single fetch: zero observed intervals clamps to 1, p stays 0
    assert got[_C]["p_change_r"] == 0.0
    assert got[_A]["host"] == "example.com"


def test_sink_compaction_preserves_state_fold(spark, tmp_path):
    """After folding committed delta batches into one compact
    generation, latest_state still sees every (url, seq) delta — so a
    later batch keeps incrementing from the compacted state instead
    of restarting counters."""
    from streamlit_flink_demo_spark.sinks import compact_sink

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out = str(tmp_path / "state")
    ck = str(tmp_path / "ck")

    q = attach_recrawl_stream(_stream(spark, spool), out, checkpoint_dir=ck)
    try:
        _write_batch(spark, spool, 0, _B0)
        q.processAllAvailable()
        _write_batch(spark, spool, 1, _B1)
        q.processAllAvailable()
    finally:
        q.stop()

    folded = compact_sink(spark, out, target_partitions=1)
    assert folded == 2

    q2 = attach_recrawl_stream(_stream(spark, spool), out, checkpoint_dir=ck)
    try:
        _write_batch(spark, spool, 2, _B2)
        q2.processAllAvailable()
    finally:
        q2.stop()

    st = _final_state(spark, out)
    # counters continued across the compaction boundary
    assert st[_A]["n_fetches"] == 3 and st[_A]["n_changes"] == 1
    assert st[_C]["n_fetches"] == 2 and st[_C]["n_changes"] == 1
