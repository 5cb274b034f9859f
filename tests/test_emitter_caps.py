"""Bounded microbatch consumption: keyed cap, stateless-gated keyless
limit, stateful full-drain, replay-safe truncation accounting."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from streamlit_flink_demo_spark.sources.stream_fixtures import (
    user_row,
    user_stream,
    write_user_batch,
)
from streamlit_flink_demo_spark.streaming.emitter import ChangelogEmitter


def _keyed_df(spark, n):
    return spark.range(0, n).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )


def test_keyed_cap_bounds_driver_rows_and_flags(spark):
    e = ChangelogEmitter(["k", "v"], ["k"], keyed_batch_cap=100)
    e(_keyed_df(spark, 1000), 0)
    # snapshot bounded by the cap, not the batch's 1000 changed keys
    assert len(e._snapshot) <= 100
    assert e.truncated_batches == 1
    # emitted ops equal what was consumed
    assert e.buffer.size() == len(e._snapshot)


def test_keyed_uncapped_still_collects_all(spark):
    e = ChangelogEmitter(["k", "v"], ["k"])
    e(_keyed_df(spark, 500), 0)
    assert len(e._snapshot) == 500
    assert e.truncated_batches == 0


def test_truncation_not_double_counted_on_replay(spark):
    e = ChangelogEmitter(["k", "v"], ["k"], keyed_batch_cap=50)
    df = _keyed_df(spark, 200)
    e(df, 0)
    assert e.truncated_batches == 1
    e(df, 0)  # restart replay of the same batch id
    assert e.truncated_batches == 1  # replay dedup runs first


def test_keyless_stateless_uses_limit_and_truncates(spark):
    e = ChangelogEmitter(["k", "v"], [], keyless_batch_cap=50)
    df = _keyed_df(spark, 300)
    assert e._is_stateful(df) is False  # plain projection: limit path
    e(df, 0)
    assert e.buffer.size() == 50
    assert e.truncated_batches == 1


def test_bounded_collect_caps_and_reports(spark):
    rows, truncated = ChangelogEmitter._bounded_collect(_keyed_df(spark, 400), 100)
    assert truncated and len(rows) == 100
    rows, truncated = ChangelogEmitter._bounded_collect(_keyed_df(spark, 40), 100)
    assert not truncated and len(rows) == 40


def test_facade_marks_projection_stateless_and_distinct_stateful(spark):
    """The statements façade proves statelessness on the ANALYZED
    streaming plan (the batch df is opaque in Python foreachBatch):
    a pure projection gets the cheap CollectLimit consume, a DISTINCT
    keeps the safe full drain."""
    import tempfile as _tf

    from streamlit_flink_demo_spark.statements import StatementsService

    spool = os.path.join(_tf.mkdtemp(prefix="facade_cap_"), "spool")
    user_stream(spark, spool).createOrReplaceTempView("user")
    svc = StatementsService(spark)
    env_proj = svc.create("SELECT guid, eyeColor FROM user")
    env_dist = svc.create("SELECT DISTINCT eyeColor FROM user")
    try:
        proj = svc._statements[env_proj["name"]]
        dist = svc._statements[env_dist["name"]]
        assert proj.emitter._plan_stateful is False
        assert dist.emitter._plan_stateful is True
        write_user_batch(spark, spool, 0, [user_row(i) for i in range(30)])
        svc.process_available(env_proj["name"])
        svc.process_available(env_dist["name"])
        assert proj.buffer.size() == 30
        assert dist.buffer.size() >= 1
    finally:
        svc.stop(env_proj["name"])
        svc.stop(env_dist["name"])


def test_keyless_stateful_stream_drains_without_commit_error(spark):
    """dropDuplicates with no aggregation → keyless but STATEFUL
    batches: the capped consume must still drain every partition
    (state-store commit) instead of planning a CollectLimit. Regression
    guard for STATE_STORE_COMMIT_VALIDATION_FAILED."""
    tmp = tempfile.mkdtemp(prefix="emitcap_")
    spool = os.path.join(tmp, "spool")
    stream = user_stream(spark, spool).dropDuplicates(["guid"]).select(
        "guid", "eyeColor"
    )
    e = ChangelogEmitter(["guid", "eyeColor"], [], keyless_batch_cap=25)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            stream.writeStream.outputMode("update")
            .foreachBatch(e)
            .option(
                "checkpointLocation", os.path.join(tmp, "ck")
            )
            .start()
        )
        try:
            write_user_batch(spark, spool, 0, [user_row(i) for i in range(80)])
            q.processAllAvailable()
            assert q.exception() is None
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert e._plan_stateful is True  # detected the state store
    assert e.buffer.size() == 25  # bounded by the cap
    assert e.truncated_batches == 1


def test_snapshot_high_water_and_eviction_cap(spark):
    """VERDICT r4 #4: the keyed shadow snapshot must not grow silently.
    Past snapshot_key_warn the high-water mark is recorded (surfaced in
    the statement envelope); with snapshot_key_cap set, oldest keys are
    evicted so resident snapshot size is bounded by the cap."""
    e = ChangelogEmitter(
        ["k", "v"], ["k"], snapshot_key_warn=200, snapshot_key_cap=300
    )
    e(_keyed_df(spark, 1000), 0)
    assert e.snapshot_high_water == 1000
    assert len(e._snapshot) == 300
    assert e.evicted_snapshot_keys == 700
    # an evicted key's next change re-emits +I (lossy, monotone):
    e(_keyed_df(spark, 1), 1)  # k0 was evicted (oldest-inserted)
    from streamlit_flink_demo_spark.changelog import OP_INSERT

    recs, _ = e.buffer.read(e.buffer.size() - 1, 1)
    assert recs[0]["op"] == OP_INSERT and recs[0]["row"][0] == "k0"


def test_snapshot_warning_reaches_envelope(spark, tmp_path):
    """A keyed statement whose result cardinality crosses the warn
    threshold must surface it in the envelope's status detail."""
    from streamlit_flink_demo_spark.statements import StatementsService

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    user_stream(spark, spool).createOrReplaceTempView("user_snapwarn")
    os.environ["SPARK_GRAFT_SNAPSHOT_KEY_WARN"] = "10"
    try:
        svc = StatementsService(spark)
        env = svc.create(
            "SELECT guid, count(*) AS n FROM user_snapwarn GROUP BY guid"
        )
        try:
            write_user_batch(
                spark, spool, 0, [user_row(i) for i in range(40)]
            )
            svc.process_available(env["name"])
            detail = svc.get(env["name"])["status"]["detail"]
            assert "snapshot_keys_high_water=40" in detail
        finally:
            svc.stop(env["name"])
    finally:
        del os.environ["SPARK_GRAFT_SNAPSHOT_KEY_WARN"]
