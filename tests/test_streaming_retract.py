"""Streaming retract-semantics tests (SURVEY.md §5.3).

Feed scripted microbatches of `user` rows through the statements
façade running the reference's three continuous queries
(dashboard.py:83,100,118-132) and assert the emitted changelog op
sequences match Flink's documented retract behavior
(api/statements.py:160-169): first row of a key → +I; change → -U
old, +U new, adjacent and in order.
"""

from __future__ import annotations

import pytest

from streamlit_flink_demo_spark.changelog import Changelog, MaterializedTable
from streamlit_flink_demo_spark.sources.stream_fixtures import (
    user_stream,
    write_user_batch,
)
from streamlit_flink_demo_spark.statements import StatementsService

EYE_SQL = "SELECT eyeColor, count(*) AS eye_color_count FROM user GROUP BY eyeColor"

# the reference's map query (dashboard.py:100), verbatim shape
MAP_SQL = """
SELECT `user`.guid,
       37.7 + (RAND() * (37.77 - 37.7)) AS latitude,
       -122.50 + (RAND() * (-122.39 - (-122.50))) AS longitude
FROM `user`
"""

# the reference's age-group query (dashboard.py:118-132), verbatim shape
AGE_SQL = """
WITH users_with_age_groups AS (
  SELECT
    CASE
      WHEN age BETWEEN 20 AND 29 THEN '20-29'
      WHEN age BETWEEN 30 AND 39 THEN '30-39'
      WHEN age BETWEEN 40 AND 49 THEN '40-49'
      WHEN age BETWEEN 50 AND 59 THEN '50-59'
      ELSE 'other'
    END AS age_group,
    CAST(substring(balance FROM 2) AS DOUBLE) AS balance_double
  FROM `user`
)
SELECT age_group, AVG(balance_double) AS avg_balance
FROM users_with_age_groups
GROUP BY age_group
"""


def _mk(spark, tmp_path, sql, **kw):
    spool = str(tmp_path / "spool")
    user_stream(spark, spool).createOrReplaceTempView("user")
    svc = StatementsService(spark)
    env = svc.create(sql, checkpoint_dir=str(tmp_path / "ckpt"), **kw)
    assert env["status"]["phase"] == "running", env["status"]["detail"]
    return svc, env, spool


def _drain(svc, env, cl: Changelog) -> list[tuple]:
    svc.process_available(env["name"])
    new = []
    while True:
        got = cl.consume(100)
        new.extend(got)
        if len(got) < 100:
            break
    return new


def test_groupby_count_retract_sequence(spark, tmp_path):
    svc, env, spool = _mk(spark, tmp_path, EYE_SQL)
    cols = [c["name"] for c in env["status"]["traits"]["schema"]["columns"]]
    assert cols == ["eyeColor", "eye_color_count"]
    cl = Changelog(cols, svc.results(env["name"], continuous_query=True))

    write_user_batch(spark, spool, 0, [{"guid": "g1", "eyeColor": "brown",
                                        "age": 30, "balance": "$10.00",
                                        "name": "u", "registered": None}])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    assert ops == [(0, ("brown", 1))]  # first key → +I

    write_user_batch(spark, spool, 1, [{"guid": "g2", "eyeColor": "brown",
                                        "age": 31, "balance": "$11.00",
                                        "name": "u", "registered": None}])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    assert ops == [(1, ("brown", 1)), (2, ("brown", 2))]  # -U then +U

    write_user_batch(spark, spool, 2, [{"guid": "g3", "eyeColor": "blue",
                                        "age": 32, "balance": "$12.00",
                                        "name": "u", "registered": None}])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    assert ops == [(0, ("blue", 1))]  # unrelated key untouched

    # materialization: the snapshot equals the batch answer
    table = cl.collapse()
    assert sorted(map(tuple, table.rows)) == [("blue", 1), ("brown", 2)]
    svc.stop(env["name"])


def test_map_query_appends_with_bounds(spark, tmp_path):
    svc, env, spool = _mk(spark, tmp_path, MAP_SQL)
    cols = [c["name"] for c in env["status"]["traits"]["schema"]["columns"]]
    assert cols == ["guid", "latitude", "longitude"]
    cl = Changelog(cols, svc.results(env["name"], continuous_query=True))

    from streamlit_flink_demo_spark.sources.stream_fixtures import user_row

    write_user_batch(spark, spool, 0, [user_row(i) for i in range(20)])
    recs = _drain(svc, env, cl)
    assert len(recs) == 20
    assert all(r["op"] == 0 for r in recs)  # projection: append-only +I
    for r in recs:
        _, lat, lon = r["row"]
        assert 37.7 <= lat <= 37.77
        assert -122.50 <= lon <= -122.39
    svc.stop(env["name"])


def test_age_group_avg_with_cast_null_semantics(spark, tmp_path):
    svc, env, spool = _mk(spark, tmp_path, AGE_SQL)
    cols = [c["name"] for c in env["status"]["traits"]["schema"]["columns"]]
    cl = Changelog(cols, svc.results(env["name"], continuous_query=True))

    # $25.50 parses; $1,100.00 has a comma → CAST yields NULL (ANSI off)
    write_user_batch(spark, spool, 0, [
        {"guid": "a", "eyeColor": "brown", "age": 25, "balance": "$25.50",
         "name": "u", "registered": None},
        {"guid": "b", "eyeColor": "blue", "age": 27, "balance": "$1,100.00",
         "name": "u", "registered": None},
    ])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    # both rows are 20-29; NULL excluded from AVG → avg = 25.50
    assert ops == [(0, ("20-29", 25.5))]

    # second parseable balance moves the average → retract pair
    write_user_batch(spark, spool, 1, [
        {"guid": "c", "eyeColor": "green", "age": 22, "balance": "$74.50",
         "name": "u", "registered": None},
    ])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    assert ops == [(1, ("20-29", 25.5)), (2, ("20-29", 50.0))]
    svc.stop(env["name"])


def test_restart_recovery_exactly_once(spark, tmp_path):
    """The SURVEY §7 'hardest risk': after a stop/restart with the
    same checkpoint, committed batches must NOT re-emit (the emitter's
    snapshot rehydration + batch-id dedup), and the retract stream
    must continue from the recovered state — the first post-restart
    change to an existing key emits -U of the PRE-restart value."""
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    user_stream(spark, spool).createOrReplaceTempView("user")

    def user(g, color):
        return {"guid": g, "eyeColor": color, "age": 30,
                "balance": "$10.00", "name": "u", "registered": None}

    svc1 = StatementsService(spark)
    env1 = svc1.create(EYE_SQL, checkpoint_dir=ckpt)
    cols = [c["name"] for c in env1["status"]["traits"]["schema"]["columns"]]
    cl1 = Changelog(cols, svc1.results(env1["name"], continuous_query=True))
    write_user_batch(spark, spool, 0, [user("g1", "brown")])
    write_user_batch(spark, spool, 1, [user("g2", "brown")])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc1, env1, cl1)]
    assert ops == [(0, ("brown", 1)), (1, ("brown", 1)), (2, ("brown", 2))]
    svc1.stop(env1["name"])

    # restart against the same checkpoint: fresh service, fresh buffer
    user_stream(spark, spool).createOrReplaceTempView("user")
    svc2 = StatementsService(spark)
    env2 = svc2.create(EYE_SQL, checkpoint_dir=ckpt)
    cl2 = Changelog(cols, svc2.results(env2["name"], continuous_query=True))
    # no new data: recovery must emit NOTHING (committed batches skip)
    assert _drain(svc2, env2, cl2) == []
    # new data: continues from recovered count 2, retracting it first
    write_user_batch(spark, spool, 2, [user("g3", "brown")])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc2, env2, cl2)]
    assert ops == [(1, ("brown", 2)), (2, ("brown", 3))]
    svc2.stop(env2["name"])


TOP1_SQL = (
    "SELECT eyeColor, count(*) AS n FROM user "
    "GROUP BY eyeColor ORDER BY n DESC, eyeColor LIMIT 1"
)


def test_complete_mode_emits_delete_on_key_exit(spark, tmp_path):
    """Streaming ORDER BY/LIMIT runs in complete output mode; when the
    leader changes, the displaced key must leave the result as a -D
    (op 3, reference api/statements.py:167) — the one op code update
    mode can never produce."""
    svc, env, spool = _mk(
        spark, tmp_path, TOP1_SQL, key_cols=["eyeColor"], output_mode="complete"
    )
    cols = [c["name"] for c in env["status"]["traits"]["schema"]["columns"]]
    cl = Changelog(cols, svc.results(env["name"], continuous_query=True))

    def user(g, color):
        return {"guid": g, "eyeColor": color, "age": 30,
                "balance": "$10.00", "name": "u", "registered": None}

    write_user_batch(spark, spool, 0, [user("g1", "brown"), user("g2", "brown")])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    assert ops == [(0, ("brown", 2))]  # +I leader

    # green overtakes: 3 > 2 → brown exits (-D), green enters (+I)
    write_user_batch(
        spark, spool, 1, [user("g3", "green"), user("g4", "green"),
                          user("g5", "green")]
    )
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    assert (0, ("green", 3)) in ops
    assert (3, ("brown", 2)) in ops  # the -D

    # materialized snapshot is just the current leader
    table = cl.collapse()
    assert sorted(map(tuple, table.rows)) == [("green", 3)]
    svc.stop(env["name"])


WINDOWED_SQL = (
    "SELECT window(registered, '1 hour') AS window, eyeColor, "
    "count(*) AS n FROM user "
    "GROUP BY window(registered, '1 hour'), eyeColor"
)


def test_windowed_continuous_query_retracts_per_window(spark, tmp_path):
    """Event-time tumbling windows through the façade with INFERRED
    (window, eyeColor) keys: same color in different hours is two
    keys (+I each); a repeat inside one hour retracts only that
    window's row."""
    from datetime import datetime

    svc, env, spool = _mk(spark, tmp_path, WINDOWED_SQL)
    cols = [c["name"] for c in env["status"]["traits"]["schema"]["columns"]]
    assert cols == ["window", "eyeColor", "n"]
    cl = Changelog(cols, svc.results(env["name"], continuous_query=True))

    def user(g, color, hour, minute):
        return {"guid": g, "eyeColor": color, "age": 30, "balance": "$1.00",
                "name": "u", "registered": datetime(2024, 1, 1, hour, minute)}

    write_user_batch(spark, spool, 0, [user("g1", "brown", 10, 5)])
    ops = [(r["op"], r["row"][0]["start"].hour, tuple(r["row"][1:]))
           for r in _drain(svc, env, cl)]
    assert ops == [(0, 10, ("brown", 1))]

    # same color, NEXT hour → new key, +I only (no retraction of hour 10)
    write_user_batch(spark, spool, 1, [user("g2", "brown", 11, 15)])
    ops = [(r["op"], r["row"][0]["start"].hour, tuple(r["row"][1:]))
           for r in _drain(svc, env, cl)]
    assert ops == [(0, 11, ("brown", 1))]

    # repeat inside hour 10 → retract exactly that window's row
    write_user_batch(spark, spool, 2, [user("g3", "brown", 10, 45)])
    ops = [(r["op"], r["row"][0]["start"].hour, tuple(r["row"][1:]))
           for r in _drain(svc, env, cl)]
    assert ops == [(1, 10, ("brown", 1)), (2, 10, ("brown", 2))]
    svc.stop(env["name"])


def test_complete_mode_restart_recovery(spark, tmp_path):
    """Complete-mode (full-snapshot diff) restart: committed batches
    don't re-emit; after recovery a leader change still produces the
    -D of the PRE-restart leader — the shadow snapshot and Spark's
    state store stay consistent across the restart boundary."""
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    user_stream(spark, spool).createOrReplaceTempView("user")

    def user(g, color):
        return {"guid": g, "eyeColor": color, "age": 30,
                "balance": "$10.00", "name": "u", "registered": None}

    svc1 = StatementsService(spark)
    env1 = svc1.create(
        TOP1_SQL, key_cols=["eyeColor"], checkpoint_dir=ckpt,
        output_mode="complete",
    )
    cols = [c["name"] for c in env1["status"]["traits"]["schema"]["columns"]]
    cl1 = Changelog(cols, svc1.results(env1["name"], continuous_query=True))
    write_user_batch(spark, spool, 0, [user("g1", "brown"), user("g2", "brown")])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc1, env1, cl1)]
    assert ops == [(0, ("brown", 2))]
    svc1.stop(env1["name"])

    user_stream(spark, spool).createOrReplaceTempView("user")
    svc2 = StatementsService(spark)
    env2 = svc2.create(
        TOP1_SQL, key_cols=["eyeColor"], checkpoint_dir=ckpt,
        output_mode="complete",
    )
    cl2 = Changelog(cols, svc2.results(env2["name"], continuous_query=True))
    assert _drain(svc2, env2, cl2) == []  # no re-emission on recovery
    write_user_batch(
        spark, spool, 1,
        [user("g3", "green"), user("g4", "green"), user("g5", "green")],
    )
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc2, env2, cl2)]
    assert (0, ("green", 3)) in ops
    assert (3, ("brown", 2)) in ops  # -D of the pre-restart leader
    svc2.stop(env2["name"])


CASE_SQL = """
SELECT CASE WHEN age < 40 THEN 'young' ELSE 'older' END AS bucket,
       count(*) AS n
FROM `user`
GROUP BY CASE WHEN age < 40 THEN 'young' ELSE 'older' END
"""


def test_groupby_expression_infers_keys_from_plan(spark, tmp_path):
    """GROUP BY <CASE expression> (the reference's age-group shape,
    dashboard.py:121-126, without the CTE alias): the key must be
    derived from the ANALYZED plan's grouping expressions — the regex
    over the SQL text sees no plain identifier — so per-group
    retraction works without callers passing key_cols."""
    svc, env, spool = _mk(spark, tmp_path, CASE_SQL)
    cols = [c["name"] for c in env["status"]["traits"]["schema"]["columns"]]
    assert cols == ["bucket", "n"]
    assert env["status"]["phase"] == "running"
    keys = svc._statements[env["name"]].emitter.key_idx
    assert keys == [0], "plan-derived key must be the aliased CASE column"
    cl = Changelog(cols, svc.results(env["name"], continuous_query=True))

    def user(g, age):
        return {"guid": g, "eyeColor": "brown", "age": age,
                "balance": "$1.00", "name": "u", "registered": None}

    write_user_batch(spark, spool, 0, [user("g1", 30), user("g2", 50)])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    assert sorted(ops) == [(0, ("older", 1)), (0, ("young", 1))]

    # second young user: ONLY the young bucket retracts
    write_user_batch(spark, spool, 1, [user("g3", 25)])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    assert ops == [(1, ("young", 1)), (2, ("young", 2))]
    svc.stop(env["name"])


def test_windowed_restart_recovery_struct_keys(spark, tmp_path):
    """Restart with WINDOW-STRUCT group keys: the JSON snapshot must
    round-trip the (start, end) timestamps exactly, so recovery emits
    nothing for already-seen windows and the first post-restart change
    retracts the typed pre-restart row (ADVICE: default=str snapshots
    made every rehydrated key miss)."""
    from datetime import datetime

    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    user_stream(spark, spool).createOrReplaceTempView("user")

    def user(g, hour, minute):
        return {"guid": g, "eyeColor": "brown", "age": 30, "balance": "$1.00",
                "name": "u", "registered": datetime(2024, 1, 1, hour, minute)}

    svc1 = StatementsService(spark)
    env1 = svc1.create(WINDOWED_SQL, checkpoint_dir=ckpt)
    cols = [c["name"] for c in env1["status"]["traits"]["schema"]["columns"]]
    cl1 = Changelog(cols, svc1.results(env1["name"], continuous_query=True))
    write_user_batch(spark, spool, 0, [user("g1", 10, 5)])
    ops = [(r["op"], r["row"][0]["start"].hour, tuple(r["row"][1:]))
           for r in _drain(svc1, env1, cl1)]
    assert ops == [(0, 10, ("brown", 1))]
    svc1.stop(env1["name"])

    user_stream(spark, spool).createOrReplaceTempView("user")
    svc2 = StatementsService(spark)
    env2 = svc2.create(WINDOWED_SQL, checkpoint_dir=ckpt)
    cl2 = Changelog(cols, svc2.results(env2["name"], continuous_query=True))
    # recovery must be silent — the rehydrated window key matches live
    assert _drain(svc2, env2, cl2) == []
    # change inside the pre-restart window → -U of the recovered row
    write_user_batch(spark, spool, 1, [user("g2", 10, 45)])
    ops = [(r["op"], r["row"][0]["start"].hour, tuple(r["row"][1:]))
           for r in _drain(svc2, env2, cl2)]
    assert ops == [(1, 10, ("brown", 1)), (2, 10, ("brown", 2))]
    svc2.stop(env2["name"])


def test_three_concurrent_continuous_queries(spark, tmp_path):
    """The reference dashboard runs 3 continuous statements at once
    (BASELINE.md); verify concurrent statements don't interfere."""
    spool = str(tmp_path / "spool")
    user_stream(spark, spool).createOrReplaceTempView("user")
    svc = StatementsService(spark)
    envs = [
        svc.create(EYE_SQL, checkpoint_dir=str(tmp_path / "c1")),
        svc.create(MAP_SQL, checkpoint_dir=str(tmp_path / "c2")),
        svc.create(AGE_SQL, checkpoint_dir=str(tmp_path / "c3")),
    ]
    assert all(e["status"]["phase"] == "running" for e in envs)

    from streamlit_flink_demo_spark.sources.stream_fixtures import user_row

    write_user_batch(spark, spool, 0, [user_row(i) for i in range(30)])
    for e in envs:
        svc.process_available(e["name"])

    cls = {
        e["name"]: Changelog(
            [c["name"] for c in e["status"]["traits"]["schema"]["columns"]],
            svc.results(e["name"], continuous_query=True),
        )
        for e in envs
    }
    counts = {}
    for name, cl in cls.items():
        got = cl.consume(500)
        counts[name] = len(got)
    assert counts[envs[0]["name"]] == 3   # three eye colors → 3 × +I
    assert counts[envs[1]["name"]] == 30  # 30 appended locations
    assert counts[envs[2]["name"]] >= 1
    for e in envs:
        svc.stop(e["name"])


def test_keyless_batch_collect_is_capped(spark, tmp_path):
    """A keyless (append-only) statement must never ship an unbounded
    microbatch to the driver: the emitter caps the per-batch collect
    EXECUTOR-side (limit(cap+1)), records the truncation, and surfaces
    it in the envelope detail. VERDICT r2 item 5."""
    svc, env, spool = _mk(spark, tmp_path, "SELECT guid, eyeColor FROM user")
    stmt = svc._statements[env["name"]]
    assert stmt.emitter.key_idx == []  # keyless → append-only path
    stmt.emitter.keyless_batch_cap = 500

    from streamlit_flink_demo_spark.sources.stream_fixtures import user_row

    write_user_batch(spark, spool, 0, [user_row(i) for i in range(5_000)])
    svc.process_available(env["name"])

    assert stmt.buffer.size() == 500  # cap rows, not 5 000
    assert stmt.emitter.truncated_batches == 1
    assert "truncated_batches=1" in svc.get(env["name"])["status"]["detail"]

    # an under-cap batch flows through whole and untruncated
    write_user_batch(spark, spool, 1, [user_row(10_000 + i) for i in range(10)])
    svc.process_available(env["name"])
    assert stmt.buffer.size() == 510
    assert stmt.emitter.truncated_batches == 1
    svc.stop(env["name"])


def test_ephemeral_statement_uses_tmpfs_checkpoint(spark, tmp_path):
    """A statement created WITHOUT checkpoint_dir has no recovery
    contract — its Spark checkpoint (WAL/offsets/state) goes to tmpfs
    when available, and is removed on stop()."""
    import os

    if not (os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)):
        import pytest as _pytest

        _pytest.skip("no /dev/shm on this platform")
    spool = str(tmp_path / "spool")
    user_stream(spark, spool).createOrReplaceTempView("user")
    svc = StatementsService(spark)
    env = svc.create(EYE_SQL)  # no checkpoint_dir
    assert env["status"]["phase"] == "running", env["status"]["detail"]
    stmt = svc._statements[env["name"]]
    assert stmt._tmp_ckpt is not None and stmt._tmp_ckpt.startswith("/dev/shm")
    assert os.path.isdir(stmt._tmp_ckpt)
    ckpt = stmt._tmp_ckpt
    svc.stop(env["name"])
    assert not os.path.exists(ckpt)
    assert stmt._tmp_ckpt is None


def test_global_aggregate_promoted_to_single_row_retracts(spark, tmp_path):
    """``SELECT count(*)`` with no GROUP BY has no upsert key — with
    keys=[] the keyless emitter path would append one stale +I per
    microbatch ([3], [3,5], ...). The facade promotes the statement to
    complete-mode single-row diffing (statements._plan_global_aggregate),
    so the changelog carries -U/+U of the one row."""
    from streamlit_flink_demo_spark.sources.stream_fixtures import user_row

    spool = str(tmp_path / "spool")
    user_stream(spark, spool).createOrReplaceTempView("user_gagg")
    svc = StatementsService(spark)
    env = svc.create(
        "SELECT COUNT(*) AS n FROM user_gagg",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert env["status"]["phase"] == "running", env["status"]["detail"]
    cl = Changelog(["n"], svc.results(env["name"], continuous_query=True))

    write_user_batch(spark, spool, 0, [user_row(i) for i in range(3)])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    assert ops == [(0, (3,))]  # first result row → +I

    write_user_batch(spark, spool, 1, [user_row(i) for i in range(3, 5)])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    assert ops == [(1, (3,)), (2, (5,))]  # -U old count, +U new count

    assert [tuple(r) for r in cl.collapse().rows] == [(5,)]
    svc.stop(env["name"])


TOPN_SQL = """
SELECT eyeColor, count(*) AS n FROM user
GROUP BY eyeColor ORDER BY n DESC, eyeColor LIMIT 2
"""


def test_continuous_topn_emits_ranking_retracts(spark, tmp_path):
    """Flink's continuous Top-N (GROUP BY … ORDER BY agg LIMIT k) as a
    facade statement: Spark only allows the streaming sort in complete
    mode, which the facade promotes to via plan introspection
    (_plan_has_sort); the emitter's snapshot diff then gives exactly
    Top-N retract semantics — +I when a key enters the ranking, -D
    when it falls out, -U/+U when its row changes in place."""
    svc, env, spool = _mk(spark, tmp_path, TOPN_SQL)
    cols = [c["name"] for c in env["status"]["traits"]["schema"]["columns"]]
    assert cols == ["eyeColor", "n"]
    cl = Changelog(cols, svc.results(env["name"], continuous_query=True))

    def u(i, color):
        return {"guid": f"g{i}", "eyeColor": color, "age": 30,
                "balance": "$10.00", "name": "u", "registered": None}

    rows = [u(i, "brown") for i in range(3)]
    rows += [u(10 + i, "blue") for i in range(2)]
    rows += [u(20, "green")]
    write_user_batch(spark, spool, 0, rows)
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    assert sorted(ops) == [(0, ("blue", 2)), (0, ("brown", 3))]

    # green 1+3=4 overtakes: blue leaves the top-2 (-D), green enters
    # (+I), brown row unchanged (silent)
    write_user_batch(
        spark, spool, 1, [u(30 + i, "green") for i in range(3)]
    )
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    assert (0, ("green", 4)) in ops
    assert (3, ("blue", 2)) in ops
    assert not any(row[0] == "brown" for _, row in ops)

    table = cl.collapse()
    assert sorted(map(tuple, table.rows)) == [("brown", 3), ("green", 4)]
    svc.stop(env["name"])


def test_batch_side_sort_does_not_promote_to_complete(spark, tmp_path):
    """A Sort in a BATCH subtree (sorted-LIMIT dim subquery joined to
    the stream) must NOT trigger the Top-N complete-mode promotion —
    Spark allows batch-side sorts in update mode and REJECTS complete
    mode without a streaming aggregation (review finding)."""
    spool = str(tmp_path / "spool")
    user_stream(spark, spool).createOrReplaceTempView("user")
    spark.createDataFrame(
        [("brown", 1), ("blue", 2), ("green", 3)], "color string, pri int"
    ).createOrReplaceTempView("dim_colors")
    sql = """
SELECT u.guid, d.pri FROM user u
JOIN (SELECT color, pri FROM dim_colors ORDER BY pri LIMIT 2) d
  ON u.eyeColor = d.color
"""
    svc = StatementsService(spark)
    env = svc.create(sql, checkpoint_dir=str(tmp_path / "ckpt"))
    assert env["status"]["phase"] == "running", env["status"]["detail"]
    cl = Changelog(
        [c["name"] for c in env["status"]["traits"]["schema"]["columns"]],
        svc.results(env["name"], continuous_query=True),
    )
    write_user_batch(spark, spool, 0, [
        {"guid": "g1", "eyeColor": "brown", "age": 30, "balance": "$1.00",
         "name": "u", "registered": None},
        {"guid": "g2", "eyeColor": "green", "age": 30, "balance": "$1.00",
         "name": "u", "registered": None},
    ])
    ops = [(r["op"], tuple(r["row"])) for r in _drain(svc, env, cl)]
    # only the top-2-priority colors join; appends only
    assert ops == [(0, ("g1", 1))]
    svc.stop(env["name"])
