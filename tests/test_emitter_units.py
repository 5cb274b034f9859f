"""Unit tests for ChangelogEmitter snapshot encoding and keyless
complete-mode semantics (no Spark needed — the emitter's diff logic is
plain Python; streaming end-to-end lives in test_streaming_retract)."""

from __future__ import annotations

import datetime
import decimal

from streamlit_flink_demo_spark.streaming.emitter import (
    ChangelogEmitter,
    _dec,
    _enc,
)

COLS3 = ["k", "ts", "v"]


def test_snapshot_roundtrip_timestamp_and_struct_keys(tmp_path):
    """A rehydrated snapshot must equal live collected values exactly:
    timestamps, dates, decimals, bytes, and window-struct (Row→tuple)
    keys all round-trip, so a restart emits NO spurious +I for
    already-seen keys and -U carries the typed pre-restart row."""
    ckpt = str(tmp_path / "ck")
    ts = datetime.datetime(2024, 1, 1, 10, 0, 0)
    window = (ts, ts + datetime.timedelta(hours=1))  # Row compares as tuple
    row = [window, "brown", decimal.Decimal("12.50"), b"\x00\xff", ts.date()]

    e1 = ChangelogEmitter(
        ["window", "color", "bal", "blob", "d"], ["window", "color"],
        checkpoint_dir=ckpt,
    )
    out = e1.apply_upserts([row])
    assert [o["op"] for o in out] == [0]
    e1._persist(batch_id=0)

    e2 = ChangelogEmitter(
        ["window", "color", "bal", "blob", "d"], ["window", "color"],
        checkpoint_dir=ckpt,
    )
    assert e2._last_batch == 0
    # same row again: key and value must match the rehydrated snapshot
    assert e2.apply_upserts([row]) == []
    # changed value: -U must carry the TYPED pre-restart row
    row2 = list(row)
    row2[2] = decimal.Decimal("13.00")
    out = e2.apply_upserts([row2])
    assert [o["op"] for o in out] == [1, 2]
    assert out[0]["row"] == row  # not a stringified copy


def test_enc_dec_identity_on_nested():
    vals = [
        None, True, 3, 2.5, "s",
        datetime.datetime(2024, 5, 6, 7, 8, 9, 123456),
        datetime.date(2024, 5, 6),
        decimal.Decimal("-0.001"),
        b"\x01\x02",
        (1, (2, "x")),
        [1, [2.0, None]],
        {"a": 1},
    ]
    for v in vals:
        assert _dec(_enc(v)) == v


def test_keyless_complete_single_row_upserts():
    """A global aggregate (complete mode, no GROUP BY) that changes
    must emit -U/+U like the update-mode upsert path, not -D/+I."""
    e = ChangelogEmitter(["total"], [], full_snapshot=True)
    assert [o["op"] for o in e.apply_full_snapshot([[5]])] == [0]
    out = e.apply_full_snapshot([[7]])
    assert [(o["op"], o["row"]) for o in out] == [(1, [5]), (2, [7])]
    # unchanged → silent
    assert e.apply_full_snapshot([[7]]) == []


def test_keyless_complete_multiplicity_preserved():
    """Duplicate rows in a keyless complete-mode result must not
    collapse: multiplicity is diffed per distinct row."""
    e = ChangelogEmitter(["v"], [], full_snapshot=True)
    out = e.apply_full_snapshot([[1], [1], [2]])
    assert sorted((o["op"], o["row"][0]) for o in out) == [(0, 1), (0, 1), (0, 2)]
    # one copy of [1] leaves → exactly one -D
    out = e.apply_full_snapshot([[1], [2]])
    assert [(o["op"], o["row"][0]) for o in out] == [(3, 1)]


def test_keyless_complete_checkpoint_roundtrip(tmp_path):
    ckpt = str(tmp_path / "ck")
    e1 = ChangelogEmitter(["v"], [], full_snapshot=True, checkpoint_dir=ckpt)
    e1.apply_full_snapshot([[1], [1]])
    e1._persist(batch_id=3)
    e2 = ChangelogEmitter(["v"], [], full_snapshot=True, checkpoint_dir=ckpt)
    assert e2._last_batch == 3
    assert e2.apply_full_snapshot([[1], [1]]) == []  # multiplicity recovered
    assert [o["op"] for o in e2.apply_full_snapshot([[1]])] == [3]


def test_full_snapshot_diff_reconstructs_bag_property():
    """Property: for ANY sequence of keyless complete-mode snapshots,
    folding the emitted ops into a bag reproduces each snapshot
    exactly (multiplicity included) — the invariant every changelog
    consumer relies on."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    rows = st.lists(st.integers(min_value=0, max_value=3), max_size=6)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(rows, min_size=1, max_size=6))
    def run(snapshots):
        e = ChangelogEmitter(["v"], [], full_snapshot=True)
        bag: Counter = Counter()
        for snap in snapshots:
            for op in e.apply_full_snapshot([[v] for v in snap]):
                key = tuple(op["row"])
                if op["op"] in (0, 2):  # +I / +U
                    bag[key] += 1
                elif op["op"] in (1, 3):  # -U / -D
                    bag[key] -= 1
            assert +bag == Counter((v,) for v in snap)

    run()


def test_legacy_snapshot_version_ignored(tmp_path):
    """A pre-v2 (default=str) snapshot can't round-trip — rehydration
    must ignore it rather than load corrupted keys."""
    import json
    import os

    ckpt = str(tmp_path / "ck")
    os.makedirs(ckpt)
    with open(os.path.join(ckpt, "snapshot.json"), "w") as f:
        json.dump({"batch_id": 5, "entries": [[["k"], ["k", "2024-01-01 00:00:00"]]]}, f)
    e = ChangelogEmitter(["k", "ts"], ["k"], checkpoint_dir=ckpt)
    assert e._last_batch == -1
    assert e._snapshot == {}


def test_array_and_map_values_in_keys_do_not_crash():
    """Rows carrying lists/dicts (collect_list aggregates, map columns)
    must diff cleanly: snapshot keys are frozen to hashable forms —
    tuple(row) over a list-valued column used to raise TypeError inside
    foreachBatch and kill the query."""
    from streamlit_flink_demo_spark.streaming.emitter import (
        ChangelogEmitter,
    )
    from streamlit_flink_demo_spark.changelog import (
        OP_INSERT,
        OP_UPDATE_AFTER,
        OP_UPDATE_BEFORE,
    )

    # keyless complete mode: the whole row (with a list) is the key
    e = ChangelogEmitter(["n", "colors"], [], full_snapshot=True)
    out1 = e.apply_full_snapshot([[2, ["blue", "brown"]]])
    assert [o["op"] for o in out1] == [OP_INSERT]
    out2 = e.apply_full_snapshot([[3, ["blue", "brown", "green"]]])
    assert [o["op"] for o in out2] == [OP_UPDATE_BEFORE, OP_UPDATE_AFTER]

    # keyed update mode with an ARRAY group key (e.g. window struct
    # already covered; arrays/maps are the remaining unhashables)
    e2 = ChangelogEmitter(["tags", "n"], ["tags"])
    e2.apply_upserts([[["a", "b"], 1]])
    out3 = e2.apply_upserts([[["a", "b"], 2], [{"k": 1}, 5]])
    assert [o["op"] for o in out3] == [
        OP_UPDATE_BEFORE,
        OP_UPDATE_AFTER,
        OP_INSERT,
    ]
