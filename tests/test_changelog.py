"""Changelog algebra unit + property tests (SURVEY.md §5.1).

Covers the semantics the reference implements in lib/flink.py:21-131:
op validation, arity checks, remove-by-value with warning on absent,
keep-alive skipping, and the collapse ≡ incremental-fold invariant.
"""

from __future__ import annotations

import logging

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from streamlit_flink_demo_spark.changelog import (
    Changelog,
    ChangelogError,
    MaterializedTable,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
)

COLS = ["eyeColor", "n"]


def rec(op, *row):
    return {"op": op, "row": list(row)}


def test_insert_update_sequence():
    t = MaterializedTable(COLS)
    t.apply([rec(OP_INSERT, "brown", 1)])
    t.apply([rec(OP_UPDATE_BEFORE, "brown", 1), rec(OP_UPDATE_AFTER, "brown", 2)])
    assert t.rows == [["brown", 2]]


def test_delete_removes_single_copy():
    t = MaterializedTable(COLS)
    t.apply([rec(OP_INSERT, "blue", 1), rec(OP_INSERT, "blue", 1)])
    t.apply([rec(OP_DELETE, "blue", 1)])
    assert t.rows == [["blue", 1]]


def test_retract_absent_warns_not_raises(caplog):
    t = MaterializedTable(COLS)
    with caplog.at_level(logging.WARNING):
        t.apply([rec(OP_UPDATE_BEFORE, "green", 9)])
    assert len(t) == 0
    assert any("absent" in r.message for r in caplog.records)


def test_no_op_record_appends():
    t = MaterializedTable(COLS)
    t.apply([{"row": ["brown", 7]}])
    assert t.rows == [["brown", 7]]


def test_unknown_op_raises():
    t = MaterializedTable(COLS)
    with pytest.raises(ChangelogError):
        t.apply([rec(7, "brown", 1)])


def test_changelog_validates_arity():
    cl = Changelog(COLS, iter([{"op": OP_INSERT, "row": ["brown"]}]))
    with pytest.raises(ChangelogError):
        cl.consume(1)


def test_changelog_keepalive_stops_consume():
    src = iter([rec(OP_INSERT, "a", 1), None, rec(OP_INSERT, "b", 2)])
    cl = Changelog(COLS, src)
    assert len(cl.consume(10)) == 1  # stops at keep-alive
    assert len(cl.consume(10)) == 1  # resumes after
    assert cl.ops_received == {"+I": 2}


def test_cursor_carries_across_consumes():
    src = iter([rec(OP_INSERT, "a", i) for i in range(5)])
    cl = Changelog(COLS, src)
    assert len(cl.consume(2)) == 2
    assert len(cl.consume(2)) == 2
    assert len(cl.consume(2)) == 1
    assert len(cl.history) == 5


# -- property: collapse == incremental fold ---------------------------------

_ops = st.sampled_from([OP_INSERT, OP_UPDATE_BEFORE, OP_UPDATE_AFTER, OP_DELETE])
_rows = st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 3))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_ops, _rows), max_size=40))
def test_collapse_equals_incremental_fold(history):
    records = [rec(op, *row) for op, row in history]
    cl = Changelog(COLS, iter(records))
    cl.consume(len(records) + 1)
    collapsed = cl.collapse()

    incremental = MaterializedTable(COLS)
    for r in records:
        incremental.apply([r])
    assert collapsed == incremental


def test_retract_then_reapply_is_identity():
    """-U immediately followed by +U of the same row preserves state."""
    t1 = MaterializedTable(COLS, [["a", 1], ["b", 2]])
    t2 = MaterializedTable(COLS, [["a", 1], ["b", 2]])
    t2.apply([rec(OP_UPDATE_BEFORE, "a", 1), rec(OP_UPDATE_AFTER, "a", 1)])
    assert t1 == t2
