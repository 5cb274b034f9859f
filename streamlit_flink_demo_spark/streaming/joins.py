"""Stream-stream interval joins (event time, watermark-bounded state).

The reference platform's engine (Flink) treats the interval join as a
first-class streaming operator (`a.ts BETWEEN b.ts - x AND b.ts + y`);
Structured Streaming expresses the same semantics as a plain join with
a time-range predicate once BOTH sides carry watermarks — Spark then
derives the state-retention bound from the watermark delta plus the
interval width and evicts matched state automatically (no unbounded
join buffers; see the Structured Streaming stream-stream join
semantics). This module packages that recipe so callers get the Flink
shape without re-deriving the watermark algebra.

Scale posture: the join keys on (key, time-bucket) — state per
executor is bounded by (watermark + interval) × input rate for its key
range; no global state, no driver involvement. Skewed keys behave like
any keyed stream state (salt upstream if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events occurring within ``[left_ts + lower,
    left_ts + upper]`` of a left-side event with the same ``key``.

    Columns are disambiguated with ``l_`` / ``r_`` prefixes (the join
    key keeps one unprefixed copy). ``how`` is ``inner`` or
    ``left_outer``; the outer variant emits the null-padded left row
    only once the watermark proves no match can still arrive — the
    same late-data contract Flink's interval join gives its outer
    variant."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported interval-join type: {how!r}")
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    l_pref = lw.select(
        F.col(key).alias("k"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in lw.columns
            if c != key
        ],
    )
    r_pref = rw.select(
        F.col(key).alias("rk"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in rw.columns
            if c != key
        ],
    )
    lts, rts = F.col(f"l_{left_ts}"), F.col(f"r_{right_ts}")
    cond = (
        (F.col("k") == F.col("rk"))
        & (rts >= lts + F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    joined = l_pref.join(r_pref, cond, how)
    return joined.select(
        F.col("k").alias(key),
        *[c for c in joined.columns if c.startswith(("l_", "r_"))],
    )
