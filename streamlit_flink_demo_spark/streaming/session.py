"""Event-time session windows over a stream (gap-based sessionization).

Flink exposes ``SESSION(ts, INTERVAL ...)`` group windows; Structured
Streaming's native counterpart is ``F.session_window(ts, gap)``:
per-key windows that OPEN at an event, EXTEND while successive events
arrive within ``gap``, and CLOSE (emit, in append mode) once the
watermark passes session end — which also makes cross-micro-batch
session MERGING automatic (two fragments of one burst arriving in
different batches fuse into a single session row; Spark keeps the
merge state keyed, bounded by the watermark).

The batch operator `events_sessionized` (plans/analytics.py) computes
the same sessions with a lag()-window formulation; this module is the
STREAMING path, and its test pins stream ≡ batch-twin equality on
finalized sessions — the two formulations must agree row-for-row.

Scale posture: state is (key, open-session) only, evicted at the
watermark; no driver state, no unbounded buffers. Skewed keys shard
like any keyed state.

Reference scope: Flink session group-windows
(`streamlit-flink-demo`'s engine supports them natively; the demo's
own statements stop at plain GROUP BY — this is §2-adjacent streaming
breadth, same tier as the interval join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_window_agg(
    events: DataFrame,
    key: str = "user_id",
    *,
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str | None = None,
) -> DataFrame:
    """Per-(key, session) aggregate: (key, session_start, session_end,
    n_events[, sum_value]). Works identically on a batch DataFrame
    (no watermark applied there) — the parity contract the tests pin.
    """
    if events.isStreaming:
        events = events.withWatermark(ts, watermark)
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        events.groupBy(
            F.session_window(F.col(ts), gap).alias("sw"), F.col(key)
        )
        .agg(*aggs)
        .select(
            key,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            *(["sum_value"] if value_col is not None else []),
        )
    )
