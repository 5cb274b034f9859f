"""Custom stateful streaming operators via applyInPandasWithState.

The escape hatch for semantics Spark's built-in streaming aggregates
can't express (SURVEY.md §2.5 / pyspark guide): per-group state with
arbitrary Python transition logic, Arrow-batched.

``streaming_first_seen`` — stateful streaming deduplication: emit only
the FIRST occurrence of each key across the whole stream. This is the
streaming twin of the batch dedup operators (operators/dedup.py): at
ingest time a 100 TB pipeline drops duplicate documents before they
ever hit storage. State per key is a single boolean-sized marker, so
the state store grows with distinct keys only; pair with watermark
eviction when keys are time-scoped.

(Spark's built-in ``dropDuplicates`` covers the exact-key case
natively — this module exists to demonstrate and test the custom-
state pattern, and to carry per-key payloads dropDuplicates can't,
e.g. first-seen timestamp + occurrence count.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def streaming_first_seen(
    df: DataFrame, key_col: str, out_schema: str
) -> DataFrame:
    """Emit each key's first-seen row, plus a running duplicate count
    carried in state (emitted as ``n_dupes_so_far`` on first sight = 0).

    out_schema must be "<key type>, ... , n_dupes_so_far bigint" and
    match the non-key columns selected below. The transition closure is
    self-contained (cloudpickle by value — executors don't import us).
    """

    def transition(key, pdfs, state):
        seen = state.exists
        n = state.get[0] if seen else 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if not seen:
                row = pdf.iloc[[0]].copy()
                row["n_dupes_so_far"] = 0
                n += len(pdf) - 1
                seen = True
                yield row
            else:
                n += len(pdf)
        state.update((n,))

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            transition,
            outputStructType=out_schema,
            stateStructType="n bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
