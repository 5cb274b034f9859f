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


def streaming_running_totals(
    df: DataFrame, key_col: str = "user_id", value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum, max) via ``transformWithStateInPandas``
    — the Spark 4 arbitrary-state API (StatefulProcessor + typed state
    handles) next to the classic ``applyInPandasWithState`` operator
    above. Each micro-batch re-emits the updated totals for every key
    it touched (update semantics), which is exactly the changelog-
    upsert shape the emitter consumes.

    State per key is one fixed-size ValueState row; ``ttl_ms`` opts
    into the engine-managed state TTL (idle keys evicted without a
    watermark — the knob applyInPandasWithState lacks). The processor
    class is defined inside this factory so cloudpickle ships it BY
    VALUE — executors never need this module importable (same
    contract as streaming_first_seen's closure).

    Runtime requirement: transformWithState's state protocol is
    protobuf-framed, so ``google.protobuf`` must be importable by the
    Python workers (absent from this sandbox — the pytest is
    env-gated; standard cluster images carry it)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: "StatefulProcessorHandle") -> None:
            self._tot = handle.getValueState(
                "totals", "n bigint, total double, vmax double", ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            if self._tot.exists():
                n, total, vmax = self._tot.get()
            else:
                n, total, vmax = 0, 0.0, float("-inf")
            for pdf in rows:
                if not len(pdf):
                    continue
                n += int(len(pdf))
                total += float(pdf[value_col].sum())
                vmax = max(vmax, float(pdf[value_col].max()))
            self._tot.update((n, total, vmax))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n": [n],
                    "total": [total],
                    "vmax": [vmax],
                }
            )

        def close(self) -> None:
            pass

    # Spark only allows state TTL under processing-time semantics
    # (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL otherwise),
    # so the time mode follows the knob; the key field's type is taken
    # from the input schema rather than assumed.
    key_type = df.schema[key_col].dataType.simpleString()
    return df.groupBy(key_col).transformWithStateInPandas(
        _RunningTotals(),
        outputStructType=f"{key_col} {key_type}, n bigint, total double, "
        "vmax double",
        outputMode="update",
        timeMode="processingtime" if ttl_ms is not None else "none",
    )
