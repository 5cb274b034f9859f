"""Unified ingest-compaction job: fold committed streaming tails into
the standing index artifacts (operators/compaction.py).

    python tools/compact_ingest.py vector  ARTIFACT_PATH SINK_PATH
    python tools/compact_ingest.py span    ARTIFACT_PATH SINK_PATH
    python tools/compact_ingest.py dedup   ARTIFACT_PATH DOCS_SINK_PATH
    python tools/compact_ingest.py cdc     ARTIFACT_PATH DOCS_SINK_PATH

Idempotent and crash-safe: re-running from any point folds each
committed batch exactly once (the artifact's delta ledger records
folded ids; an already-committed fold key is a no-op). The vector
tail is truncated after its fold (its rows are redundant copies of
the artifact's); the span/dedup tails are landed-document stores and
are never truncated. Prints one JSON digest line.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from streamlit_flink_demo_spark.operators.compaction import (  # noqa: E402
    compact_cdc_ingest,
    compact_dedup_ingest,
    compact_span_ingest,
    compact_vector_ingest,
)

_ADAPTERS = {
    "vector": compact_vector_ingest,
    "span": compact_span_ingest,
    "dedup": compact_dedup_ingest,
    "cdc": compact_cdc_ingest,
}


def main() -> int:
    if len(sys.argv) != 4 or sys.argv[1] not in _ADAPTERS:
        print(__doc__)
        return 2
    kind, artifact, sink = sys.argv[1], sys.argv[2], sys.argv[3]
    from streamlit_flink_demo_spark.session import get_spark

    spark = get_spark(f"compact-{kind}")
    digest = _ADAPTERS[kind](spark, artifact, sink)
    print(json.dumps({"kind": kind, **digest}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
