#!/usr/bin/env python
"""Benchmark harness (SURVEY.md §6 / BASELINE.md).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": "<dir>"}

Each query executes to completion through the noop sink (full plan
runs, nothing materializes on the driver) — measuring engine work, not
collect() serialization. Set BENCH_QUERIES=comma,list to restrict.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = {
        q for q in os.environ.get("BENCH_QUERIES", "").split(",") if q
    } or None

    from streamlit_flink_demo_spark.plans import load_all
    from streamlit_flink_demo_spark.session import get_spark

    spark = get_spark("bench")
    reg = load_all()

    # Warm the JVM + parquet footers with a trivial action so query #1
    # doesn't pay session startup.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    repeat = max(1, int(os.environ.get("BENCH_REPEAT", "2")))
    timings: dict[str, float] = {}
    for name in sorted(reg):
        if only is not None and name not in only:
            continue
        fn = reg[name].fn
        best = None
        try:
            # best-of-N: first run pays whole-stage-codegen compilation
            # and page-cache warmup; the best run is the steady-state
            # number a long-lived engine delivers.
            for _ in range(repeat):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as ex:  # keep the bench running; flag the query
            timings[name] = -1.0
            print(f"BENCH ERROR {name}: {ex}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "batch_query_set_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )
    return 0 if all(t >= 0 for t in timings.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
