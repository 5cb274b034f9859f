"""Resumable full-registry oracle parity sweep at any scale factor.

    python tools/full_parity_sweep.py [SF_DIR] [OUT_JSONL]

Runs every registered query with an oracle through the driver's exact
comparison (sort columns by name, sort rows, exact values) against the
DuckDB replay, appending one JSON line per query to OUT_JSONL as it
goes — interrupt and re-run to resume (already-recorded names are
skipped). The committed sf0.1 runs of this script are the
"three-scale parity evidence" COVERAGE.md cites.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from streamlit_flink_demo_spark.plans import load_all  # noqa: E402
from streamlit_flink_demo_spark.sources.catalog import (  # noqa: E402
    TABLES,
    table_path,
)


def canon(rows, cols):
    df = pd.DataFrame(rows, columns=cols)
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")

    def norm(v):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return v

    return [
        tuple(norm(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/parity_sweep.jsonl"
    )
    done = set()
    if os.path.exists(out_path):
        with open(out_path) as fh:
            for line in fh:
                try:
                    done.add(json.loads(line)["name"])
                except ValueError:
                    pass

    from streamlit_flink_demo_spark.session import get_spark

    spark = get_spark("full_parity_sweep")
    reg = load_all(exposed_only=False)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf, t)}')"
        )
    only = {
        n.strip()
        for n in os.environ.get("SWEEP_ONLY", "").split(",")
        if n.strip()
    }
    names = sorted(
        n
        for n, rq in reg.items()
        if rq.oracle and (not only or n in only)
    )
    n_fail = 0
    for name in names:
        if name in done:
            continue
        rq = reg[name]
        t0 = time.perf_counter()
        try:
            sdf = rq.fn(spark, sf)
            srows = canon(
                [tuple(r) for r in sdf.collect()], sdf.columns
            )
            res = con.execute(rq.oracle)
            drows = canon(res.fetchall(), [d[0] for d in res.description])
            ok = srows == drows
            rec = {
                "name": name,
                "match": ok,
                "rows": len(srows),
                "sec": round(time.perf_counter() - t0, 1),
            }
        except Exception as ex:  # noqa: BLE001 — record and continue
            rec = {
                "name": name,
                "match": False,
                "error": str(ex)[:300],
                "sec": round(time.perf_counter() - t0, 1),
            }
        if not rec["match"]:
            n_fail += 1
        with open(out_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(f"{name}: {'MATCH' if rec['match'] else 'FAIL'} "
              f"({rec['sec']}s)", flush=True)
    print(f"swept {len(names)} queries at {sf}; failures this run: "
          f"{n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
