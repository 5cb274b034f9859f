"""One-query oracle parity check: ``python tools/check_query.py NAME [SF_DIR]``.

Same canonicalization as tests/driver_sim.py, for fast iteration on a
single registered query without running the whole surface.
"""
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from streamlit_flink_demo_spark.plans import load_all
from streamlit_flink_demo_spark.sources.catalog import TABLES, table_path


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
    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    reg = load_all(exposed_only=False)
    rq = reg[name]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t0 = time.time()
    sdf = rq.fn(spark, sf)
    srows = [tuple(r) for r in sdf.collect()]
    ts = time.time() - t0
    print(f"spark: {len(srows)} rows in {ts:.1f}s cols={sdf.columns}")
    if not rq.oracle:
        print("rows-only query (no oracle)")
        return 0
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf, t)}')"
        )
    t0 = time.time()
    res = con.execute(rq.oracle)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]
    print(f"duck : {len(drows)} rows in {time.time()-t0:.1f}s cols={dcols}")
    if sorted(sdf.columns) != sorted(dcols):
        print("COLS MISMATCH")
        return 1
    if len(srows) != len(drows):
        print("ROWCOUNT MISMATCH")
        return 1
    s, d = canon(srows, sdf.columns), canon(drows, dcols)
    bad = [(a, b) for a, b in zip(s, d) if a != b]
    if bad:
        print(f"VALUE MISMATCH: {len(bad)} rows; first 3:")
        for a, b in bad[:3]:
            print("  spark:", a)
            print("  duck :", b)
        return 1
    print("MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
