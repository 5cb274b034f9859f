"""Local replica of the driver's correctness gate.

For every registered query with an oracle: run the Spark DataFrame and
the DuckDB SQL on the same sf0.001 parquet, sort columns by name, sort
rows, and compare values exactly (hash-equivalent). This is the same
comparison CORRECTNESS_r{N}.json records, so a green run here predicts
a green round.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from streamlit_flink_demo_spark.plans import load_all
from streamlit_flink_demo_spark.sources.catalog import TABLES, table_path

REG = load_all(exposed_only=False)
ORACLE_QUERIES = sorted(n for n, rq in REG.items() if rq.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, rq in REG.items() if not rq.oracle)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def canon(rows, colnames):
    """Sort columns by name, then rows; normalize floats."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return float(v)
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    rq = REG[name]
    sdf = rq.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_con(sf_dir)
    res = con.execute(rq.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={sorted(spark_cols)} "
        f"duck={sorted(duck_cols)}"
    )
    s = canon(spark_rows, spark_cols)
    d = canon(duck_rows, duck_cols)
    assert len(s) == len(d), f"{name}: row count {len(s)} vs {len(d)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    rq = REG[name]
    sdf = rq.fn(spark, sf_dir)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.schema) > 0
