"""Data-layout optimization: Z-order clustering + zone-map skipping.

At 100 TB the cheapest query is the one that never reads the file:
engines prune parquet files whose column min/max (zone maps) cannot
satisfy the predicate. A time-sorted layout prunes time predicates
only; a Z-ORDER layout (interleave the bits of two dimensions and
range-partition on the interleaved key) bounds EVERY file's extent in
BOTH dimensions, so multi-dimensional predicates skip most files —
the Delta/Iceberg `OPTIMIZE ZORDER BY` lever, here as a first-class
measurable operator rather than folklore.

``events_zorder_skipping`` simulates both layouts over the events
table at a fixed file count, builds each file's zone map, applies the
classic two-dimensional slice predicate through the zone maps exactly
the way a scan planner would (read a file iff its [min,max] box
intersects the predicate rectangle), and reports files/rows read per
layout — quantified, oracle-replayed data skipping. The write-side
production form is one line on top of the same key:
``df.repartitionByRange(N, zorder_col).sortWithinPartitions(...)``;
the simulation computes the identical file assignment (equal Z-ranges)
without writing files, so the decision("does Z-order pay for this
table?") can be made from a query, not a rewrite.

Everything is integer arithmetic (bit interleave via div/mod, counts,
mins/maxes), so the DuckDB replay is exact; the bit-interleave
expression is emitted from ONE template for both dialects (the only
split: Spark's `div` vs DuckDB's `//` integer division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.plans import register
from streamlit_flink_demo_spark.sources.catalog import load_table

_ZBITS = 8  # bits per dimension -> z in [0, 65536)
_ZFILES = 64  # simulated file count per layout
_EPOCH0 = 1704067200  # 2024-01-01T00:00:00Z, the corpus origin
# predicate rectangle: a (user bucket) 4..7, b (time bucket) 96..159.
# The a-range sits inside every SF's user-id span (sf0.001 has users
# 0..14), so the predicate is non-empty at all test scales.
_A_LO, _A_HI, _B_LO, _B_HI = 4, 7, 96, 159


def _dims_sql(spark_dialect: bool) -> tuple[str, str]:
    """a = user bucket, b = 3-hour time bucket clamped to 8 bits."""
    ep = (
        "unix_timestamp(ts)"
        if spark_dialect
        else "CAST(floor(epoch(ts)) AS BIGINT)"
    )
    dv = "div" if spark_dialect else "//"
    return (
        "user_id % 256 AS a",
        f"least(greatest((({ep} - {_EPOCH0}) {dv} 3600) {dv} 3, 0), 255)"
        " AS b",
    )


def _z_sql(spark_dialect: bool) -> str:
    """Bit-interleave a (odd positions) and b (even positions)."""
    dv = "div" if spark_dialect else "//"
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((a {dv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((b {dv} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def _zorder_oracle() -> str:
    dims = ", ".join(_dims_sql(spark_dialect=False))
    z = _z_sql(spark_dialect=False)
    fw = (1 << (2 * _ZBITS)) // _ZFILES  # z-range width per file
    pred = (
        f"a BETWEEN {_A_LO} AND {_A_HI} AND b BETWEEN {_B_LO} AND {_B_HI}"
    )
    return f"""
WITH pts AS MATERIALIZED (
  SELECT a, b, ({z}) AS z FROM (SELECT {dims} FROM events)
),
files AS (
  SELECT 'time' AS layout, (b * {_ZFILES}) // 256 AS file_id, a, b
  FROM pts
  UNION ALL
  SELECT 'zorder' AS layout, z // {fw} AS file_id, a, b FROM pts
),
zonemap AS (
  SELECT layout, file_id,
         MIN(a) AS min_a, MAX(a) AS max_a,
         MIN(b) AS min_b, MAX(b) AS max_b,
         COUNT(*) AS n_rows
  FROM files GROUP BY layout, file_id
),
matched AS (
  SELECT COUNT(*) AS n FROM pts WHERE {pred}
)
SELECT layout,
       COUNT(*)::BIGINT AS n_files,
       SUM(n_rows)::BIGINT AS n_rows_total,
       SUM(CASE WHEN min_a <= {_A_HI} AND max_a >= {_A_LO}
                 AND min_b <= {_B_HI} AND max_b >= {_B_LO}
                THEN 1 ELSE 0 END)::BIGINT AS files_read,
       SUM(CASE WHEN min_a <= {_A_HI} AND max_a >= {_A_LO}
                 AND min_b <= {_B_HI} AND max_b >= {_B_LO}
                THEN n_rows ELSE 0 END)::BIGINT AS rows_read,
       (SELECT CAST(n AS BIGINT) FROM matched) AS rows_matched
FROM zonemap GROUP BY layout
"""


@register(
    "events_zorder_skipping",
    oracle=_zorder_oracle(),
    tags=("layout", "scale"),
    expose=False,
)
def events_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified zone-map data skipping under a time-sorted vs a
    Z-ordered file layout (64 simulated files each): per layout, the
    number of files and rows a min/max-pruning scan planner must read
    to answer the two-dimensional slice predicate (user-bucket range ×
    time range). One pass computes the dims and the interleaved key;
    two integer aggregations build the zone maps; the planner's
    intersect-the-box decision is replayed exactly by the oracle.
    The time layout cannot skip on the user dimension (every file
    spans all users), so it reads every file the time range touches;
    the Z layout bounds both dimensions per file and reads a fraction.
    Write-side form of the same key: repartitionByRange(N, z) +
    sortWithinPartitions — turning this report into the layout is one
    shuffle."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.selectExpr(*_dims_sql(spark_dialect=True)).selectExpr(
        "a", "b", f"({_z_sql(spark_dialect=True)}) AS z"
    )
    fw = (1 << (2 * _ZBITS)) // _ZFILES
    files = pts.selectExpr(
        "'time' AS layout",
        f"(b * {_ZFILES}) div 256 AS file_id",
        "a",
        "b",
    ).unionAll(
        pts.selectExpr(
            "'zorder' AS layout", f"z div {fw} AS file_id", "a", "b"
        )
    )
    zonemap = files.groupBy("layout", "file_id").agg(
        F.min("a").alias("min_a"),
        F.max("a").alias("max_a"),
        F.min("b").alias("min_b"),
        F.max("b").alias("max_b"),
        F.count("*").alias("n_rows"),
    )
    read = (
        (F.col("min_a") <= _A_HI)
        & (F.col("max_a") >= _A_LO)
        & (F.col("min_b") <= _B_HI)
        & (F.col("max_b") >= _B_LO)
    )
    matched = pts.filter(
        (F.col("a").between(_A_LO, _A_HI))
        & (F.col("b").between(_B_LO, _B_HI))
    ).agg(F.count("*").cast("bigint").alias("rows_matched"))
    return (
        zonemap.groupBy("layout")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("n_rows_total"),
            F.sum(F.when(read, 1).otherwise(0))
            .cast("bigint")
            .alias("files_read"),
            F.sum(F.when(read, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_read"),
        )
        .crossJoin(F.broadcast(matched))
        .select(
            "layout",
            "n_files",
            "n_rows_total",
            "files_read",
            "rows_read",
            "rows_matched",
        )
    )
