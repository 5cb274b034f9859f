"""Distributed linear algebra over the embedding table.

``embeddings_pca_power``: the top principal direction of the (uncentered)
embedding Gram matrix via fixed-iteration power iteration, and every
vector's projection onto it — the whitening/compression primitive a
training-data pipeline runs before clustering or quality filtering
(SemDeDup-style pipelines project onto leading components first).

Reference scope: the reference engine (a thin REST client over remote
Flink SQL, ``lib/flink.py:21-131``) has no linear-algebra operators;
this is extension scope for the 100 TB training-data pipeline, next to
the k-means / PageRank iterative family.

Architecture (the Spark-first split):
- the O(N·d²) Gram accumulation is DISTRIBUTED: an Arrow
  ``mapInPandas`` kernel emits one exact int64 partial X^T X per
  record batch (a d²-row frame), and one ``groupBy(i,j)`` partial-agg
  shuffle folds the partials — per-executor traffic is d² rows no
  matter how many input rows it scanned, the matrix analogue of a
  map-side combine;
- the O(d²·T) power iteration runs on the DRIVER over the collected
  d×d = 64×64 matrix (bounded by construction, like the IVF training
  sample and k-means seeds) at plan-build time;
- the O(N·d) projection is a JVM higher-order function over the
  broadcast-literal component (zero Python in the per-row path).

Determinism (the scaled-integer pattern): embeddings quantize to
``round(x·1000)`` BIGINT, so the Gram is EXACT integer arithmetic —
order-independent across any partitioning. The iteration normalizes
through ``round(double-of-exact-ints)`` steps whose IEEE expression
shape is replayed verbatim by the oracle's unrolled CTEs, and the
driver mirrors SQL ``round`` (half away from zero) exactly, so the
component vector — and every projection — is bit-identical to the
DuckDB replay.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.plans import register, track_persist
from streamlit_flink_demo_spark.sources.catalog import load_spread

_DIM = 64
_XS = 1000.0  # embedding quantization scale (3 decimals)
_GS = float(1 << 30)  # normalized-Gram scale
_VS = float(1 << 16)  # iteration-vector scale
_ITERS = 4


def _rha(x: float) -> int:
    """Round half away from zero, exactly as SQL ``round(DOUBLE)``
    (DuckDB std::round / Spark HALF_UP). ``abs(x) - floor(abs(x))`` is
    exact in IEEE double (Sterbenz), so the >= 0.5 test is exact."""
    a = abs(x)
    f = math.floor(a)
    r = f + (1 if a - f >= 0.5 else 0)
    return int(-r if x < 0 else r)


def _power_iterate(gram: dict[tuple[int, int], int]) -> list[int]:
    """The driver-side recurrence — every arithmetic step mirrors one
    oracle CTE (exact ints between steps; double ops in the same
    association order as the SQL expressions)."""
    gmax = max(abs(g) for g in gram.values())
    gp = {
        ij: _rha(float(g) * _GS / float(gmax)) for ij, g in gram.items()
    }
    v = [int(_VS)] * _DIM
    for _ in range(_ITERS):
        y = [
            sum(gp[(i, j)] * v[j] for j in range(_DIM))
            for i in range(_DIM)
        ]
        m = max(abs(t) for t in y)
        v = [_rha(float(t) * _VS / float(m)) for t in y]
    return v


def _xq_col() -> F.Column:
    return F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(_XS), 0).cast("bigint"),
    )


def _gram_partials(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    acc = np.zeros((_DIM, _DIM), dtype=np.int64)
    seen = False
    for pdf in batches:
        if not len(pdf):
            continue
        x = np.stack(pdf["xq"].to_numpy()).astype(np.int64)
        acc += x.T @ x  # exact int64: |x|<=~600 -> safe to ~2^52 rows
        seen = True
    if seen:
        ii, jj = np.indices((_DIM, _DIM))
        yield pd.DataFrame(
            {"i": ii.ravel() + 1, "j": jj.ravel() + 1, "g": acc.ravel()}
        )


def _oracle_sql() -> str:
    steps = [
        f"""xq AS MATERIALIZED (
  SELECT vec_id, i,
         CAST(round(CAST(embedding[i] AS DOUBLE) * {_XS!r}) AS BIGINT) AS x
  FROM embeddings, range(1, {_DIM + 1}) AS t(i)
)""",
        """g AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS g
  FROM xq a JOIN xq b ON a.vec_id = b.vec_id
  GROUP BY a.i, b.i
)""",
        "gm AS (SELECT MAX(ABS(g)) AS m FROM g)",
        f"""gp AS MATERIALIZED (
  SELECT i, j,
         CAST(round(CAST(g.g AS DOUBLE) * {_GS!r} / CAST(gm.m AS DOUBLE))
              AS BIGINT) AS g
  FROM g CROSS JOIN gm
)""",
        f"""v0 AS (
  SELECT i, CAST({int(_VS)} AS BIGINT) AS v
  FROM range(1, {_DIM + 1}) AS t(i)
)""",
    ]
    for t in range(_ITERS):
        steps.append(
            f"""y{t} AS (
  SELECT gp.i AS i, CAST(SUM(gp.g * v.v) AS BIGINT) AS y
  FROM gp JOIN v{t} v ON gp.j = v.i GROUP BY gp.i
)"""
        )
        steps.append(f"m{t} AS (SELECT MAX(ABS(y)) AS m FROM y{t})")
        steps.append(
            f"""v{t + 1} AS MATERIALIZED (
  SELECT i,
         CAST(round(CAST(y AS DOUBLE) * {_VS!r} / CAST(m.m AS DOUBLE))
              AS BIGINT) AS v
  FROM y{t} CROSS JOIN m{t} AS m
)"""
        )
    return (
        "WITH "
        + ",\n".join(steps)
        + f"""
SELECT p.vec_id, e.label,
       p.proj_q,
       ROUND(CAST(p.proj_q AS DOUBLE) / {_XS * _VS!r}, 6) AS proj
FROM (
  SELECT xq.vec_id, CAST(SUM(xq.x * v.v) AS BIGINT) AS proj_q
  FROM xq JOIN v{_ITERS} v ON xq.i = v.i
  GROUP BY xq.vec_id
) p JOIN embeddings e ON p.vec_id = e.vec_id
"""
    )


@register(
    "embeddings_pca_power",
    oracle=_oracle_sql(),
    tags=("linalg", "iterative", "pca"),
    expose=False,
)
def embeddings_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction (uncentered, {_ITERS} power iterations)
    of the quantized embedding Gram matrix + per-vector projection.
    Gram: distributed exact-int64 Arrow matmul partials folded by one
    (i,j) partial-agg shuffle; iteration: driver-side over the 64x64
    collect (bounded); projection: JVM zip_with/aggregate over the
    literal component. proj_q is exact; proj its 6-digit decimal."""
    emb = track_persist(
        load_spread(spark, sf_dir, "embeddings", min_bytes=32 << 20).select(
            "vec_id", "label", _xq_col().alias("xq")
        )
    )
    gram_df = (
        emb.select("xq")
        .mapInPandas(_gram_partials, schema="i int, j int, g long")
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
    )
    gram = {
        (r["i"] - 1, r["j"] - 1): r["g"] for r in gram_df.collect()
    }
    v = _power_iterate(gram)
    v_lit = F.array(*[F.lit(c).cast("bigint") for c in v])
    proj_q = F.aggregate(
        F.zip_with(F.col("xq"), v_lit, lambda x, w: x * w),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        "label",
        proj_q.alias("proj_q"),
        F.round(proj_q.cast("double") / F.lit(_XS * _VS), 6).alias("proj"),
    )
