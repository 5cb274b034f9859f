"""Cross-engine deterministic hashing.

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
algorithms, so any operator whose *values* depend on a hash (minhash,
simhash, fingerprints, LSH) would be untestable against the DuckDB
oracle.  md5 is the one digest both engines produce bit-identically, so
every hash-dependent operator here derives integers from md5:

    u60(x) = int(hex(md5(x))[:15], 16)        # 60 bits, fits BIGINT

Spark:   CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
DuckDB:  ('0x' || substr(md5(x), 1, 15))::UBIGINT::BIGINT

md5 per row is ~100ns JVM-side — fine even at 100 TB scale (it stays
inside whole-stage codegen; no Python boundary).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def u60(col: Column) -> Column:
    """60-bit unsigned int from md5(col), as BIGINT (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def u60_sql(expr: str) -> str:
    """DuckDB fragment computing the same 60-bit integer."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::UBIGINT::BIGINT)"
