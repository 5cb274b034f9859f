"""Deterministic cross-engine numeric aggregation helpers.

Problem: ``SUM(double)`` is order-dependent; Spark's partial/final
aggregation and DuckDB's parallel aggregation sum in different orders,
so the low bits differ and the driver's value-hash comparison fails.

Pattern used by every money-sum in this engine:

    CAST(SUM(CAST(<per-row double expr> AS DECIMAL(18,6))) AS DOUBLE)

- the per-row double expression is IEEE-deterministic (same value in
  any engine),
- the double→decimal(18,6) cast rounds to a fixed scale chosen so every
  true value in the data is ON the 6-decimal grid (inputs have ≤2
  decimals; triple products have ≤6) — no rounding ties, so Spark's
  HALF_UP and DuckDB's rounding agree,
- the decimal SUM is exact integer arithmetic (order-independent),
- the final decimal→double cast is deterministic.

Why precision 18 (not higher): per-row Decimal values with precision
≤ 18 stay long-backed in Spark (no BigDecimal allocation on the cast
path — measured ~2× faster than wider casts); the SUM accumulator is
auto-widened (Spark → DECIMAL(28,6), DuckDB → DECIMAL(38,6)), so group
totals do not overflow even at 100 TB aggregate magnitudes. A
bigint-scaled fixed-point sum would be ~2× faster still but silently
wraps past ±9.2e12 in micro-units — unacceptable at scale.

This is also the right thing at 100 TB: decimal sums stay in Tungsten
whole-stage codegen with map-side partial aggregation; no UDF, no
precision drift across billions of rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "DECIMAL(18,6)"


def dsum(expr: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM of a double expression, returned as DOUBLE."""
    col = F.expr(expr) if isinstance(expr, str) else expr
    out = F.sum(col.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(expr: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum cast to double, divided
    by the group count (double division is deterministic)."""
    col = F.expr(expr) if isinstance(expr, str) else expr
    out = F.sum(col.cast(DEC)).cast("double") / F.count(col)
    return out.alias(alias) if alias else out


def dsum_sql(expr: str, alias: str) -> str:
    """The equivalent ANSI SQL fragment for the DuckDB oracle."""
    return f"CAST(SUM(CAST(({expr}) AS {DEC})) AS DOUBLE) AS {alias}"


def bsum_sql(expr: str, alias: str) -> str:
    """Integer SUM for the DuckDB oracle, pinned to BIGINT.

    DuckDB widens SUM(integer) to HUGEINT (int128) while Spark's
    SUM(int) is BIGINT; the external driver's value hasher serializes
    the two differently even when every value is equal (a plain
    Python ``==`` compare hides it). Every integer SUM an oracle
    exposes as an output column must therefore be cast back to
    BIGINT. tests/driver_sim.py enforces this with a result-schema
    lint (no HUGEINT column may reach the compare).
    """
    return f"CAST(SUM({expr}) AS BIGINT) AS {alias}"


def davg_sql(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS {DEC})) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )
