"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the engine's registered operator inventory
(streamlit_flink_demo_spark/plans registry) for the driver's DuckDB
oracle comparison at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from streamlit_flink_demo_spark.plans import load_all

    return load_all()


def _configure(spark: SparkSession) -> None:
    """Apply engine-required session configs (the driver may hand us a
    session built elsewhere). ANSI must be off for Flink-compatible
    cast-to-null semantics (SURVEY.md §4)."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    _configure(spark)
    reg = _registry()
    return reg["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    reg = _registry()

    def wrap(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return reg[name].fn(spark, sf_dir)

        run.__name__ = name
        return run

    return {name: wrap(name) for name in sorted(reg)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the
    genuinely non-SQL-expressible ops → rows-only check)."""
    reg = _registry()
    return {name: rq.oracle for name, rq in sorted(reg.items()) if rq.oracle}
