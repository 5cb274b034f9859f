"""Query registry.

Every operator/query the engine claims in SURVEY.md §2 registers here as

    (spark, sf_dir) -> DataFrame        # Spark-first implementation
    oracle: str | None                  # equivalent DuckDB ANSI SQL

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin reads of this
registry; the local test harness (tests/test_oracle_parity.py) runs the
same comparison the driver runs, at sf0.001, so regressions surface
before the round gate.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, RegisteredQuery] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = RegisteredQuery(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return deco


def load_all() -> dict[str, RegisteredQuery]:
    """Import every plan/operator module so registration side-effects run."""
    from streamlit_flink_demo_spark.plans import (  # noqa: F401
        analytics,
        breadth,
        breadth2,
        reference,
        tpch,
        tpch2,
        tpch3,
        windows,
    )
    from streamlit_flink_demo_spark.operators import (  # noqa: F401
        dedup,
        multimodal,
        pipeline,
        similarity,
        skew,
        text,
    )

    return REGISTRY
