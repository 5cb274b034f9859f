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
    # expose=False marks a suite member: still registered (so the local
    # parity tests verify it individually against its own oracle) but
    # hidden from __spark_entry__.queries(). The external driver checks
    # at most the first 50 query names per round, so near-duplicate
    # breadth queries are consolidated into family suites
    # (plans/suites.py) that union their members under one name — the
    # member's semantics stay oracle-checked inside the suite AND on
    # their own in tests/test_oracle_parity.py.
    expose: bool = True


REGISTRY: dict[str, RegisteredQuery] = {}

# Prepared-plan cache: building a registered query's DataFrame costs
# real driver time (py4j expression construction + logical-plan
# assembly — measured 2-4 s for the 9-13-branch family suites), and the
# plan for a given (session, query, sf_dir) is immutable. Long-lived
# engines cache compiled plans (a prepared-statement cache); ours lives
# here so EVERY caller — bench, façade, driver — gets steady-state
# dispatch on repeat execution. Execution state (persist/cache of DATA)
# is unaffected: re-executing a cached plan re-runs it against current
# storage, and `spark.catalog.clearCache()` hygiene works as before.
_PLAN_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def clear_plan_cache() -> None:
    _PLAN_CACHE.clear()


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    expose: bool = True,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def cached_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            key = (id(spark), name, sf_dir)
            df = _PLAN_CACHE.get(key)
            if df is None:
                df = fn(spark, sf_dir)
                _PLAN_CACHE[key] = df
            return df

        cached_fn.__name__ = fn.__name__
        cached_fn.__doc__ = fn.__doc__
        cached_fn.__wrapped__ = fn  # uncached original, for tests
        REGISTRY[name] = RegisteredQuery(
            name=name,
            fn=cached_fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
            expose=expose,
        )
        return fn

    return deco


def load_all(exposed_only: bool = True) -> dict[str, RegisteredQuery]:
    """Import every plan/operator module so registration side-effects run.

    ``exposed_only=True`` (the driver surface) returns the ≤50 curated
    names; ``exposed_only=False`` additionally returns suite members,
    for tests that verify each member against its own oracle.
    """
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
        sampling,
        similarity,
        skew,
        text,
    )

    # suites compose the modules above — import LAST (reads REGISTRY)
    from streamlit_flink_demo_spark.plans import suites  # noqa: F401

    if exposed_only:
        return {n: q for n, q in REGISTRY.items() if q.expose}
    return dict(REGISTRY)
