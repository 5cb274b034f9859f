"""Physical-plan linter: machine-check a DataFrame for the
anti-patterns that kill 100 TB jobs.

The engine's own test suite asserts these properties plan-by-plan
(tests/test_plans.py); ``lint_plan`` packages the same checks as a
user-facing API so pipeline authors can gate THEIR queries the same
way (e.g. in CI: ``assert not errors(lint_plan(df))`` before a
production submit). Rules read the physical plan only — no execution.

Rules:

- ``cartesian-product`` (error): a CartesianProduct node — the
  all-pairs shuffle that cannot survive a large join side.
- ``rowwise-python-udf`` (error): BatchEvalPython — row-at-a-time
  Python in the row path (10-100x slower than Arrow; see the UDF
  guidance in README). Arrow-batched Python (ArrowEvalPython /
  mapInPandas) is reported as ``arrow-python`` (info): legitimate
  for dense-linear-algebra kernels, but worth seeing.
- ``nested-loop-join`` (warning): BroadcastNestedLoopJoin — fine for
  k-row broadcast sides (the engine uses it for trained-model cross
  joins), quadratic disaster otherwise; the rule surfaces it so the
  author decides.
- ``shuffle-join`` (info): SortMergeJoin / ShuffledHashJoin — a
  corpus-wide exchange per side; expected for big-big joins, a miss
  when one side should have been broadcast.
- ``unpushed-filter`` (warning): a parquet scan whose node detail
  shows ``PushedFilters: []`` while a Filter sits in the plan — the
  predicate is evaluated after IO instead of pruning it (non-
  foldable expressions over scan columns do this silently).
- ``exchange-count`` (info): total Exchange nodes — the shuffle
  budget of the plan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

_ERROR, _WARNING, _INFO = "error", "warning", "info"


@dataclass(frozen=True)
class Finding:
    rule: str
    severity: str
    detail: str


def _plan_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            mode
        )
    )


def lint_plan(df: DataFrame, *, allow: tuple[str, ...] = ()) -> list[Finding]:
    """Lint ``df``'s physical plan; ``allow`` suppresses rules by
    name (e.g. ``allow=("nested-loop-join",)`` for a deliberate
    k-row-broadcast cross join)."""
    p = _plan_str(df)
    tree = p.split("\n\n")[0]
    out: list[Finding] = []

    def add(rule: str, severity: str, detail: str) -> None:
        if rule not in allow:
            out.append(Finding(rule, severity, detail))

    n = tree.count("CartesianProduct")
    if n:
        add("cartesian-product", _ERROR, f"{n} CartesianProduct node(s)")
    n = tree.count("BatchEvalPython")
    if n:
        add(
            "rowwise-python-udf",
            _ERROR,
            f"{n} BatchEvalPython node(s) — use pandas_udf/Arrow",
        )
    n = tree.count("ArrowEvalPython") + tree.count("MapInPandas")
    if n:
        add("arrow-python", _INFO, f"{n} Arrow-batched Python node(s)")
    n = tree.count("BroadcastNestedLoopJoin")
    if n:
        add(
            "nested-loop-join",
            _WARNING,
            f"{n} BroadcastNestedLoopJoin node(s) — verify the build "
            "side is k-row",
        )
    n = tree.count("SortMergeJoin") + tree.count("ShuffledHashJoin")
    if n:
        add(
            "shuffle-join",
            _INFO,
            f"{n} shuffle join(s) — check whether a side is "
            "broadcast-able",
        )
    # unpushed filters: a Filter node exists, and some parquet scan
    # carries nothing to the reader — either an explicit empty
    # PushedFilters list or (as Spark prints for fully non-pushable
    # predicates, e.g. Python UDFs) no PushedFilters line at all.
    # Heuristic: in a multi-scan plan the unfiltered scan may be a
    # different branch than the Filter — a warning, not an error.
    if re.search(r"Filter", tree):
        empty = len(re.findall(r"PushedFilters: \[\]", p))
        scan_blocks = re.findall(
            r"\(\d+\) Scan parquet.*?(?=\n\n)", p, re.DOTALL
        )
        missing = sum(
            1 for b in scan_blocks if "PushedFilters" not in b
        )
        if empty + missing:
            add(
                "unpushed-filter",
                _WARNING,
                f"{empty + missing} parquet scan(s) with no pushed "
                "filters below a Filter — predicate runs after IO",
            )
    n = tree.count("Exchange")
    add("exchange-count", _INFO, f"{n} Exchange node(s) in the plan")
    return out


def errors(findings: list[Finding]) -> list[Finding]:
    """The gate-worthy subset."""
    return [f for f in findings if f.severity == _ERROR]
