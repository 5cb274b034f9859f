"""Capture ``.explain("formatted")`` for registered queries:

    python tools/explain_plan.py NAME[,NAME...] [--out DIR] [--suffix TAG]

Writes ``<out>/<name>_<tag>.txt`` per query (default out plans/r14,
default tag ``after``) at $SPARK_GRAFT_SF_DIR (default sf0.1) so the
committed plan evidence matches the benched scale factor.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamlit_flink_demo_spark.plans import load_all
from streamlit_flink_demo_spark.session import get_spark


_USAGE = (
    "usage: python tools/explain_plan.py NAME[,NAME...] "
    "[--out DIR] [--suffix TAG]"
)


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1].startswith("--"):
        print(_USAGE, file=sys.stderr)
        return 2
    names = sys.argv[1].split(",")
    out_dir = "plans/r14"
    tag = "after"
    args = sys.argv[2:]
    while args:
        a = args.pop(0)
        if a == "--out":
            out_dir = args.pop(0)
        elif a == "--suffix":
            tag = args.pop(0)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain")
    reg = load_all(exposed_only=False)
    os.makedirs(out_dir, exist_ok=True)
    unknown = [n for n in names if n not in reg]
    if unknown:
        print(
            f"unknown query name(s) {unknown}; registry has {len(reg)}",
            file=sys.stderr,
        )
        return 2
    for name in names:
        df = reg[name].fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"===== {name} =====\n{plan}")
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
