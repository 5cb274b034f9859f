#!/usr/bin/env python
"""End-to-end parity demo: the reference dashboard's lifecycle against
this engine, headless.

Mirrors `/root/reference/dashboard.py` step for step:

1. three continuous statements (grouped count / jittered map projection
   / CTE+CASE age buckets — dashboard.py:83,100,118-132) submitted
   through the statements façade,
2. a JR-style user generator feeding microbatches (README.md:111
   profile: bursts of 10 users),
3. per-statement Changelog consumers doing consume() → Table.update()
   incremental materialization exactly like the Streamlit fragments
   (dashboard.py:86-94,104-113,136-144),
4. printed table snapshots standing in for the widgets.

Run: python examples/dashboard_parity.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamlit_flink_demo_spark.changelog import Changelog
from streamlit_flink_demo_spark.session import get_spark
from streamlit_flink_demo_spark.sources.stream_fixtures import (
    user_row,
    user_stream,
    write_user_batch,
)
from streamlit_flink_demo_spark.statements import StatementsService

EYE_SQL = "SELECT eyeColor, count(*) AS eye_color_count FROM `user` GROUP BY eyeColor"
MAP_SQL = """
SELECT `user`.guid,
       37.7 + (RAND() * (37.77 - 37.7)) AS latitude,
       -122.50 + (RAND() * (-122.39 - (-122.50))) AS longitude
FROM `user`
"""
AGE_SQL = """
WITH users_with_age_groups AS (
  SELECT
    CASE
      WHEN age BETWEEN 20 AND 29 THEN '20-29'
      WHEN age BETWEEN 30 AND 39 THEN '30-39'
      WHEN age BETWEEN 40 AND 49 THEN '40-49'
      WHEN age BETWEEN 50 AND 59 THEN '50-59'
      ELSE 'other'
    END AS age_group,
    CAST(substring(balance FROM 2) AS DOUBLE) AS balance_double
  FROM `user`
)
SELECT age_group, AVG(balance_double) AS avg_balance
FROM users_with_age_groups
GROUP BY age_group
"""


def main() -> None:
    spark = get_spark("dashboard-parity")
    tmp = tempfile.mkdtemp(prefix="dash_parity_")
    spool = os.path.join(tmp, "spool")
    user_stream(spark, spool).createOrReplaceTempView("user")

    svc = StatementsService(spark)
    queries = {}
    for label, sql in (("eye", EYE_SQL), ("map", MAP_SQL), ("age", AGE_SQL)):
        env = svc.create(sql)
        ready = svc.wait_for_status(env, "running", "completed")
        schema = ready["status"]["traits"]["schema"]  # dashboard.py:201
        cols = [c["name"] for c in schema["columns"]]
        cl = Changelog(cols, svc.results(env["name"], continuous_query=True))
        queries[label] = (env, cl)
        print(f"[{label}] {env['name']} running, schema={cols}")

    # JR profile: bursts of 10 users (README.md:111), 5 rounds
    for batch in range(5):
        write_user_batch(
            spark, spool, batch, [user_row(batch * 10 + i) for i in range(10)]
        )
        for _, (env, _cl) in queries.items():
            svc.process_available(env["name"])
        # fragment refresh: consume new changelog records, update tables
        for label, (env, cl) in queries.items():
            cl.consume(1000)
        time.sleep(0.1)

    print("\n=== materialized snapshots after ~50 users ===")
    for label, (env, cl) in queries.items():
        table = cl.collapse()
        rows = sorted(map(tuple, table.rows))[:8]
        print(f"\n[{label}] {len(table.rows)} rows "
              f"(ops received: {dict(cl.ops_received)})")
        for r in rows:
            print("   ", r)

    for env, _ in queries.values():
        svc.stop(env["name"])
    print("\nall statements stopped.")


if __name__ == "__main__":
    main()
