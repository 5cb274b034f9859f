#!/usr/bin/env python
"""The reference dashboard's lifecycle over the WIRE — a client that
speaks only the reference's REST protocol (client-generated names,
envelope polling, results paged via metadata.next) against the
engine's HTTP façade. No engine imports on the client side of the
line: everything below `--- client ---` uses urllib + JSON only, i.e.
what `/root/reference/api/statements.py` does with `requests`.

Run: python examples/dashboard_http.py
"""

from __future__ import annotations

import json
import os
import secrets
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamlit_flink_demo_spark.http_api import StatementsHTTPServer
from streamlit_flink_demo_spark.session import get_spark
from streamlit_flink_demo_spark.sources.stream_fixtures import (
    user_row,
    user_stream,
    write_user_batch,
)
from streamlit_flink_demo_spark.statements import StatementsService

EYE_SQL = "SELECT eyeColor, count(*) AS n FROM `user` GROUP BY eyeColor"


def main() -> None:
    spark = get_spark("dashboard-http")
    tmp = tempfile.mkdtemp(prefix="dash-http-")
    spool = os.path.join(tmp, "spool")
    user_stream(spark, spool).createOrReplaceTempView("user")
    svc = StatementsService(spark)
    server = StatementsHTTPServer(svc).start()
    root = server.url()
    print(f"engine listening at {root}")

    # --- client (reference protocol only: urllib + JSON) ---------------
    def http(method: str, url: str, payload: dict | None = None) -> dict:
        req = urllib.request.Request(
            url,
            data=json.dumps(payload).encode() if payload is not None else None,
            headers={"Content-Type": "application/json"},
            method=method,
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    name = "demo-" + secrets.token_hex(6)  # client makes the name
    env = http("POST", root, {"name": name,
                              "spec": {"statement": EYE_SQL}})
    print("created:", env["name"], env["status"]["phase"])

    table: dict[str, int] = {}
    results_url = f"{root}/{name}/results"
    for batch in range(3):
        write_user_batch(spark, spool, batch,
                         [user_row(batch * 10 + i) for i in range(10)])
        svc.process_available(name)  # engine-side nudge (tests only)
        page = http("GET", results_url)
        for rec in page["results"]["data"]:
            op, (color, n) = rec["op"], rec["row"]
            if op in (0, 2):     # +I / +U
                table[color] = n
            elif op == 1:        # -U: superseded value
                pass
            elif op == 3:        # -D
                table.pop(color, None)
        nxt = page["metadata"]["next"]
        results_url = f"http://{server.address[0]}:{server.address[1]}{nxt}"
        print(f"after batch {batch}: {dict(sorted(table.items()))}")

    http("DELETE", f"{root}/{name}")
    print("final phase:", http("GET", f"{root}/{name}")["status"]["phase"])
    server.stop()
    spark.stop()


if __name__ == "__main__":
    main()
