#!/usr/bin/env python
"""A Streamlit dashboard against THIS engine's HTTP statements façade —
the reference dashboard's widget pattern (reference
``dashboard.py:37-52,83-136``: create a continuous statement, poll
results over HTTP, fold the +I/-U/+U/-D changelog into a client
table, render) re-pointed at a Spark backend with, as the reference
README promises, "only a URL change".

``streamlit`` is a CLIENT dependency (the same split the reference has
between ``api/`` and ``dashboard.py``) and is not part of the engine's
dependency set, so this file is NOT covered by CI — the identical
lifecycle is exercised headlessly by ``examples/dashboard_http.py``
and ``tests/test_http_api.py``. To run it where streamlit exists:

    python examples/streamlit_app.py serve      # engine + HTTP façade
    ENGINE_URL=<printed url> streamlit run examples/streamlit_app.py
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The reference's three-widget shape, retargeted at the events table.
QUERIES = {
    "counts by type": "SELECT event_type, count(*) AS n "
    "FROM events GROUP BY event_type",
    "avg value by type": "SELECT event_type, avg(value) AS avg_value "
    "FROM events GROUP BY event_type",
    "activity bands": "SELECT CASE WHEN n < 50 THEN 'low' "
    "WHEN n < 150 THEN 'mid' ELSE 'high' END AS band, "
    "count(*) AS n_users FROM (SELECT user_id, count(*) AS n "
    "FROM events GROUP BY user_id) GROUP BY 1",
}


def serve() -> int:
    """Engine side: register the catalog and expose the wire protocol."""
    from streamlit_flink_demo_spark.http_api import StatementsHTTPServer
    from streamlit_flink_demo_spark.session import get_spark
    from streamlit_flink_demo_spark.sources.catalog import register_tables
    from streamlit_flink_demo_spark.statements import StatementsService

    spark = get_spark("streamlit-backend")
    register_tables(
        spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    server = StatementsHTTPServer(StatementsService(spark)).start()
    print(f"ENGINE_URL={server.url()}")
    try:
        import time

        while True:
            time.sleep(3600)
    finally:
        server.stop()
    return 0


def _http(method: str, url: str, payload: dict | None = None) -> dict:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode() if payload is not None else None,
        headers={"Content-Type": "application/json"},
        method=method,
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def dashboard() -> None:
    """Client side: streamlit + urllib + the changelog client SDK only
    (no engine imports past the changelog module — the reference's
    lib/flink.py equivalent)."""
    import secrets

    import streamlit as st

    from streamlit_flink_demo_spark.changelog import MaterializedTable

    root = os.environ.get("ENGINE_URL")
    if not root:
        st.error("set ENGINE_URL to the value printed by `serve`")
        return

    st.set_page_config(page_title="spark analytics", layout="wide")
    st.title("Continuous queries on Spark (reference dashboard parity)")

    if "stmts" not in st.session_state:
        st.session_state.stmts = {}
        st.session_state.tables = {}
        st.session_state.cursors = {}
        for title, sql in QUERIES.items():
            name = "widget-" + secrets.token_hex(6)  # client-made name
            _http("POST", root, {"name": name, "spec": {"statement": sql}})
            st.session_state.stmts[title] = name
            st.session_state.tables[title] = None  # until schema is known
            st.session_state.cursors[title] = f"{root}/{name}/results"

    host = root.split("/sql/")[0]
    for col, title in zip(st.columns(len(QUERIES)), QUERIES):
        if st.session_state.tables[title] is None:
            # schema traits appear once the statement is running/complete
            env = _http("GET", f"{root}/{st.session_state.stmts[title]}")
            schema = env["status"].get("traits", {}).get("schema")
            if not schema:
                with col:
                    st.subheader(title)
                    st.caption(f"starting… ({env['status']['phase']})")
                continue
            st.session_state.tables[title] = MaterializedTable(
                [c["name"] for c in schema["columns"]]
            )
        page = _http("GET", st.session_state.cursors[title])
        st.session_state.tables[title].apply(page["results"]["data"])
        nxt = page["metadata"]["next"]
        if nxt:
            st.session_state.cursors[title] = host + nxt
        with col:
            st.subheader(title)
            st.dataframe(st.session_state.tables[title].to_pandas())

    st.button("refresh")  # streamlit reruns the script on interaction


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "serve":
        raise SystemExit(serve())
    dashboard()
