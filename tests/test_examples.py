"""The end-to-end pipeline demo (examples/llm_data_pipeline.py) must
keep running as operators evolve — it is the composition surface a
user copies from, so a broken stage there is a real regression even
when every operator's own test is green."""

from __future__ import annotations

import importlib.util
import io
import os
import sys
from contextlib import redirect_stdout


def test_llm_pipeline_demo_runs_end_to_end(spark, tmp_path):
    spec = importlib.util.spec_from_file_location(
        "llm_data_pipeline",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples",
            "llm_data_pipeline.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv, out = sys.argv, io.StringIO()
    sys.argv = ["llm_data_pipeline.py", "/root/testdata/sf0.001"]
    try:
        with redirect_stdout(out):
            rc = mod.main()
    finally:
        sys.argv = argv
    assert rc == 0
    text = out.getvalue()
    for marker in (
        "after quality gate:",
        "cdc new-bytes monitor:",
        "ccnet perplexity gate",
        "exact span removal (gram-group):",
        "hybrid RRF top-3",
        "k-center diversity picks",
        "contamination gate:",
        "shards written:",
    ):
        assert marker in text, f"demo stage missing: {marker}"


def test_ingest_compact_serve_demo_runs_end_to_end(spark):
    spec = importlib.util.spec_from_file_location(
        "ingest_compact_serve",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples",
            "ingest_compact_serve.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv, out = sys.argv, io.StringIO()
    sys.argv = ["ingest_compact_serve.py", "/root/testdata/sf0.001"]
    try:
        with redirect_stdout(out):
            rc = mod.main()
    finally:
        sys.argv = argv
    assert rc == 0
    text = out.getvalue()
    for marker in (
        "artifacts built:",
        "fresh probe top hit: doc 900001 (rk=1)",
        "probe identical after compaction",
        "batch 1 cleaned against ingested corpus:",
    ):
        assert marker in text, f"missing stage marker: {marker}"
