"""docs_dsir_weights semantic verification — a pure-Python
collections.Counter reimplementation of the hashed-n-gram importance
model (no Spark, no SQL, no shared code beyond the md5 bucket
definition), plus the selection-direction property DSIR exists for:
target-slice documents must score higher on average than the rest."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from streamlit_flink_demo_spark.plans import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all(exposed_only=False)


def _bucket(g: str, b: int) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % b


def _reference_weights(sf_dir: str, b: int, target: str) -> pd.DataFrame:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs = docs[docs.text.notna()]
    from collections import Counter

    cr: Counter = Counter()
    ct: Counter = Counter()
    per_doc: dict[int, list[int]] = {}
    for doc_id, text, lang in zip(docs.doc_id, docs.text, docs.lang):
        w = text.strip().lower().split()
        grams = w + [f"{a} {bb}" for a, bb in zip(w, w[1:])]
        feats = [_bucket(g, b) for g in grams]
        per_doc[doc_id] = feats
        cr.update(feats)
        if lang == target:
            ct.update(feats)
    tr, tt = sum(cr.values()), sum(ct.values())
    rows = []
    for doc_id, feats in per_doc.items():
        s = sum(
            math.log(ct.get(f, 0) + 1) - math.log(cr[f] + 1) for f in feats
        )
        rows.append(
            dict(
                doc_id=doc_id,
                n_feats=len(feats),
                logw=s + len(feats) * (math.log(tr + b) - math.log(tt + b)),
            )
        )
    return pd.DataFrame(rows)


def test_dsir_matches_counter_reimplementation(spark, sf_dir, registry):
    from streamlit_flink_demo_spark.operators.pipeline import (
        _DSIR_B,
        _DSIR_TARGET,
    )

    got = registry["docs_dsir_weights"].fn(spark, sf_dir).toPandas()
    want = _reference_weights(sf_dir, _DSIR_B, _DSIR_TARGET)
    m = got.merge(want, on="doc_id")
    assert len(m) == len(got) == len(want)
    assert (m.n_feats_x == m.n_feats_y).all()
    # the operator's quantized sum vs the float reference: within the
    # 6-digit rounding the operator applies
    assert (m.logw_r - m.logw).abs().max() < 1e-5


def test_dsir_ranks_target_slice_higher(spark, sf_dir, registry):
    from streamlit_flink_demo_spark.operators.pipeline import _DSIR_TARGET

    got = registry["docs_dsir_weights"].fn(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "lang"]]
    m = got.merge(docs, on="doc_id")
    t = m[m.lang == _DSIR_TARGET].logw_r.mean()
    o = m[m.lang != _DSIR_TARGET].logw_r.mean()
    assert t > o, (t, o)
