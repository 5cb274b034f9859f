"""docs_nb_classify semantic verification — an independent
collections.Counter reimplementation of multinomial NB (train on the
same hash-mod split, Laplace smoothing, argmax with lexicographic
tie-break), compared prediction-for-prediction; plus the property the
classifier exists for: accuracy above chance on the eval slice."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from streamlit_flink_demo_spark.plans import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all(exposed_only=False)


def _u60(x: str) -> int:
    return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)


def _reference_predictions(sf_dir: str, b: int) -> pd.DataFrame:
    from collections import Counter, defaultdict

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs = docs[docs.text.notna()]
    model: dict[str, Counter] = defaultdict(Counter)
    n_docs_c: Counter = Counter()
    rows = []
    eval_docs = []
    for doc_id, text, lang in zip(docs.doc_id, docs.text, docs.lang):
        feats = [
            _u60(g) % b for g in text.strip().lower().split()
        ]
        if _u60(str(doc_id)) % 100 < 90:
            model[lang].update(feats)
            n_docs_c[lang] += 1
        else:
            eval_docs.append((doc_id, lang, feats))
    classes = sorted(n_docs_c)
    n_tr = sum(n_docs_c.values())
    tot_c = {c: sum(model[c].values()) for c in classes}
    for doc_id, lang, feats in eval_docs:
        best, best_s = None, None
        for c in classes:
            s = (
                sum(math.log(model[c].get(f, 0) + 1) for f in feats)
                + math.log(n_docs_c[c] + 1)
                - math.log(n_tr + len(classes))
                - len(feats) * math.log(tot_c[c] + b)
            )
            if best_s is None or s > best_s:  # ties keep earlier (sorted) cls
                best, best_s = c, s
        rows.append(
            dict(doc_id=doc_id, lang_actual=lang, lang_pred=best, score=best_s)
        )
    return pd.DataFrame(rows)


def test_nb_matches_counter_reimplementation(spark, sf_dir, registry):
    from streamlit_flink_demo_spark.operators.pipeline import _NB_B

    got = registry["docs_nb_classify"].fn(spark, sf_dir).toPandas()
    want = _reference_predictions(sf_dir, _NB_B)
    m = got.merge(want, on="doc_id", suffixes=("", "_ref"))
    assert len(m) == len(got) == len(want)
    assert (m.lang_actual == m.lang_actual_ref).all()
    assert (m.lang_pred == m.lang_pred_ref).all()
    assert (m.score_r - m.score).abs().max() < 1e-5


def test_nb_beats_chance(spark, sf_dir, registry):
    got = registry["docs_nb_classify"].fn(spark, sf_dir).toPandas()
    n_classes = got.lang_actual.nunique()
    assert got.ok.mean() > 1.0 / n_classes, (got.ok.mean(), n_classes)
