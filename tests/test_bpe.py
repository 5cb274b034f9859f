"""BPE trainer: independent pure-Python reimplementation parity plus
plan/structure contracts (the DuckDB oracle replay runs separately in
test_oracle_parity)."""

from __future__ import annotations

import collections
import re

import duckdb

from streamlit_flink_demo_spark.operators.bpe import N_MERGES
from streamlit_flink_demo_spark.plans import load_all
from streamlit_flink_demo_spark.sources.catalog import table_path

REG = load_all(exposed_only=False)


def _reference_bpe(texts, n_merges):
    """Classic Sennrich-style BPE on (word, count): Counter pair stats,
    argmax with (count desc, lexicographic pair) tie-break, greedy
    leftmost non-overlapping application."""
    words = collections.Counter()
    for t in texts:
        for w in re.split("[^a-z]+", (t or "").lower()):
            if w:
                words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}

    def apply(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    merges = []
    for r in range(1, n_merges + 1):
        stats = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (a, b), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, c))
        vocab = {apply(s, a, b): cnt for s, cnt in vocab.items()}
    return merges


def test_bpe_matches_pure_python_reimplementation(spark, sf_dir):
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{table_path(sf_dir, 'documents')}')"
        ).fetchall()
    ]
    want = _reference_bpe(texts, N_MERGES)
    got = [
        (r["merge_rank"], r["sym_a"], r["sym_b"], r["merged"], r["pair_cnt"])
        for r in REG["docs_bpe_merges"].fn(spark, sf_dir).collect()
    ]
    assert got == want


def test_bpe_merge_frequencies_non_increasing(spark, sf_dir):
    """Classic BPE invariant: the best-pair frequency never grows
    round over round (a merge can only create pairs bounded by the
    frequency of the pair that was just merged)."""
    rows = sorted(
        REG["docs_bpe_merges"].fn(spark, sf_dir).collect(),
        key=lambda r: r["merge_rank"],
    )
    assert len(rows) == N_MERGES
    cnts = [r["pair_cnt"] for r in rows]
    assert all(x >= y for x, y in zip(cnts, cnts[1:]))
    assert len({r["merged"] for r in rows}) == N_MERGES  # all distinct


def test_bpe_pair_count_plan_is_codegen(spark, sf_dir):
    """The per-round hot path: no Python eval anywhere, map-side
    partial integer sums, no cartesian/shuffle joins."""
    from streamlit_flink_demo_spark.operators.bpe import (
        bpe_pair_counts,
        bpe_words,
    )

    df = bpe_pair_counts(bpe_words(spark, sf_dir))
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "partial_sum" in p and "partial_count" in p
    assert "CartesianProduct" not in p and "Join" not in p


def test_bpe_tokenize_matches_pure_python(spark, sf_dir):
    """Per-doc BPE token counts against an independent greedy-apply
    reimplementation using the same learned merges."""
    texts = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{table_path(sf_dir, 'documents')}')"
        ).fetchall()
    }
    merges = _reference_bpe(texts.values(), N_MERGES)

    def apply_all(w):
        syms = list(w)
        for _, a, b, _, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    want = {}
    for doc_id, t in texts.items():
        ws = [w for w in re.split("[^a-z]+", (t or "").lower()) if w]
        want[doc_id] = (
            len(ws),
            sum(len(w) for w in ws),
            sum(apply_all(w) for w in ws),
        )
    got = {
        r["doc_id"]: (r["n_words"], r["n_chars_az"], r["n_bpe_tokens"])
        for r in REG["docs_bpe_tokenize"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_bpe_tokenize_apply_plan_is_shuffle_free(spark, sf_dir):
    """The apply pass is one HOF projection off the scan: no Python
    eval, no joins, and the only exchange allowed is the byte-gated
    spread repartition (absent at sf0.001)."""
    df = REG["docs_bpe_tokenize"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    tree = p.split("\n\n")[0]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Join" not in p and "CartesianProduct" not in p
    assert "hashpartitioning" not in p
    assert tree.count("Scan parquet") == 1
