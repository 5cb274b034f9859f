"""Similarity-search quality tests: LSH recall vs the exact baseline,
and multimodal mapInPandas plumbing."""

from __future__ import annotations

import math

from streamlit_flink_demo_spark.plans import load_all

REG = load_all(exposed_only=False)


def _topk_sets(df, k_col="vec_id"):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r[k_col])
    return out


def test_lsh_recall_vs_exact(spark, sf_dir):
    """Banded LSH must recover a reasonable fraction of the true
    top-10 per query (single-probe, 4 bands × 2 planes: expected
    per-neighbor candidate probability well above 50% for the high-
    cosine neighbors that matter)."""
    exact = _topk_sets(REG["ann_cosine_topk"].fn(spark, sf_dir))
    approx = _topk_sets(REG["ann_lsh_topk"].fn(spark, sf_dir))
    assert set(exact) == set(approx.keys() | exact.keys())
    total, hit = 0, 0
    for q, truth in exact.items():
        got = approx.get(q, set())
        total += len(truth)
        hit += len(truth & got)
    recall = hit / total
    assert recall >= 0.4, f"LSH recall {recall:.2f} below floor"


def test_embedding_near_dup_pairs_are_verified(spark, sf_dir):
    """Every emitted pair must actually clear the cosine threshold
    (LSH may miss pairs — it must never emit a false positive)."""
    rows = REG["dedup_embedding_cosine"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["cos_sim"] >= 0.45
        assert r["vec_a"] < r["vec_b"]


def test_ivf_exhaustive_probe_is_exact(spark, sf_dir):
    """With nprobe = n_clusters, IVF scores every vector — the result
    must be EXACTLY the brute-force top-k (ids, ranks, and scores):
    cluster pruning is the only approximation in the operator."""
    from streamlit_flink_demo_spark.operators.similarity import ivf_topk

    exact = {
        (r["q_id"], r["rk"]): (r["vec_id"], r["cos_sim"])
        for r in REG["ann_cosine_topk"].fn(spark, sf_dir).collect()
    }
    full = {
        (r["q_id"], r["rk"]): (r["vec_id"], r["cos_sim"])
        for r in ivf_topk(spark, sf_dir, n_clusters=8, nprobe=8).collect()
    }
    assert full == exact


def test_ivf_default_probe_shape_and_honesty(spark, sf_dir):
    """Default (pruned) IVF: k results per query, no self-matches, and
    every returned score must be a true cosine (spot-check by
    recomputing against the exact scores: any (q, vec) pair IVF
    returns that brute-force also ranked must carry the same score)."""
    ivf = REG["ann_ivf_topk"].fn(spark, sf_dir).collect()
    per_q = {}
    for r in ivf:
        assert r["vec_id"] != r["q_id"]
        per_q.setdefault(r["q_id"], []).append(r)
    for q, rows in per_q.items():
        assert len(rows) == 10
        assert sorted(r["rk"] for r in rows) == list(range(1, 11))
    exact_scores = {
        (r["q_id"], r["vec_id"]): r["cos_sim"]
        for r in REG["ann_cosine_topk"].fn(spark, sf_dir).collect()
    }
    for r in ivf:
        key = (r["q_id"], r["vec_id"])
        if key in exact_scores:
            assert abs(r["cos_sim"] - exact_scores[key]) < 1e-12


def test_multimodal_resize_contract(spark, sf_dir):
    """Resize plumbing: 1 row in → 1 row out, output byte length is
    content-independent (target-dims-determined), and re-running is
    bit-deterministic."""
    src = REG["multimodal_resize_fake"].fn(spark, sf_dir)
    rows = {r["doc_id"]: r for r in src.collect()}
    n_docs = REG["multimodal_binary_meta"].fn(spark, sf_dir).count()
    assert len(rows) == n_docs
    target = 224 * 224 // 64
    for r in rows.values():
        assert r["n_bytes_out"] == target
        assert len(r["content"]) == target
    again = {r["doc_id"]: r for r in src.collect()}
    assert all(bytes(rows[k]["content"]) == bytes(again[k]["content"]) for k in rows)


def test_multimodal_frame_sample_fanout(spark, sf_dir):
    """Frame sampling: ≥1 and ≤4 frames per doc, frame_idx dense from
    0, n_frames consistent across a doc's rows, frames deterministic
    (md5 matches content)."""
    import hashlib

    rows = REG["multimodal_frame_sample"].fn(spark, sf_dir).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
        # Driver surface is hex text (raw binary crashes pandas-based
        # canonicalizers); surface md5 hashes the hex rendering so the
        # oracle stays byte-exact without DuckDB md5(BLOB).
        assert isinstance(r["frame_hex"], str)
        assert hashlib.md5(r["frame_hex"].encode()).hexdigest() == r["frame_md5"]
    for doc, frs in per_doc.items():
        n = frs[0]["n_frames"]
        assert 1 <= n <= 4 and len(frs) == n
        assert sorted(f["frame_idx"] for f in frs) == list(range(n))


def test_approx_distinct_error_bound(spark, sf_dir):
    """Deterministic-HLL estimate (m=1024, md5 hashes) within 5% of the
    exact per-group distinct (std error 1.04/sqrt(m) = 3.3%; the
    registered query is sketch-only — the exact side is computed here,
    where the comparison belongs)."""
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.sources.catalog import load_table

    exact = {
        r["event_type"]: r["exact_users"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_users"))
        .collect()
    }
    for r in REG["events_approx_distinct"].fn(spark, sf_dir).collect():
        ex = exact[r["event_type"]]
        assert ex > 0
        rel = abs(r["approx_users"] - ex) / ex
        assert rel <= 0.05, (r["event_type"], rel)


def test_approx_quantiles_rank_error_bound(spark, sf_dir):
    """Rank-selected quantiles over the 25% md5-deterministic sample:
    each must land within 3 binomial sigmas of its target rank in the
    FULL value list (sigma = n*sqrt(p(1-p)/s) for sample size s — the
    exact sampling-error model for rank statistics)."""
    import bisect
    import math

    from streamlit_flink_demo_spark.functions.hashing import u60
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    vals: dict[str, list[float]] = {}
    for r in e.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for et in vals:
        vals[et].sort()
    sample_n = {
        r["event_type"]: r["s"]
        for r in e.filter(u60(F.col("event_id").cast("string")) % 4 == 0)
        .groupBy("event_type")
        .agg(F.count("*").alias("s"))
        .collect()
    }
    for r in REG["events_approx_distinct"].fn(spark, sf_dir).collect():
        v = vals[r["event_type"]]
        n, s = len(v), sample_n[r["event_type"]]
        for pct, got in ((0.5, r["p50_value"]), (0.95, r["p95_value"])):
            rank = bisect.bisect_left(v, got)
            bound = max(3.0, 3 * n * math.sqrt(pct * (1 - pct) / s))
            assert abs(rank - pct * n) <= bound, (
                r["event_type"], pct, rank, n, s,
            )


def test_salted_join_row_identical(spark, sf_dir):
    """The salted join must produce exactly the plain join's rows."""
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.operators.skew import salted_join
    from streamlit_flink_demo_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    plain = sorted(
        (r["o_orderkey"], r["c_nationkey"])
        for r in o.join(c, o.o_custkey == c.c_custkey).collect()
    )
    salted = sorted(
        (r["o_orderkey"], r["c_nationkey"])
        for r in salted_join(o, c, "o_custkey", "c_custkey").collect()
    )
    assert salted == plain


def test_multimodal_decode_batch_shape(spark, sf_dir):
    """mapInPandas plumbing: output schema fixed, one row per input,
    deterministic fake decode (same bytes → same dims)."""
    df = REG["multimodal_decode_fake"].fn(spark, sf_dir)
    assert [f.name for f in df.schema] == [
        "doc_id", "n_bytes", "width", "height", "mean_luma",
    ]
    rows = df.collect()
    from streamlit_flink_demo_spark.sources.catalog import load_table

    assert len(rows) == load_table(spark, sf_dir, "documents").count()
    again = {r["doc_id"]: (r["width"], r["height"]) for r in df.collect()}
    for r in rows:
        assert again[r["doc_id"]] == (r["width"], r["height"])


def test_multimodal_real_decode_raises(spark, sf_dir):
    """The non-fake path must fail loudly (no silent fake data in
    production pipelines)."""
    import pytest
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.operators.multimodal import (
        decode_binary_batch,
    )
    from streamlit_flink_demo_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").limit(2).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    with pytest.raises(Exception, match="NotImplementedError|PIL|decode"):
        decode_binary_batch(d, fake=False).collect()


def test_confluent_header_strip(spark):
    """Kafka wire-format plumbing on batch binary data: 5-byte header
    removed, schema id extracted big-endian."""
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.sources.kafka_avro import (
        confluent_schema_id,
        strip_confluent_header,
    )

    payload = b"\x00\x00\x00\x01\x02hello-avro"
    df = spark.createDataFrame([(bytearray(payload),)], "value binary")
    out = df.select(
        strip_confluent_header(F.col("value")),
        confluent_schema_id(F.col("value")),
    ).collect()[0]
    assert bytes(out["avro_body"]) == b"hello-avro"
    assert out["schema_id"] == (1 << 8) + 2

    short = spark.createDataFrame([(bytearray(b"\x00\x01"),)], "value binary")
    assert short.select(strip_confluent_header(F.col("value"))).collect()[0][
        "avro_body"
    ] is None

    # the helpers must honor the PASSED column, not a hardcoded name
    # (regression: an F.expr referencing 'value' crashed when the
    # column was named differently — or silently read the wrong one)
    renamed = spark.createDataFrame(
        [(bytearray(payload), bytearray(b"decoy"))],
        "payload binary, value binary",
    )
    out2 = renamed.select(
        strip_confluent_header(F.col("payload")),
        confluent_schema_id(F.col("payload")),
    ).collect()[0]
    assert bytes(out2["avro_body"]) == b"hello-avro"
    assert out2["schema_id"] == (1 << 8) + 2


def test_decode_json_fallback(spark):
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.sources.kafka_avro import decode_json_value

    df = spark.createDataFrame(
        [(bytearray(b'{"guid": "g1", "age": 30}'),)], "value binary"
    )
    rec = df.select(
        decode_json_value(F.col("value"), "guid string, age int")
    ).select("record.*").collect()[0]
    assert (rec["guid"], rec["age"]) == ("g1", 30)


def test_arrow_sigs_match_jvm_sigs(spark, sf_dir):
    """The Arrow-batched matmul signature path must agree with the
    sequential JVM higher-order-function path on every (vec, band) —
    they evaluate the same ±1 projections, differing only in summation
    order (a sign can flip only for |projection| < ~1e-15, absent in
    this corpus)."""
    from streamlit_flink_demo_spark.operators.similarity import (
        _banded_sigs,
        _banded_sigs_arrow,
    )
    from streamlit_flink_demo_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    jvm = {
        (r.vec_id, r.band): r.bsig
        for r in _banded_sigs(e, 4, 8, salt="dup:").collect()
    }
    arrow = {
        (r.vec_id, r.band): r.bsig
        for r in _banded_sigs_arrow(e, 4, 8, salt="dup:").collect()
    }
    assert jvm == arrow


def test_arrow_assign_matches_jvm_assign(spark, sf_dir):
    """Arrow matmul cluster assignment must agree with the JVM
    struct-max cosine argmax for every vector (ties are measure-zero
    for float embeddings)."""
    import numpy as np

    from streamlit_flink_demo_spark.operators.similarity import (
        _ivf_assign,
        _ivf_assign_arrow,
        _ivf_centroids,
    )
    from streamlit_flink_demo_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    cent_rows = sorted(
        _ivf_centroids(e, 8).collect(), key=lambda r: r["c_id"]
    )
    cents = spark.createDataFrame(
        [(int(r["c_id"]), [float(v) for v in r["c_emb"]]) for r in cent_rows],
        "c_id int, c_emb array<double>",
    )
    cents_np = np.array([r["c_emb"] for r in cent_rows], dtype=np.float64)
    jvm = {r.vec_id: r.cluster for r in _ivf_assign(e, cents).collect()}
    arrow = {r.vec_id: r.cluster for r in _ivf_assign_arrow(e, cents_np).collect()}
    assert jvm == arrow


def test_ivf_artifact_probe_equals_inline_pipeline(spark, sf_dir):
    """ann_ivf_topk (prebuilt inverted-list artifact) must produce
    exactly the inline ivf_topk pipeline's rows — the artifact is a
    materialization of the same deterministic index, not a different
    algorithm."""
    from streamlit_flink_demo_spark.operators.similarity import ivf_topk

    art = {
        (r["q_id"], r["rk"]): (r["vec_id"], r["cos_sim"])
        for r in REG["ann_ivf_topk"].fn(spark, sf_dir).collect()
    }
    inline = {
        (r["q_id"], r["rk"]): (r["vec_id"], r["cos_sim"])
        for r in ivf_topk(spark, sf_dir).collect()
    }
    assert art == inline


def test_index_dir_is_collision_free_and_publish_is_atomic(tmp_path):
    """Distinct source dirs must map to distinct artifact dirs (the old
    os.sep->'_' flattening collided /x/sf0_1 with /x/sf0/1), and
    _publish_artifact must swap a symlink so the artifact path resolves
    to a complete (data + matching meta.json) version at every instant,
    survive repeated publishes, and sweep superseded versions."""
    import json
    import os

    from streamlit_flink_demo_spark.operators import similarity as sim

    a = str(tmp_path / "sf0_1")
    b = str(tmp_path / "sf0" / "1")
    assert sim._index_dir("lsh_topk", a) != sim._index_dir("lsh_topk", b)
    assert sim._index_dir("lsh_topk", a) == sim._index_dir("lsh_topk", a)

    out = str(tmp_path / "art" / "current")

    def stage(fp):
        tmp = f"{out}.tmp-{fp}"
        os.makedirs(os.path.join(tmp, "data"))
        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump({"fingerprint": fp}, fh)
        return tmp

    # legacy real-dir artifact migrates cleanly
    os.makedirs(out)
    with open(os.path.join(out, "meta.json"), "w") as fh:
        json.dump({"fingerprint": "legacy"}, fh)
    sim._publish_artifact(stage("v1"), out)
    assert os.path.islink(out)
    assert json.load(open(os.path.join(out, "meta.json")))["fingerprint"] == "v1"
    assert os.path.isdir(os.path.join(out, "data"))

    # second publish repoints and sweeps the superseded version
    sim._publish_artifact(stage("v2"), out)
    assert json.load(open(os.path.join(out, "meta.json")))["fingerprint"] == "v2"
    versions = [
        d
        for d in os.listdir(tmp_path / "art")
        if d.startswith("current.v-")
    ]
    assert len(versions) == 1  # only the live version remains
    # no leftover tmp/old/link debris beyond the lock files (the
    # publish lock, plus the maintenance lock _publish_artifact now
    # takes so builders serialize with compaction/fold — ADVICE r12)
    leftover = sorted(os.listdir(tmp_path / "art"))
    assert leftover == sorted(
        ["current", "current.lock", "current.maint.lock"] + versions
    )

def test_substring_spans_exact_independent_recompute(spark, sf_dir):
    """Exact recompute of the span operator from raw token streams:
    mark duplicated window starts corpus-wide, merge starts whose
    coverage touches (gap <= W), and compare the resulting region set
    (extents + n_windows) to the operator output EXACTLY. Also pins
    disjointness and coverage-maximality."""
    from collections import Counter

    from streamlit_flink_demo_spark.operators.dedup import _SPAN_W
    from streamlit_flink_demo_spark.sources.catalog import load_table

    w = _SPAN_W
    toks = {
        r["doc_id"]: r["t"]
        for r in load_table(spark, sf_dir, "documents")
        .selectExpr("doc_id", r"regexp_extract_all(lower(text), '\\S+', 0) AS t")
        .collect()
    }
    counts = Counter()
    for t in toks.values():
        for k in range(len(t) - w + 1):
            counts[" ".join(t[k : k + w])] += 1
    expect = set()
    for doc_id, t in toks.items():
        marked = [
            k
            for k in range(len(t) - w + 1)
            if counts[" ".join(t[k : k + w])] > 1
        ]
        if not marked:
            continue
        start, prev, n = marked[0], marked[0], 1
        for k in marked[1:]:
            if k - prev > w:
                expect.add((doc_id, start, prev + w - 1, n))
                start, n = k, 0
            prev = k
            n += 1
        expect.add((doc_id, start, prev + w - 1, n))

    got = set()
    per_doc: dict[int, list] = {}
    for r in REG["dedup_substring_spans"].fn(spark, sf_dir).collect():
        got.add((r["doc_id"], r["span_start"], r["span_end"], r["n_windows"]))
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1 >= w
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert got == expect and got  # exact match; fixture has dup spans
    for doc, rs in per_doc.items():
        rs.sort(key=lambda r: r["span_start"])
        for a, b in zip(rs, rs[1:]):
            assert a["span_end"] < b["span_start"]  # disjoint per doc


def test_substring_spans_overlap_counterexample(spark):
    """Regression for the start-adjacency islands bug: duplicated
    window starts 2 apart (coverage overlapping, gap < W) must merge
    into ONE region, never two overlapping "maximal" spans. Corpus:
    doc 2 = x0..x9; doc 0 = x0..x7 (dups windows at start 0); doc 1 =
    x2..x9 (dups window at start 2); window at start 1 of doc 2 is
    unique."""
    from streamlit_flink_demo_spark.operators.dedup import (
        _SPAN_W,
        duplicated_spans_over,
    )

    w = _SPAN_W
    xs = [f"x{i}" for i in range(w + 2)]  # x0..x9 for W=8
    docs = [
        (0, xs[: w]),        # x0..x7
        (1, xs[2 : w + 2]),  # x2..x9
        (2, xs),             # x0..x9 — starts 0 and 2 duplicated, 1 not
    ]
    toks = spark.createDataFrame(
        [(d, t) for d, t in docs], "doc_id long, t array<string>"
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicated_spans_over(toks).collect()
    }
    assert spans[0] == (0, w - 1, 1)
    assert spans[1] == (0, w - 1, 1)
    # ONE merged region covering the whole doc, built from 2 windows
    assert spans[2] == (0, w + 1, 2)


def test_span_rewrite_accounting_and_independent_recompute(spark, sf_dir):
    """dedup_span_rewrite: (a) per-doc token accounting closes
    (orig - removed == clean), (b) an independent Python recompute of
    the keep-first-occurrence rule over the operator's own spans
    reproduces every doc's cleaned md5, (c) exactly one occurrence of
    each duplicated span content survives removal."""
    import hashlib

    from streamlit_flink_demo_spark.sources.catalog import load_table

    toks = {
        r["doc_id"]: r["t"]
        for r in load_table(spark, sf_dir, "documents")
        .selectExpr("doc_id", r"regexp_extract_all(lower(text), '\\S+', 0) AS t")
        .collect()
    }
    spans = REG["dedup_substring_spans"].fn(spark, sf_dir).collect()
    # rank occurrences of identical content; every non-first is removed
    by_content: dict[str, list] = {}
    for s in spans:
        content = " ".join(
            toks[s["doc_id"]][s["span_start"] : s["span_end"] + 1]
        )
        by_content.setdefault(content, []).append(s)
    removed: dict[int, list] = {}
    for content, occ in by_content.items():
        occ.sort(key=lambda s: (s["doc_id"], s["span_start"]))
        for s in occ[1:]:
            removed.setdefault(s["doc_id"], []).append(s)
    assert any(len(o) > 1 for o in by_content.values())  # fixture has dups

    rows = {r["doc_id"]: r for r in REG["dedup_span_rewrite"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(toks)
    for doc_id, r in rows.items():
        assert r["orig_tokens"] - r["tokens_removed"] == r["clean_tokens"]
        cut = {
            k
            for s in removed.get(doc_id, [])
            for k in range(s["span_start"], s["span_end"] + 1)
        }
        kept = [t for i, t in enumerate(toks[doc_id]) if i not in cut]
        assert r["clean_tokens"] == len(kept)
        assert r["n_spans_removed"] == len(removed.get(doc_id, []))
        assert (
            hashlib.md5(" ".join(kept).encode()).hexdigest() == r["clean_md5"]
        ), doc_id


def test_ivf_empty_cluster_keeps_seed_and_matches_oracle(spark, tmp_path):
    """Regression: a duplicated embedding among the first-k seeds makes
    one cluster empty after the Lloyd step. The kernel keeps the seed
    as that cluster's centroid; the oracle must too (an inner aggregate
    silently dropped the cluster, leaving k-1 centroids and wholesale
    assignment divergence)."""
    import duckdb
    import numpy as np

    from streamlit_flink_demo_spark.operators.similarity import (
        _IVF_CLUSTERS,
        _ivf_centroids_np,
        _ivf_oracle_sql,
        ivf_topk,
    )

    rng = np.random.RandomState(7)
    n = 120
    vecs = rng.randn(n, 64).astype(np.float32)
    vecs[1] = vecs[0]  # duplicate seed → cluster 1 trains empty
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/embeddings.parquet")

    # the kernel's empty-cluster contract
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    cents = _ivf_centroids_np(e, _IVF_CLUSTERS)
    assert np.allclose(cents[1], vecs[1].astype(np.float64))

    got = sorted(
        (r["q_id"], r["rk"], r["vec_id"], r["cos_sim"])
        for r in ivf_topk(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    want = sorted(
        (r[0], r[3], r[1], r[2]) for r in con.execute(_ivf_oracle_sql()).fetchall()
    )
    assert got == want


def test_kmeans_summary_partitions_corpus(spark, sf_dir):
    """The k-means cluster summary must partition the corpus: member
    counts sum to N, cluster ids come from the seed range, ranks of
    the vec_id checksum are internally consistent."""
    import duckdb  # noqa: F401  (parity itself is in test_oracle_parity)

    from streamlit_flink_demo_spark.operators import similarity as sim

    rows = REG["docs_cluster_kmeans"].fn(spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r["n_members"] for r in rows) == n_vecs
    assert all(0 <= r["cluster"] < sim._KM_K for r in rows)
    assert all(r["exemplar"] >= 0 for r in rows)
    # checksum sanity: sum of all per-cluster vec_id sums = sum 0..N-1
    assert sum(r["sum_vec_id"] for r in rows) == n_vecs * (n_vecs - 1) // 2


def test_kmeans_and_ivf_training_degrade_on_tiny_corpus(spark):
    """Fewer vectors than k must yield fewer centroids (like the SQL
    oracle's seed CTE), not an IndexError; zero vectors must not
    NaN-poison the assignment."""
    import numpy as np

    from streamlit_flink_demo_spark.operators import similarity as sim

    rows = [(i, [float(i + d) for d in range(sim._DIM)]) for i in range(5)]
    rows.append((5, [0.0] * sim._DIM))  # zero-norm vector
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = sim._ivf_centroids_np(e, sim._IVF_CLUSTERS)
    assert 1 <= len(cents) <= 6
    assert np.isfinite(cents).all()
    a = sim._ivf_assign_arrow(e, cents).collect()
    assert len(a) == 6
    assert all(0 <= r["cluster"] < len(cents) for r in a)


def test_pq_adc_shape_recall_and_honesty(spark, sf_dir):
    """PQ-ADC contract: k results per query with ranks 1..k, no
    self-matches, every returned score is a TRUE cosine (any (q, vec)
    pair brute-force also ranked must carry the identical score — the
    re-rank stage recomputes exact cosine, so approximation can only
    change WHICH vectors surface, never their scores), and the
    8-byte-code candidate generation recovers a reasonable fraction
    of the true top-10."""
    pq = REG["ann_pq_adc_topk"].fn(spark, sf_dir).collect()
    per_q = {}
    for r in pq:
        assert r["vec_id"] != r["q_id"]
        per_q.setdefault(r["q_id"], []).append(r)
    for q, rows in per_q.items():
        assert len(rows) == 10
        assert sorted(r["rk"] for r in rows) == list(range(1, 11))
    exact = REG["ann_cosine_topk"].fn(spark, sf_dir).collect()
    exact_scores = {(r["q_id"], r["vec_id"]): r["cos_sim"] for r in exact}
    for r in pq:
        key = (r["q_id"], r["vec_id"])
        if key in exact_scores:
            assert abs(r["cos_sim"] - exact_scores[key]) < 1e-12
    truth = _topk_sets(spark.createDataFrame(exact))
    got = _topk_sets(spark.createDataFrame(pq))
    total = sum(len(v) for v in truth.values())
    hit = sum(len(truth[q] & got.get(q, set())) for q in truth)
    assert hit / total >= 0.5, f"PQ recall {hit / total:.2f} below floor"


def test_pq_encode_deterministic_and_in_range(spark, sf_dir):
    """Codes are stable across runs (the bench/oracle replay contract)
    and every code addresses a real codeword (0 <= j < ksub, exactly
    m codes per vector)."""
    from streamlit_flink_demo_spark.operators.similarity import (
        _PQ_KSUB,
        _PQ_M,
        _pq_codebooks_np,
        _pq_encode_arrow,
    )
    from streamlit_flink_demo_spark.sources.catalog import load_spread

    e = load_spread(spark, sf_dir, "embeddings")
    books = _pq_codebooks_np(e)
    a = {r["vec_id"]: tuple(r["code"]) for r in _pq_encode_arrow(e, books).collect()}
    b = {r["vec_id"]: tuple(r["code"]) for r in _pq_encode_arrow(e, books).collect()}
    assert a == b
    n = load_spread(spark, sf_dir, "embeddings").count()
    assert len(a) == n
    for code in a.values():
        assert len(code) == _PQ_M
        assert all(0 <= j < _PQ_KSUB for j in code)


def test_ivfpq_shape_recall_and_honesty(spark, sf_dir):
    """Composite IVF-PQ: k per query with ranks 1..k, no self-matches,
    scores exact wherever brute-force ranked the same pair, and the
    doubly-pruned candidate generation still clears a recall floor."""
    res = REG["ann_ivfpq_topk"].fn(spark, sf_dir).collect()
    per_q = {}
    for r in res:
        assert r["vec_id"] != r["q_id"]
        per_q.setdefault(r["q_id"], []).append(r)
    for q, rows in per_q.items():
        assert len(rows) == 10
        assert sorted(r["rk"] for r in rows) == list(range(1, 11))
    exact = REG["ann_cosine_topk"].fn(spark, sf_dir).collect()
    exact_scores = {(r["q_id"], r["vec_id"]): r["cos_sim"] for r in exact}
    for r in res:
        key = (r["q_id"], r["vec_id"])
        if key in exact_scores:
            assert abs(r["cos_sim"] - exact_scores[key]) < 1e-12
    truth = _topk_sets(spark.createDataFrame(exact))
    got = _topk_sets(spark.createDataFrame(res))
    total = sum(len(v) for v in truth.values())
    hit = sum(len(truth[q] & got.get(q, set())) for q in truth)
    assert hit / total >= 0.4, f"IVF-PQ recall {hit / total:.2f} below floor"


def test_hard_negatives_are_cross_label_and_hard(spark, sf_dir):
    """Every mined negative must carry a label different from its
    anchor's, scores are true cosines (cross-checked against the
    brute-force scores), and within the LSH candidate pool the mined
    set is maximal: no returned negative may score below an unreturned
    cross-label candidate from ann_lsh_topk's pool for that anchor."""
    hn = REG["embeddings_hard_negatives"].fn(spark, sf_dir).collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    per_q = {}
    for r in hn:
        assert r["neg_label"] != r["q_label"]
        assert labels[r["vec_id"]] == r["neg_label"]
        assert labels[r["q_id"]] == r["q_label"]
        per_q.setdefault(r["q_id"], []).append(r)
    for q, rows in per_q.items():
        assert sorted(r["rk"] for r in rows) == list(range(1, len(rows) + 1))
        assert len(rows) <= 5
    # same-bucket pool from the plain LSH top-k run (superset check):
    # any cross-label LSH hit scoring above an anchor's weakest mined
    # negative must itself have been mined
    lsh = REG["ann_lsh_topk"].fn(spark, sf_dir).collect()
    mined = {(r["q_id"], r["vec_id"]) for r in hn}
    floor = {
        q: min(r["cos_sim"] for r in rows) for q, rows in per_q.items()
    }
    for r in lsh:
        q = r["q_id"]
        if (
            labels[r["vec_id"]] != labels[q]
            and q in floor
            and len(per_q[q]) == 5
            and r["cos_sim"] > floor[q]
        ):
            assert (q, r["vec_id"]) in mined


def test_source_overlap_matrix_complete_and_correct(spark, sf_dir):
    """docs_source_overlap: full C(S,2) matrix (zero-overlap pairs
    included), values match an independent pure-Python set
    reimplementation."""
    import re as _re

    import duckdb as _duck

    rows = REG["docs_source_overlap"].fn(spark, sf_dir).collect()
    docs = _duck.sql(
        f"SELECT source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    sets = {}
    for src, text in docs:
        t = _re.findall("[A-Za-z0-9]+", text or "")
        for i in range(len(t) - 2):
            sets.setdefault(src, set()).add(
                " ".join(w.lower() for w in t[i : i + 3])
            )
    srcs = sorted(sets)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        a, b = sets[r["src_a"]], sets[r["src_b"]]
        assert r["src_a"] < r["src_b"]
        assert (r["n_a"], r["n_b"]) == (len(a), len(b))
        assert r["n_common"] == len(a & b)
        want_j = len(a & b) / (len(a) + len(b) - len(a & b))
        assert abs(r["jaccard"] - want_j) < 1e-15


def test_label_margins_match_numpy_reimplementation(spark, sf_dir):
    """Independent numpy replay of the separability report: centroids
    from the same scaled-integer sums, cosine margins, confusion
    counts and dominant confusion target."""
    import numpy as np

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    S = float(1 << 30)
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            np.array(r["embedding"], dtype=np.float64)
        )
    def half_up(x):
        return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)

    cents = {}
    for lbl, vs in by_label.items():
        q = np.array(
            [[half_up(float(x) * S) for x in v] for v in vs], dtype=np.int64
        )
        cents[lbl] = (q.sum(axis=0).astype(np.float64) / len(vs)) / S

    def cos(a, b):
        # left-to-right folds matching the engine's cosine contract
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
            na += float(x) * float(x)
            nb += float(y) * float(y)
        return dot / ((na**0.5) * (nb**0.5))

    want = {}
    for r in rows:
        own = cos(r["embedding"], cents[r["label"]])
        best_cs, best_l = max(
            (cos(r["embedding"], c), l)
            for l, c in cents.items()
            if l != r["label"]
        )
        st = want.setdefault(r["label"], [0, 0, 0, {}])
        st[0] += 1
        # Spark rounds HALF_UP (away from zero); Python round() is
        # half-even — match Spark explicitly
        m = (own - best_cs) * 1_000_000_000
        st[1] += int(math.floor(abs(m) + 0.5)) * (1 if m >= 0 else -1)
        if own <= best_cs:
            st[2] += 1
            st[3][best_l] = st[3].get(best_l, 0) + 1
    got = {
        r["label"]: (
            r["n_vecs"],
            r["margin_sum_q"],
            r["n_confused"],
            r["top_confusion"],
        )
        for r in REG["embeddings_label_margins"].fn(spark, sf_dir).collect()
    }
    for lbl, (n, mq, nc, conf) in want.items():
        top = (
            min(conf, key=lambda k: (-conf[k], k)) if conf else None
        )
        assert got[lbl] == (n, mq, nc, top), lbl
    assert set(got) == set(want)


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Multi-probe's candidate set is a SUPERSET of single-probe's
    (it probes the same bucket plus two Hamming-1 neighbors per band),
    so its recall vs the exact baseline can never be lower — and every
    vec the single-probe tier ranked must still be reachable."""
    exact = _topk_sets(REG["ann_cosine_topk"].fn(spark, sf_dir))
    single = _topk_sets(REG["ann_lsh_topk"].fn(spark, sf_dir))
    multi = _topk_sets(REG["ann_lsh_multiprobe_topk"].fn(spark, sf_dir))

    def recall(approx):
        total = hit = 0
        for q, truth in exact.items():
            total += len(truth)
            hit += len(truth & approx.get(q, set()))
        return hit / total

    r1, r3 = recall(single), recall(multi)
    assert r3 >= r1, f"multi-probe recall {r3:.2f} < single {r1:.2f}"
    assert r3 >= 0.4


def test_cdc_chunks_resynchronize_after_insertion(spark):
    """The property that justifies CDC over fixed windows: inserting a
    prefix shifts every fixed-window boundary, but CDC boundaries
    re-synchronize after the edit — the shifted document shares almost
    all its chunk hashes with the original (everything after the first
    post-edit boundary is cut identically)."""
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.operators.dedup import cdc_chunks_col

    base = (
        "the quick brown fox jumps over the lazy dog and then "
        "wanders through seventeen additional sentences of filler "
        "content that exists purely to give the chunker enough "
        "characters to place several content-defined boundaries "
        "inside this document body before it finally ends here"
    ) * 3
    shifted = "INSERTED-PREFIX-" + base

    df = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id bigint, text string"
    )
    rows = df.select(
        "doc_id", F.transform(cdc_chunks_col(), F.md5).alias("hs")
    ).collect()
    hs = {r["doc_id"]: r["hs"] for r in rows}
    assert len(hs[1]) >= 4, "corpus too short to place boundaries"
    shared = set(hs[1]) & set(hs[2])
    # everything after the first re-synchronized boundary is shared:
    # at most the first chunk of each differs
    assert set(hs[1][1:]) <= shared
    # reassembly sanity: chunks concatenate back to the document
    joined = df.select(
        "doc_id", F.concat_ws("", cdc_chunks_col()).alias("re")
    ).collect()
    for r in joined:
        want = base if r["doc_id"] == 1 else shifted
        assert r["re"] == want


def _py_u60_cdc(s: str) -> int:
    import hashlib as _h

    return int(_h.md5(s.encode()).hexdigest()[:15], 16)


def _py_cdc(text: str, w: int, d: int) -> list[str]:
    """Engine-free replica of the CDC rule: cut after any w-char
    window whose u60 ≡ 0 (mod d); doc start/end always bound."""
    cuts = (
        [0]
        + [
            p + w
            for p in range(0, len(text) - w + 1)
            if _py_u60_cdc(text[p : p + w]) % d == 0
        ]
        + [len(text)]
    )
    return [text[a:b] for a, b in zip(cuts, cuts[1:]) if b > a]


def test_cdc_resynchronization_property():
    """Engine-free pin of the CDC math: for ANY text and ANY inserted
    prefix, every chunk after the original's first boundary reappears
    verbatim in the edited document's chunking (extra boundaries can
    only appear in windows overlapping the insertion, all strictly
    before the first mapped cut), and chunks always reassemble to the
    document. Small w/d keep boundaries dense under hypothesis-sized
    texts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    w, d = 4, 4

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(alphabet="abc ", min_size=8, max_size=200),
        st.text(alphabet="xyz", min_size=1, max_size=40),
    )
    def run(t, s):
        c_t = _py_cdc(t, w, d)
        c_st = _py_cdc(s + t, w, d)
        assert "".join(c_t) == t
        assert "".join(c_st) == s + t
        if len(c_t) >= 2:
            # everything after the original's first chunk is shared
            assert set(c_t[1:]) <= set(c_st)

    run()


def test_cdc_engine_matches_python_replica(spark, sf_dir):
    """The engine's cdc_chunks_col must produce exactly the
    pure-Python replica's chunk lists (same u60, same w=16/d=64 rule)
    on real corpus documents — the cross-check that ties the
    engine-free property pin to the registered operator."""
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.operators.dedup import (
        _CDC_D,
        _CDC_W,
        cdc_chunks_col,
    )
    from streamlit_flink_demo_spark.sources.catalog import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .limit(20)
    )
    rows = docs.select(
        "doc_id", "text", cdc_chunks_col().alias("chunks")
    ).collect()
    assert rows
    for r in rows:
        assert list(r["chunks"]) == _py_cdc(r["text"], _CDC_W, _CDC_D)
