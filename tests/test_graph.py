"""Connected-component duplicate clustering invariants: the oracle
parity test proves hash-equality with the recursive-CTE closure; these
pin the graph semantics independently of the oracle."""

from __future__ import annotations

from streamlit_flink_demo_spark.plans import load_all

REG = load_all(exposed_only=False)


def test_clusters_cover_pairs_and_pick_min_canonical(spark, sf_dir):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in REG["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    ]
    lab = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in REG["dedup_connected_clusters"].fn(spark, sf_dir).collect()
    }
    # every near-dup pair landed in one cluster
    for a, b in pairs:
        assert lab[a][0] == lab[b][0], (a, b)
    # cluster id is the component minimum; exactly that doc is canonical
    by_cluster: dict[int, list[int]] = {}
    for doc, (cid, _) in lab.items():
        by_cluster.setdefault(cid, []).append(doc)
    for cid, docs in by_cluster.items():
        assert cid == min(docs)
    for doc, (cid, canon) in lab.items():
        assert canon == (doc == cid)


def test_transitive_closure_via_python_union_find(spark, sf_dir):
    """Independent reimplementation: union-find over the pair list must
    produce the identical partition (labels may differ; partition must
    not)."""
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in REG["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    ]
    lab = {
        r["doc_id"]: r["cluster_id"]
        for r in REG["dedup_connected_clusters"].fn(spark, sf_dir).collect()
    }
    parent: dict[int, int] = {d: d for d in lab}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for doc in lab:
        assert lab[doc] == find(doc), doc


def test_leakage_safe_split_no_pair_straddles(spark, sf_dir):
    """The property the cluster-level split exists for: NO near-dup
    pair may straddle train/eval — checked directly against the raw
    LSH pair list, not through the cluster labels the operator uses."""
    from pyspark.sql import functions as F

    from streamlit_flink_demo_spark.functions.hashing import u60
    from streamlit_flink_demo_spark.operators.dedup import _LS_SALT
    from streamlit_flink_demo_spark.plans import REGISTRY

    cl = REGISTRY["dedup_connected_clusters"].fn(spark, sf_dir)
    side = cl.select(
        "doc_id",
        (
            u60(
                F.concat(
                    F.lit(_LS_SALT), F.col("cluster_id").cast("string")
                )
            )
            % 100
            < 90
        ).alias("is_train"),
    )
    pairs = REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    straddles = (
        pairs.join(
            side.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "is_train", "ta"
            ),
            "doc_a",
        )
        .join(
            side.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "is_train", "tb"
            ),
            "doc_b",
        )
        .filter(F.col("ta") != F.col("tb"))
        .count()
    )
    assert straddles == 0
    # and the split is actually a split: both sides nonempty
    sides = {r["is_train"] for r in side.distinct().collect()}
    assert sides == {True, False}
