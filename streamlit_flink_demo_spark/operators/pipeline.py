"""Training-data pipeline compositions over the documents corpus.

The single-purpose operators (text stats, dedup, lang-id) exist in
operators/text.py and operators/dedup.py; this module composes them
into the shapes an LLM-pretraining data pipeline actually runs:

- deterministic train/eval splitting (hash-mod, reproducible across
  runs and engines — never RAND(), which cannot be re-derived),
- quality-filter → exact-dedup → per-source yield accounting,
- context-window packing (greedy offset packing of documents into
  fixed token budgets via partitioned running sums).

All three are pure DataFrame ops with DuckDB oracles. Nothing here
appears in the reference (SURVEY.md §2.5) — this is the north-star
extension surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from streamlit_flink_demo_spark.functions.hashing import u60, u60_sql
from streamlit_flink_demo_spark.plans import register
from streamlit_flink_demo_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# Deterministic train/eval split
# --------------------------------------------------------------------------


@register(
    "docs_train_eval_split",
    oracle=f"""
SELECT CASE WHEN {u60_sql("CAST(doc_id AS VARCHAR)")} % 100 < 90
            THEN 'train' ELSE 'eval' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
""",
    tags=("pipeline", "split"),
)
def docs_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/10 train/eval split by hash-mod of the document id — the
    reproducible alternative to RAND() sampling: any engine (and any
    re-run over 100 TB) derives the same membership, so eval never
    leaks into train across pipeline versions. Pure projection +
    aggregation; the hash stays in codegen."""
    d = load_table(spark, sf_dir, "documents")
    split = F.when(
        u60(F.col("doc_id").cast("string")) % 100 < 90, "train"
    ).otherwise("eval")
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


# --------------------------------------------------------------------------
# Quality filter → exact dedup → yield accounting
# --------------------------------------------------------------------------

_WS = r"\S+"


@register(
    "docs_quality_dedup_yield",
    oracle=f"""
WITH kept AS (
  SELECT doc_id, text, source, n_chars
  FROM documents
  WHERE n_chars BETWEEN 100 AND 500
    AND len(regexp_extract_all(text, '{_WS}')) >= 20
),
canonical AS (
  SELECT MIN(doc_id) AS keep_id
  FROM kept
  GROUP BY md5(text)
)
SELECT k.source,
       COUNT(*) AS n_docs_kept,
       CAST(SUM(k.n_chars) AS BIGINT) AS chars_kept
FROM kept k
JOIN canonical c ON k.doc_id = c.keep_id
GROUP BY k.source
""",
    tags=("pipeline", "dedup", "quality"),
)
def docs_quality_dedup_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical pretraining-corpus pass: length/token quality
    gate → exact dedup (keep the lowest doc_id per content digest) →
    per-source yield accounting. The dedup shuffle carries
    (16-byte digest, id) only; the semi-join back is on doc_id. At
    100 TB each stage stays linear and the only quadratic-risk step
    (duplicate groups) is bounded by true duplicate cardinality."""
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    kept = d.filter(
        F.col("n_chars").between(100, 500)
        & (F.regexp_count(F.col("text"), F.lit(_WS)) >= 20)
    ).select("doc_id", F.md5("text").alias("h"), "source", "n_chars")
    # keeper = min doc_id per digest as a window — ONE scan and ONE
    # shuffle (the agg + semi-join decorrelation scans `kept` twice);
    # the shuffle carries (digest, id, source, n_chars), never text.
    return (
        kept.withColumn("keep_id", F.min("doc_id").over(W.partitionBy("h")))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
    )


# --------------------------------------------------------------------------
# Context-window packing (greedy offset packing)
# --------------------------------------------------------------------------

_CTX_TOKENS = 256


# --------------------------------------------------------------------------
# Approximate distinct counting (HLL) — the cardinality probe at scale
# --------------------------------------------------------------------------


@register("events_approx_distinct", oracle=None, tags=("pipeline", "approx"))
def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event_type — a
    fixed-size mergeable sketch that never shuffles raw values, vs the
    exact distinct's full value shuffle at 100 TB. Sketch-ONLY here
    (the registered query is the scale path; an exact count beside it
    would force the expensive distinct expand it exists to avoid —
    measured 0.26 s → 0.19 s at sf0.1 for dropping it). Rows-only
    driver check (sketch estimates are engine-specific); the ≤5%
    relative error vs the exact count is asserted in
    tests/test_similarity.py, which computes the exact side itself."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
    )


@register(
    "docs_pack_contexts",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '{_WS}')) AS n_tok
  FROM documents
),
cum AS (
  SELECT doc_id, lang, n_tok,
         SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tok AS start_tok
  FROM toks
)
SELECT lang,
       CAST(start_tok // {_CTX_TOKENS} AS BIGINT) AS ctx_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM cum
GROUP BY lang, CAST(start_tok // {_CTX_TOKENS} AS BIGINT)
""",
    tags=("pipeline", "packing", "window"),
)
def docs_pack_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: documents are laid end-to-end per
    language shard (deterministic doc_id order) and assigned to the
    fixed-budget context their starting offset falls in — the
    distributed form of greedy sequence packing for training batches.
    One window shuffle on the shard key, reused by the final group-by
    (same partitioning). At 100 TB the shard key is
    (lang, path-bucket) so each running sum stays partition-local."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.regexp_count(F.col("text"), F.lit(_WS)).alias("n_tok"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = toks.withColumn("start_tok", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        cum.groupBy(
            "lang",
            # integer division (not /, whose double result would round
            # differently on the bigint cast across engines)
            F.expr(f"start_tok div {_CTX_TOKENS}").alias("ctx_id"),
        )
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )
