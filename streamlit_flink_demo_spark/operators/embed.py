"""Batch embedding encoder: documents.text -> array<double> vectors.

The stage every semantic operator in this engine consumes but (until
round 9) nothing produced: the reference demo's corpus arrives with
embeddings precomputed upstream (the role JR-generated data plays for
it — /root/reference/README.md:108-112), and our ``embeddings`` fixture
played that part. This module closes the loop so text -> embed ->
semantic-dedup runs end-to-end inside the engine.

Two tiers, the multimodal codec-tier pattern (operators/multimodal.py):

- **Deterministic tier** (``docs_embed``, the registered/oracle path):
  a hashing-trick random-projection encoder (Weinberger et al. 2009
  feature hashing; Charikar 2002 SimHash): every token hashes ONCE to a
  60-bit md5-derived integer (functions/hashing.u60 — the only digest
  both engines compute bit-identically), and bit ``d`` of that hash is
  an independent Rademacher ±1 in dimension ``d``; the document vector
  is the token-sum, L2-normalized. Integer sums are exact and
  order-independent (deterministic under any partitioning), the
  normalization fold is sequential double arithmetic — so the whole
  encoder replays bit-for-bit in the DuckDB oracle.
- **Real tier** (``encode_documents``): Arrow-batched mapInPandas over
  a pluggable ``encoder(texts) -> np.ndarray`` callable — by default a
  sentence-transformers model, import-gated with the install remedy
  (this container ships without torch); tests inject a fake callable,
  so the Spark-side plumbing (batching, schema, partition shape) is
  real and pinned even where the model is not installable.

Scale shape (deterministic tier): ONE narrow projection chain over the
documents scan — no explode (tokens stay an array per row), no shuffle,
no Python. The token-hash array is materialized in its own projection
so Catalyst cannot inline the md5 work into each of the 16 per-dim
folds (CollapseProject keeps non-cheap exprs referenced >1× in their
own Project); the bit-folds then cost integer ops only. At 100 TB this
is a map-only stage that rides whatever partitioning the scan has.

Reference parity: the reference has no encoder (embeddings arrive from
outside the demo); this operator is the training-data-pipeline
extension the build brief mandates, not a port.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.functions.hashing import u60, u60_sql
from streamlit_flink_demo_spark.functions.vectors import dot, dot_sql
from streamlit_flink_demo_spark.plans import register, track_persist
from streamlit_flink_demo_spark.sources.catalog import load_spread

_EMB_DIM = 16  # <= 60 (one u60 hash yields all dims' sign bits)

# Composed semantic-dedup knobs (docs_embed_semdedup): sign-LSH bucket
# on the first _BKT_BITS dims (near-identical vectors share all sign
# bits), rank-window prune exactly like docs_semdedup (_SEM_W there).
_BKT_BITS = 8
_EMB_W = 8
# Tuned to the synthetic corpus (tiny shared vocabulary -> high
# baseline cosine between random bags; measured pair-cosine p50 ~0.8
# in-bucket): 0.97 exercises the prune on a few percent of candidates
# at every SF. A production embedding corpus would run ~0.9 on real
# model vectors (SemDeDup's operating point).
_EMB_TAU = 0.97


# --------------------------------------------------------------------------
# Deterministic tier: hash-projection encoder (JVM-only, SQL-replayable)
# --------------------------------------------------------------------------


def embed_columns(d: DataFrame) -> DataFrame:
    """The encoder as a pure projection chain over ANY (doc_id, text)
    frame — batch or STREAMING (it is stateless and shuffle-free, so
    it attaches to a readStream source unchanged; pinned by
    tests/test_embed.py::test_encoder_runs_on_a_stream). Produces
    (doc_id, n_tokens, v bigint[DIM], l2_norm, embedding double[DIM]):

    p1: tokens -> one u60 hash per token (the only md5 work)
    p2: 16 integer bit-folds over the hash array + token count
    p3: sequential-fold L2 norm
    p4: normalized double vector (zero vector for empty/cancelled docs)
    """
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )
    th = F.transform(toks, lambda t: u60(F.concat(F.lit("emb:"), t)))
    p1 = d.select("doc_id", th.alias("th"))

    def _bit_fold(d_: int):
        # closure (not a lambda default) — pyspark counts every lambda
        # parameter, defaults included, as a higher-order-function
        # variable, so `lambda acc, h, d_=d_` would arity-mismatch
        return F.aggregate(
            F.col("th"),
            F.lit(0).cast("bigint"),
            lambda acc, h: acc
            + ((F.shiftright(h, d_) % 2) * 2 - 1).cast("bigint"),
        )

    v = F.array(*[_bit_fold(d_) for d_ in range(_EMB_DIM)])
    p2 = p1.select(
        "doc_id", F.size("th").cast("bigint").alias("n_tokens"), v.alias("v")
    )

    nrm = F.sqrt(
        F.aggregate(
            F.col("v"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    p3 = p2.select("doc_id", "n_tokens", "v", nrm.alias("l2_norm"))

    emb = F.when(
        F.col("l2_norm") == 0.0,
        F.array(*[F.lit(0.0) for _ in range(_EMB_DIM)]),
    ).otherwise(
        F.transform(F.col("v"), lambda x: x.cast("double") / F.col("l2_norm"))
    )
    return p3.select(
        "doc_id", "n_tokens", "v", "l2_norm", emb.alias("embedding")
    )


def sign_bucket_col() -> F.Column:
    """Sign-LSH bucket over the first _BKT_BITS dims of the raw fold
    vector ``v`` (SimHash-style: near-identical vectors agree on every
    sign bit). Shared by the batch semdedup prune and the streaming
    ingest-time semantic dedup so the bucketing can't fork."""
    return sum(
        F.when(F.col("v")[d] > 0, F.lit(1 << d)).otherwise(F.lit(0))
        for d in range(_BKT_BITS)
    ).cast("bigint")


def _embed_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch encode of the documents table, persisted: the
    md5-per-token projection is the dominant cost, and every consumer
    of the family (the embed surface, the semdedup prune's two join
    sides, the search query's query+corpus sides) rebuilds an
    identical plan — Spark's CacheManager matches canonicalized plans,
    so ONE persisted encode serves them all (measured: the 3-branch
    embed_pipeline_suite re-encoded 3x, 4.9 s at sf0.1; shared-cache
    cut it to 0.8 s). At 100 TB the same role is played by
    materializing the encode as a parquet table — the `embeddings`
    table of a production pipeline IS this stage's output;
    in-session persist is the query-scoped form."""
    d = load_spread(spark, sf_dir, "documents", min_bytes=32 << 20)
    return track_persist(embed_columns(d))


def _embed_ctes(src: str = "documents", prefix: str = "e") -> list[str]:
    """DuckDB CTE chain replaying the encoder exactly (same hash, same
    bit extraction, same fold orders), ending in ``{prefix}emb``.
    Shared by the docs_embed oracle, the composed semantic-dedup /
    search oracles, and (with ``src``/``prefix``) the chunk-level
    retrieval oracle (operators/retrieval.py) so the encoder replay
    cannot fork between them. ``src`` must expose (doc_id, text)."""
    p = prefix
    return [
        f"""{p}th AS (
  SELECT doc_id,
         list_transform(
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       t -> t <> ''),
           t -> {u60_sql("'emb:' || t")}) AS th
  FROM {src}
)""",
        f"""{p}vv AS (
  SELECT doc_id, len(th)::BIGINT AS n_tokens,
         [CAST(COALESCE(list_aggregate(
             list_transform(th, h -> ((h >> d) & 1) * 2 - 1), 'sum'), 0)
           AS BIGINT) for d in range({_EMB_DIM})] AS v
  FROM {p}th
)""",
        f"""{p}nn AS (
  SELECT doc_id, n_tokens, v,
         sqrt(list_aggregate(
           [(v[d+1]::DOUBLE) * (v[d+1]::DOUBLE)
            for d in range({_EMB_DIM})], 'sum')) AS l2_norm
  FROM {p}vv
)""",
        f"""{p}emb AS (
  SELECT doc_id, n_tokens, v, l2_norm,
         CASE WHEN l2_norm = 0
              THEN [0.0::DOUBLE for d in range({_EMB_DIM})]
              ELSE [(v[d+1]::DOUBLE) / l2_norm
                    for d in range({_EMB_DIM})] END AS embedding
  FROM {p}nn
)""",
    ]


_EMBED_ORACLE = (
    "WITH "
    + ",\n".join(_embed_ctes())
    + """
SELECT doc_id, n_tokens, l2_norm, embedding FROM eemb
"""
)


@register(
    "docs_embed",
    oracle=_EMBED_ORACLE,
    tags=("embed", "encoder", "pipeline"),
    expose=False,
)
def docs_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-projection document encoder: text ->
    L2-normalized ``array<double>`` (16-d). One token-hash per token
    (md5/u60), sign-bit Rademacher projection per dimension, exact
    integer sums, sequential-fold normalization — value-identical to
    the SQL replay at every SF. Driver-surfaced through the 'embed'
    branch of embed_pipeline_suite."""
    return _embed_frame(spark, sf_dir).select(
        "doc_id", "n_tokens", "l2_norm", "embedding"
    )


# --------------------------------------------------------------------------
# Composed pipeline: text -> embed -> sign-LSH bucket -> windowed prune
# --------------------------------------------------------------------------


def _semdedup_oracle_sql() -> str:
    steps = _embed_ctes()
    bucket = " + ".join(
        f"(CASE WHEN v[{d + 1}] > 0 THEN {1 << d} ELSE 0 END)"
        for d in range(_BKT_BITS)
    )
    steps.append(
        f"""erk AS (
  SELECT doc_id, n_tokens, embedding,
         CAST({bucket} AS BIGINT) AS bucket,
         ROW_NUMBER() OVER (PARTITION BY CAST({bucket} AS BIGINT)
                            ORDER BY n_tokens DESC, doc_id) AS rk
  FROM eemb
)"""
    )
    cos = dot_sql("a.embedding", "b.embedding", _EMB_DIM)
    steps.extend(
        [
            f"""edrop AS (
  SELECT a.bucket, b.doc_id AS b_id
  FROM erk a JOIN erk b
    ON a.bucket = b.bucket AND b.rk > a.rk AND b.rk <= a.rk + {_EMB_W}
  WHERE {cos} >= {_EMB_TAU}
  GROUP BY a.bucket, b.doc_id
)""",
            """emem AS (
  SELECT bucket, COUNT(*) AS n_docs, SUM(doc_id) AS sum_doc_id
  FROM erk GROUP BY bucket
)""",
            """edst AS (
  SELECT bucket, COUNT(*) AS n_dropped, SUM(b_id) AS dropped_sum
  FROM edrop GROUP BY bucket
)""",
        ]
    )
    return (
        "WITH "
        + ",\n".join(steps)
        + """
SELECT m.bucket,
       CAST(m.n_docs AS BIGINT) AS n_docs,
       CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(COALESCE(d.dropped_sum, 0) AS BIGINT) AS dropped_checksum,
       CAST(m.sum_doc_id - COALESCE(d.dropped_sum, 0) AS BIGINT)
         AS kept_checksum
FROM emem m LEFT JOIN edst d USING (bucket)
"""
    )


@register(
    "docs_embed_semdedup",
    oracle=_semdedup_oracle_sql(),
    tags=("embed", "dedup", "semantic", "pipeline"),
    expose=False,
)
def docs_embed_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end semantic dedup from RAW TEXT: encode (docs_embed's
    hash projection), sign-LSH bucket on the first 8 dims (SimHash-
    style: near-identical vectors agree on every sign bit), rank
    members by (n_tokens DESC, doc_id) — the keep-the-longest policy —
    and prune any member whose cosine to a within-_EMB_W-ranks
    predecessor reaches _EMB_TAU. Per-bucket integer summary so the
    whole encode -> bucket -> rank -> prune chain is value-exact
    against the SQL replay.

    Scale shape: the encoder is map-only; bucketing is a projection;
    ONE hash shuffle on bucket feeds both the rank window and the
    self-join (n·W candidates, never crossing the wire unpaired —
    the docs_semdedup argument); summaries are <=2^_BKT_BITS-row
    aggregates. Driver-surfaced through the 'semdedup' branch of
    embed_pipeline_suite."""
    bucket = sign_bucket_col()
    from pyspark.sql import Window as W

    base = _embed_frame(spark, sf_dir).select(
        "doc_id", "n_tokens", "embedding", bucket.alias("bucket")
    )
    w = W.partitionBy("bucket").orderBy(F.col("n_tokens").desc(), "doc_id")
    ranked = track_persist(base.withColumn("rk", F.row_number().over(w)))

    # Rank-BLOCK banding for the W-neighbor pairing: a plain
    # equi-join on bucket with a post-join rank-range filter buffers
    # the WHOLE equal-key group in the sort-merge join — on a skewed
    # sign-bucket (this synthetic corpus concentrates most docs into a
    # few buckets) that is an n²-per-bucket scan (measured 58× at 10×
    # data). Instead: block = floor((rk-1)/W); a pair with
    # b.rk in (a.rk, a.rk+W] always has b.blk in {a.blk, a.blk+1}, so
    # the a-side explodes into its two probe blocks and the join key
    # becomes (bucket, blk) — every join group is <= W rows and total
    # pair work is O(n·W) regardless of bucket skew. Semantics are
    # identical (the rank-range filter still applies); the oracle
    # keeps the direct range-join formulation.
    blk = F.floor((F.col("rk") - 1) / _EMB_W).cast("bigint")
    a = (
        ranked.withColumn(
            "probe_blk", F.explode(F.array(blk, blk + 1))
        )
        .select(
            F.col("bucket").alias("a_bucket"),
            F.col("doc_id").alias("a_id"),
            F.col("rk").alias("a_rk"),
            F.col("embedding").alias("a_emb"),
            "probe_blk",
        )
    )
    b = ranked.select(
        "bucket",
        F.col("doc_id").alias("b_id"),
        F.col("rk").alias("b_rk"),
        F.col("embedding").alias("b_emb"),
        blk.alias("blk"),
    )
    drops = (
        a.join(
            b,
            (F.col("a_bucket") == F.col("bucket"))
            & (F.col("probe_blk") == F.col("blk"))
            & (F.col("b_rk") > F.col("a_rk"))
            & (F.col("b_rk") <= F.col("a_rk") + _EMB_W),
        )
        .filter(dot(F.col("a_emb"), F.col("b_emb")) >= _EMB_TAU)
        .groupBy(F.col("bucket"), F.col("b_id"))
        .agg(F.lit(1))
    )
    mem = ranked.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
    )
    dst = drops.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_dropped"),
        F.sum("b_id").cast("bigint").alias("dropped_sum"),
    )
    return mem.join(dst, "bucket", "left").select(
        "bucket",
        "n_docs",
        F.coalesce(F.col("n_dropped"), F.lit(0)).cast("bigint").alias(
            "n_dropped"
        ),
        F.coalesce(F.col("dropped_sum"), F.lit(0)).cast("bigint").alias(
            "dropped_checksum"
        ),
        (F.col("sum_doc_id") - F.coalesce(F.col("dropped_sum"), F.lit(0)))
        .cast("bigint")
        .alias("kept_checksum"),
    )


# --------------------------------------------------------------------------
# Composed pipeline: text -> embed -> top-k similar-document search
# --------------------------------------------------------------------------

_SRCH_N_QUERIES = 5
_SRCH_TOPK = 5


def _search_oracle_sql() -> str:
    steps = _embed_ctes()
    cos = dot_sql("q.q_emb", "e.embedding", _EMB_DIM)
    steps.append(
        f"""eq AS (
  SELECT doc_id AS q_id, embedding AS q_emb FROM eemb
  WHERE doc_id < {_SRCH_N_QUERIES}
)"""
    )
    return (
        "WITH "
        + ",\n".join(steps)
        + f"""
SELECT q_id, doc_id, cos_sim, rk FROM (
  SELECT q.q_id, e.doc_id, {cos} AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q.q_id
                            ORDER BY {cos} DESC, e.doc_id) AS rk
  FROM eq q JOIN eemb e ON e.doc_id <> q.q_id
) WHERE rk <= {_SRCH_TOPK}
"""
    )


@register(
    "docs_embed_search",
    oracle=_search_oracle_sql(),
    tags=("embed", "similarity", "pipeline"),
    expose=False,
)
def docs_embed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end similar-document search from RAW TEXT: encode both
    sides with docs_embed's hash projection, broadcast the (tiny)
    query set, exact-cosine rank the corpus per query (vectors are
    unit-normalized, so the dot IS the cosine; zero-norm docs score
    0), keep top-k. The ann_cosine_topk shape over derived embeddings
    — the correctness baseline a production deployment would LSH/IVF
    above (those scale tiers already exist over the embeddings table;
    this query proves the text->embed->search composition end-to-end).
    One corpus encode pass + a broadcast join + one rank shuffle."""
    from pyspark.sql import Window as W

    emb = _embed_frame(spark, sf_dir).select("doc_id", "embedding")
    q = F.broadcast(
        emb.filter(F.col("doc_id") < _SRCH_N_QUERIES).select(
            F.col("doc_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
    )
    scored = q.join(emb, F.col("doc_id") != F.col("q_id")).select(
        "q_id",
        "doc_id",
        dot(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _SRCH_TOPK)
        .select("q_id", "doc_id", "cos_sim", "rk")
    )


# --------------------------------------------------------------------------
# Real tier: Arrow-batched pluggable encoder (mapInPandas)
# --------------------------------------------------------------------------

ENCODE_SCHEMA = "doc_id bigint, embedding array<double>"


def _default_real_encoder(model_name: str) -> Callable[[list], "np.ndarray"]:
    try:
        from sentence_transformers import SentenceTransformer  # type: ignore
    except ImportError as ex:
        raise NotImplementedError(
            "real embedding tier needs the sentence-transformers package "
            "(pip install sentence-transformers torch) — this container "
            "ships without it. The deterministic tier (docs_embed) and the "
            "injectable-encoder tests exercise the identical Spark plumbing "
            "(mapInPandas batching, array schema, partition shape)."
        ) from ex
    model = SentenceTransformer(model_name)
    return lambda texts: model.encode(texts, convert_to_numpy=True)


def encode_documents(
    df: DataFrame,
    encoder: Callable[[list], "np.ndarray"] | None = None,
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
    batch_size: int = 64,
) -> DataFrame:
    """Real-tier encoder plumbing: (doc_id, text) -> (doc_id,
    embedding array<double>) via mapInPandas. ``encoder`` is a
    plain callable ``list[str] -> (n, dim) ndarray`` — the default
    loads a sentence-transformers model ONCE PER PYTHON WORKER (lazy,
    inside the iterator, the expensive-init pattern every UDF-hosted
    model uses) and is import-gated; tests inject a deterministic fake
    so the batching contract is pinned without torch.

    Scale shape: map-only over whatever partitioning the scan has;
    Arrow batches are re-chunked to ``batch_size`` so GPU/BLAS batch
    geometry is controlled by the caller, not by
    spark.sql.execution.arrow.maxRecordsPerBatch."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = encoder if encoder is not None else _default_real_encoder(
            model_name
        )
        for pdf in it:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size]
                vecs = np.asarray(enc(chunk["text"].tolist()), dtype=np.float64)
                yield pd.DataFrame(
                    {
                        "doc_id": chunk["doc_id"].to_numpy(),
                        "embedding": list(vecs),
                    }
                )

    return df.select("doc_id", "text").mapInPandas(run, ENCODE_SCHEMA)


def build_embed_encode(spark: SparkSession, sf_dir: str, force: bool = False):
    """Materialize the corpus encode for the bench's artifacts ledger:
    the registered embed queries share ONE persisted encode (see
    _embed_frame), so their timed windows measure probe work — this
    entry measures the encode itself, the same disclosure the
    lsh/ivf/kmeans builders get. ``force`` drops the prepared-plan and
    block caches first so the timed pass is the real md5-per-token
    projection, not a cache read."""
    from streamlit_flink_demo_spark.plans import clear_plan_cache

    if force:
        clear_plan_cache()
        spark.catalog.clearCache()
    _embed_frame(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return ""
