"""Text-analysis operators over ``documents``.

All pure built-in expressions (regexp_count / regexp_extract_all /
length) — no Python in the row path, so these run inside whole-stage
codegen and scale linearly. Regex patterns are restricted to syntax
that Java regex (Spark) and RE2 (DuckDB) interpret identically, so the
oracle is exact.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.functions.hashing import u60, u60_sql
from streamlit_flink_demo_spark.plans import register
from streamlit_flink_demo_spark.sources.catalog import load_spread, load_table

# --------------------------------------------------------------------------
# Quality / stats scoring
# --------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
_STOP_PAT = r"\b(" + "|".join(_STOPWORDS) + r")\b"

_STATS_ORACLE = rf"""
SELECT
  doc_id,
  length(text) AS n_chars_m,
  len(regexp_extract_all(text, '\S+')) AS n_tokens,
  len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
  len(regexp_extract_all(lower(text), '{_STOP_PAT}'))
    / GREATEST(len(regexp_extract_all(text, '\S+')), 1)::DOUBLE
    AS stopword_ratio,
  length(regexp_replace(text, '\s', '', 'g'))
    / GREATEST(len(regexp_extract_all(text, '\S+')), 1)::DOUBLE
    AS avg_token_len
FROM documents
"""


@register("text_quality_stats", oracle=_STATS_ORACLE, tags=("text",), expose=False)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features: char/token/punct counts, stopword
    ratio, mean token length. Pure codegen projection straight off
    the scan — zero shuffles (a pre-repartition of full document text
    costs more than these regexp_counts save; measured 0.28 s direct
    vs 1.26 s spread at sf0.1; the 32 MB byte-gate re-enables the
    spread once the corpus outgrows its scan split — measured 6× at
    10× replication without it)."""
    d = load_spread(spark, sf_dir, "documents", min_bytes=32 << 20)
    n_tokens = F.regexp_count(F.col("text"), F.lit(r"\S+"))
    denom = F.greatest(n_tokens, F.lit(1)).cast("double")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[.,!?;:]")).alias("n_punct"),
        (
            F.regexp_count(F.lower(F.col("text")), F.lit(_STOP_PAT)) / denom
        ).alias("stopword_ratio"),
        (
            F.length(F.regexp_replace(F.col("text"), r"\s", "")) / denom
        ).alias("avg_token_len"),
    )


# --------------------------------------------------------------------------
# Language identification (stopword-voting heuristic)
# --------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ("the", "and", "is", "of"),
    "de": ("der", "und", "ist", "das"),
    "fr": ("le", "et", "est", "les"),
    "es": ("el", "y", "es", "los"),
}


def _marker_pat(lang: str) -> str:
    return r"\b(" + "|".join(_LANG_MARKERS[lang]) + r")\b"


_lang_scores_sql = ",\n  ".join(
    f"len(regexp_extract_all(lower(text), '{_marker_pat(lang)}')) AS s_{lang}"
    for lang in _LANG_MARKERS
)

_LANG_ORACLE = f"""
WITH scores AS (
  SELECT doc_id, lang AS lang_actual,
  {_lang_scores_sql}
  FROM documents
)
SELECT doc_id, lang_actual,
  CASE
    WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'unknown'
    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
    WHEN s_fr >= s_es THEN 'fr'
    ELSE 'es'
  END AS lang_guess
FROM scores
"""


@register("text_lang_id", oracle=_LANG_ORACLE, tags=("text", "langid"), expose=False)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language stopword votes, determinstic
    priority argmax (en > de > fr > es on ties), 'unknown' when no
    marker fires. A real deployment would swap the marker lists for
    character-n-gram profiles — the plan shape (narrow projection)
    stays the same. Byte-gated spread: zero-shuffle at bench SF,
    parallelized past 32 MB."""
    d = load_spread(spark, sf_dir, "documents", min_bytes=32 << 20)
    lowered = F.lower(F.col("text"))
    scores = {
        lang: F.regexp_count(lowered, F.lit(_marker_pat(lang)))
        for lang in _LANG_MARKERS
    }
    guess = (
        F.when(
            (scores["en"] == 0)
            & (scores["de"] == 0)
            & (scores["fr"] == 0)
            & (scores["es"] == 0),
            "unknown",
        )
        .when(
            (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["es"]),
            "en",
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] >= scores["es"]), "de")
        .when(scores["fr"] >= scores["es"], "fr")
        .otherwise("es")
    )
    return d.select(
        "doc_id", F.col("lang").alias("lang_actual"), guess.alias("lang_guess")
    )


# --------------------------------------------------------------------------
# Token counting (BPE-ish regex segmentation)
# --------------------------------------------------------------------------

_BPE_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_TOKENS_ORACLE = rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_PAT}')) AS n_bpe_tokens,
       len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
       CEIL(length(text) / 4.0)::BIGINT AS n_chars_div4
FROM documents
"""


@register("text_token_count", oracle=_TOKENS_ORACLE, tags=("text", "tokens"), expose=False)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: BPE-ish regex segmentation (letters /
    digits / single punctuation — the GPT-2 pre-tokenizer shape),
    whitespace tokens, and the chars/4 heuristic. Byte-gated spread
    (no-op at bench SF)."""
    d = load_spread(spark, sf_dir, "documents", min_bytes=32 << 20)
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_BPE_PAT)).alias("n_bpe_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"\S+")).alias("n_ws_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("n_chars_div4"),
    )


# --------------------------------------------------------------------------
# Text normalization (pretraining cleanup pass)
# --------------------------------------------------------------------------

_NORM_ORACLE = """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS norm_md5,
       length(trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS n_chars_norm
FROM documents
"""


@register("text_normalize", oracle=_NORM_ORACLE, tags=("text", "normalize"), expose=False)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization pass before dedup/tokenization: lowercase, strip
    non-alphanumerics, collapse whitespace, trim — emitted as a
    content digest + length (the compact form downstream exact-dedup
    keys on). Pure codegen projection kernel, byte-gated spread
    (no-op at bench SF); Spark's
    regexp_replace is global by default, the oracle passes the 'g'
    flag for the same semantics."""
    d = load_spread(spark, sf_dir, "documents", min_bytes=32 << 20)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", " "),
            r"\s+",
            " ",
        )
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).alias("n_chars_norm"),
    )


# --------------------------------------------------------------------------
# PII redaction (pretraining scrub pass)
# --------------------------------------------------------------------------

# Patterns restricted to syntax Java regex and RE2 read identically.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_URL = r"https?://[^\s]+"
_PII_PHONE = r"\d{3}[-.]\d{3}[-.]\d{4}"
_PII_NUM = r"\d+"

_REDACT_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(text, '{_PII_URL}')) AS n_urls,
       len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phones,
       len(regexp_extract_all(text, '{_PII_NUM}')) AS n_nums,
       md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           text, '{_PII_EMAIL}', '<EMAIL>', 'g'), '{_PII_URL}', '<URL>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g'), '{_PII_NUM}', '<NUM>', 'g'))
         AS redacted_md5
FROM documents
"""


@register(
    "text_redact_pii",
    oracle=_REDACT_ORACLE,
    tags=("text", "redact", "pii"),
    expose=False,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass for a pretraining corpus: emails / URLs / phone
    numbers / bare numbers replaced by typed placeholder tokens, with
    per-category match counts and the digest of the redacted text
    (what downstream dedup keys on — redaction must happen BEFORE
    dedup or the same document with two emails survives twice). Order
    matters: emails and URLs are matched before the bare-number rule
    so their digits don't get shredded into <NUM>. Pure codegen
    projection, zero shuffles; driver-checked inside
    scalar_funcs_suite (family redact_pii). Byte-gated spread
    (no-op at bench SF)."""
    d = load_spread(spark, sf_dir, "documents", min_bytes=32 << 20)
    redacted = F.col("text")
    for pat, tok in (
        (_PII_EMAIL, "<EMAIL>"),
        (_PII_URL, "<URL>"),
        (_PII_PHONE, "<PHONE>"),
        (_PII_NUM, "<NUM>"),
    ):
        redacted = F.regexp_replace(redacted, pat, tok)
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_PII_URL)).alias("n_urls"),
        F.regexp_count(F.col("text"), F.lit(_PII_PHONE)).alias("n_phones"),
        F.regexp_count(F.col("text"), F.lit(_PII_NUM)).alias("n_nums"),
        F.md5(redacted).alias("redacted_md5"),
    )


# --------------------------------------------------------------------------
# Document fingerprinting (min-hash over rolling char 8-grams)
# --------------------------------------------------------------------------

# Gram stride: hash every 2nd 8-gram position instead of all of them.
# Measured at sf0.1 (forced evaluation): all-grams 2.94 s, stride-2
# 1.50 s, stride-4 0.81 s; the md5 per gram dominates and is the only
# cross-engine-stable hash (xxhash64 all-grams is 1.67 s but DuckDB
# can't reproduce it → would demote the query to rows-only). Stride-2
# is the chosen point: 2× throughput, and the sketch stays exact for
# the primary use (byte-identical copies always collide since the
# sampled positions are content-relative). Trade-off, documented: an
# odd-length edit flips gram alignment downstream of the edit, so
# near-dup (not exact) matches lose sensitivity vs all-grams — at
# stride s the bottom-1 gram survives sampling with probability 1/s
# on shifted content. Larger strides pay more of that for less gain.
_FP_STRIDE = 2

_FP_ORACLE = f"""
SELECT doc_id,
       list_min([{u60_sql("substr(text, i, 8)")}
                 for i in range(1, GREATEST(length(text) - 6, 2), {_FP_STRIDE})])
         AS fingerprint,
       length(text) AS n_chars_m
FROM documents
"""


@register("text_fingerprint", oracle=_FP_ORACLE, tags=("text", "fingerprint"), expose=False)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: minimum 60-bit hash over
    stride-sampled sliding char-8-grams (a bottom-1 sketch — equal
    fingerprints flag likely shared content; see _FP_STRIDE for the
    measured sampling trade-off). Computed with array higher-order
    functions per row. spread() pre-repartition: the per-gram md5
    kernel is the heavy part (measured 2.75 s -> 0.44 s at sf0.1 with
    the spread); it is the one text operator whose kernel dwarfs the
    repartition shuffle."""
    d = load_spread(spark, sf_dir, "documents")
    fp = F.array_min(
        F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.length("text") - 6, F.lit(2)) - 1,
                F.lit(_FP_STRIDE),
            ),
            lambda i: u60(F.expr("text").substr(i, F.lit(8))),
        )
    )
    return d.select(
        "doc_id", fp.alias("fingerprint"), F.length("text").alias("n_chars_m")
    )


# --------------------------------------------------------------------------
# Arrow-UDF surface, driver-checked (SURVEY §2.5 UDF/UDAF row)
# --------------------------------------------------------------------------

_UDF_METRICS_ORACLE = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS n_tokens_udf,
       length(text) AS n_chars_udf
FROM documents
"""


@register(
    "udf_text_metrics",
    oracle=_UDF_METRICS_ORACLE,
    tags=("udf", "text"),
    expose=False,
)
def udf_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Arrow (pandas) UDFs in the row path, value-checked by the
    driver against a plain-SQL oracle — the registration surface itself
    is pinned by tests/test_udf_registration.py; this member proves the
    UDF OUTPUT end-to-end. Scale: Arrow batch transfer, one Python
    roundtrip per ~10k-row batch, no shuffle."""
    @F.pandas_udf("bigint")
    def ws_tokens(s: pd.Series) -> pd.Series:
        return s.str.count(r"\S+").astype("int64")

    @F.pandas_udf("bigint")
    def n_chars(s: pd.Series) -> pd.Series:
        return s.str.len().astype("int64")

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ws_tokens("text").alias("n_tokens_udf"),
        n_chars("text").alias("n_chars_udf"),
    )


_UDAF_LANG_ORACLE = """
SELECT lang,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang
"""


@register(
    "udaf_lang_chars",
    oracle=_UDAF_LANG_ORACLE,
    tags=("udf", "udaf", "text"),
    expose=False,
)
def udaf_lang_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAFs (Series -> scalar) —
    driver-checked against plain SQL. Integer sum keeps the comparison
    exact (no float summation order); Spark disallows mixing
    grouped-agg pandas UDFs with built-in aggregates in one agg, so the
    row count is a second UDAF. Scale: grouped-agg UDAFs shuffle once
    on the group key, same as built-in aggregates, then one Arrow
    batch per group."""
    @F.pandas_udf("bigint")
    def total_chars(s: pd.Series) -> int:
        return int(s.sum())

    @F.pandas_udf("bigint")
    def n_docs(s: pd.Series) -> int:
        return len(s)

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        total_chars(F.length("text")).alias("total_chars"),
        n_docs(F.length("text")).alias("n_docs"),
    )


# --------------------------------------------------------------------------
# BM25 top-k retrieval (Okapi BM25, Lucene's always-positive idf)
# --------------------------------------------------------------------------
# The retrieval/quality-ranking operator of a training-data pipeline:
# score every document against a small query-term set and keep the
# top k. Scale shape: ONE corpus scan computes per-term tfs (codegen
# regexp_count — no tokenize/explode shuffle for a bounded query set),
# one 1-row global aggregate collects N / Σdl / per-term dfs (bounded
# driver transfer at any corpus size), idfs become plan literals, and
# the final top-k is orderBy+limit — Spark's TakeOrderedAndProject,
# which never materializes a full sort at scale.

_BM25_TERMS = ("query", "join", "window", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


def bm25_ctes() -> list[str]:
    """DuckDB CTE chain ending in ``bm25s(doc_id, score_r)`` — the
    6-digit-rounded BM25 score per document. Shared by the BM25 top-k
    oracle and the hybrid-RRF oracle (operators/retrieval.py) so the
    lexical leg cannot fork between the two."""
    tf_cols = ",\n         ".join(
        rf"len(regexp_extract_all(lower(text), '\b{t}\b')) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ",\n         ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in _BM25_TERMS
    )
    # term score: idf(t) * tf / (tf + k1*(1-b + b*dl/avgdl)) — the
    # arithmetic order mirrors the Spark expression token for token so
    # the doubles agree before the 6-digit display round.
    parts = " +\n           ".join(
        f"(ln(1 + (s.n - s.df_{t} + 0.5) / (s.df_{t} + 0.5))"
        f" * b.tf_{t} / (b.tf_{t} + {_BM25_K1} * ({1.0 - _BM25_B}"
        f" + {_BM25_B} * b.dl / (CAST(s.sumdl AS DOUBLE) / s.n))))"
        for t in _BM25_TERMS
    )
    return [
        rf"""base AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+')) AS dl,
         {tf_cols}
  FROM documents
)""",
        f"""stats AS (
  SELECT COUNT(*) AS n, SUM(dl) AS sumdl,
         {df_cols}
  FROM base
)""",
        f"""bm25s AS (
  SELECT b.doc_id, ROUND({parts}, 6) AS score_r
  FROM base b CROSS JOIN stats s
)""",
    ]


def _bm25_oracle_sql() -> str:
    return (
        "WITH "
        + ",\n".join(bm25_ctes())
        + f""", ranked AS (
  SELECT doc_id, score_r,
         ROW_NUMBER() OVER (ORDER BY score_r DESC, doc_id) AS rank
  FROM bm25s
)
SELECT doc_id, rank, score_r FROM ranked WHERE rank <= {_BM25_TOPK}
"""
    )


def bm25_scores(d: DataFrame) -> DataFrame:
    """(doc_id, score_r): 6-digit-rounded Okapi BM25 score of every
    document against the fixed _BM25_TERMS query — the Spark twin of
    ``bm25_ctes``. One corpus scan (codegen regexp_count per term, no
    tokenize/explode shuffle), one collected 1-row aggregate turning
    N / Σdl / per-term dfs into plan literals; the scoring projection
    is pure JVM arithmetic. Shared by docs_bm25_topk and the hybrid
    RRF fusion (operators/retrieval.py)."""
    import math

    base = d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(r"\S+")).alias("dl"),
        *[
            F.regexp_count(
                F.lower(F.col("text")), F.lit(rf"\b{t}\b")
            ).alias(f"tf_{t}")
            for t in _BM25_TERMS
        ],
    )
    stats = base.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sumdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("bigint")).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    ).collect()[0]
    n = stats["n"]
    avgdl = float(stats["sumdl"]) / n
    score = None
    for t in _BM25_TERMS:
        idf = math.log(
            1 + (n - stats[f"df_{t}"] + 0.5) / (stats[f"df_{t}"] + 0.5)
        )
        tfc = F.col(f"tf_{t}")
        term = (
            F.lit(idf)
            * tfc
            / (
                tfc
                + _BM25_K1
                * (F.lit(1.0 - _BM25_B) + _BM25_B * F.col("dl") / avgdl)
            )
        )
        score = term if score is None else score + term
    return base.select("doc_id", F.round(score, 6).alias("score_r"))


@register(
    "docs_bm25_topk",
    oracle=_bm25_oracle_sql(),
    tags=("text", "retrieval", "bm25"),
    expose=False,
)
def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k over the corpus for a fixed query-term set
    (k1=1.2, b=0.75, Lucene's ln(1+(N-df+.5)/(df+.5)) idf). The idfs
    and avgdl are computed from a single collected 1-row aggregate and
    enter the scoring projection as literals, so the per-row score is
    pure JVM codegen arithmetic; ln() runs once per term in Python
    (libm — the same library the DuckDB oracle calls, so the idf
    literals agree bit-for-bit). Scores are ranked on their 6-digit
    round with doc_id tie-break, making the top-k deterministic."""
    d = load_spread(spark, sf_dir, "documents", min_bytes=32 << 20)
    # top-k FIRST via orderBy+limit (TakeOrderedAndProject — per-
    # partition heaps, never a full sort), THEN rank the k surviving
    # rows with the same total order: a global row_number window
    # before the limit sorted the whole corpus on one task (10× sweep
    # 8.0× → 5.2× after this change; the remaining growth is the five
    # linear regexp passes over 10× text on a floored 0.3 s base —
    # at 1000× the single-task sort, not the scan, would dominate).
    topk = (
        bm25_scores(d)
        .orderBy(F.col("score_r").desc(), F.col("doc_id"))
        .limit(_BM25_TOPK)
    )
    return topk.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("score_r").desc(), F.col("doc_id")))
        .cast("bigint")
        .alias("rank"),
        "score_r",
    )


# --------------------------------------------------------------------------
# Bigram language-model scoring (CCNet-style statistical quality filter)
# --------------------------------------------------------------------------
# Score every document by its average negative log-likelihood under a
# bigram LM trained on the corpus itself — the classic
# perplexity-bucket quality gate. Scale shape: one explode + lead per
# document (narrow after the doc_id shuffle), TWO count aggregations
# (bigram counts and bigram-start counts — both map-side combined and
# vocabulary-bounded), a broadcast join of the tiny count tables back
# to the bigram stream, and one per-doc aggregation. Per-bigram log
# probabilities are quantized to round(ln(p) * 2^40) BIGINT before the
# per-doc sum — the k-means trick: integer sums are exact and
# order-independent, so the distributed doc score is deterministic and
# bit-identical to the SQL replay (ln() itself is the same libm call
# in Python-free form: both engines evaluate ln over IEEE-identical
# count ratios).

_LM_SCALE = float(1 << 40)


_LM_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM documents WHERE text IS NOT NULL
), bg AS (
  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))])
           AS bigram
  FROM toks WHERE len(w) >= 2
), cb AS (
  SELECT bigram, COUNT(*) AS c_bg FROM bg GROUP BY bigram
), cs AS (
  SELECT split_part(bigram, ' ', 1) AS w1, SUM(c_bg) AS c_start
  FROM cb GROUP BY w1
), scored AS (
  SELECT g.doc_id,
         CAST(round(ln(cb.c_bg / CAST(cs.c_start AS DOUBLE))
                    * {_LM_SCALE}) AS BIGINT) AS q
  FROM bg g
  JOIN cb ON g.bigram = cb.bigram
  JOIN cs ON split_part(g.bigram, ' ', 1) = cs.w1
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(-((CAST(SUM(q) AS DOUBLE) / {_LM_SCALE}) / COUNT(*)), 6)
         AS avg_nll
FROM scored GROUP BY doc_id
"""


@register(
    "docs_lm_score",
    oracle=_LM_ORACLE,
    tags=("text", "lm", "quality"),
    expose=False,
)
def docs_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average bigram negative log-likelihood per document under the
    corpus's own bigram LM (conditional p = C(w1 w2) / C(w1 ·), where
    C(w1 ·) sums bigrams starting with w1). Low avg_nll = formulaic /
    repetitive text, high = rare constructions — the statistical
    quality signal next to the rule-based text_quality_stats. Docs
    with fewer than two tokens have no bigrams and no row (mirrored by
    the oracle's len >= 2 filter)."""
    from streamlit_flink_demo_spark.functions.ngrams import ngram_array_expr

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    # Round-10 rewrite (1.51 s -> 1.02 s at sf0.1): the corpus is
    # exploded into bigrams ONCE, behind a repartition(doc_id) that
    # ships raw text bytes instead of the bigram expansion — and
    # because HashPartitioning(doc_id) satisfies the clustering of
    # both per-doc aggregations, the (doc_id, bigram) count AND the
    # final per-doc score run exchange-free. Occurrence-level work
    # collapses to type-level: per-bigram log-probs are computed once
    # per distinct bigram and weighted by the per-doc count
    # (cnt * round(ln(p)*S) == sum of per-occurrence quantized terms —
    # integer-exact, so the oracle is unchanged).
    db = (
        d.select(
            "doc_id",
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w"),
        )
        .repartition("doc_id")
        .select(
            "doc_id", F.explode(F.expr(ngram_array_expr(2))).alias("bigram")
        )
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("cnt"))
    )
    cb = db.groupBy("bigram").agg(F.sum("cnt").alias("c_bg"))
    cs = (
        cb.select(
            F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
            "c_bg",
        )
        .groupBy("w1")
        .agg(F.sum("c_bg").alias("c_start"))
    )
    # NOT force-broadcast: the count tables are vocabulary-bounded
    # (tiny here — AQE promotes them to broadcast at runtime), but a
    # web-scale corpus has billions of bigram TYPES; the plain join
    # lets the same plan degrade to a shuffle join instead of OOMing
    # the driver on a forced broadcast.
    qt = (
        cb.join(
            cs,
            F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)) == F.col("w1"),
        )
        .select(
            "bigram",
            F.round(
                F.ln(F.col("c_bg") / F.col("c_start").cast("double"))
                * _LM_SCALE
            )
            .cast("bigint")
            .alias("q"),
        )
    )
    return (
        db.join(qt, "bigram")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.round(
                -(
                    (F.sum(F.col("q") * F.col("cnt")).cast("double") / _LM_SCALE)
                    / F.sum("cnt")
                ),
                6,
            ).alias("avg_nll"),
        )
    )


# --------------------------------------------------------------------------
# Collocation mining (PMI phrase detection)
# --------------------------------------------------------------------------

_COLLOC_MIN = 3
_COLLOC_TOPK = 50
_COLLOC_SCALE = 1_000_000

_COLLOC_ORACLE = rf"""
WITH toks AS (
  SELECT string_split_regex(lower(trim(text)), '\s+') AS w
  FROM documents WHERE text IS NOT NULL
), cu AS (
  SELECT word, COUNT(*) AS c_w
  FROM (SELECT unnest(w) AS word FROM toks) GROUP BY word
), cb AS (
  SELECT bigram, COUNT(*) AS c_bg
  FROM (SELECT unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))])
          AS bigram
        FROM toks WHERE len(w) >= 2) GROUP BY bigram
), tot AS (
  SELECT (SELECT SUM(c_w) FROM cu) AS n1, (SELECT SUM(c_bg) FROM cb) AS n2
), scored AS (
  SELECT cb.bigram, cb.c_bg, u1.c_w AS c_w1, u2.c_w AS c_w2,
         CAST(round(ln((cb.c_bg / CAST(t.n2 AS DOUBLE))
                       / ((u1.c_w / CAST(t.n1 AS DOUBLE))
                          * (u2.c_w / CAST(t.n1 AS DOUBLE))))
                    * {_COLLOC_SCALE}) AS BIGINT) AS pmi_q
  FROM cb
  CROSS JOIN tot t
  JOIN cu u1 ON split_part(cb.bigram, ' ', 1) = u1.word
  JOIN cu u2 ON split_part(cb.bigram, ' ', 2) = u2.word
  WHERE cb.c_bg >= {_COLLOC_MIN}
), topk AS (
  SELECT * FROM scored ORDER BY pmi_q DESC, bigram LIMIT {_COLLOC_TOPK}
)
SELECT CAST(row_number() OVER (ORDER BY pmi_q DESC, bigram) AS BIGINT) AS rank,
       bigram, CAST(c_bg AS BIGINT) AS c_bg, CAST(c_w1 AS BIGINT) AS c_w1,
       CAST(c_w2 AS BIGINT) AS c_w2,
       ROUND(pmi_q / {_COLLOC_SCALE}.0, 6) AS pmi_r
FROM topk
"""


@register(
    "docs_collocations",
    oracle=_COLLOC_ORACLE,
    tags=("text", "collocations", "pmi"),
    expose=False,
)
def docs_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level collocation mining: top-k word bigrams by pointwise
    mutual information, PMI = ln(p(w1 w2) / (p(w1) p(w2))), with a
    min-count support filter (word2phrase / NLTK-collocations shape --
    the phrase-detection pass a pretraining pipeline runs before
    tokenizer training). Single heavy scan: unigrams and bigrams are
    tagged structs in ONE explode (the bigram array comes straight from
    the split array, functions/ngrams -- no lead window), so one
    exchange on (kind, gram) produces the unified count table; that
    table is vocabulary-bounded and persisted (track_persist), so the
    cu/cb/totals branches never rescan the corpus. Unigram joins stay
    un-forced (AQE broadcasts the tiny side here; billions of gram
    types degrade to a shuffle join instead of OOMing the driver).
    PMI is ranked on its 1e-6 scaled integer with bigram tie-break;
    top-k via orderBy+limit (TakeOrderedAndProject heaps, no global
    sort) before the k-row row_number window."""
    from streamlit_flink_demo_spark.functions.ngrams import ngram_array_expr
    from streamlit_flink_demo_spark.plans import track_persist

    d = load_spread(spark, sf_dir, "documents", min_bytes=32 << 20).filter(
        F.col("text").isNotNull()
    )
    toks = d.select(F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w"))
    tagged = (
        "concat(transform(w, x -> struct('u' AS kind, x AS gram)), "
        f"transform({ngram_array_expr(2)}, g -> struct('b' AS kind, g AS gram)))"
    )
    counts = track_persist(
        toks.select(F.explode(F.expr(tagged)).alias("t"))
        .select(F.col("t.kind").alias("kind"), F.col("t.gram").alias("gram"))
        .groupBy("kind", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    tot = F.broadcast(
        counts.agg(
            F.sum(F.when(F.col("kind") == "u", F.col("cnt"))).alias("n1"),
            F.sum(F.when(F.col("kind") == "b", F.col("cnt"))).alias("n2"),
        )
    )
    cb = (
        counts.filter((F.col("kind") == "b") & (F.col("cnt") >= _COLLOC_MIN))
        .select(F.col("gram").alias("bigram"), F.col("cnt").alias("c_bg"))
    )
    u1 = counts.filter(F.col("kind") == "u").select(
        F.col("gram").alias("w1_"), F.col("cnt").alias("c_w1")
    )
    u2 = counts.filter(F.col("kind") == "u").select(
        F.col("gram").alias("w2_"), F.col("cnt").alias("c_w2")
    )
    scored = (
        cb.crossJoin(tot)
        .join(u1, F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)) == F.col("w1_"))
        .join(u2, F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)) == F.col("w2_"))
        .select(
            "bigram",
            "c_bg",
            "c_w1",
            "c_w2",
            F.round(
                F.ln(
                    (F.col("c_bg") / F.col("n2").cast("double"))
                    / (
                        (F.col("c_w1") / F.col("n1").cast("double"))
                        * (F.col("c_w2") / F.col("n1").cast("double"))
                    )
                )
                * _COLLOC_SCALE
            )
            .cast("bigint")
            .alias("pmi_q"),
        )
    )
    topk = scored.orderBy(F.col("pmi_q").desc(), "bigram").limit(_COLLOC_TOPK)
    rank_w = W.orderBy(F.col("pmi_q").desc(), "bigram")
    return topk.select(
        F.row_number().over(rank_w).cast("bigint").alias("rank"),
        "bigram",
        F.col("c_bg").cast("bigint").alias("c_bg"),
        F.col("c_w1").cast("bigint").alias("c_w1"),
        F.col("c_w2").cast("bigint").alias("c_w2"),
        F.round(F.col("pmi_q") / float(_COLLOC_SCALE), 6).alias("pmi_r"),
    )


# --------------------------------------------------------------------------
# Zipf-fit corpus diagnostics
# --------------------------------------------------------------------------

_ZIPF_TOPN = 256


@register(
    "text_zipf_fit",
    oracle=f"""
WITH tok AS (
  SELECT unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'),
           t -> t <> '')) AS t
  FROM documents WHERE length(text) > 0
),
cnt AS (
  SELECT t, COUNT(*)::BIGINT AS c FROM tok GROUP BY t
),
topn AS (
  SELECT t, c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rk
  FROM cnt QUALIFY rk <= {_ZIPF_TOPN}
),
arr AS (
  SELECT list(ln(rk::DOUBLE) ORDER BY rk) AS xs,
         list(ln(c::DOUBLE) ORDER BY rk) AS ys,
         COUNT(*)::BIGINT AS n
  FROM topn
)
SELECT n,
       ROUND(
         (n * list_aggregate(
                [xs[i+1] * ys[i+1] for i in range(len(xs))], 'sum')
          - list_aggregate(xs, 'sum') * list_aggregate(ys, 'sum'))
         / (n * list_aggregate(
                  [xs[i+1] * xs[i+1] for i in range(len(xs))], 'sum')
            - list_aggregate(xs, 'sum') * list_aggregate(xs, 'sum')),
         6) AS slope_r,
       ROUND(
         (list_aggregate(ys, 'sum')
          - ((n * list_aggregate(
                    [xs[i+1] * ys[i+1] for i in range(len(xs))], 'sum')
              - list_aggregate(xs, 'sum') * list_aggregate(ys, 'sum'))
             / (n * list_aggregate(
                      [xs[i+1] * xs[i+1] for i in range(len(xs))], 'sum')
                - list_aggregate(xs, 'sum')
                  * list_aggregate(xs, 'sum')))
            * list_aggregate(xs, 'sum')) / n,
         6) AS intercept_r
FROM arr
""",
    tags=("text", "stats", "eval"),
    expose=False,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health diagnostic: least-squares fit of ln(freq) ~
    a + b·ln(rank) over the top-256 tokens — a healthy natural-language
    corpus sits near the Zipf slope b ≈ -1; boilerplate/spam floods
    flatten or steepen it, which is why corpus monitors graph it. The
    token count is one combine-enabled aggregation ending in
    TakeOrderedAndProject; the 256-row fit folds xs/ys SEQUENTIALLY
    (F.aggregate over rank-ordered arrays, matching DuckDB's
    list_aggregate fold order) so every sum — and therefore the
    closed-form slope/intercept — is bit-identical across engines."""
    d = load_spread(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    toks = d.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda t: t != F.lit(""),
            )
        ).alias("t")
    )
    cnt = toks.groupBy("t").agg(F.count("*").cast("bigint").alias("c"))
    topn = (
        cnt.orderBy(F.col("c").desc(), F.col("t"))
        .limit(_ZIPF_TOPN)
        .select(
            "t",
            "c",
            F.row_number()
            .over(W.orderBy(F.col("c").desc(), F.col("t")))
            .alias("rk"),
        )
    )
    arr = topn.agg(
        F.sort_array(
            F.collect_list(F.struct("rk", F.log(F.col("rk").cast("double")).alias("x")))
        ).alias("xs_s"),
        F.sort_array(
            F.collect_list(F.struct("rk", F.log(F.col("c").cast("double")).alias("y")))
        ).alias("ys_s"),
        F.count("*").cast("bigint").alias("n"),
    ).select(
        "n",
        F.transform(F.col("xs_s"), lambda s: s["x"]).alias("xs"),
        F.transform(F.col("ys_s"), lambda s: s["y"]).alias("ys"),
    )

    def fsum(col):
        return F.aggregate(col, F.lit(0.0), lambda a, v: a + v)

    sx = fsum(F.col("xs"))
    sy = fsum(F.col("ys"))
    sxy = fsum(F.zip_with(F.col("xs"), F.col("ys"), lambda a, b: a * b))
    sxx = fsum(F.zip_with(F.col("xs"), F.col("xs"), lambda a, b: a * b))
    n = F.col("n").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return arr.select(
        "n",
        F.round(slope, 6).alias("slope_r"),
        F.round(intercept, 6).alias("intercept_r"),
    )
