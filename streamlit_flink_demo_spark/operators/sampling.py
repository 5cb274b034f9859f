"""Deterministic sampling, sharding and mixture control for training
corpora.

A pretraining pipeline rarely trains on the raw crawl: it samples
strata at different rates (quality tiers, languages), rebalances the
domain mixture toward a target recipe, and writes the result as
shuffled shards whose order must be reproducible run-to-run. RAND()
breaks all three (not re-derivable, not resumable, engine-specific),
so every operator here derives its randomness from the md5-based u60
hash (functions/hashing.py) with a per-operator salt prefix — the
same document gets independent "random" draws for splitting,
stratified sampling and shuffling, yet any engine recomputes the
identical decision.

Companion to operators/pipeline.py (split / quality-yield / packing);
like it, nothing here exists in the reference (SURVEY.md §2.5) — this
is the LLM-data-pipeline extension surface. All four operators are
suite members (expose=False): the driver checks them through
scalar_funcs_suite / group_agg_suite branches, and
tests/test_oracle_parity.py checks each against its own oracle.

Scale posture (100 TB): every operator is a projection or a
shard-local window + one hash aggregation — no global sort, no
driver-side state, no UDFs; the hash math stays in whole-stage
codegen. Shard count and rate tables are literals in the plan, so
partition pruning and map-side combine apply as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from streamlit_flink_demo_spark.functions.hashing import u60, u60_sql
from streamlit_flink_demo_spark.functions.numeric import bsum_sql
from streamlit_flink_demo_spark.plans import register
from streamlit_flink_demo_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# Stratified sampling: per-language keep rates in basis points
# --------------------------------------------------------------------------

# lang -> keep rate in basis points (of 10_000). Any unlisted stratum
# falls back to the tail rate.
_STRATA_BPS = {"en": 10_000, "es": 5_000, "fr": 5_000, "de": 2_500, "zh": 2_500}
_TAIL_BPS = 1_000


def _rate_bps_col() -> F.Column:
    expr = None
    for lang, bps in _STRATA_BPS.items():
        cond = F.col("lang") == lang
        expr = F.when(cond, bps) if expr is None else expr.when(cond, bps)
    return expr.otherwise(_TAIL_BPS).cast("bigint")


def _rate_bps_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {bps}" for lang, bps in _STRATA_BPS.items()
    )
    return f"CAST(CASE lang {whens} ELSE {_TAIL_BPS} END AS BIGINT)"


@register(
    "docs_stratified_sample",
    oracle=f"""
SELECT doc_id, lang,
       {_rate_bps_sql()} AS rate_bps,
       CAST(CASE WHEN {u60_sql("'strat:' || CAST(doc_id AS VARCHAR)")} % 10000
                 < {_rate_bps_sql()}
            THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM documents
""",
    tags=("pipeline", "sampling"),
    expose=False,
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sampling with deterministic membership:
    keep a document iff u60('strat:' || doc_id) mod 10000 falls under
    its stratum's basis-point rate. The 'strat:' salt decorrelates
    this draw from the train/eval split's hash (pipeline.py) — a
    document's sampling fate and its split assignment are independent,
    as two uses of RAND() would be, but reproducibly so. Pure
    projection; at 100 TB the filter form (kept=1) pushes straight
    into the scan's row-group pruning when membership is materialized."""
    d = load_table(spark, sf_dir, "documents")
    draw = u60(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))) % 10_000
    return d.select(
        "doc_id",
        "lang",
        _rate_bps_col().alias("rate_bps"),
        F.when(draw < _rate_bps_col(), 1).otherwise(0).cast("bigint").alias("kept"),
    )


# --------------------------------------------------------------------------
# Deterministic shuffle-shard: reproducible training order
# --------------------------------------------------------------------------

_N_SHARDS = 16


@register(
    "docs_shuffle_shard",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         {u60_sql("'shuf:' || CAST(doc_id AS VARCHAR)")} AS sort_key
  FROM documents
), pos AS (
  SELECT doc_id, sort_key,
         sort_key % {_N_SHARDS} AS shard,
         ROW_NUMBER() OVER (PARTITION BY sort_key % {_N_SHARDS}
                            ORDER BY sort_key, doc_id) AS pos
  FROM keyed
)
SELECT CAST(shard AS VARCHAR) AS shard,
       COUNT(*) AS n_docs,
       {bsum_sql(f"(pos * (sort_key % 997)) % 1000003", "order_digest")},
       CAST(MIN(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS head_doc
FROM pos
GROUP BY shard
""",
    tags=("pipeline", "sampling", "shard"),
    expose=False,
)
def docs_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding: shard =
    u60('shuf:' || doc_id) mod N, within-shard order = (sort_key,
    doc_id). This is how a 100 TB corpus becomes N training shards
    whose byte order is identical on every run/engine — the
    prerequisite for resumable data loaders. The verification output
    is per-shard: row count, a positional checksum
    SUM((pos * (sort_key % 997)) % 1000003) that pins the entire
    permutation, and the head document. Scale: the window partitions
    by shard (N grows with the corpus, e.g. 65 536), so each sort is
    shard-local — there is no global sort, and the groupBy reuses the
    shard partitioning."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        u60(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))).alias(
            "sort_key"
        ),
    ).withColumn("shard", F.col("sort_key") % _N_SHARDS)
    win = W.partitionBy("shard").orderBy("sort_key", "doc_id")
    pos = keyed.withColumn("pos", F.row_number().over(win))
    return pos.groupBy(F.col("shard").cast("string").alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.sum(
            (F.col("pos") * (F.col("sort_key") % 997)) % 1_000_003
        ).alias("order_digest"),
        F.min(F.when(F.col("pos") == 1, F.col("doc_id")))
        .cast("bigint")
        .alias("head_doc"),
    )


# --------------------------------------------------------------------------
# Domain mixture rebalancing: sampling rates toward a target recipe
# --------------------------------------------------------------------------

# Target mixture by source-id band: the first five sources carry half
# the training mix, the next five 30%, the long tail shares 20%.
_MIX_BANDS = ((0, 4, 0.10), (5, 9, 0.06), (10, 19, 0.02))


def _target_frac_col(src_num: F.Column) -> F.Column:
    expr = None
    for lo, hi, w in _MIX_BANDS:
        cond = (src_num >= lo) & (src_num <= hi)
        expr = F.when(cond, w) if expr is None else expr.when(cond, w)
    return expr.otherwise(0.0)


def _target_frac_sql(src_num: str) -> str:
    whens = " ".join(
        f"WHEN {src_num} BETWEEN {lo} AND {hi} THEN {w}"
        for lo, hi, w in _MIX_BANDS
    )
    # CAST: DuckDB types the 0.10/0.06 literals as DECIMAL, which would
    # make the rate arithmetic exact where Spark's double math is not.
    return f"CAST(CASE {whens} ELSE 0.0 END AS DOUBLE)"


@register(
    "docs_domain_mix",
    oracle=f"""
WITH per_src AS (
  SELECT source,
         TRY_CAST(substr(source, 4) AS BIGINT) AS src_num,
         COUNT(*) AS n_docs
  FROM documents
  GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM per_src
)
SELECT source,
       n_docs,
       {_target_frac_sql("src_num")} AS target_frac,
       LEAST(1.0, ({_target_frac_sql("src_num")} * total_docs) / n_docs)
         AS rate,
       CAST(FLOOR(LEAST(1.0, ({_target_frac_sql("src_num")} * total_docs)
                             / n_docs) * n_docs) AS BIGINT) AS expected_kept
FROM per_src, tot
""",
    tags=("pipeline", "sampling", "mixture"),
    expose=False,
)
def docs_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: given a target recipe (fraction of
    the training mix per source band), derive each source's
    down-sampling rate = min(1, target_frac * total_docs / n_docs) and
    the expected kept count. Over-represented domains are
    down-sampled toward the recipe; under-represented ones keep
    everything (rate capped at 1 — upsampling is a loader concern).
    The per-source aggregate broadcasts against the single-row global
    total, so at 100 TB this is one map-side-combined count per
    source plus a broadcast join — no second scan of the corpus."""
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    total = per_src.agg(F.sum("n_docs").cast("bigint").alias("total_docs"))
    # unbounded tail (matches the oracle's substr(source, 4)): a fixed
    # width would silently truncate 10+-digit source ids
    # BIGINT + TRY_CAST: both engines yield NULL on junk/overflow —
    # Spark's ANSI-off int cast NULLs where DuckDB's CAST would RAISE
    src_num = F.expr("substring(source, 4)").cast("bigint")
    target = _target_frac_col(src_num)
    rate = F.least(F.lit(1.0), (target * F.col("total_docs")) / F.col("n_docs"))
    return per_src.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        target.alias("target_frac"),
        rate.alias("rate"),
        F.floor(rate * F.col("n_docs")).cast("bigint").alias("expected_kept"),
    )


# --------------------------------------------------------------------------
# Gopher-style repetition metrics
# --------------------------------------------------------------------------


@register(
    "text_repetition",
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
  FROM documents WHERE text IS NOT NULL
), b AS (
  SELECT doc_id, w,
         [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))] AS bg
  FROM t
)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_words,
       CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words,
       CAST(list_max(list_transform(list_distinct(w),
                     x -> len(list_filter(w, y -> y = x)))) AS BIGINT)
         AS top_word_n,
       CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w)
         AS dup_word_frac,
       CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / NULLIF(len(bg), 0)
         AS dup_bigram_frac
FROM b
""",
    tags=("text", "quality", "repetition"),
    expose=False,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition metrics in the style of the Gopher quality filters
    (Rae et al. 2021, §A1.1): per-document word count, distinct-word
    count, most-frequent-word count, duplicate-word fraction and
    duplicate-bigram fraction — the signals that catch boilerplate
    and degenerate repetition. Spark path: every size-based metric is
    a plain array projection over the split array (zero shuffles);
    only top_word_n — the one metric that needs per-word counts —
    pays an explode + two-level aggregation, joined back on doc_id.
    Linear in corpus size, no O(n²) per-document work (the oracle's
    list_filter scan is fine at sf0.01 but would not be at 100 TB,
    which is exactly why the engine path explodes instead)."""
    from streamlit_flink_demo_spark.functions.ngrams import ngram_array_expr

    # NULL text: explode(NULL) emits no rows, so the doc would
    # silently vanish here while the oracle's CTE kept a NULL-metric
    # row — filter explicitly, mirrored by the oracle's WHERE.
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    base = d.select(
        "doc_id",
        F.split(F.trim(F.col("text")), r"\s+").alias("w"),
        F.expr(ngram_array_expr(2)).alias("bg"),
    )
    sizes = base.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct_words"),
        F.size("bg").alias("nb"),
        F.size(F.array_distinct("bg")).alias("nbd"),
    )
    top = (
        base.select("doc_id", F.explode("w").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word_n"))
    )
    return sizes.join(top, "doc_id").select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_distinct_words").cast("bigint").alias("n_distinct_words"),
        F.col("top_word_n").cast("bigint").alias("top_word_n"),
        (
            (F.col("n_words") - F.col("n_distinct_words")).cast("double")
            / F.col("n_words")
        ).alias("dup_word_frac"),
        (
            (F.col("nb") - F.col("nbd")).cast("double")
            / F.nullif(F.col("nb"), F.lit(0))
        ).alias("dup_bigram_frac"),
    )


@register(
    "text_topngram",
    oracle=r"""
WITH t AS (
  SELECT doc_id, trim(text) AS tt, string_split_regex(trim(text), '\s+') AS w
  FROM documents WHERE text IS NOT NULL
), g AS (
  SELECT doc_id, 2 AS n,
         unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
  FROM t
  UNION ALL
  SELECT doc_id, 3,
         unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                 FOR i IN range(1, len(w) - 1)])
  FROM t WHERE len(w) >= 3
  UNION ALL
  SELECT doc_id, 4,
         unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                 FOR i IN range(1, len(w) - 2)])
  FROM t WHERE len(w) >= 4
), c AS (
  SELECT doc_id, n, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, n, gram
), r AS (
  SELECT doc_id, n, gram, cnt,
         ROW_NUMBER() OVER (PARTITION BY doc_id, n
                            ORDER BY cnt DESC, gram) AS rk
  FROM c
)
SELECT r.doc_id, CAST(r.n AS BIGINT) AS n, r.gram AS top_gram,
       CAST(r.cnt AS BIGINT) AS top_cnt,
       ROUND(CAST(r.cnt * len(r.gram) AS DOUBLE) / len(t.tt), 6)
         AS top_frac_r
FROM r JOIN t USING (doc_id) WHERE rk = 1
""",
    tags=("text", "quality", "repetition"),
    expose=False,
)
def text_topngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-n-gram character fraction for n in {2,3,4} — the second
    Gopher repetition family (Rae et al. 2021, §A1.1: 'fraction of
    characters contained within the most frequently-occurring
    n-gram'); complements text_repetition's duplicate-count
    fractions. Per doc and n: the most frequent word n-gram (ties →
    lexicographically smallest), its count, and the fraction of the
    trimmed text's characters its occurrences cover. Spark path: all
    three gram widths from the split array in one projection + one
    explode (functions/ngrams — no token-stream exchange), one count
    aggregation, one rank-limit window — linear in corpus size; docs
    with fewer than n tokens have no row for that n in either
    engine."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    # all three gram widths from the split array in ONE projection +
    # ONE explode — no posexplode, no lead window (see
    # functions/ngrams). len_t rides the gram rows (8 bytes) and folds
    # as MAX through the count aggregation — the earlier second
    # documents scan + per-doc join was a broadcast-side hazard at
    # scale (review finding).
    #
    # ONE exchange total (round-10 rewrite, 2.22 s -> 1.26 s at
    # sf0.1): the shuffle moves BEFORE the explode — repartition by
    # doc_id ships each doc's raw text bytes once instead of its ~9x
    # expansion into 2/3/4-gram strings, and HashPartitioning(doc_id)
    # satisfies the clustering requirement of BOTH downstream
    # aggregations (doc_id is a subset of each grouping key), so the
    # gram count and the per-(doc,n) top-1 run exchange-free. The
    # top-1 itself is min_by over the ordering struct (-cnt, gram) —
    # field-wise struct comparison encodes (cnt DESC, gram ASC)
    # exactly, replacing the rank window's extra shuffle + full sort
    # with a combinable aggregate.
    from streamlit_flink_demo_spark.functions.ngrams import ngram_array_expr

    widths = ", ".join(
        f"transform({ngram_array_expr(n)}, x -> named_struct"
        f"('n', {n}, 'gram', x))"
        for n in (2, 3, 4)
    )
    grams = (
        d.select(
            "doc_id",
            F.length(F.trim(F.col("text"))).alias("len_t"),
            F.split(F.trim(F.col("text")), r"\s+").alias("w"),
        )
        .repartition("doc_id")
        .select(
            "doc_id",
            "len_t",
            F.explode(F.expr(f"concat({widths})")).alias("g"),
        )
        .select(
            "doc_id",
            "len_t",
            F.col("g.n").alias("n"),
            F.col("g.gram").alias("gram"),
        )
    )
    cnt = grams.groupBy("doc_id", "n", "gram").agg(
        F.count("*").alias("cnt"), F.max("len_t").alias("len_t")
    )
    top = cnt.groupBy("doc_id", "n").agg(
        F.min_by(
            F.struct("gram", "cnt", "len_t"),
            F.struct((-F.col("cnt")).alias("nc"), F.col("gram")),
        ).alias("t")
    )
    return top.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n"),
        F.col("t.gram").alias("top_gram"),
        F.col("t.cnt").cast("bigint").alias("top_cnt"),
        F.round(
            (F.col("t.cnt") * F.length("t.gram")).cast("double")
            / F.col("t.len_t"),
            6,
        ).alias("top_frac_r"),
    )


# --------------------------------------------------------------------------
# Temperature-based language rebalancing (UniMax / T5-style α-sampling)
# --------------------------------------------------------------------------
# docs_domain_mix rebalances toward a FIXED recipe; multilingual
# pipelines instead derive the recipe FROM the data with temperature
# sampling: p_lang ∝ n_lang^α flattens the head languages so low-
# resource ones aren't drowned (α=1 is proportional, α=0 uniform).
# α = 0.5 here — inside the range the T5/mT5 ablations use — and
# deliberately exactly sqrt: IEEE 754 requires sqrt to be correctly
# rounded, so Spark (java.lang.Math.sqrt) and the DuckDB oracle
# (libm sqrt) produce bit-identical weights, which a pow(x, 0.3)
# formulation cannot guarantee across engines. Weights are then
# floor-scaled to integer parts-per-million and summed as BIGINTs, so
# the normalizing denominator is order-independent (double summation
# across groups is not).


@register(
    "docs_lang_temperature_mix",
    oracle="""
WITH per_lang AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(FLOOR(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000.0) AS BIGINT)
           AS weight_ppm
  FROM documents GROUP BY lang
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
         CAST(SUM(weight_ppm) AS BIGINT) AS w_total
  FROM per_lang
)
SELECT lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       weight_ppm,
       LEAST(1.0, ((CAST(weight_ppm AS DOUBLE) / CAST(w_total AS DOUBLE))
                   * CAST(total_docs AS DOUBLE)) / CAST(n_docs AS DOUBLE))
         AS rate,
       CAST(FLOOR(LEAST(1.0, ((CAST(weight_ppm AS DOUBLE)
                               / CAST(w_total AS DOUBLE))
                              * CAST(total_docs AS DOUBLE))
                             / CAST(n_docs AS DOUBLE))
                  * CAST(n_docs AS DOUBLE)) AS BIGINT) AS expected_kept
FROM per_lang, tot
""",
    tags=("pipeline", "sampling", "mixture"),
    expose=False,
)
def docs_lang_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-derived language mix (α = 0.5): per-language target
    share ∝ sqrt(n_lang), then the same rate/expected-kept derivation
    as docs_domain_mix (rate capped at 1; upsampling is a loader
    concern). Same scale shape too: one map-side-combined count per
    language, a broadcast single-row total, no second corpus scan —
    the whole mixture computation is |languages| rows."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    per = per.withColumn(
        "weight_ppm",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000000.0).cast(
            "bigint"
        ),
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("total_docs"),
        F.sum("weight_ppm").cast("bigint").alias("w_total"),
    )
    rate = F.least(
        F.lit(1.0),
        (
            (F.col("weight_ppm").cast("double") / F.col("w_total").cast("double"))
            * F.col("total_docs").cast("double")
        )
        / F.col("n_docs").cast("double"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "weight_ppm",
        rate.alias("rate"),
        F.floor(rate * F.col("n_docs").cast("double"))
        .cast("bigint")
        .alias("expected_kept"),
    )


# --------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES)
# --------------------------------------------------------------------------
# The primitive behind quality-weighted subcorpus selection ("sample
# 100 docs with probability proportional to length/quality, no
# repeats"): Efraimidis & Spirakis 2006 — draw u_i ~ U(0,1], give item
# i the key u_i^(1/w_i), keep the n largest keys. The result is a
# distributionally-exact weighted sample without replacement, and it
# is embarrassingly parallel: one scan, per-partition top-n heaps, no
# shuffle of the corpus (TakeOrderedAndProject), which is why it is
# THE weighted-sampling shape for distributed engines (a sequential
# weighted draw can't parallelize). The u_i here is the engine's
# deterministic hash-uniform (u60/2^60, salt "esw:"), so any engine
# re-derives the identical sample; we rank by ln(u)/w — the same
# order as u^(1/w) (ln is monotone, w > 0) without pow()'s rounding
# hazards, and the ln-over-identical-doubles discipline is the one
# docs_lm_score already proved cross-engine-exact.

_ES_N = 100
_ES_SALT = "esw:"


_ES_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         (n_chars + 1)::DOUBLE AS w,
         ln(({u60_sql(f"'{_ES_SALT}' || CAST(doc_id AS VARCHAR)")} + 1)
            / 1152921504606846976.0) / ((n_chars + 1)::DOUBLE) AS es_key
  FROM documents
)
SELECT doc_id,
       CAST(w AS BIGINT) AS w,
       ROUND(es_key, 12) AS es_key_r,
       CAST(ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS BIGINT)
         AS rank
FROM keyed
ORDER BY es_key DESC, doc_id
LIMIT {_ES_N}
"""


@register(
    "docs_weighted_sample",
    oracle=_ES_ORACLE,
    tags=("sampling", "pipeline"),
    expose=False,
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement:
    keep the 100 (_ES_N) documents with the largest ln(u)/w keys,
    u = the deterministic hash-uniform in (0, 1] (salt "esw:"),
    w = n_chars + 1 (length-proportional inclusion, the +1 keeps
    empty docs drawable). One corpus scan into per-partition top-n
    heaps (orderBy+limit = TakeOrderedAndProject — the corpus never
    shuffles); ranks are assigned afterwards by a window over the
    surviving 100 rows. ln runs engine-side over bit-identical
    doubles on both engines (the docs_lm_score precedent), and the
    12-digit round on the emitted key absorbs any display-layer
    difference."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        u60(F.concat(F.lit(_ES_SALT), F.col("doc_id").cast("string")))
        + F.lit(1)
    ) / F.lit(float(1 << 60))
    w = (F.col("n_chars") + 1).cast("double")
    keyed = d.select(
        "doc_id", w.alias("w"), (F.log(u) / w).alias("es_key")
    )
    topn = keyed.orderBy(F.col("es_key").desc(), F.col("doc_id")).limit(
        _ES_N
    )
    return topn.select(
        "doc_id",
        F.col("w").cast("bigint").alias("w"),
        F.round("es_key", 12).alias("es_key_r"),
        F.row_number()
        .over(W.orderBy(F.col("es_key").desc(), F.col("doc_id")))
        .cast("bigint")
        .alias("rank"),
    )
