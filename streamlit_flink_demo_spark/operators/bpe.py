"""Distributed BPE tokenizer training over ``documents``.

``docs_bpe_merges`` learns the first N byte-pair-encoding merges from
the corpus with the word-count formulation every production BPE
trainer (Sennrich 2016; HF tokenizers) uses: ONE corpus-wide shuffle
builds the (word, count) vocabulary table, and every subsequent merge
round runs over that vocabulary only — at 100 TB the corpus is
touched exactly once, and the 8 merge rounds aggregate a table the
size of the *vocabulary* (weighted by counts), not the corpus.

The whole pipeline is JVM-side codegen — no Python in any row path:

- symbol sequences are flat delimiter-wrapped strings
  (``"char" -> "|c||h||a||r|"``), so applying a merge is ONE built-in
  ``replace(enc, '|a||b|', '|ab|')``: SQL replace scans leftmost and
  continues after each replacement, which is exactly BPE's greedy
  non-overlapping merge application (``[a,a,a] -> [aa,a]``,
  ``[b,a,b,a,b] -> [b,ab,ab]``), and the per-symbol wrapping makes a
  suffix like ``xa`` unable to false-match the pattern for ``a``;
- pair statistics per round are an explode of the zipped
  slice-shifted symbol arrays + one integer sum aggregation
  (map-side partial combine, exact);
- the argmax merge per round is a 1-ROW collect (count DESC, then
  lexicographic (a, b) — deterministic), the same bounded-convergence
  pattern as the k-means / connected-components operators.

The DuckDB oracle replays training end-to-end: the identical word
split, the identical encode, and all N rounds unrolled as CTEs with
the identical replace-application — so the emitted merge table is
exact, and because round r+1's counts depend on round r's merges
being APPLIED correctly, the oracle transitively verifies the
application operator too.

Reference scope: the reference repo (confluentinc/streamlit-flink-demo)
has no tokenizer training; this is part of the LLM-training-data
extension surface (brief: dedup/similarity/text families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.plans import register, track_persist
from streamlit_flink_demo_spark.sources.catalog import load_spread

N_MERGES = 8

# split on runs of anything outside the trained alphabet; both engines
# treat '[^a-z]+' identically (no char-class shorthands involved)
_SPLIT_PAT = "[^a-z]+"


def bpe_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(enc, cnt): the weighted vocabulary, each word encoded as the
    delimiter-wrapped character sequence. The ONLY corpus-wide pass."""
    d = load_spread(spark, sf_dir, "documents", min_bytes=32 << 20)
    return (
        d.select(F.explode(F.split(F.lower("text"), _SPLIT_PAT)).alias("w"))
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.regexp_replace("w", "(.)", r"|$1|").alias("enc"),
            "cnt",
        )
    )


def bpe_pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, c): corpus-frequency of every adjacent symbol pair.
    slice-shifted arrays_zip (empty for 1-symbol words — no
    descending-sequence hazard), one explode, one integer-sum
    aggregation with map-side partial combine."""
    syms = F.split(F.expr("trim(BOTH '|' FROM enc)"), r"\|\|")
    pairs = F.arrays_zip(
        F.slice(syms, 1, F.size(syms) - 1).alias("a"),
        F.slice(syms, 2, F.size(syms) - 1).alias("b"),
    )
    return (
        words.select(F.explode_outer(pairs).alias("p"), "cnt")
        .filter(F.col("p").isNotNull())
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("c"))
    )


def _bpe_oracle_sql(n_merges: int = N_MERGES) -> str:
    """Unrolled-CTE replay of the full training loop."""
    ctes = [
        r"""words AS (
  SELECT w, COUNT(*)::BIGINT AS cnt FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE length(w) >= 1 GROUP BY w
)""",
        r"""w0 AS (
  SELECT regexp_replace(w, '(.)', '|\1|', 'g') AS enc, cnt FROM words
)""",
    ]
    for r in range(1, n_merges + 1):
        prev = f"w{r - 1}"
        ctes.append(
            f"""p{r} AS (
  SELECT l[i] AS a, l[i + 1] AS b, SUM(cnt)::BIGINT AS c
  FROM (SELECT string_split(trim(enc, '|'), '||') AS l, cnt FROM {prev}),
       unnest(range(1, len(l))) t(i)
  GROUP BY a, b
)"""
        )
        ctes.append(
            f"""b{r} AS (
  SELECT a, b, c FROM p{r} ORDER BY c DESC, a, b LIMIT 1
)"""
        )
        ctes.append(
            f"""w{r} AS (
  SELECT replace(enc, '|' || a || '||' || b || '|', '|' || a || b || '|')
           AS enc, cnt
  FROM {prev}, b{r}
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS merge_rank, a AS sym_a, b AS sym_b, "
        f"a || b AS merged, c AS pair_cnt FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


def train_merges(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """Run the training loop; returns
    [(rank, a, b, merged, count), ...] — the tokenizer artifact."""
    words = track_persist(bpe_words(spark, sf_dir))
    merges = []
    for r in range(1, N_MERGES + 1):
        best = (
            bpe_pair_counts(words)
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:  # degenerate corpus: every word is 1 symbol
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((r, a, b, a + b, c))
        # each round layers ONE replace projection over the cached
        # vocab — round r recomputes r cheap projections, never the
        # corpus scan
        words = words.withColumn(
            "enc",
            F.replace(
                F.col("enc"),
                F.lit(f"|{a}||{b}|"),
                F.lit(f"|{a}{b}|"),
            ),
        )
    return merges


@register(
    "docs_bpe_merges",
    oracle=_bpe_oracle_sql(),
    tags=("text", "bpe", "tokenizer"),
    expose=False,
)
def docs_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First {N_MERGES} BPE merges learned from the corpus: one row per
    round — (merge_rank, sym_a, sym_b, merged, pair_cnt). The trained
    merge list IS the tokenizer artifact a downstream token-count /
    packing stage would apply."""
    return spark.createDataFrame(
        train_merges(spark, sf_dir),
        "merge_rank int, sym_a string, sym_b string, "
        "merged string, pair_cnt bigint",
    )


def _tokenize_oracle_sql(n_merges: int = N_MERGES) -> str:
    """Training CTEs + the per-doc apply pass, all list-comprehension
    style (no unnest+regroup) so empty documents keep their zero row
    exactly like the Spark aggregate() does."""
    train = _bpe_oracle_sql(n_merges)
    with_block = train[: train.rindex("\nSELECT CAST(1 AS INT)")]
    # strip the final UNION SELECT; keep every CTE, add merge-literal
    # CTEs m1..mN and the apply projection
    # MAX over an empty b{r} yields one NULL row, so a missing merge
    # degrades to the identity replace('~','~') — matching the Spark
    # loop's `break` (it simply applies fewer merges) instead of the
    # empty-CROSS-JOIN collapse that would zero out every document row
    for r in range(1, n_merges + 1):
        with_block += f""",
m{r} AS (
  SELECT coalesce(MAX('|' || a || '||' || b || '|'), '~') AS pat{r},
         coalesce(MAX('|' || a || b || '|'), '~') AS rep{r}
  FROM b{r}
)"""
    # DuckDB lambdas forbid subqueries but capture enclosing columns,
    # so the 1-row m{r} tables are cross-joined into scope instead
    chain = r"regexp_replace(w, '(.)', '|\1|', 'g')"
    for r in range(1, n_merges + 1):
        chain = f"replace({chain}, pat{r}, rep{r})"
    crosses = " ".join(f"CROSS JOIN m{r}" for r in range(1, n_merges + 1))
    return f"""{with_block}
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(coalesce(list_aggregate(
              list_transform(ws, w -> length(w)), 'sum'), 0) AS BIGINT)
         AS n_chars_az,
       CAST(coalesce(list_aggregate(
              list_transform(ws, w ->
                (length({chain}) -
                 length(replace({chain}, '|', ''))) // 2), 'sum'), 0)
            AS BIGINT) AS n_bpe_tokens
FROM (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                     w -> w != '') AS ws
  FROM documents
) {crosses}"""


@register(
    "docs_bpe_tokenize",
    oracle=_tokenize_oracle_sql(),
    tags=("text", "bpe", "tokenizer"),
    expose=False,
)
def docs_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the corpus-trained merges back over the corpus: per doc,
    (n_words, n_chars_az, n_bpe_tokens). The apply stage is ONE
    higher-order-function projection (split -> per-word encode ->
    {N_MERGES} chained replaces -> symbol count summed via
    aggregate()) — zero shuffles beyond training, no explode +
    re-group round trip, so at 100 TB tokenization is embarrassingly
    parallel over the scan. This is the engine's token-count stage
    running on its OWN trained tokenizer rather than the whitespace
    heuristic of ``text_token_count``."""
    merges = train_merges(spark, sf_dir)
    chain = "regexp_replace(w, '(.)', '|$1|')"
    for _, a, b, _, _ in merges:
        chain = f"replace({chain}, '|{a}||{b}|', '|{a}{b}|')"
    d = load_spread(spark, sf_dir, "documents", min_bytes=32 << 20)
    return d.select(
        "doc_id",
        F.expr("filter(split(lower(text), '[^a-z]+'), w -> w != '')").alias(
            "ws"
        ),
    ).select(
        "doc_id",
        F.size("ws").cast("bigint").alias("n_words"),
        F.expr(
            "aggregate(ws, CAST(0 AS BIGINT), (acc, w) -> acc + length(w))"
        ).alias("n_chars_az"),
        F.expr(
            f"aggregate(ws, CAST(0 AS BIGINT), (acc, w) -> "
            f"acc + ((length({chain}) - length(replace({chain}, '|', '')))"
            f" div 2))"
        ).alias("n_bpe_tokens"),
    )
