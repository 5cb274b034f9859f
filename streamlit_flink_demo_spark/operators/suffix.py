"""Distributed suffix-array construction (prefix doubling).

The real machinery behind exact substring dedup at corpus scale
("Deduplicating Training Data Makes Language Models Better", Lee et
al. 2022 build a suffix array over the whole training corpus):
``corpus_suffix_array`` ranks EVERY character position of every
document in global lexicographic suffix order, using the
Manber-Myers prefix-doubling scheme a distributed engine can actually
run — O(log maxlen) rounds of (sort → global index → key-group rank →
shift join), each round a fixed set of exchanges over (doc_id, pos,
rank) triples, never materializing any suffix longer than the initial
seed key.

This complements the two span operators in operators/dedup.py:
``dedup_substring_spans`` (hashed screen) and ``dedup_suffix_spans``
(exact L-gram grouping) answer "which regions are duplicated";
the suffix array is the index structure that answers the harder
questions (longest repeated substring, arbitrary-length match lookup,
cross-corpus containment) — and its construction is the showcase of a
genuinely iterative distributed algorithm expressed Spark-first.

Algorithm (per document; cross-document order = plain string order of
the suffixes, ties broken by (doc_id, pos) — documents are separate
strings, no concatenation, so no artificial separators are needed):

1. seed: rank⁰(p) = group-rank of the first _SA_SEED chars of the
   suffix at p (one global sort of 8-char keys).
2. round k: key(p) = (rankᵏ(p), rankᵏ(p + 2ᵏ·seed) or -1); a suffix
   past its document's end contributes -1 (a proper prefix sorts
   before every extension — exactly string order). Re-rank by one
   global sort of the integer pair.
3. stop when the offset exceeds the corpus's longest document; final
   sa_rank = global index in (rank, doc_id, pos) order.

Global ranking (the distributed-sort primitive, used once per round):
repartitionByRange + per-partition row_number + partition-count
offsets. The only driver state is one count per partition (bounded by
the shuffle-partition setting, never by data) and the corpus max
length (one row) — the same bounded-collect discipline as the ANN
trainers. Equal keys may straddle a range boundary; group rank =
MIN(global index) over the key group (one hash exchange), which is
boundary-placement-independent, so the result is deterministic even
though range sampling is not.

Cost model: ~log₂(maxlen/seed)+1 rounds; each round exchanges
(doc_id, pos, 2 ranks) ≈ 28 B/char — the distributed analogue of the
external-memory SA sorts, and the reason Lee et al. shard their
corpus. The verification story is the point: the scalable iterative
algorithm is checked bit-for-bit against a brute-force oracle that
simply sorts the materialized suffix strings (DuckDB can afford that
at test SF; Spark never builds them at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.plans import register
from streamlit_flink_demo_spark.sources.catalog import load_spread

_SA_SEED = 8  # initial key: first 8 chars of each suffix
_SA_MOD = 1_000_000_007  # per-term checksum modulus (no BIGINT overflow)


def _global_group_rank(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Add ``rank`` = number of rows strictly smaller in ``key_cols``
    order (dense group-start rank): range-sort globally, index rows as
    (partition offset + within-partition row_number), then take the
    key group's MIN index. The per-partition count collect is bounded
    by the partition count; correctness does not depend on where the
    range sampler places boundaries (see module docstring)."""
    from pyspark.sql import Window as W

    rp = df.repartitionByRange(*key_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # localCheckpoint BEFORE the count collect: the range sampler is
    # not deterministic across evaluations, so the counts job and the
    # window job must read the SAME materialized partitioning. A bare
    # persist() is only safe while every block stays cached — on a
    # real cluster an executor loss would RECOMPUTE the partitioning
    # with freshly sampled boundaries, making the collected offsets
    # index a partitioning that no longer exists (silently wrong
    # ranks). localCheckpoint severs the lineage entirely: the
    # partitioning cannot be re-derived, so a lost block fail-stops
    # the job instead of silently corrupting every downstream rank —
    # the only acceptable failure mode for an index build.
    # It also truncates lineage once per round (the pagerank
    # discipline), so round k never re-executes rounds 1..k-1.
    rp = rp.localCheckpoint(eager=True)
    cnts = {
        r["_pid"]: r["n"]
        for r in rp.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offs: dict[int, int] = {}
    acc = 0
    for pid in sorted(cnts):
        offs[pid] = acc
        acc += cnts[pid]
    off_map = F.create_map(*[F.lit(x) for kv in offs.items() for x in kv])
    widx = W.partitionBy("_pid").orderBy(*key_cols)
    idx = (
        F.row_number().over(widx).cast("bigint")
        - 1
        + F.coalesce(off_map[F.col("_pid")], F.lit(0)).cast("bigint")
    )
    indexed = rp.withColumn("_idx", idx)
    wkey = W.partitionBy(*key_cols)
    # the window plans below hang off the checkpointed rp, so the
    # caller's next-round self-join re-derives them from pinned
    # blocks — no extra materialization of the output needed (the
    # identical window subplan on both join sides reuses one
    # exchange under AQE).
    return indexed.withColumn("rank", F.min("_idx").over(wkey)).drop(
        "_pid", "_idx"
    )


def suffix_ranks(docs: DataFrame, spark: SparkSession) -> DataFrame:
    """(doc_id, p, sa_rank) for every char position of every doc:
    sa_rank is the 0-based global index in (suffix string, doc_id, p)
    order. Prefix doubling as described in the module docstring."""
    d = docs.select("doc_id", "text").filter(F.length("text") > 0)
    max_len = d.agg(F.max(F.length("text"))).first()[0] or 0

    pos = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.length("text") - 1)).alias("p"),
        F.col("text"),
    ).select(
        "doc_id",
        "p",
        F.col("text").substr(F.col("p") + 1, F.lit(_SA_SEED)).alias("k0"),
    )
    cur = _global_group_rank(pos, ["k0"]).select("doc_id", "p", "rank")

    off = _SA_SEED
    while off < max_len:
        a = cur.alias("a")
        b = cur.select(
            F.col("doc_id").alias("b_doc"),
            (F.col("p") - off).alias("b_p"),
            F.col("rank").alias("r2"),
        )
        paired = a.join(
            b,
            (F.col("a.doc_id") == F.col("b_doc"))
            & (F.col("a.p") == F.col("b_p")),
            "left",
        ).select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.p").alias("p"),
            F.col("a.rank").alias("r1"),
            F.coalesce(F.col("r2"), F.lit(-1)).cast("bigint").alias("r2"),
        )
        cur = _global_group_rank(paired, ["r1", "r2"]).select(
            "doc_id", "p", "rank"
        )
        off *= 2

    # final total order: identical suffixes (duplicate documents /
    # repeated tails) share a rank — break by (doc_id, p), index once
    from pyspark.sql import Window as W  # noqa: F401  (doc link)

    final = _global_group_rank(
        cur.select("doc_id", "p", F.col("rank").alias("r1"))
        .withColumn("r2", F.col("doc_id"))
        .withColumn("r3", F.col("p")),
        ["r1", "r2", "r3"],
    )
    # with the full tie-break the key is unique, so rank == row index
    return final.select("doc_id", "p", F.col("rank").alias("sa_rank"))


_SA_ORACLE = f"""
WITH pos AS (
  SELECT doc_id, k AS p, substr(text, k + 1) AS sfx
  FROM (
    SELECT doc_id, text, unnest(range(0, length(text))) AS k
    FROM documents WHERE length(text) > 0
  )
),
sa AS (
  SELECT doc_id, p,
         ROW_NUMBER() OVER (ORDER BY sfx, doc_id, p) - 1 AS sa_rank
  FROM pos
)
SELECT doc_id,
       COUNT(*)::BIGINT AS n_suffixes,
       CAST(MIN(sa_rank) AS BIGINT) AS min_rank,
       SUM((sa_rank * (p + 1)) % {_SA_MOD})::BIGINT AS rank_checksum
FROM sa GROUP BY doc_id
"""


@register(
    "corpus_suffix_array",
    oracle=_SA_ORACLE,
    tags=("dedup", "suffix", "index"),
    expose=False,
)
def corpus_suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global corpus suffix array via distributed prefix doubling,
    summarized per document (suffix count, minimum global rank, and a
    position-weighted rank checksum that pins EVERY suffix's exact
    global rank). The oracle is the brute-force definition — sort the
    materialized suffix strings — so a green row proves the iterative
    distributed construction reproduces true lexicographic suffix
    order bit-for-bit."""
    docs = load_spread(spark, sf_dir, "documents")
    sa = suffix_ranks(docs, spark)
    return sa.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_suffixes"),
        F.min("sa_rank").cast("bigint").alias("min_rank"),
        F.sum((F.col("sa_rank") * (F.col("p") + 1)) % _SA_MOD)
        .cast("bigint")
        .alias("rank_checksum"),
    )


# --------------------------------------------------------------------------
# Longest repeated substring per document — the suffix array's payoff
# --------------------------------------------------------------------------
# The query Lee et al. 2022 build the suffix array FOR: for every
# position, the longest substring starting there that also occurs
# elsewhere in the corpus equals the LCP with one of its ADJACENT
# suffixes in suffix order (the classic SA property: lexicographic
# neighbors maximize common prefixes). So: pair rank r with r+1, LCP
# each pair, credit both endpoints, max per document. LCP is CAPPED at
# _LCP_CAP chars — the production choice (the dedup policy only needs
# "is the repeat >= threshold", and the cap bounds the adjacent-pair
# exchange at cap+16 bytes per suffix instead of shipping whole
# suffixes); the oracle applies the same cap, so the comparison stays
# exact.

_LCP_CAP = 64


def _lcp_expr(a, b):  # Column, Column: capped suffix strings
    """First-mismatch LCP of two capped suffixes, via one char-array
    zip (eqNullSafe handles the shorter suffix's null padding: a
    proper prefix mismatches at its end, so lcp = its length). Both
    engines share the convention position=0 => no mismatch => lcp =
    min(len) (identical truncated suffixes)."""
    neq = F.zip_with(
        F.split(a, ""), F.split(b, ""), lambda x, y: ~x.eqNullSafe(y)
    )
    pos = F.array_position(neq, F.lit(True))
    return F.when(
        pos == 0, F.least(F.length(a), F.length(b))
    ).otherwise(pos - 1).cast("bigint")


_LR_ORACLE = f"""
WITH pos AS (
  SELECT doc_id, k AS p, substr(text, k + 1) AS sfx
  FROM (
    SELECT doc_id, text, unnest(range(0, length(text))) AS k
    FROM documents WHERE length(text) > 0
  )
),
sa AS (
  SELECT doc_id, p, substr(sfx, 1, {_LCP_CAP}) AS s64,
         ROW_NUMBER() OVER (ORDER BY sfx, doc_id, p) - 1 AS r
  FROM pos
),
adj AS (
  SELECT a.doc_id AS a_doc, a.p AS a_p, a.s64 AS a_s,
         b.doc_id AS b_doc, b.p AS b_p, b.s64 AS b_s
  FROM sa a JOIN sa b ON b.r = a.r + 1
),
pairs AS (
  SELECT a_doc, a_p, b_doc, b_p,
         (CASE WHEN mp = 0 THEN least(length(a_s), length(b_s))
               ELSE mp - 1 END)::BIGINT AS lcp
  FROM (
    SELECT *, list_position(
      [ (CASE WHEN d < length(a_s) THEN a_s[d+1] END)
          IS DISTINCT FROM
        (CASE WHEN d < length(b_s) THEN b_s[d+1] END)
        for d in range({_LCP_CAP}) ], true) AS mp
    FROM adj
  )
),
credited AS (
  SELECT a_doc AS doc_id, a_p AS p, lcp FROM pairs
  UNION ALL
  SELECT b_doc, b_p, lcp FROM pairs
)
SELECT doc_id,
       CAST(MAX(lcp) AS BIGINT) AS max_repeat,
       CAST(SUM(CASE WHEN lcp >= 24 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_long_positions
FROM credited GROUP BY doc_id
"""


@register(
    "corpus_longest_repeat",
    oracle=_LR_ORACLE,
    tags=("dedup", "suffix", "index"),
    expose=False,
)
def corpus_longest_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest repeated substring per document (capped at _LCP_CAP
    chars) + count of positions whose repeat reaches 24 chars — the
    statistic Lee-et-al-style span removal thresholds on, computed
    from the distributed suffix array: adjacent ranks joined (one
    exchange on rank), capped suffix text attached from the documents
    scan, LCP via one char-array zip, both endpoints credited, max
    per doc. The brute-force oracle replays the whole chain, so every
    LCP value is hash-checked."""
    docs = load_spread(spark, sf_dir, "documents")
    sa = suffix_ranks(docs, spark)
    with_txt = sa.join(
        docs.select("doc_id", "text"), "doc_id"
    ).select(
        "doc_id",
        "p",
        "sa_rank",
        F.col("text").substr(F.col("p") + 1, F.lit(_LCP_CAP)).alias("s64"),
    )
    a = with_txt.alias("a")
    b = with_txt.select(
        (F.col("sa_rank") - 1).alias("prev_rank"),
        F.col("doc_id").alias("b_doc"),
        F.col("p").alias("b_p"),
        F.col("s64").alias("b_s64"),
    )
    pairs = a.join(b, F.col("a.sa_rank") == F.col("prev_rank")).select(
        F.col("a.doc_id").alias("a_doc"),
        F.col("a.p").alias("a_p"),
        "b_doc",
        "b_p",
        _lcp_expr(F.col("a.s64"), F.col("b_s64")).alias("lcp"),
    )
    credited = pairs.select(
        F.col("a_doc").alias("doc_id"), F.col("a_p").alias("p"), "lcp"
    ).unionAll(
        pairs.select(
            F.col("b_doc").alias("doc_id"), F.col("b_p").alias("p"), "lcp"
        )
    )
    return credited.groupBy("doc_id").agg(
        F.max("lcp").cast("bigint").alias("max_repeat"),
        F.sum(F.when(F.col("lcp") >= 24, 1).otherwise(0))
        .cast("bigint")
        .alias("n_long_positions"),
    )
