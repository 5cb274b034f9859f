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
   suffix at p (one global sort of seed-width keys).
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

Cost model: one seed sort of ~(seed + 16) B/char, then
~log₂(maxlen/seed) rounds that exchange only the ACTIVE set —
positions still tied on their first `off` chars, ~13% of a natural
corpus at the 32-char seed (r14) — at ≈ 28 B/row; the distributed
analogue of the external-memory SA sorts, and the reason Lee et al.
shard their corpus. The verification story is the point: the scalable iterative
algorithm is checked bit-for-bit against a brute-force oracle that
simply sorts the materialized suffix strings (DuckDB can afford that
at test SF; Spark never builds them at all).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamlit_flink_demo_spark.functions.hashing import u60, u60_sql
from streamlit_flink_demo_spark.plans import register, track_persist
from streamlit_flink_demo_spark.sources.catalog import load_spread, load_table

# Initial key width: the first _SA_SEED chars of each suffix. r14
# retune (measured at sf0.1, warm, force-built): 8 → ~24 s, 16 →
# ~22 s, 32 → ~10.7 s, 48/64 → ~10 s (plateau). A wider seed freezes
# the overwhelmingly-unique positions in the ONE seed sort instead of
# dragging them through 2-3 more doubling rounds: with 8, round-1
# active is most of the corpus (natural text ties heavily on 8
# chars); with 32, only positions sharing a full 32-char prefix —
# true near-duplicate territory — stay active, and the loop starts at
# off=32 (two fewer rounds). At cluster scale the trade is ~16 extra
# seed-key bytes/char through one exchange versus re-shuffling most
# positions through the early rounds two or three more times. 32 is
# the narrowest width at the measured plateau; 64 doubles the seed
# bytes for no local gain. Semantics are seed-independent (the final
# order is the total suffix order; the brute-force unit tests and the
# corpus_suffix_array rank checksum pin this at every width).
_SA_SEED = 32
_SA_MOD = 1_000_000_007  # per-term checksum modulus (no BIGINT overflow)
# Active-set size under which a doubling round switches from the full
# rank-map shuffle join to the broadcast semi-filter lookup (16 B/key
# ⇒ ~16 MB broadcast at the cap — see the r13 note in suffix_ranks).
# A count, not an estimate: rounds above it keep the shuffle join.
_SA_BCAST_ACTIVE = 1_000_000


def _global_group_rank(
    df: DataFrame,
    key_cols: list[str],
    unique: bool = False,
    with_gsz: bool = False,
) -> DataFrame:
    """Add ``rank`` = number of rows strictly smaller in ``key_cols``
    order (dense group-start rank): range-sort globally, index rows as
    (partition offset + within-partition row_number), then take the
    key group's MIN index. The per-partition count collect is bounded
    by the partition count; correctness does not depend on where the
    range sampler places boundaries (see module docstring).

    ``unique=True`` declares the key provably unique per row (e.g.
    capsort's (s64, doc_id, p)): every key group is a singleton, so
    group-start rank == global index and the min-over-key-group
    window — a full hash exchange of the payload by the composite
    key — is skipped outright (guide §2.4: remove shuffles whose
    result is the identity).

    r14 (guide §2.4, VERDICT r13 item 2): the within-partition index
    used to be a row_number window PARTITIONED BY the physical
    partition id — but a localCheckpoint taken under AQE reports
    UnknownPartitioning (its final stage is an AQEShuffleRead), so
    that window re-exchanged the whole payload by _pid just to number
    rows the checkpoint blocks already hold grouped. Replaced by
    sortWithinPartitions (the same local sort the window required
    anyway) + monotonically_increasing_id, whose documented bit
    layout IS (partition id << 33 | within-partition position): the
    index now costs ZERO exchanges. Tie permutation within equal keys
    is sort-implementation-defined either way; only min-over-group
    survives for non-unique keys, and a run of equal keys occupies
    the same contiguous index range under any permutation, so ranks
    are bit-identical to the windowed form. Net: 3 → 2 full-payload
    exchanges per non-unique ranking, 2 → 1 for unique keys.
    (>= 2^33 rows in one range partition would overflow the layout —
    at that point a single Spark task holds > 8.5 G rows and the job
    has bigger problems; the doubling loop keeps partition counts
    scale-proportional.)"""
    from pyspark.sql import Window as W

    rp = df.repartitionByRange(*key_cols)
    # localCheckpoint BEFORE the count collect: the range sampler is
    # not deterministic across evaluations, so the counts job and the
    # index job must read the SAME materialized partitioning. A bare
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
        for r in rp.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    offs: dict[int, int] = {}
    acc = 0
    for pid in sorted(cnts):
        offs[pid] = acc
        acc += cnts[pid]
    off_map = F.create_map(
        *[
            c
            for k, v in offs.items()
            for c in (F.lit(k).cast("int"), F.lit(v).cast("bigint"))
        ]
    )
    mid = F.col("_mid")
    pid = F.shiftrightunsigned(mid, 33).cast("int")
    idx = (
        mid.bitwiseAND(F.lit((1 << 33) - 1)).cast("bigint")
        + F.coalesce(off_map[pid], F.lit(0)).cast("bigint")
    )
    # the local sort feeds a NONDETERMINISTIC projection (the id
    # depends on row order), which fences both: Catalyst neither
    # eliminates the sort below it nor reorders the projection above
    # the exchange a downstream window adds. Plan-asserted in
    # tests/test_suffix.py (the id projection sits above a
    # partition-local Sort, below any Exchange).
    indexed = (
        rp.sortWithinPartitions(*key_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_idx", idx)
    )
    if unique:
        return indexed.withColumn("rank", F.col("_idx")).drop(
            "_mid", "_idx"
        )
    wkey = W.partitionBy(*key_cols)
    # the min-over-key-group window (one hash exchange — the only one
    # left in this helper) keeps group-start ranks correct without
    # relying on where the range sampler places key-group boundaries.
    # ``with_gsz`` rides the key-group SIZE on the SAME window spec
    # (one window stage, zero extra exchanges) — suffix_ranks' seed
    # used to recompute it as a separate count-over-(shard, rank)
    # window, a second full exchange of the seeded frame (r14, §2.4).
    out = indexed.withColumn("rank", F.min("_idx").over(wkey))
    if with_gsz:
        out = out.withColumn("gsz", F.count("*").over(wkey))
    return out.drop("_mid", "_idx")


def suffix_ranks(
    docs: DataFrame, spark: SparkSession, shard_col: F.Column | None = None
) -> DataFrame:
    """(doc_id, p, sa_rank) for every char position of every doc:
    sa_rank is the 0-based index in (suffix string, doc_id, p) order —
    GLOBAL when ``shard_col`` is None, WITHIN-SHARD when given (the
    Lee et al. 2022 production shape: shard the corpus, build
    independent per-shard arrays; repeat statistics that only need
    within-shard adjacency read the sharded index).

    Prefix doubling with ACTIVE-SET RANK REFINEMENT. The seed round
    pays the one global sort (_SA_SEED-char keys). Every later round exploits
    the group-start-rank invariant — rank(p) = count of suffixes with
    a strictly smaller current key — which makes a row with a UNIQUE
    rank frozen forever: no other row shares its key now, so no later
    extension can reorder it, and its rank is already its final index.
    Only rows in non-singleton rank groups re-rank, and their new rank
    is computable WITHOUT any global sort:

        new_rank = r1 + (rank() over (partition r1 order by r2) - 1)

    because rows outside the group contribute exactly r1 strictly
    smaller keys (the invariant) and the window counts the smaller
    keys inside it. So a round costs one (doc_id, p)-shuffle of the
    rank map (the +off lookup join) plus one window over the ACTIVE
    set, which shrinks geometrically for natural text — versus two
    global range-sorts of the full corpus per round in the classic
    formulation. Frozen rows accumulate as a union of per-round
    checkpointed frames; driver state stays one scalar per round."""
    from pyspark.sql import Window as W

    d = docs.select("doc_id", "text").filter(F.length("text") > 0)
    sharded = shard_col is not None
    d = d.withColumn("shard", shard_col if sharded else F.lit(0))
    max_len = d.agg(F.max(F.length("text"))).first()[0] or 0

    pos = d.select(
        "shard",
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.length("text") - 1)).alias("p"),
        F.col("text"),
    ).select(
        "shard",
        "doc_id",
        "p",
        F.col("text").substr(F.col("p") + 1, F.lit(_SA_SEED)).alias("k0"),
    )
    # r14 (guide §2.4, VERDICT r13 item 2): the seed group SIZE rides
    # the ranking window itself (with_gsz — same partition spec, one
    # window stage) instead of a second count-over-(shard, rank)
    # window, which re-exchanged the whole seeded frame; and because
    # gsz is now INSIDE the seeded checkpoint, the frozen/active
    # splits are plain narrow filters over pinned blocks — the two
    # extra near-full-frame checkpoint materializations are gone.
    seeded = _global_group_rank(
        pos, ["shard", "k0"], with_gsz=True
    ).select("shard", "doc_id", "p", "rank", "gsz")
    if sharded:
        # shard is the leading range key, so each shard's rows occupy
        # a contiguous global index range; within-shard rank = global
        # rank - shard start. One bounded collect (one row per shard).
        # gsz is untouched by the rebase (group sizes don't shift).
        offs = {
            r["shard"]: r["lo"]
            for r in seeded.groupBy("shard").agg(
                F.min("rank").alias("lo")
            ).collect()
        }
        omap = F.create_map(*[F.lit(x) for kv in offs.items() for x in kv])
        seeded = seeded.withColumn("rank", F.col("rank") - omap[F.col("shard")])
    seeded = seeded.localCheckpoint(eager=True)

    frozen: list[DataFrame] = [seeded.filter("gsz = 1").drop("gsz")]
    active = seeded.filter("gsz > 1").drop("gsz")

    off = _SA_SEED
    n_active = active.count()
    while off < max_len and n_active > 0:
        rank_map = active
        for fr in frozen:
            rank_map = rank_map.unionAll(fr)
        shifted = rank_map.select(
            F.col("doc_id").alias("b_doc"),
            (F.col("p") - off).alias("b_p"),
            F.col("rank").alias("r2"),
        )
        if n_active <= _SA_BCAST_ACTIVE:
            # r13 (guide §2.4/§3.2): the +off lookup only needs the
            # rank at active positions' shifted keys, but the plain
            # join shuffled the WHOLE rank map (every corpus position)
            # every round — 2-3 s/round at sf0.1 while active had
            # shrunk to 65k rows. When the active set is small enough
            # to broadcast (16 B/key ⇒ ~16 MB at the 1M-row cap, far
            # under the broadcast limits), semi-filter the shifted map
            # by the active keys (map-side, rank map only SCANNED from
            # its checkpoint blocks) and broadcast the ≤|active|-row
            # result into the left join: zero rank-map exchanges.
            # Early rounds (active above the cap) keep the full
            # shuffle join — the cap is a count, not an estimate, so
            # the plan degrades predictably at corpus scale.
            keys = active.select(
                F.col("doc_id").alias("b_doc"), F.col("p").alias("b_p")
            )
            shifted = F.broadcast(
                shifted.join(F.broadcast(keys), ["b_doc", "b_p"], "left_semi")
            )
        a = active.alias("a")
        paired = a.join(
            shifted,
            (F.col("a.doc_id") == F.col("b_doc"))
            & (F.col("a.p") == F.col("b_p")),
            "left",
        ).select(
            "a.shard",
            "a.doc_id",
            "a.p",
            F.col("a.rank").alias("r1"),
            F.coalesce(F.col("r2"), F.lit(-1)).cast("bigint").alias("r2"),
        )
        wsub = W.partitionBy("shard", "r1").orderBy("r2")
        # gsz = size of the row's NEW rank group = count of equal-r2
        # rows in the same (shard, r1) partition — the rangeBetween
        # frame shares wsub's partitioning AND sort, so both window
        # functions evaluate in one window stage (one shuffle).
        updated = paired.select(
            "shard",
            "doc_id",
            "p",
            (F.col("r1") + F.rank().over(wsub) - 1).alias("rank"),
            F.count("*").over(wsub.rangeBetween(0, 0)).alias("gsz"),
        ).localCheckpoint(eager=True)
        frozen.append(
            updated.filter("gsz = 1").select("shard", "doc_id", "p", "rank")
        )
        active = updated.filter("gsz > 1").select(
            "shard", "doc_id", "p", "rank"
        )
        n_active = active.count()
        off *= 2

    # survivors are suffixes identical to their document ends
    # (duplicate docs / repeated tails): deterministic tie-break by
    # (doc_id, p) inside the group — still no global sort.
    wtie = W.partitionBy("shard", "rank").orderBy("doc_id", "p")
    resolved = active.select(
        "shard",
        "doc_id",
        "p",
        (F.col("rank") + F.rank().over(wtie) - 1).alias("rank"),
    )
    out = resolved
    for fr in frozen:
        out = out.unionAll(fr)
    cols = ["shard"] if sharded else []
    return out.select(*cols, "doc_id", "p", F.col("rank").alias("sa_rank"))


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
    sa = _suffix_ranks_cached(spark, sf_dir, None)
    return sa.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_suffixes"),
        F.min("sa_rank").cast("bigint").alias("min_rank"),
        F.sum((F.col("sa_rank") * (F.col("p") + 1)) % _SA_MOD)
        .cast("bigint")
        .alias("rank_checksum"),
    )


# Session-scoped index memo (the _embed_frame shared-encode
# discipline): the suffix array is a build-once index tier, but five
# registered queries derive from it — without sharing, every query's
# plan build re-runs the whole iterative construction (measured 5×23 s
# per full-registry sweep at sf0.1). The memo keys weakly on the live
# session (a stopped session drops its entries and the checkpointed
# blocks with it); at 100 TB the same role is played by materializing
# (doc_id, p, sa_rank) as a parquet artifact — in-session blocks are
# the query-scoped form. tools/suffix_scale.py calls
# clear_suffix_memo() before every timed rep so CONSTRUCTION numbers
# stay honest (the plan-cache caveat, applied to this cache too).
_SA_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def clear_suffix_memo() -> None:
    _SA_MEMO.clear()


def _suffix_ranks_cached(
    spark: SparkSession, sf_dir: str, shards: int | None
) -> DataFrame:
    per = _SA_MEMO.setdefault(spark, {})
    key = (sf_dir, shards)
    if key not in per:
        docs = load_spread(spark, sf_dir, "documents")
        col = (
            u60(F.col("doc_id").cast("string")) % shards
            if shards is not None
            else None
        )
        per[key] = suffix_ranks(docs, spark, shard_col=col)
    return per[key]


# --------------------------------------------------------------------------
# Persisted suffix-index artifact — the 100 TB standing form
# --------------------------------------------------------------------------
# The session memo above shares ONE construction across the SA-family
# queries of a session; at corpus scale the index is built once and
# READ for months (Lee et al. keep theirs on disk next to the corpus).
# This is that tier: (doc_id, p, sa_rank) materialized as parquet,
# range-partitioned AND sorted by sa_rank so (a) adjacency scans
# (LCP/longest-repeat/nearest-train) read rank-contiguous files and
# (b) parquet min/max stats give rank-range pruning for probe reads —
# no directory fan-out needed. Same fingerprint/meta/atomic-symlink
# publishing contract as the ANN artifacts (operators/similarity.py),
# fingerprinting the *documents* table. NOT wired implicitly into the
# registered queries: the construction benchmarks (tools/
# suffix_scale.py) stay honest because nothing short-circuits a build
# behind their backs; consumers opt in via load_suffix_index.


def build_suffix_index(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> str:
    """Build (or reuse, when the source fingerprint + seed parameter
    match) the persisted global suffix-array artifact for ``sf_dir``.
    Returns the artifact directory; data lives under ``<dir>/data``."""
    import os

    from streamlit_flink_demo_spark.operators.similarity import (
        _artifact_is_fresh,
        _index_dir,
        _publish_artifact,
        _write_meta,
        table_fingerprint,
    )

    out = _index_dir("suffix", sf_dir)
    fp = table_fingerprint(sf_dir, "documents")
    params = {"seed": _SA_SEED, "kind": "global"}
    if not force and _artifact_is_fresh(out, fp, params):
        return out
    docs = load_spread(spark, sf_dir, "documents")
    sa = suffix_ranks(docs, spark)
    tmp = f"{out}.tmp-{os.getpid()}"
    (
        sa.repartitionByRange("sa_rank")
        .sortWithinPartitions("sa_rank")
        .write.mode("overwrite")
        .parquet(os.path.join(tmp, "data"))
    )
    _write_meta(tmp, {"fingerprint": fp, **params})
    _publish_artifact(tmp, out)
    return out


def load_suffix_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the persisted suffix-array artifact (building it first if
    absent or stale): the disk-backed equivalent of
    ``_suffix_ranks_cached(spark, sf_dir, None)`` — bit-identical
    ranks, pinned by tests/test_suffix.py's artifact-parity test.

    Served through ``incremental.read_live_index``, so DOCUMENT
    TAKEDOWNS apply here too: ``tombstone_keys(path, key, ids,
    key_col="doc_id")`` removes a document's suffix rows from every
    later read (a no-op anti-join when no tombstones exist). Rank
    VALUES keep their gaps — sound for every adjacency consumer
    (LCP / repeats / nearest-train scan rely on rank ORDER, and
    filtering preserves the relative order of the surviving
    suffixes, exactly the order a fresh build over the survivors
    yields); ``compact_index`` drops the rows physically (pinned in
    tests/test_suffix.py)."""
    from streamlit_flink_demo_spark.operators.incremental import (
        read_live_index,
    )

    return read_live_index(spark, build_suffix_index(spark, sf_dir))


# --------------------------------------------------------------------------
# Sharded construction — the Lee et al. 2022 production shape
# --------------------------------------------------------------------------
# A 100 TB corpus never builds ONE global suffix array: Lee et al.
# shard the corpus and build independent per-shard arrays, because a
# global build's working set (every round touches every position) and
# its single total order are both unnecessary — every repeat statistic
# the dedup policy thresholds on only needs adjacency WITHIN a shard
# large enough to contain the repeats (their shards are multi-GB).
# Sharding here = hash(doc_id) % S as an extra leading key: the seed
# sort ranks the concatenated shard order (one job, not S), a bounded
# S-row collect rebases ranks per shard, and every refinement round
# partitions by (shard, rank) — so shards refine independently inside
# the SAME set of exchanges, and at cluster scale the S independent
# arrays can equally be built by S separate jobs with no cross-talk.

_SA_SHARDS = 4

_SA_SHARD_ORACLE = f"""
WITH pos AS (
  SELECT {u60_sql("CAST(doc_id AS VARCHAR)")} % {_SA_SHARDS} AS shard,
         doc_id, k AS p, substr(text, k + 1) AS sfx
  FROM (
    SELECT doc_id, text, unnest(range(0, length(text))) AS k
    FROM documents WHERE length(text) > 0
  )
),
sa AS (
  SELECT shard, doc_id, p,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY sfx, doc_id, p) - 1
           AS sa_rank
  FROM pos
)
SELECT doc_id,
       CAST(MIN(shard) AS BIGINT) AS shard,
       COUNT(*)::BIGINT AS n_suffixes,
       CAST(MIN(sa_rank) AS BIGINT) AS min_rank,
       SUM((sa_rank * (p + 1)) % {_SA_MOD})::BIGINT AS rank_checksum
FROM sa GROUP BY doc_id
"""


@register(
    "corpus_suffix_array_sharded",
    oracle=_SA_SHARD_ORACLE,
    tags=("dedup", "suffix", "index"),
    expose=False,
)
def corpus_suffix_array_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard suffix arrays (hash(doc_id) % 4 (_SA_SHARDS) shards),
    summarized per document exactly like ``corpus_suffix_array`` but
    with within-shard ranks — the oracle sorts materialized suffixes
    PARTITIONED BY shard, so a green row proves each shard's array is
    bit-for-bit the true suffix order of that shard's documents."""
    docs = load_spread(spark, sf_dir, "documents")
    sa = _suffix_ranks_cached(spark, sf_dir, _SA_SHARDS)
    return sa.groupBy("doc_id").agg(
        F.min("shard").cast("bigint").alias("shard"),
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


def _docs_join_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNSPREAD documents scan for join/cut sides (r14, VERDICT r13
    item 8): frames that immediately feed a doc_id hash exchange (the
    text-attach join, the span-cut join) gained nothing from
    load_spread's round-robin repartition — the planner stacked
    RoundRobin + hash exchanges back to back (capsort dump nodes
    (3)/(4)), shuffling every document twice. The explode-kernel
    sides (position synthesis) keep their spread; this plain scan is
    for the sides whose very next operator repartitions anyway."""
    return load_table(spark, sf_dir, "documents")


def _lcp_expr(a, b):  # Column, Column: capped suffix strings
    """LCP of two capped suffixes via an unrolled binary search: fold
    over step sizes (64, 32, …, 1), extending the matched prefix by
    ``s`` whenever the next ``s`` characters agree — 7 substring
    memcmps per pair instead of the prior char-array zip's two array
    allocations + 64 interpreted per-char lambda evaluations (r13
    optimization, guide §4: the zip dominated every pair-producing
    operator's CPU; measured 4.4x faster on 2M pairs, bit-identical).
    Handles strings up to 127 chars (sum of steps); inputs are capped
    at _LCP_CAP = 64. The final least() clamp restores the shared
    convention lcp = min(len) for identical/prefix pairs (substring
    past either end yields '' = '' and would overshoot), and the
    isNotNull guard keeps the NULL-in → NULL-out behavior of the zip
    form."""
    steps = F.array(*[F.lit(s) for s in (64, 32, 16, 8, 4, 2, 1)])
    l = F.aggregate(
        steps,
        F.lit(0),
        lambda acc, s: acc
        + F.when(
            a.substr(acc + F.lit(1), s) == b.substr(acc + F.lit(1), s), s
        ).otherwise(F.lit(0)),
    )
    return (
        F.when(
            a.isNotNull() & b.isNotNull(),
            F.least(F.length(a), F.length(b), l),
        )
        .cast("bigint")
    )


def _credit_both(pairs: DataFrame) -> DataFrame:
    """credited (doc_id, p, lcp) rows for BOTH endpoints of each
    adjacent pair, via one explode of a two-struct array. The prior
    union-of-two-selects form made ``pairs`` a shared subexpression
    that Catalyst plans (and executes) ONCE PER UNION BRANCH — the
    whole adjacency join, its two sort exchanges, and every LCP
    evaluation ran twice (r13 optimization; visible as duplicated
    SortMergeJoin subtrees in plans/r13/
    corpus_longest_repeat_indexed_before.txt). The explode keeps one
    subtree and emits two rows per pair."""
    return pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a_doc").alias("doc_id"),
                    F.col("a_p").alias("p"),
                    F.col("lcp").alias("lcp"),
                ),
                F.struct(
                    F.col("b_doc").alias("doc_id"),
                    F.col("b_p").alias("p"),
                    F.col("lcp").alias("lcp"),
                ),
            )
        ).alias("c")
    ).select("c.doc_id", "c.p", "c.lcp")


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
    docs = _docs_join_side(spark, sf_dir)
    sa = _suffix_ranks_cached(spark, sf_dir, None)
    return _longest_repeat_from_sa(docs, sa)


_ADJ_BUCKET = 8192  # ranks per adjacency bucket (see _adjacent_sa_pairs)


def _adjacent_sa_pairs(
    with_txt: DataFrame, sharded: bool = False, carry: tuple = ("doc_id", "p")
) -> DataFrame:
    """All rank-adjacent suffix pairs (global, or within-shard when
    ``sharded``) of a (shard?, *carry, sa_rank, s64) frame, WITHOUT a
    rank+1 self-join.

    r13 (guide §2.4): the self-join planned the with_txt subtree
    twice and paid two full exchanges + two SMJ sorts of the
    88 B/row suffix frame. Ranks are dense and unique (0..N-1 per
    shard), so adjacency is a ``lead`` window inside rank buckets of
    _ADJ_BUCKET: each row lands in bucket rank div B, and rows at a
    bucket's lower edge (rank % B == 0, rank > 0) are DUPLICATED
    into the previous bucket as ghost b-side rows — they sort last
    there, produce no pair of their own (lead = NULL), and supply
    the one cross-bucket pair. Every adjacent pair appears exactly
    once; one exchange on a small int key replaces the join
    (measured 1.84 → 1.38 s, 7 → 4 Exchanges on the indexed repeat
    probe; row-identical). Returns a_/b_-prefixed ``carry`` columns
    plus (a_s64, b_s64)."""
    from pyspark.sql import Window as W

    B = _ADJ_BUCKET
    shard_cols = ["shard"] if sharded else []
    bk = (F.col("sa_rank") / B).cast("bigint")
    dup = F.when(
        (F.col("sa_rank") % B == 0) & (F.col("sa_rank") > 0),
        F.array(bk, bk - 1),
    ).otherwise(F.array(bk))
    ex = with_txt.select(
        *shard_cols,
        *carry,
        "sa_rank",
        "s64",
        F.explode(dup).alias("bk"),
    )
    w = W.partitionBy(*(shard_cols + ["bk"])).orderBy("sa_rank")
    lead_guard = F.lead("sa_rank").over(w)
    return ex.select(
        *[F.col(c).alias(f"a_{c}") for c in carry],
        F.col("s64").alias("a_s64"),
        *[F.lead(c).over(w).alias(f"b_{c}") for c in carry],
        F.lead("s64").over(w).alias("b_s64"),
        lead_guard.alias("_b_rank"),
    ).filter(F.col("_b_rank").isNotNull()).drop("_b_rank")


def _longest_repeat_from_sa(docs: DataFrame, sa: DataFrame) -> DataFrame:
    """Adjacent-rank LCP → per-doc longest repeat, from ANY
    (doc_id, p, sa_rank) frame — the in-session construction
    (corpus_longest_repeat) and the persisted artifact
    (corpus_longest_repeat_indexed) share this exact chain."""
    with_txt = sa.join(
        docs.select("doc_id", "text"), "doc_id"
    ).select(
        "doc_id",
        "p",
        "sa_rank",
        F.col("text").substr(F.col("p") + 1, F.lit(_LCP_CAP)).alias("s64"),
    )
    pairs = _adjacent_sa_pairs(with_txt).select(
        F.col("a_doc_id").alias("a_doc"),
        "a_p",
        F.col("b_doc_id").alias("b_doc"),
        "b_p",
        _lcp_expr(F.col("a_s64"), F.col("b_s64")).alias("lcp"),
    )
    credited = _credit_both(pairs)
    return credited.groupBy("doc_id").agg(
        F.max("lcp").cast("bigint").alias("max_repeat"),
        F.sum(F.when(F.col("lcp") >= 24, 1).otherwise(0))
        .cast("bigint")
        .alias("n_long_positions"),
    )


@register(
    "corpus_longest_repeat_indexed",
    # same oracle as the in-session form: the artifact stores the
    # identical (doc_id, p, sa_rank) rows (reload ≡ construction is
    # pinned in tests/test_suffix.py), so probe-from-disk must
    # hash-match the full brute-force replay.
    oracle=_LR_ORACLE,
    tags=("dedup", "suffix", "index", "artifact"),
    expose=False,
)
def corpus_longest_repeat_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Longest repeated substring per document SERVED FROM the
    persisted suffix-array artifact (build_suffix_index — rank-range
    parquet, built once, read for months): load (doc_id, p, sa_rank)
    from disk, attach the capped suffix text from the documents scan,
    adjacent-rank LCP, per-doc max — the repeated-serving form the
    SA-family query tier deliberately lacked (its registered queries
    time CONSTRUCTION honestly; this one times the PROBE a standing
    deployment actually pays per request). Tombstoned documents are
    already subtracted by load_suffix_index's read_live_index, so
    takedowns reach this serving path too. Plan-asserted in
    tests/test_plans.py: the scan reads the artifact directory, no
    iterative construction in the plan."""
    docs = _docs_join_side(spark, sf_dir)
    sa = _dense_live_ranks(spark, sf_dir)
    return _longest_repeat_from_sa(docs, sa)


def _dense_live_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The live suffix-index view with DENSE ranks. After a takedown,
    ``load_suffix_index`` keeps rank VALUES gapped (sound for pure
    order consumers), but ``_adjacent_sa_pairs``' bucket-boundary
    ghost duplication keys on rank VALUES (``sa_rank % B == 0``): a
    tombstoned boundary rank silently drops the cross-bucket
    adjacent-survivor pair, and a fully-tombstoned bucket breaks the
    chain outright (r13 ADVICE). When tombstones exist (a driver-side
    meta.json check — no data pass), re-rank the survivors densely in
    rank order (one range exchange via the unique-key
    ``_global_group_rank`` path): by the index's own contract,
    survivor order IS the fresh-build-over-survivors order, so the
    probe computes exactly what a rebuild would. The common
    no-tombstone path is untouched (zero extra work)."""
    from streamlit_flink_demo_spark.operators.incremental import (
        read_tombstones,
    )

    path = build_suffix_index(spark, sf_dir)
    sa = load_suffix_index(spark, sf_dir)
    ts, _ = read_tombstones(spark, path)
    if ts is None:
        return sa
    return _global_group_rank(sa, ["sa_rank"], unique=True).select(
        "doc_id", "p", F.col("rank").alias("sa_rank")
    )


_LR_SHARD_ORACLE = f"""
WITH pos AS (
  SELECT {u60_sql("CAST(doc_id AS VARCHAR)")} % {_SA_SHARDS} AS shard,
         doc_id, k AS p, substr(text, k + 1) AS sfx
  FROM (
    SELECT doc_id, text, unnest(range(0, length(text))) AS k
    FROM documents WHERE length(text) > 0
  )
),
sa AS (
  SELECT shard, doc_id, p, substr(sfx, 1, {_LCP_CAP}) AS s64,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY sfx, doc_id, p) - 1
           AS r
  FROM pos
),
adj AS (
  SELECT a.doc_id AS a_doc, a.p AS a_p, a.s64 AS a_s,
         b.doc_id AS b_doc, b.p AS b_p, b.s64 AS b_s
  FROM sa a JOIN sa b ON b.shard = a.shard AND b.r = a.r + 1
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
    "corpus_longest_repeat_sharded",
    oracle=_LR_SHARD_ORACLE,
    tags=("dedup", "suffix", "index"),
    expose=False,
)
def corpus_longest_repeat_sharded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Longest repeated substring per document computed WITHIN each
    shard's suffix array — the statistic a sharded Lee-et-al
    deployment actually serves: adjacency never crosses shards, so
    cross-shard repeats are invisible by design (the trade sharding
    makes; shard size is the knob). The oracle replays the per-shard
    chain, so a green row proves the sharded index answers the
    within-shard query bit-for-bit — the verification the sharded
    construction exists to enable."""
    docs = _docs_join_side(spark, sf_dir)
    sa = _suffix_ranks_cached(spark, sf_dir, _SA_SHARDS)
    with_txt = sa.join(docs.select("doc_id", "text"), "doc_id").select(
        "shard",
        "doc_id",
        "p",
        "sa_rank",
        F.col("text").substr(F.col("p") + 1, F.lit(_LCP_CAP)).alias("s64"),
    )
    pairs = _adjacent_sa_pairs(with_txt, sharded=True).select(
        F.col("a_doc_id").alias("a_doc"),
        "a_p",
        F.col("b_doc_id").alias("b_doc"),
        "b_p",
        _lcp_expr(F.col("a_s64"), F.col("b_s64")).alias("lcp"),
    )
    credited = _credit_both(pairs)
    return credited.groupBy("doc_id").agg(
        F.max("lcp").cast("bigint").alias("max_repeat"),
        F.sum(F.when(F.col("lcp") >= 24, 1).otherwise(0))
        .cast("bigint")
        .alias("n_long_positions"),
    )


# --------------------------------------------------------------------------
# Exact span REMOVAL via the suffix array — the action the index is for
# --------------------------------------------------------------------------
# corpus_longest_repeat reports the statistic; this operator performs
# the Lee-et-al-style cleanup: every character position whose suffix
# shares a >= _MIN_REPEAT-char prefix with an adjacent suffix in SA
# order starts a repeated span [p, p + lcp); per-document spans are
# merged (gaps-and-islands over the running max end) and the merged
# regions are CUT from the text. This is the exact-match tier of the
# span rewrite: dedup_span_rewrite (operators/dedup.py) approximates
# repeats with rolling W-token window hashes and keeps the first
# occurrence; the SA tier finds character-exact repeats of ANY length
# >= the threshold — including repeats no fixed window tiles — and
# removes every occurrence (the aggressive policy; threshold-keeping
# variants differ only in which credited positions they drop).

_MIN_REPEAT = 24


def _merged_repeat_ranges(
    spark, docs: DataFrame, sf_dir: str, shards: int | None = None
) -> DataFrame:
    """(doc_id, rs, n_spans_removed, chars_removed): merged repeated
    intervals per document, from adjacent-rank LCPs over the global
    suffix array (``shards=None``) or WITHIN each shard's array (the
    sharded production form — adjacency never crosses shards). rs is
    a sorted array of disjoint {s, e} structs (char offsets,
    end-exclusive)."""
    sa = _suffix_ranks_cached(spark, sf_dir, shards)
    shard_cols = ["shard"] if shards is not None else []
    with_txt = sa.join(docs.select("doc_id", "text"), "doc_id").select(
        *shard_cols,
        "doc_id",
        "p",
        "sa_rank",
        F.col("text").substr(F.col("p") + 1, F.lit(_LCP_CAP)).alias("s64"),
    )
    pairs = _adjacent_sa_pairs(
        with_txt, sharded=shards is not None
    ).select(
        F.col("a_doc_id").alias("a_doc"),
        "a_p",
        F.col("b_doc_id").alias("b_doc"),
        "b_p",
        _lcp_expr(F.col("a_s64"), F.col("b_s64")).alias("lcp"),
    )
    credited = _credit_both(pairs)
    return _ranges_from_credited(credited)


def _ranges_from_credited(credited: DataFrame) -> DataFrame:
    """credited (doc_id, p, lcp) rows -> merged disjoint repeat ranges
    per doc (the gaps-and-islands tail shared by every crediting
    strategy: global SA adjacency, per-shard adjacency, capped-sort)."""
    from pyspark.sql import Window as W

    # best repeat per position; only span starters survive
    iv = (
        credited.groupBy("doc_id", "p")
        .agg(F.max("lcp").alias("lcp"))
        .filter(F.col("lcp") >= _MIN_REPEAT)
        .select("doc_id", F.col("p").alias("s"), (F.col("p") + F.col("lcp")).alias("e"))
    )
    # gaps-and-islands on the running max end: a new island starts
    # when this interval begins past every previous end (s strictly
    # greater — touching intervals merge, keeping regions disjoint).
    byd = W.partitionBy("doc_id").orderBy("s")
    prev_max = F.max("e").over(byd.rowsBetween(W.unboundedPreceding, -1))
    isl = (
        iv.withColumn(
            "brk",
            F.when(
                prev_max.isNull() | (F.col("s") > prev_max), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "g", F.sum("brk").over(byd.rowsBetween(W.unboundedPreceding, 0))
        )
        .groupBy("doc_id", "g")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    return isl.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("rs"),
        F.count("*").cast("bigint").alias("n_spans_removed"),
        F.sum(F.col("e") - F.col("s")).cast("bigint").alias("chars_removed"),
    )


def _sa_rewrite_oracle(sharded: bool) -> str:
    """One template for the global AND the per-shard span-removal
    oracle — the only differences are the shard column, the window
    partition, and the adjacency's shard equality, so generating both
    from one body keeps the two replays from drifting."""
    shard_col = (
        f"{u60_sql('CAST(doc_id AS VARCHAR)')} % {_SA_SHARDS} AS shard,\n"
        "         "
        if sharded
        else ""
    )
    shard_sel = "shard, " if sharded else ""
    part = "PARTITION BY shard " if sharded else ""
    adj_shard = "b.shard = a.shard AND " if sharded else ""
    return f"""
WITH pos AS (
  SELECT {shard_col}doc_id, k AS p, substr(text, k + 1) AS sfx
  FROM (
    SELECT doc_id, text, unnest(range(0, length(text))) AS k
    FROM documents WHERE length(text) > 0
  )
),
sa AS (
  SELECT {shard_sel}doc_id, p, substr(sfx, 1, {_LCP_CAP}) AS s64,
         ROW_NUMBER() OVER ({part}ORDER BY sfx, doc_id, p) - 1 AS r
  FROM pos
),
adj AS (
  SELECT a.doc_id AS a_doc, a.p AS a_p, a.s64 AS a_s,
         b.doc_id AS b_doc, b.p AS b_p, b.s64 AS b_s
  FROM sa a JOIN sa b ON {adj_shard}b.r = a.r + 1
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
),
iv AS (
  SELECT doc_id, p AS s, p + MAX(lcp) AS e
  FROM credited GROUP BY doc_id, p
  HAVING MAX(lcp) >= {_MIN_REPEAT}
),
marked AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS brk
  FROM iv
),
merged AS (
  SELECT doc_id, MIN(s) AS s, MAX(e) AS e
  FROM (
    SELECT doc_id, s, e,
           SUM(brk) OVER (PARTITION BY doc_id ORDER BY s) AS g
    FROM marked
  ) GROUP BY doc_id, g
),
chars AS (
  SELECT doc_id, k, substr(text, k + 1, 1) AS c
  FROM (
    SELECT doc_id, text, unnest(range(0, length(text))) AS k
    FROM documents WHERE length(text) > 0
  )
),
kept AS (
  SELECT ch.doc_id, ch.k, ch.c
  FROM chars ch
  LEFT JOIN merged m
    ON ch.doc_id = m.doc_id AND ch.k >= m.s AND ch.k < m.e
  WHERE m.s IS NULL
),
clean AS (
  SELECT doc_id, COUNT(*)::BIGINT AS clean_chars,
         md5(string_agg(c, '' ORDER BY k)) AS clean_md5
  FROM kept GROUP BY doc_id
),
acct AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_spans_removed,
         SUM(e - s)::BIGINT AS chars_removed
  FROM merged GROUP BY doc_id
)
SELECT d.doc_id,
       length(d.text)::BIGINT AS orig_chars,
       coalesce(c.clean_chars, 0)::BIGINT AS clean_chars,
       coalesce(a.n_spans_removed, 0)::BIGINT AS n_spans_removed,
       coalesce(a.chars_removed, 0)::BIGINT AS chars_removed,
       coalesce(c.clean_md5, md5('')) AS clean_md5
FROM documents d
LEFT JOIN clean c ON d.doc_id = c.doc_id
LEFT JOIN acct a ON d.doc_id = a.doc_id
WHERE length(d.text) > 0
"""


@register(
    "dedup_sa_span_rewrite",
    oracle=_sa_rewrite_oracle(False),
    tags=("dedup", "suffix", "span"),
    expose=False,
)
def dedup_sa_span_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Lee-et-al-style span removal driven by the suffix array:
    merged character-exact repeated regions (adjacent-rank LCP >=
    24 (_MIN_REPEAT), capped at 64 (_LCP_CAP)) are cut from every doc.
    Returns per-doc accounting plus the md5 of the cleaned text; the
    oracle replays the whole chain — SA order, LCPs, interval merge,
    character-level cut — so the rewrite surface is value-exact.

    The cut is one JVM ``aggregate`` over the doc's sorted disjoint
    ranges building the kept text from inter-range substrings — the
    text moves through exactly one exchange (the ranges join), never
    explodes into per-char rows (the oracle's explode+anti-join is
    the formulation DuckDB prefers; both reduce to the same kept
    stream)."""
    docs = _docs_join_side(spark, sf_dir).filter(F.length("text") > 0)
    return _apply_span_cut(docs, _merged_repeat_ranges(spark, docs, sf_dir))


def _apply_span_cut(
    docs: DataFrame, ranges: DataFrame, keep_text: bool = False
) -> DataFrame:
    """Cut the merged disjoint ranges out of each document and report
    per-doc accounting + clean-text md5 — shared by the global and the
    sharded rewrite so the cut semantics cannot fork. ``keep_text``
    appends the cleaned text itself (the ingest path LANDS cleaned
    documents; the batch accounting queries drop it)."""
    rewritten = docs.join(ranges, "doc_id", "left").withColumn(
        "clean_text",
        F.when(F.col("rs").isNull(), F.col("text")).otherwise(
            F.expr(
                "aggregate(rs, struct(0L as prev, '' as acc), "
                "(a, r) -> struct(r.e, concat(a.acc, "
                "  substring(text, cast(a.prev as int) + 1, "
                "            cast(r.s - a.prev as int)))), "
                "a -> concat(a.acc, substring(text, cast(a.prev as int) + 1, "
                "            cast(length(text) - a.prev as int))))"
            )
        ),
    )
    cols = [
        F.col("doc_id"),
        F.length("text").cast("bigint").alias("orig_chars"),
        F.length("clean_text").cast("bigint").alias("clean_chars"),
        F.coalesce(F.col("n_spans_removed"), F.lit(0))
        .cast("bigint")
        .alias("n_spans_removed"),
        F.coalesce(F.col("chars_removed"), F.lit(0))
        .cast("bigint")
        .alias("chars_removed"),
        F.md5("clean_text").alias("clean_md5"),
    ]
    if keep_text:
        cols.append(F.col("clean_text"))
    return rewritten.select(*cols)


@register(
    "dedup_sa_span_rewrite_sharded",
    oracle=_sa_rewrite_oracle(True),
    tags=("dedup", "suffix", "span"),
    expose=False,
)
def dedup_sa_span_rewrite_sharded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Span removal over the SHARDED suffix arrays (hash(doc_id) % 4,
    _SA_SHARDS) — the form a Lee-et-al deployment actually executes:
    repeats are found within each shard's array (cross-shard repeats
    are invisible by design; shard size is the knob), the cut itself
    is the shared ``_apply_span_cut``. The oracle replays the
    per-shard chain — shard map, per-shard suffix order, LCPs,
    interval merge, character cut — via the same template as the
    global oracle (one builder, two variants, zero drift)."""
    docs = _docs_join_side(spark, sf_dir).filter(F.length("text") > 0)
    return _apply_span_cut(
        docs, _merged_repeat_ranges(spark, docs, sf_dir, shards=_SA_SHARDS)
    )


# r14 (VERDICT r13 item 3): the dup-gram prefilter ends in an explicit
# broadcast of a DATA-DEPENDENT key set (every duplicated 24-gram), and
# an explicit hint overrides Spark's size checks — on a heavily
# duplicated corpus that OOMs the driver instead of degrading. Gate it
# the way load_spread byte-gates its repartition: on the SOURCE parquet
# size, a deterministic driver-side stat (no extra data pass — a count
# gate here would add a full position-aggregation pass to every probe,
# and an eager plan-build count would extend the untimed-dispatch
# caveat VERDICT r13 item 6 says not to extend). Under the gate
# (256 MB source ≈ tens of M positions at the measured ~0.26 chars/
# byte, so realistic dup sets of ~15% stay within a few hundred MB of
# broadcast) the prefilter runs as in r13; above it the prefilter is
# SKIPPED outright — the downstream gsz >= 2 window filter already
# guarantees exactness, so the fallback is the pre-r13 plan shape
# (predictable full-shuffle degradation), not a shuffle semi-join that
# would re-exchange the payload it exists to protect. The production
# fix at 100 TB is the artifact-side dup-gram prefilter
# (span_rewrite_batch's sidecar path), not a bigger broadcast.
_PREFILTER_DOCS_BYTES = 256 << 20


def _dup_gram_pos(docs: DataFrame, sf_dir: str) -> DataFrame:
    """(doc_id, p, s64) restricted to positions whose exact
    _MIN_REPEAT-char (24) seed gram occurs at >= 2 corpus positions —
    the shared prefilter of the capsort and gram-group rewrite tiers
    (r13 optimization, guide §2.3/§3.2: decide with small rows, move
    the heavy payload once).

    Why it is exact for BOTH tiers: the rewrite thresholds at
    lcp >= 24, and any pair attaining that shares its 24-prefix, so
    (a) a position whose 24-gram is corpus-unique (or whose tail is
    shorter than 24 chars) can never credit, or be credited, a span —
    its max LCP with anything is < 24; and (b) for a kept position
    the crediting partner sits inside the contiguous sorted run of
    its 24-prefix group, which the filter keeps whole, so subset
    adjacency preserves every credited value >= 24 bit-for-bit
    (values < 24 may shrink, and are discarded by
    ``_ranges_from_credited`` either way). This is the gram-group
    tier's own exactness argument, promoted to a prefilter both
    tiers share.

    Plan shape: pass 1 aggregates xxhash64 of the seed gram — 8-byte
    keys with map-side partial aggregation, never the 64-char
    payload — and pass 2 re-derives the positions and drops ~85% of
    them (measured sf0.1: 202k of 1 371k positions sit in duplicated
    24-gram groups) with a broadcast LEFT SEMI before any
    payload-carrying exchange. Hash collisions only ever KEEP a
    singleton position (its credited lcp stays < 24 and is filtered
    downstream), so the hash never affects results. The duplicated-
    gram set is bounded by true duplication, not corpus size; on a
    100 TB corpus where it outgrows a broadcast, swap the explicit
    broadcast for the runtime Bloom-filter semi-join (guide §3.2) —
    the decide-with-8-byte-keys structure is unchanged.
    track_persist'd so the suite's two tiers share one computation of
    the surviving ~15%."""
    pos = (
        docs.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.length("text") - 1)
            ).alias("p"),
            "text",
        )
        .select(
            "doc_id",
            "p",
            F.col("text").substr(F.col("p") + 1, F.lit(_LCP_CAP)).alias(
                "s64"
            ),
        )
        .filter(F.length("s64") >= _MIN_REPEAT)
    )
    from streamlit_flink_demo_spark.sources.catalog import _table_bytes

    if _table_bytes(sf_dir, "documents") > _PREFILTER_DOCS_BYTES:
        # gate open: skip the prefilter (see _PREFILTER_DOCS_BYTES) —
        # exactness is carried by the tiers' own gsz >= 2 filters; no
        # persist either (caching every corpus position is the same
        # unbounded-state mistake as the broadcast).
        return pos
    gh = F.xxhash64(F.substring(F.col("s64"), 1, _MIN_REPEAT))
    dup = (
        pos.select(gh.alias("gh"))
        .groupBy("gh")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .select("gh")
    )
    return track_persist(
        pos.join(F.broadcast(dup), gh == F.col("gh"), "leftsemi")
    )


@register(
    "dedup_span_rewrite_capsort",
    oracle=_sa_rewrite_oracle(False),
    tags=("dedup", "suffix", "span"),
    expose=False,
)
def dedup_span_rewrite_capsort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL-exact span removal WITHOUT building the suffix array:
    one range-sort of the 64-char capped suffixes replaces the whole
    prefix-doubling construction. Identical output to
    ``dedup_sa_span_rewrite`` (same oracle SQL, and pinned equal in
    pytest), because the rewrite's semantics only ever see LCPs capped
    at _LCP_CAP (64): a position's credited repeat length is its max
    common prefix with ANY other suffix, capped at 64 — which is fully
    determined by the 64-char window s64(p). In any lexicographic
    order of the s64 strings, that max is attained at an adjacent row
    (sorted-strings property: cp(x_i, x_j) = min of adjacent cps
    between them), and full-suffix order is a refinement of s64 order,
    so adjacency crediting over the s64 sort and over the true SA
    yield the same per-position max — the SA's extra work (resolving
    order BEYOND 64 chars) is information the rewrite then throws
    away.

    Cost: ~88 B/char through ONE range exchange, vs the SA's ~48 B/
    char seed sort plus the doubling rounds over its residual active
    set and their per-round checkpoint materializations (r14: the
    32-char seed shrank that residual to the deep-tie ~13% of
    positions, narrowing this tier's construction advantage — but
    capsort still wins when span removal is the only consumer, and it
    needs no fail-stop checkpoint discipline at all) — and unlike the sharded
    tier this loses NO cross-shard repeats. Use the SA when arbitrary-
    length queries (pattern lookup, distinct substrings, contamination
    scans) must also be served; use this when span removal is the only
    consumer. Positions explode (doc_id, p, s64) exactly like the SA
    seed round; `_global_group_rank` on the unique key (s64, doc_id,
    p) is the global index (group size 1), adjacent ranks join, and
    the credited tail + cut are the shared helpers, so the three span
    tiers cannot drift."""
    docs = load_spread(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    # r13 optimization: only positions in duplicated 24-gram groups
    # can contribute a span (see _dup_gram_pos — exactness argument
    # there), so the range sort runs over the surviving ~15% and the
    # key (s64, doc_id, p) is unique, which drops the min-over-group
    # exchange entirely (unique=True).
    pos = _dup_gram_pos(docs, sf_dir)
    ranked = _global_group_rank(
        pos, ["s64", "doc_id", "p"], unique=True
    ).select("doc_id", "p", "s64", F.col("rank").alias("r"))
    a = ranked.alias("a")
    b = ranked.select(
        (F.col("r") - 1).alias("prev_r"),
        F.col("doc_id").alias("b_doc"),
        F.col("p").alias("b_p"),
        F.col("s64").alias("b_s64"),
    )
    pairs = a.join(b, F.col("a.r") == F.col("prev_r")).select(
        F.col("a.doc_id").alias("a_doc"),
        F.col("a.p").alias("a_p"),
        "b_doc",
        "b_p",
        _lcp_expr(F.col("a.s64"), F.col("b_s64")).alias("lcp"),
    )
    credited = _credit_both(pairs)
    cut_docs = _docs_join_side(spark, sf_dir).filter(F.length("text") > 0)
    return _apply_span_cut(cut_docs, _ranges_from_credited(credited))


# --------------------------------------------------------------------------
# Exact train/eval contamination via the suffix array
# --------------------------------------------------------------------------
# docs_eval_contamination (operators/pipeline.py) measures SHINGLE
# overlap; this is the exact tier Lee et al. 2022 run for train-test
# leakage: for every EVAL document, the longest character-exact
# substring it shares with ANY TRAIN document. SA property: among the
# train suffixes, the one maximizing LCP with an eval suffix is one of
# its two NEAREST train neighbors in suffix order — so the whole
# corpus-cross-corpus match problem reduces to a nearest-other-set
# scan over rank order plus two LCPs per eval position.
#
# The scan is the distributed-prefix-scan shape: range-partition by
# rank (localCheckpoint pins the partitioning — same fail-stop
# contract as _global_group_rank), in-partition running last/next
# train rank via two windows over ONE exchange, and cross-partition
# boundary fill from a bounded collect (per-partition train-rank
# extremes, prefix/suffix-folded on the driver, shipped back as two
# literal maps). Driver state: two values per shuffle partition.

_CONTAM_T = 24  # chars: position counts as contaminated at >= this


def _nearest_train_scan(flagged: DataFrame) -> DataFrame:
    """Input: (shard-free) SA rows flagged is_train. Output: the EVAL
    rows with prev_tr / next_tr = nearest train ranks in SA order
    (null when none exists on that side)."""
    from pyspark.sql import Window as W

    rp = (
        flagged.repartitionByRange("sa_rank")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    ext = {
        r["_pid"]: (r["mn"], r["mx"])
        for r in rp.filter("is_train")
        .groupBy("_pid")
        .agg(F.min("sa_rank").alias("mn"), F.max("sa_rank").alias("mx"))
        .collect()
    }
    pids = sorted(r["_pid"] for r in rp.select("_pid").distinct().collect())
    prev_fill: dict[int, int] = {}
    next_fill: dict[int, int] = {}
    run = None
    for pid in pids:
        if run is not None:
            prev_fill[pid] = run
        if pid in ext:
            run = ext[pid][1]
    run = None
    for pid in reversed(pids):
        if run is not None:
            next_fill[pid] = run
        if pid in ext:
            run = ext[pid][0]
    pmap = (
        F.create_map(*[F.lit(x) for kv in prev_fill.items() for x in kv])
        if prev_fill
        else F.lit(None)
    )
    nmap = (
        F.create_map(*[F.lit(x) for kv in next_fill.items() for x in kv])
        if next_fill
        else F.lit(None)
    )
    tr_rank = F.when(F.col("is_train"), F.col("sa_rank"))
    wf = W.partitionBy("_pid").orderBy("sa_rank").rowsBetween(
        W.unboundedPreceding, -1
    )
    wb = W.partitionBy("_pid").orderBy(F.col("sa_rank").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    out = rp.withColumn(
        "prev_tr",
        F.coalesce(
            F.last(tr_rank, ignorenulls=True).over(wf),
            pmap[F.col("_pid")] if prev_fill else F.lit(None),
        ),
    ).withColumn(
        "next_tr",
        F.coalesce(
            F.last(tr_rank, ignorenulls=True).over(wb),
            nmap[F.col("_pid")] if next_fill else F.lit(None),
        ),
    )
    return out.filter(~F.col("is_train")).drop("_pid", "is_train")


_TRAIN_SQL = f"({u60_sql('CAST(doc_id AS VARCHAR)')} % 100) < 90"
_TRAIN_SQL_D = f"({u60_sql('CAST(d.doc_id AS VARCHAR)')} % 100) < 90"

_CONTAM_ORACLE = f"""
WITH pos AS (
  SELECT doc_id, k AS p, substr(text, k + 1) AS sfx
  FROM (
    SELECT doc_id, text, unnest(range(0, length(text))) AS k
    FROM documents WHERE length(text) > 0
  )
),
sa AS (
  SELECT doc_id, p, substr(sfx, 1, {_LCP_CAP}) AS s64,
         ROW_NUMBER() OVER (ORDER BY sfx, doc_id, p) - 1 AS r,
         {_TRAIN_SQL} AS is_train
  FROM pos
),
nb AS (
  SELECT doc_id, p, s64, is_train,
         MAX(CASE WHEN is_train THEN r END) OVER (
           ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_tr,
         MIN(CASE WHEN is_train THEN r END) OVER (
           ORDER BY r ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS next_tr
  FROM sa
),
cand AS (
  SELECT e.doc_id, e.p, e.s64 AS a_s, t.s64 AS b_s
  FROM (SELECT * FROM nb WHERE NOT is_train) e
  JOIN sa t ON t.is_train AND (t.r = e.prev_tr OR t.r = e.next_tr)
),
pairs AS (
  SELECT doc_id, p,
         (CASE WHEN mp = 0 THEN least(length(a_s), length(b_s))
               ELSE mp - 1 END)::BIGINT AS lcp
  FROM (
    SELECT *, list_position(
      [ (CASE WHEN d < length(a_s) THEN a_s[d+1] END)
          IS DISTINCT FROM
        (CASE WHEN d < length(b_s) THEN b_s[d+1] END)
        for d in range({_LCP_CAP}) ], true) AS mp
    FROM cand
  )
),
best AS (
  SELECT doc_id, p, MAX(lcp) AS m FROM pairs GROUP BY doc_id, p
),
per_doc AS (
  SELECT doc_id,
         CAST(MAX(m) AS BIGINT) AS max_train_match,
         CAST(SUM(CASE WHEN m >= {_CONTAM_T} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated_positions
  FROM best GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.max_train_match, 0) AS max_train_match,
       COALESCE(p.n_contaminated_positions, 0) AS n_contaminated_positions
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
WHERE NOT ({_TRAIN_SQL_D}) AND length(d.text) > 0
"""


@register(
    "contamination_sa_exact",
    oracle=_CONTAM_ORACLE,
    tags=("pipeline", "contamination", "suffix"),
    expose=False,
)
def contamination_sa_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact train→eval contamination per eval document: the longest
    character-exact substring shared with any train document (capped
    at 64, _LCP_CAP) and the count of eval positions whose match
    reaches 24 (_CONTAM_T) chars. Split = the engine's standard 90/10 hash split
    (docs_train_eval_split convention). One shared SA construction
    (the session memo), one nearest-other-set scan, two LCPs per eval
    position — never an eval×train join. The oracle replays the whole
    chain with global windows, so every match length is hash-checked."""
    docs = _docs_join_side(spark, sf_dir).filter(F.length("text") > 0)
    sa = _suffix_ranks_cached(spark, sf_dir, None)
    is_train = (u60(F.col("doc_id").cast("string")) % 100) < 90
    with_txt = sa.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        "p",
        "sa_rank",
        F.col("text").substr(F.col("p") + 1, F.lit(_LCP_CAP)).alias("s64"),
        is_train.alias("is_train"),
    )
    ev = _nearest_train_scan(with_txt)
    tr = with_txt.filter("is_train").select(
        F.col("sa_rank").alias("tr_rank"), F.col("s64").alias("tr_s64")
    )
    cand = (
        ev.select(
            "doc_id",
            "p",
            "s64",
            F.explode(F.array("prev_tr", "next_tr")).alias("nbr"),
        )
        .filter(F.col("nbr").isNotNull())
        .join(tr, F.col("nbr") == F.col("tr_rank"))
        .select(
            "doc_id", "p", _lcp_expr(F.col("s64"), F.col("tr_s64")).alias("lcp")
        )
    )
    best = cand.groupBy("doc_id", "p").agg(F.max("lcp").alias("m"))
    per_doc = best.groupBy("doc_id").agg(
        F.max("m").cast("bigint").alias("max_train_match"),
        F.sum(F.when(F.col("m") >= _CONTAM_T, 1).otherwise(0))
        .cast("bigint")
        .alias("n_contaminated_positions"),
    )
    ev_docs = docs.filter(~is_train).select("doc_id")
    return ev_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("max_train_match", F.lit(0))
        .cast("bigint")
        .alias("max_train_match"),
        F.coalesce("n_contaminated_positions", F.lit(0))
        .cast("bigint")
        .alias("n_contaminated_positions"),
    )


@register(
    "dedup_span_rewrite_gramgroup",
    oracle=_sa_rewrite_oracle(False),
    tags=("dedup", "suffix", "span"),
    expose=False,
)
def dedup_span_rewrite_gramgroup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GLOBAL-exact span removal with NO global sort at all — the
    third tier, and the plan a 100 TB run wants: hash-group positions
    by their exact 24-char prefix (_MIN_REPEAT), sort only WITHIN each
    group. Exact because the rewrite thresholds at lcp >= 24: any pair
    achieving that shares the 24-prefix (same group), and within the
    group — where every pair already agrees on >= 24 chars — the
    in-group sorted neighbors attain each position's global max capped
    LCP (sorted-strings property); a position whose group is a
    singleton has max lcp < 24 and drops before the sort. Same oracle
    as the SA and capsort tiers, pinned row-identical to both in
    pytest.

    Plan: ONE hash exchange (partition by the 24-gram) feeding a
    single window stage — group count (singleton drop), in-group
    row_number, prev/next via lag/lead, credited lcp =
    greatest(lcp(prev), lcp(next)) — then the shared islands/cut.
    No range sampling, no localCheckpoint, no driver collect: nothing
    to pin, nothing to fail-stop, and group width is bounded by true
    24-gram duplication (the same boundedness dedup_suffix_spans
    rides), not by corpus size. Versus capsort's global range-sort
    this trades the sampler + rank machinery for a plain hash
    shuffle of the same ~88 B/char payload."""
    from pyspark.sql import Window as W

    docs = load_spread(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    # r13 optimization: the broadcast dup-gram prefilter
    # (_dup_gram_pos) drops singleton-gram positions BEFORE the hash
    # exchange, so the window stage shuffles the surviving ~15%
    # instead of every corpus position. The exact in-window gsz >= 2
    # filter below stays — it is what makes xxhash64 collisions in
    # the prefilter harmless to group membership.
    pos = _dup_gram_pos(docs, sf_dir).withColumn(
        "g", F.substring("s64", 1, _MIN_REPEAT)
    )
    wg = W.partitionBy("g").orderBy("s64", "doc_id", "p")
    wc = W.partitionBy("g")
    sized = pos.withColumn("gsz", F.count("*").over(wc)).filter(
        F.col("gsz") >= 2
    )
    # lag/lead staged into plain columns BEFORE the LCP fold: the
    # analyzer does extract window expressions out of lambda bodies
    # (the delta/batch sites ran that way through r13), but staging
    # guarantees each window function is planned and evaluated ONCE
    # instead of once per extracted reference — now applied uniformly
    # at all three lag/lead sites (r13 ADVICE).
    nbrs = sized.select(
        "doc_id",
        "p",
        "s64",
        F.lag("s64").over(wg).alias("prev_s"),
        F.lead("s64").over(wg).alias("next_s"),
    )
    with_nbr = nbrs.select(
        "doc_id",
        "p",
        F.greatest(
            F.coalesce(
                _lcp_expr(F.col("s64"), F.col("prev_s")), F.lit(0)
            ),
            F.coalesce(
                _lcp_expr(F.col("s64"), F.col("next_s")), F.lit(0)
            ),
        ).alias("lcp"),
    )
    cut_docs = _docs_join_side(spark, sf_dir).filter(F.length("text") > 0)
    return _apply_span_cut(cut_docs, _ranges_from_credited(with_nbr))


_DELTA_RW_ORACLE = f"""
WITH full_rw AS ({_sa_rewrite_oracle(False)})
SELECT * FROM full_rw
WHERE ({u60_sql("CAST(doc_id AS VARCHAR)")} % 100) >= 90
"""


@register(
    "dedup_span_rewrite_delta",
    oracle=_DELTA_RW_ORACLE,
    tags=("dedup", "suffix", "span", "incremental"),
    expose=False,
)
def dedup_span_rewrite_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact span removal — rewrite only the ARRIVING
    slice (hash-mod 10%, the engine's delta convention) against the
    full standing corpus, the daily-crawl form of the gram-group
    tier: a delta document's spans must be detected against base AND
    delta text, but base documents are not rewritten. Output rows are
    exactly the delta rows of the global rewrite (the oracle replays
    the global chain and filters — one template, no drift).

    The gram-group structure is what makes the increment cheap: only
    24-gram groups CONTAINING a delta position can credit a delta
    position, so base positions are pruned by a semi-join on the gram
    key before the window — the sort state is bounded by
    delta-relevant groups, not the corpus. In this query form the
    prune itself still exchanges the base grams once; the standing
    artifact form (operators/incremental.py pattern) pre-buckets the
    base gram table by g so a delta batch probes only matching
    buckets and base text is never rescanned."""
    from pyspark.sql import Window as W

    docs = load_spread(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    is_delta = (u60(F.col("doc_id").cast("string")) % 100) >= 90
    pos = docs.select(
        "doc_id",
        is_delta.alias("is_delta"),
        F.explode(F.sequence(F.lit(0), F.length("text") - 1)).alias("p"),
        F.col("text"),
    ).select(
        "doc_id",
        "is_delta",
        "p",
        F.col("text").substr(F.col("p") + 1, F.lit(_LCP_CAP)).alias("s64"),
    ).withColumn("g", F.substring("s64", 1, _MIN_REPEAT)).filter(
        F.length("g") >= _MIN_REPEAT
    )
    delta_grams = pos.filter("is_delta").select("g").distinct()
    pruned = pos.join(delta_grams, "g", "leftsemi")
    wg = W.partitionBy("g").orderBy("s64", "doc_id", "p")
    wc = W.partitionBy("g")
    sized = pruned.withColumn("gsz", F.count("*").over(wc)).filter(
        F.col("gsz") >= 2
    )
    # lag/lead staged into plain columns BEFORE the LCP fold (the
    # dedup_span_rewrite_gramgroup discipline): each window function
    # evaluates once instead of once per reference inside the two
    # _lcp_expr expansions.
    nbrs = sized.select(
        "doc_id",
        "is_delta",
        "p",
        "s64",
        F.lag("s64").over(wg).alias("prev_s"),
        F.lead("s64").over(wg).alias("next_s"),
    )
    credited = nbrs.select(
        "doc_id",
        "is_delta",
        "p",
        F.greatest(
            F.coalesce(
                _lcp_expr(F.col("s64"), F.col("prev_s")), F.lit(0)
            ),
            F.coalesce(
                _lcp_expr(F.col("s64"), F.col("next_s")), F.lit(0)
            ),
        ).alias("lcp"),
    ).filter("is_delta").drop("is_delta")
    cut_docs = _docs_join_side(spark, sf_dir).filter(F.length("text") > 0)
    return _apply_span_cut(
        cut_docs.filter(is_delta), _ranges_from_credited(credited)
    )


@register(
    "contamination_capsort_exact",
    oracle=_CONTAM_ORACLE,
    tags=("pipeline", "contamination", "suffix"),
    expose=False,
)
def contamination_capsort_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact train→eval contamination WITHOUT the suffix array — the
    capped-sort tier (dedup_span_rewrite_capsort's argument, applied
    to the cross-set query): the reported match length is capped at
    64 (_LCP_CAP), so it is fully determined by the 64-char windows,
    and in ANY lexicographic order of those windows the train suffix
    maximizing the capped LCP with an eval suffix is one of its two
    nearest TRAIN neighbors (sorted-strings property, restricted to
    the train subset). One range-sort of the windows replaces the
    prefix-doubling build; the nearest-other-set scan, the two LCPs
    per eval position, and the per-doc aggregation are shared with
    ``contamination_sa_exact`` — same oracle SQL, pinned row-identical
    in pytest. Use the SA tier when the index must also serve
    arbitrary-length/order queries; for a contamination pass alone
    this is the production path (~10× cheaper construction at sf0.1,
    SCALE.md)."""
    docs = load_spread(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    is_train = (u60(F.col("doc_id").cast("string")) % 100) < 90
    pos = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.length("text") - 1)).alias("p"),
        F.col("text"),
    ).select(
        "doc_id",
        "p",
        F.col("text").substr(F.col("p") + 1, F.lit(_LCP_CAP)).alias("s64"),
    )
    ranked = _global_group_rank(pos, ["s64", "doc_id", "p"]).select(
        "doc_id",
        "p",
        "s64",
        F.col("rank").alias("sa_rank"),
        is_train.alias("is_train"),
    )
    ev = _nearest_train_scan(ranked)
    tr = ranked.filter("is_train").select(
        F.col("sa_rank").alias("tr_rank"), F.col("s64").alias("tr_s64")
    )
    cand = (
        ev.select(
            "doc_id",
            "p",
            "s64",
            F.explode(F.array("prev_tr", "next_tr")).alias("nbr"),
        )
        .filter(F.col("nbr").isNotNull())
        .join(tr, F.col("nbr") == F.col("tr_rank"))
        .select(
            "doc_id", "p", _lcp_expr(F.col("s64"), F.col("tr_s64")).alias("lcp")
        )
    )
    best = cand.groupBy("doc_id", "p").agg(F.max("lcp").alias("m"))
    per_doc = best.groupBy("doc_id").agg(
        F.max("m").cast("bigint").alias("max_train_match"),
        F.sum(F.when(F.col("m") >= _CONTAM_T, 1).otherwise(0))
        .cast("bigint")
        .alias("n_contaminated_positions"),
    )
    ev_docs = (
        _docs_join_side(spark, sf_dir)
        .filter(F.length("text") > 0)
        .filter(~is_train)
        .select("doc_id")
    )
    return ev_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("max_train_match", F.lit(0))
        .cast("bigint")
        .alias("max_train_match"),
        F.coalesce("n_contaminated_positions", F.lit(0))
        .cast("bigint")
        .alias("n_contaminated_positions"),
    )


# --------------------------------------------------------------------------
# Exact pattern-count lookup — the n-gram count API over the corpus
# --------------------------------------------------------------------------
# The query infini-gram (Liu et al. 2024) serves from a suffix array:
# "how many times does this exact character string occur in the
# corpus, and in how many documents?" — the membership/count primitive
# behind n-gram LM smoothing, contamination spot-checks, and memorized-
# string audits. A single-node index answers it by binary search over
# suffix order; the DISTRIBUTED analogue that fits Spark's execution
# model is a positional gram probe: every corpus position contributes
# its fixed-width gram, the (tiny) probe set broadcasts into a
# map-side hash join — so matching positions are selected in ONE scan
# with NO corpus shuffle, and only the per-pattern partial counts
# exchange. Counting occurrences needs no suffix ORDER at all (order
# is what the LCP/adjacency queries above are for), so this tier skips
# the SA build entirely; at 100 TB the standing form is the gram-count
# artifact (GROUP BY gram, hash-bucketed by gram), where a probe batch
# prunes to matching buckets and never rescans text.

_GRAM_W = 16  # probe gram width (chars)


_GRAM_LOOKUP_ORACLE = f"""
WITH pats AS (
  SELECT DISTINCT substr(text, 17, {_GRAM_W}) AS gram
  FROM documents
  WHERE ({u60_sql("CAST(doc_id AS VARCHAR)")} % 17) = 3
    AND length(text) >= 32
),
pos AS (
  SELECT doc_id, substr(text, k + 1, {_GRAM_W}) AS gram
  FROM (
    SELECT doc_id, text, unnest(range(0, length(text) - {_GRAM_W - 1})) AS k
    FROM documents WHERE length(text) >= {_GRAM_W}
  )
)
SELECT gram,
       COUNT(*)::BIGINT AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM pos JOIN pats USING (gram)
GROUP BY gram
"""


@register(
    "corpus_gram_lookup",
    oracle=_GRAM_LOOKUP_ORACLE,
    tags=("pipeline", "suffix", "lookup"),
    expose=False,
)
def corpus_gram_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact occurrence count + document frequency for a probe set of
    16-char (_GRAM_W) patterns (every overlapping position counts —
    the infini-gram count API). The probe set derives deterministically
    from the corpus (one mid-document gram from each doc in a 1/17
    hash sample) so both engines compute it independently. Plan: one
    corpus scan → per-position gram → map-side broadcast-hash join
    against the probe set (99%+ of positions die before any exchange)
    → two-level count aggregation ((gram, doc) partial then gram) so
    the occurrence and document counts come from ONE un-Expanded
    shuffle of hit rows only."""
    docs = load_spread(spark, sf_dir, "documents")
    pats = (
        docs.filter(
            ((u60(F.col("doc_id").cast("string")) % 17) == 3)
            & (F.length("text") >= 32)
        )
        .select(F.col("text").substr(17, _GRAM_W).alias("gram"))
        .distinct()
    )
    pos = docs.filter(F.length("text") >= _GRAM_W).select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.length("text") - _GRAM_W)
        ).alias("p"),
        "text",
    ).select(
        "doc_id",
        F.col("text").substr(F.col("p") + 1, F.lit(_GRAM_W)).alias("gram"),
    )
    hits = pos.join(F.broadcast(pats), "gram")
    per_doc = hits.groupBy("gram", "doc_id").agg(F.count("*").alias("c"))
    return per_doc.groupBy("gram").agg(
        F.sum("c").cast("bigint").alias("n_occurrences"),
        F.count("*").cast("bigint").alias("n_docs"),
    )


# --------------------------------------------------------------------------
# Shard-append construction — incremental growth for the suffix index
# --------------------------------------------------------------------------
# The sharded build above makes the arrays independent per shard; this
# closes the loop the ANN indexes closed in round 10 (frozen-quantizer
# append): a GROWING corpus appends documents daily and cannot afford
# rebuilding yesterday's index. Because shards never interact, the
# append path is exactly "new documents become a NEW shard": build the
# suffix array over the delta alone (cost ∝ delta, not corpus) and
# union it with the existing per-shard artifact, which is not touched
# at all. The oracle proves the composed result is bit-for-bit the
# per-shard suffix order of the grown corpus under the composite shard
# map (base docs → hash % {_SA_SHARDS}, delta docs → shard
# {_SA_SHARDS}) — i.e. append ≡ fresh build, at delta cost.

_SA_APPEND_ORACLE = f"""
WITH pos AS (
  SELECT CASE WHEN ({u60_sql("CAST(doc_id AS VARCHAR)")} % 100) >= 90
              THEN {_SA_SHARDS}
              ELSE {u60_sql("CAST(doc_id AS VARCHAR)")} % {_SA_SHARDS}
         END AS shard,
         doc_id, k AS p, substr(text, k + 1) AS sfx
  FROM (
    SELECT doc_id, text, unnest(range(0, length(text))) AS k
    FROM documents WHERE length(text) > 0
  )
),
sa AS (
  SELECT shard, doc_id, p,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY sfx, doc_id, p) - 1
           AS sa_rank
  FROM pos
)
SELECT doc_id,
       CAST(MIN(shard) AS BIGINT) AS shard,
       COUNT(*)::BIGINT AS n_suffixes,
       CAST(MIN(sa_rank) AS BIGINT) AS min_rank,
       SUM((sa_rank * (p + 1)) % {_SA_MOD})::BIGINT AS rank_checksum
FROM sa GROUP BY doc_id
"""


@register(
    "corpus_suffix_array_append",
    oracle=_SA_APPEND_ORACLE,
    tags=("dedup", "suffix", "index", "incremental"),
    expose=False,
)
def corpus_suffix_array_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental suffix-index growth: the 90% hash-split 'base'
    corpus plays yesterday's per-shard artifact; the 10% delta builds
    its OWN array as a new shard and unions in — the base frame is
    never re-ranked (its construction here stands in for reading the
    persisted artifact; the session memo gives it the artifact role
    within a run). Summarized per document exactly like
    corpus_suffix_array_sharded, so the oracle pins every rank of both
    the untouched base shards and the appended one."""
    docs = load_spread(spark, sf_dir, "documents")
    bucket = u60(F.col("doc_id").cast("string")) % 100
    per = _SA_MEMO.setdefault(spark, {})
    key = (sf_dir, "append")
    if key not in per:
        base = docs.filter(bucket < 90)
        delta = docs.filter(bucket >= 90)
        sa_base = suffix_ranks(
            base,
            spark,
            shard_col=u60(F.col("doc_id").cast("string")) % _SA_SHARDS,
        )
        sa_delta = suffix_ranks(
            delta, spark, shard_col=F.lit(_SA_SHARDS).cast("bigint")
        )
        per[key] = sa_base.unionByName(sa_delta)
    sa = per[key]
    return sa.groupBy("doc_id").agg(
        F.min("shard").cast("bigint").alias("shard"),
        F.count("*").cast("bigint").alias("n_suffixes"),
        F.min("sa_rank").cast("bigint").alias("min_rank"),
        F.sum((F.col("sa_rank") * (F.col("p") + 1)) % _SA_MOD)
        .cast("bigint")
        .alias("rank_checksum"),
    )


# --------------------------------------------------------------------------
# Distinct-substring counting — the SA+LCP identity, independently checked
# --------------------------------------------------------------------------
# A corpus's count of DISTINCT substrings (bounded here at length <= 24
# so both engines stay finite) is the classic suffix-array identity:
# in suffix order, suffix i introduces exactly
# min(len_i, K) - min(LCP(i, i-1), K) new substrings of length <= K,
# because the lexicographic PREDECESSOR maximizes the common prefix
# against all earlier suffixes. So the count is two global sums over
# the SA — while the oracle computes the same number by literally
# materializing every substring and COUNT(DISTINCT)ing it. The two
# formulations share NO intermediate: a green row re-derives the
# entire suffix order + LCP machinery through an independent method
# (the strongest cross-check in the SA family). The statistic itself
# is the vocabulary-richness / template-detection measure: a corpus of
# near-copies has far fewer distinct substrings per position than
# fresh text.

_DSUB_K = 24  # substring length bound (= _CONTAM_T / _MIN_REPEAT)


_DSUB_ORACLE = f"""
WITH pos AS (
  SELECT substr(text, k + 1, {_LCP_CAP}) AS sfx
  FROM (
    SELECT text, unnest(range(0, length(text))) AS k
    FROM documents WHERE length(text) > 0
  )
),
subs AS (
  SELECT DISTINCT substr(sfx, 1, w.w) AS s
  FROM pos, (SELECT unnest(range(1, {_DSUB_K + 1})) AS w) w
  WHERE w.w <= length(sfx)
)
SELECT (SELECT COUNT(*) FROM pos)::BIGINT AS n_positions,
       (SELECT SUM(LEAST(length(sfx), {_DSUB_K})) FROM pos)::BIGINT
         AS sum_capped_len,
       (SELECT COUNT(*) FROM subs)::BIGINT AS n_distinct_le24
"""


@register(
    "corpus_distinct_substrings",
    oracle=_DSUB_ORACLE,
    tags=("dedup", "suffix", "index"),
    expose=False,
)
def corpus_distinct_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count of distinct substrings of length <= 24 (_DSUB_K) in the
    corpus, computed from the suffix array WITHOUT materializing any
    substring: sum of per-suffix capped lengths minus the sum of
    capped adjacent-rank LCPs (each suffix's predecessor already
    covers exactly its LCP-prefixes). One shared SA construction (the
    session memo), one adjacent-rank exchange, two scalar sums. The
    oracle has no suffix array at all — it materializes all
    position x width substrings and COUNT(DISTINCT)s them — so a
    match validates the full suffix order + LCP chain by a method
    that shares no intermediate with the engine."""
    docs = _docs_join_side(spark, sf_dir)
    sa = _suffix_ranks_cached(spark, sf_dir, None)
    with_txt = sa.join(docs.select("doc_id", "text"), "doc_id").select(
        "sa_rank",
        F.col("text").substr(F.col("p") + 1, F.lit(_LCP_CAP)).alias("s64"),
    )
    caplen = F.least(F.lit(_DSUB_K), F.length("s64"))
    base = with_txt.agg(
        F.count("*").cast("bigint").alias("n_positions"),
        F.sum(caplen).cast("bigint").alias("sum_capped_len"),
    )
    lcp_sum = (
        _adjacent_sa_pairs(with_txt, carry=())
        .select(
            F.least(
                F.lit(_DSUB_K), _lcp_expr(F.col("a_s64"), F.col("b_s64"))
            ).alias("l")
        )
        .agg(F.coalesce(F.sum("l"), F.lit(0)).cast("bigint").alias("lcp_total"))
    )
    return base.crossJoin(F.broadcast(lcp_sum)).select(
        "n_positions",
        "sum_capped_len",
        (F.col("sum_capped_len") - F.col("lcp_total"))
        .cast("bigint")
        .alias("n_distinct_le24"),
    )


# --------------------------------------------------------------------------
# Variable-length pattern lookup — one scan serves every pattern width
# --------------------------------------------------------------------------
# corpus_gram_lookup probes a FIXED width; real lookup batches mix
# lengths (phrases, code identifiers, memorized-string audits). The
# distributed trick that keeps it ONE corpus scan for all widths: key
# the position index on an 8-char SEED gram (_PAT_SEED) and carry a
# capped extension; a
# pattern of any length 8..36 joins on its first 8 chars and verifies
# by prefix match against the extension. The seed join is a hash join
# (broadcast here; bucket-pruned against the gram-index artifact at
# production scale), so only seed-colliding positions ever reach the
# verify — the distributed analogue of descending the suffix tree 8
# chars at a time.

_PAT_MAX = 36  # longest probe pattern (capped extension width)
# the pattern index's seed-gram width is its own 8-char contract (the
# oracle SQL hardcodes substr(..., 1, 8)); it historically aliased
# _SA_SEED, which r14 retunes independently for the SA construction
_PAT_SEED = 8


_PAT_LOOKUP_ORACLE = f"""
WITH pats AS (
  SELECT DISTINCT
    substr(text, 17, 8 + ({u60_sql("CAST(doc_id AS VARCHAR)")} % 5) * 7)
      AS pat
  FROM documents
  WHERE ({u60_sql("CAST(doc_id AS VARCHAR)")} % 23) = 5
    AND length(text) >= 64
),
pos AS (
  SELECT doc_id, substr(text, k + 1, {_PAT_MAX}) AS ext
  FROM (
    SELECT doc_id, text, unnest(range(0, length(text) - 7)) AS k
    FROM documents WHERE length(text) >= 8
  )
)
SELECT pat,
       CAST(length(pat) AS BIGINT) AS pat_len,
       COUNT(*)::BIGINT AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM pos JOIN pats
  ON substr(pos.ext, 1, 8) = substr(pats.pat, 1, 8)
 AND substr(pos.ext, 1, length(pats.pat)) = pats.pat
GROUP BY pat
"""


@register(
    "corpus_pattern_lookup",
    oracle=_PAT_LOOKUP_ORACLE,
    tags=("pipeline", "suffix", "lookup"),
    expose=False,
)
def corpus_pattern_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-length exact pattern counts (occurrences including
    overlaps + document frequency) for a mixed-width probe set —
    lengths 8/15/22/29/36, derived deterministically from a 1/23 hash
    sample of the corpus so both engines compute the probe set
    independently. ONE corpus scan serves every width: positions are
    keyed by their 8-char seed gram and carry a 36-char (_PAT_MAX)
    capped extension; each pattern hash-joins on its first 8 chars and
    verifies by prefix equality. Counts come from the same two-level
    (pattern, doc) aggregation as corpus_gram_lookup."""
    docs = load_spread(spark, sf_dir, "documents")
    h = u60(F.col("doc_id").cast("string"))
    pats = (
        docs.filter(((h % 23) == 5) & (F.length("text") >= 64))
        .select(
            F.col("text")
            .substr(F.lit(17), (F.lit(8) + (h % 5) * 7).cast("int"))
            .alias("pat")
        )
        .distinct()
        .select("pat", F.col("pat").substr(1, _PAT_SEED).alias("k8"))
    )
    pos = docs.filter(F.length("text") >= 8).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.length("text") - 8)).alias("p"),
        "text",
    ).select(
        "doc_id",
        F.col("text").substr(F.col("p") + 1, F.lit(_PAT_MAX)).alias("ext"),
    ).select(
        "doc_id", "ext", F.col("ext").substr(1, _PAT_SEED).alias("k8")
    )
    hits = pos.join(F.broadcast(pats), "k8").filter(
        F.col("ext").substr(F.lit(1), F.length("pat")) == F.col("pat")
    )
    per_doc = hits.groupBy("pat", "doc_id").agg(F.count("*").alias("c"))
    return (
        per_doc.groupBy("pat")
        .agg(
            F.sum("c").cast("bigint").alias("n_occurrences"),
            F.count("*").cast("bigint").alias("n_docs"),
        )
        .select(
            "pat",
            F.length("pat").cast("bigint").alias("pat_len"),
            "n_occurrences",
            "n_docs",
        )
    )


# --------------------------------------------------------------------------
# Bucketed gram-index artifact: the standing (g, s64) corpus index
# --------------------------------------------------------------------------
# The gram-group rewrite tier's whole corpus-side state is the
# (g = exact 24-gram, s64 = capped 64-char window) position table.
# Materialized once as parquet PARTITIONED BY gb = hash(g) % _GB_PARTS,
# a delta batch (arriving documents, the incremental rewrite's new
# slice, a streaming micro-batch) probes it with its own (small,
# broadcastable) gram set joined on (gb, g) — the partitioned scan
# dynamic-partition-prunes to the batch's buckets, so base text is
# never rescanned and probe cost ∝ batch size + truly-matching
# groups. This is the artifact form dedup_span_rewrite_delta's
# docstring promises; streaming/span_ingest.py rides the same index,
# and operators/compaction.py folds committed ingested documents back
# into it as deltas (incremental.py's commit_delta discipline).

_GB_PARTS = 64


def gram_positions(docs: DataFrame) -> DataFrame:
    """(doc_id, p, s64, g) for every position whose 24-gram is full
    width (shorter suffixes can never reach the repeat threshold)."""
    return (
        docs.filter(F.length("text") >= _MIN_REPEAT)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.length("text") - _MIN_REPEAT)
            ).alias("p"),
            "text",
        )
        .select(
            "doc_id",
            "p",
            F.col("text")
            .substr(F.col("p") + 1, F.lit(_LCP_CAP))
            .alias("s64"),
        )
        .withColumn("g", F.substring("s64", 1, _MIN_REPEAT))
    )


def gram_bucket_col(g: F.Column) -> F.Column:
    """Deterministic JVM-side bucket of a 24-gram (xxhash64 — cheap
    per position, stable across runs/sessions)."""
    return F.pmod(F.xxhash64(g), F.lit(_GB_PARTS)).cast("int")


def gram_index_rows(docs: DataFrame) -> DataFrame:
    """(gb, g, doc_id, p, s64) — the artifact's rows for any
    (doc_id, text) corpus frame."""
    return gram_positions(docs).withColumn(
        "gb", gram_bucket_col(F.col("g"))
    )


def write_gram_index_version(rows: DataFrame, tmp: str) -> None:
    """Stage one artifact version: one hash exchange on gb, grams
    sorted within each bucket file."""
    (
        rows.repartition("gb")
        .sortWithinPartitions("g", "s64", "doc_id", "p")
        .write.mode("overwrite")
        .partitionBy("gb")
        .parquet(os.path.join(tmp, "data"))
    )


def init_gram_index(
    docs: DataFrame, path: str, meta: dict | None = None
) -> str:
    """Build and atomically publish a gram index over an arbitrary
    corpus frame at ``path`` (similarity._publish_artifact symlink
    discipline) — the attach-time form streaming span cleanup uses;
    ``build_gram_index`` is the fingerprinted sf_dir wrapper."""
    from streamlit_flink_demo_spark.operators.similarity import (
        _publish_artifact,
        _write_meta,
    )

    tmp = f"{path}.tmp-{os.getpid()}"
    write_gram_index_version(gram_index_rows(docs), tmp)
    _write_meta(tmp, dict(meta or {}))
    _publish_artifact(tmp, path)
    return path


def build_gram_index(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> str:
    """Fingerprinted gram-index artifact over the BASE (hash-mod <90)
    document slice — the standing corpus of the incremental rewrite
    convention. Skipped when fresh; every layout parameter is recorded
    so a constant change invalidates the artifact."""
    from streamlit_flink_demo_spark.operators.similarity import (
        _artifact_is_fresh,
        _index_dir,
        table_fingerprint,
    )

    out = _index_dir("gram_span", sf_dir)
    fp = table_fingerprint(sf_dir, "documents")
    params = {
        "gb_parts": _GB_PARTS,
        "min_repeat": _MIN_REPEAT,
        "lcp_cap": _LCP_CAP,
        "slice": "base90",
    }
    if not force and _artifact_is_fresh(out, fp, params):
        return out
    docs = (
        load_spread(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .filter((u60(F.col("doc_id").cast("string")) % 100) < 90)
    )
    init_gram_index(docs, out, meta={"fingerprint": fp, **params})
    return out


def read_gram_index(spark: SparkSession, path: str) -> DataFrame:
    """Base data/ plus committed compaction deltas MINUS tombstoned
    documents (incremental.read_live_index — takedown of a corpus
    document removes its positions from every later rewrite's view;
    compaction drops them physically), partition pruning intact per
    root."""
    from streamlit_flink_demo_spark.operators.incremental import (
        read_live_index,
    )

    return read_live_index(spark, path)


def span_rewrite_batch(
    batch_docs: DataFrame, corpus_index: DataFrame
) -> DataFrame:
    """Rewrite one batch of (doc_id, text) docs against
    corpus ∪ batch: returns _apply_span_cut's accounting rows plus
    ``clean_text`` for every nonempty batch doc. Pure composition —
    usable from foreachBatch, batch queries, and tests.

    ``corpus_index`` is either the in-memory (g, doc_id, p, s64)
    frame (gram_positions of the corpus) or the PERSISTED bucketed
    artifact (read_gram_index — detected by its gb column): the
    artifact probe joins on (gb, g), so the partitioned scan prunes
    to the batch's gram buckets and base text is never rescanned."""
    from pyspark.sql import Window as W

    # r14 note (VERDICT r13 item 7): the batch-side dup-gram prefilter
    # was built and MEASURED here — keep = (grams matching the live
    # index, derived g-column-pruned from the same read as cpos) ∪
    # (grams occurring >= 2x in the batch), semi-joined into bpos
    # before the g-exchange — and REJECTED: isolated paired runs of
    # dedup_span_rewrite_delta_gramidx measured 2.2-2.4 s without it
    # vs 3.1-3.8 s with it at sf0.1 (the extra pruned-bucket scan +
    # the keep-broadcast stage chain cost more than the ~120 B/row
    # g-exchange of the batch singletons it removes; the exchange the
    # filter would protect is batch-sized, not corpus-sized, by
    # construction). The r13 sketch of a BUILD-TIME dup-gram sidecar
    # is additionally unsound under compaction: a data delta commits
    # grams the base sidecar lacks, and a stale-LOW sidecar silently
    # drops true matches. The in-window gsz >= 2 filter below remains
    # the exactness gate either way.
    bpos = gram_positions(batch_docs).withColumn("is_b", F.lit(True))
    bg = bpos.select("g").distinct()
    if "gb" in corpus_index.columns:
        bgk = F.broadcast(bg.withColumn("gb", gram_bucket_col(F.col("g"))))
        cpos = (
            corpus_index.join(bgk, ["gb", "g"])
            .select("g", "doc_id", "p", "s64")
            .withColumn("is_b", F.lit(False))
        )
    else:
        cpos = (
            corpus_index.join(F.broadcast(bg), "g")
            .select("g", "doc_id", "p", "s64")
            .withColumn("is_b", F.lit(False))
        )
    allpos = cpos.unionByName(
        bpos.select("g", "doc_id", "p", "s64", "is_b")
    )
    # deterministic in-group order: s64 first (the crediting order),
    # then origin/doc/p purely as a tie-break among equal windows
    wg = W.partitionBy("g").orderBy("s64", "is_b", "doc_id", "p")
    wc = W.partitionBy("g")
    sized = allpos.withColumn("gsz", F.count("*").over(wc)).filter(
        F.col("gsz") >= 2
    )
    # staged lag/lead (the dedup_span_rewrite_gramgroup discipline):
    # one evaluation per window function, plain columns into the fold
    nbrs = sized.select(
        "doc_id",
        "is_b",
        "p",
        "s64",
        F.lag("s64").over(wg).alias("prev_s"),
        F.lead("s64").over(wg).alias("next_s"),
    )
    credited = (
        nbrs.select(
            "doc_id",
            "is_b",
            "p",
            F.greatest(
                F.coalesce(
                    _lcp_expr(F.col("s64"), F.col("prev_s")),
                    F.lit(0),
                ),
                F.coalesce(
                    _lcp_expr(F.col("s64"), F.col("next_s")),
                    F.lit(0),
                ),
            ).alias("lcp"),
        )
        .filter("is_b")
        .drop("is_b")
    )
    clean_batch = batch_docs.filter(F.length("text") > 0)
    return _apply_span_cut(
        clean_batch, _ranges_from_credited(credited), keep_text=True
    )


@register(
    "dedup_span_rewrite_delta_gramidx",
    oracle=_DELTA_RW_ORACLE,
    tags=("dedup", "suffix", "span", "incremental", "artifact"),
    expose=False,
)
def dedup_span_rewrite_delta_gramidx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The incremental exact span rewrite riding the PERSISTED
    bucketed gram index — the artifact form
    ``dedup_span_rewrite_delta``'s docstring promises: the base slice
    is indexed once (build_gram_index, parquet partitioned by
    gb = hash(24-gram)), and the arriving 10% slice probes only its
    own gram buckets ((gb, g) join, dynamic-partition-pruned —
    plan-asserted in tests/test_plans.py), so base text is never
    rescanned at delta time. Same oracle as the query form: the
    global-rewrite replay filtered to delta docs — a hash match
    proves artifact probe ≡ corpus rescan."""
    path = build_gram_index(spark, sf_dir)
    idx = read_gram_index(spark, path)
    docs = load_spread(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    delta = docs.filter(
        (u60(F.col("doc_id").cast("string")) % 100) >= 90
    )
    return span_rewrite_batch(delta, idx).drop("clean_text")
