"""Distributed generalized suffix array via prefix doubling, and the
pruned multi-resolution repeat-tier scan built on the same core.

The reference corpus-curation literature (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better") builds a
single-machine SUFFIX ARRAY to find every duplicated substring
exactly.  The repo's existing sub-document tier
(``operators/dedup.exact_substring_dedup``) is the k-token-gram
inverted-index formulation; this module adds the character-level
suffix-array tier itself, Spark-first:

- :func:`suffix_array_ranks` — the generalized suffix array of a
  document corpus by PREFIX DOUBLING (Manber & Myers 1990; the
  distributed formulation follows Flick & Aluru 2015, "Parallel
  distributed memory construction of suffix arrays"): ``rank_{2h}`` =
  dense rank of the pair ``(rank_h(pos), rank_h(pos+h))``.  After
  ``ceil(log2(Lmax))`` rounds the rank equals the dense rank of the
  FULL suffix string — yet no suffix string longer than ONE character
  is ever materialized or shuffled: every round sorts constant-width
  ``(int, int)`` keys.  That is the whole point at 100 TB, where the
  naive ``ORDER BY substr(text, pos)`` would shuffle terabytes of
  overlapping variable-length keys through range partitioners.

- :func:`suffix_repeat_tiers` — the curation readout: for each
  power-of-two tier ``h`` (1, 2, 4, ... 512), which positions start a
  FULL ``h``-gram that occurs at least twice corpus-wide.  Uses the
  same doubling step plus the suffix-array pruning property: a
  duplicated ``2h``-gram needs BOTH its ``h``-gram halves duplicated,
  so each level keeps only the currently-duplicated positions — the
  per-level relation shrinks from corpus-sized to exactly the
  duplicated mass, which on a lightly-duplicated 100 TB corpus is the
  difference between 10 corpus-scans and one corpus-scan plus a tail
  of near-empty rounds.  ``max(h)`` per document is the power-of-two
  floor of the document's true longest corpus-repeated substring
  (dup at h  <=>  maximal repeat >= h).

Scale shape per round: one window COUNT over the rank key (single
exchange, spillable groups), one self-join shifted by ``h`` on
``(doc, pos)``, one distinct + distributed global_rank + equi-join for
the dense rank (``operators/rank.global_rank`` — no single-partition
window anywhere).  Rounds are a driver loop over a FIXED tier list; no
driver-side data, no collect.  Lineage: global_rank localCheckpoints
its positioned relation eagerly every round (rank is a prefix sum —
the r9 lesson), which doubles as the per-round lineage cut that keeps
the doubling loop out of the 2^rounds re-execution class k_core hit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ._util import spread
from .rank import global_rank

# Power-of-two tiers, seeded at 8: tiers 1/2/4 are curation noise on
# natural text (virtually every position's 1..4-gram repeats, so they
# neither prune nor discriminate — they just cost three corpus-sized
# levels), while 512 covers the fixtures' max document length (577
# chars measured across sf0.001/0.01/0.1) and is the documented cap of
# the catalog entry.  The seed level keys on the literal 8-char gram
# (one corpus-sized shuffle of 8-char keys); every later level keys on
# constant-width group-id pairs.
REPEAT_TIERS: tuple[int, ...] = (8, 16, 32, 64, 128, 256, 512)


def _dense_rank(df: DataFrame, key_cols: list[str], out: str) -> DataFrame:
    """Append the dense rank of ``key_cols`` (1-based, ordered by the
    keys) — distributed: row-number the DISTINCT keys with
    ``global_rank`` (distinct keys are unique, so row number == dense
    rank), then equi-join back.  The distinct-key relation is bounded
    by the alphabet^h at level h, far below the position count on any
    natural-language corpus, and Spark broadcast-joins it back while
    it stays small."""
    keys = df.select(*key_cols).distinct()
    ranked = global_rank(keys, *key_cols, rank_col=out)
    return df.join(ranked, key_cols)


def _positions(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, pos, __k1) for every 1-based character position; NULL
    text is empty.  Only the level-1 SINGLE-character key leaves this
    function — higher levels rank int pairs, never substrings.  The
    sequence is guarded against empty text because Spark's
    ``sequence(1, 0)`` counts DOWN ([1, 0]), not empty."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    # spread before the explode for the same input-skew reason as the
    # repeat-tier seed (r14, guide §2.5)
    return (
        spread(docs.select(F.col(id_col).alias("doc"), t.alias("__t")))
        .select(
            "doc",
            "__t",
            F.explode(
                F.when(
                    F.length("__t") >= 1,
                    F.sequence(F.lit(1), F.length("__t")),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos"),
        )
        .select(
            "doc",
            "pos",
            F.substring(F.col("__t"), F.col("pos"), F.lit(1)).alias("__k1"),
        )
    )


def suffix_repeat_tiers(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tiers: tuple[int, ...] = REPEAT_TIERS,
) -> DataFrame:
    """Per-tier duplicated-position relation: one row per (doc, pos,
    h) where the FULL h-character gram starting at ``pos`` occurs at
    least twice corpus-wide (h from ``tiers``, a doubling chain
    starting anywhere).  Readout of the pruned prefix-doubling scan
    described in the module docstring.

    Unlike :func:`suffix_array_ranks` no ORDINAL rank is ever needed
    here — the readout only tests gram EQUALITY — so levels carry a
    cheaper equality group-id instead: ``min(struct(doc, pos))`` over
    the gram's occurrence group, computed in the SAME window exchange
    as the >= 2 occurrence count.  One shuffle per level instead of a
    distinct + distributed-rank + join chain (measured 2.5x on the
    fixture corpus), and the id stays two ints at every level.

    Returns ``(doc, pos, h)`` — callers aggregate (the catalog entry
    reduces to per-document scalars).  Equal grams from the SAME
    document count: an internal repeat is still a repeat, exactly as
    in ExactSubstr."""
    assert tiers and all(
        b == 2 * a for a, b in zip(tiers, tiers[1:])
    ), f"tiers must be a doubling chain: {tiers}"
    h0 = tiers[0]
    t = F.coalesce(F.col(text_col), F.lit(""))
    # seed: every FULL h0-gram, keyed by the literal gram — the one
    # level that shuffles string keys (h0 chars wide, once).
    # r14 optimization (guide §2.5 input skew): the seed explode +
    # substring runs BELOW the level-8 window exchange, so it
    # inherited the scan's few skewed splits on a small single-file
    # corpus — spread() the doc rows first so gram extraction runs at
    # the session's full parallelism (the seed phase alone measured
    # 2.1 s of the entry's 8.5 s isolated at sf0.1).
    cur = (
        spread(docs.select(F.col(id_col).alias("doc"), t.alias("__t")))
        .select(
            "doc",
            "__t",
            F.explode(
                F.when(
                    F.length("__t") >= h0,
                    F.sequence(F.lit(1), F.length("__t") - h0 + 1),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos"),
        )
        .select(
            "doc",
            "pos",
            F.substring(F.col("__t"), F.col("pos"), F.lit(h0)).alias("__g"),
        )
    )
    outs: list[DataFrame] = []
    key_cols = ["__g"]
    for h in tiers:
        w = Window.partitionBy(*key_cols)
        # ONE window exchange per level: occurrence count (the >= 2
        # dup test AND the pruning) and the group-id for the next
        # level's key, over the same partitioning
        cur = (
            cur.select(
                "doc",
                "pos",
                F.count("*").over(w).alias("__c"),
                F.min(F.struct("doc", "pos")).over(w).alias("__gid"),
            )
            .where(F.col("__c") >= 2)
            .select("doc", "pos", F.col("__gid").alias("__g"))
        )
        if h != tiers[-1]:
            # per-level lineage cut (INTERMEDIATE levels only — the
            # final tier is read exactly once by the readout union, so
            # its checkpoint bought nothing but one extra disk
            # write+read job; r14 optimization, guide §5): the next
            # level reads this relation
            # TWICE (the self-join below joins cur with its own shifted
            # self) and the readout union reads it a third time, so the
            # uncut plan re-executes every prior level ~2^levels times —
            # the k_core/CC exponential-lineage class (this exact OOM
            # was hit at sf0.001 before the cut: 10 uncut levels blew
            # the optimizer heap). EAGER on purpose: a lazy cut was
            # tried (saves ~1 s of per-level job scheduling at
            # local[8]) and CRASHED at the 64x scale cell with "Block
            # rdd_N does not exist" — the two reader stages of the
            # self-join launch concurrently, race to be the lazily-
            # checkpointed RDD's first materializer, and one of them
            # sees the truncated lineage before the blocks land (the
            # benign small-scale signature is the "Block already
            # exists; not re-adding" BlockManager warning). Eager
            # serializes materialization before any reader exists.
            # DISK_ONLY (Spark 4 storageLevel arg) because
            # localCheckpoint blocks live OUTSIDE the CacheManager —
            # clearCache() can't free them and they pin heap until
            # driver GC collects the Dataset, so heap-resident levels
            # ACCUMULATE across invocations (bench loops OOM'd the
            # 24g heap at the 64x scale cell: 7 levels x 3 samples
            # pinned); disk blocks cost a local write+read of compact
            # UnsafeRows and are durable against eviction, which a
            # truncated-lineage relation cannot recover from anyway.
            cur = cur.localCheckpoint(
                eager=True, storageLevel=StorageLevel.DISK_ONLY
            )
        outs.append(
            cur.select("doc", "pos", F.lit(h).cast("int").alias("h"))
        )
        if h != tiers[-1]:
            # doubling step on the PRUNED relation: a duplicated
            # 2h-gram needs both halves duplicated, and pos+2h-1 <=
            # len holds iff pos+h is itself a full h-gram start — the
            # inner join enforces both at once.
            # r14 optimization note (guide §1.2 — measured, then
            # kept): a per-doc RANGE window (frame [pos+h, pos+h]
            # replacing the self-join's shifted lookup) was A/B'd to
            # remove the join; it MEASURED 1.15x slower isolated at
            # sf0.1 (drifter 9.76 s vs 8.48 s) because the
            # checkpointed relation broadcast-hash-joins here with no
            # exchange at local sizes while the window forces a
            # by-doc exchange + sort every level. The join stays.
            cur = cur.join(
                cur.select(
                    "doc",
                    (F.col("pos") - h).alias("pos"),
                    F.col("__g").alias("__g2"),
                ),
                ["doc", "pos"],
            )
            key_cols = ["__g", "__g2"]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def suffix_repeat_lcp(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_h: int = 512,
) -> DataFrame:
    """Per-position longest corpus-repeated prefix length, capped at
    ``max_h``: the classic suffix-array + LCP readout in ONE sorted
    pass.  Returns ``(doc, pos, lcp_max)`` where ``lcp_max`` is the
    length of the longest substring starting at ``pos`` that occurs
    at least twice corpus-wide (0 when even the first character is
    unique) — every repeat tier falls out as ``lcp_max >= h``.

    Algorithm: rank every ``max_h``-truncated suffix with the
    distributed :func:`~.rank.global_rank` ordered by (suffix, doc,
    pos) — equal prefixes are CONTIGUOUS in suffix order, and the
    suffix sharing the longest prefix with s is always an adjacent
    one, so the per-position answer is ``max(lcp with rank
    neighbor on each side)``, computed by a seq/seq+1 self-join plus
    a codegen'd common-prefix expression (char-array zip — never a
    UDF).

    Trade-off vs the pruned prefix doubling of
    :func:`suffix_repeat_tiers` (tier readouts pinned equal in
    tests/test_suffix.py): this path shuffles each position ONCE but
    with up-to-``max_h``-char keys, and the range sort pays string
    comparisons as deep as the corpus's shared prefixes — on the
    committed fixtures (98% of tier-8 positions duplicated) that
    depth is exactly what saturates, and doubling measured FASTER
    (15.4 s vs 22 s at sf0.1 / local[32]; a third shape,
    repartition + hash-agg + co-partitioned join, measured 31.6 s).
    Use this path when the consumer needs exact per-POSITION repeat
    lengths (the tiers variant only yields pow2 thresholds), or when
    documents are short enough that the truncated-suffix keys stay
    narrow."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    posrel = (
        docs.select(F.col(id_col).alias("doc"), t.alias("__t"))
        .select(
            "doc",
            "__t",
            F.explode(
                F.when(
                    F.length("__t") >= 1,
                    F.sequence(F.lit(1), F.length("__t")),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos"),
        )
        .select(
            "doc",
            "pos",
            F.substring(F.col("__t"), F.col("pos"), F.lit(max_h)).alias(
                "__sfx"
            ),
        )
    )
    ranked = global_rank(
        posrel, F.col("__sfx"), F.col("doc"), F.col("pos"), rank_col="__seq"
    )
    pairs = (
        ranked.select("__seq", "__sfx")
        .join(
            ranked.select(
                (F.col("__seq") - 1).alias("__seq"),
                F.col("__sfx").alias("__sfx2"),
            ),
            "__seq",
        )
    )
    # common-prefix length of the two adjacent suffixes, pure
    # expressions: zip the char arrays, find the first inequality;
    # zip_with pads the shorter with NULL and NULL == x is NULL (not
    # false), so a missing first-false means lcp = min length
    eq = F.zip_with(
        F.split("__sfx", ""), F.split("__sfx2", ""), lambda x, y: x == y
    )
    ap = F.array_position(eq, F.lit(False))
    pairs = pairs.select(
        "__seq",
        F.when(ap > 0, ap - 1)
        .otherwise(F.least(F.length("__sfx"), F.length("__sfx2")))
        .cast("int")
        .alias("__lcp"),
    )
    # a position's repeat length is the max over its <= 2 rank
    # neighbors; fold the pair relation onto both endpoints
    lcp_max = (
        pairs.select("__seq", "__lcp")
        .unionByName(
            pairs.select((F.col("__seq") + 1).alias("__seq"), "__lcp")
        )
        .groupBy("__seq")
        .agg(F.max("__lcp").alias("__m"))
    )
    return (
        ranked.join(lcp_max, "__seq", "left")
        .select(
            "doc",
            "pos",
            F.coalesce("__m", F.lit(0)).cast("int").alias("lcp_max"),
        )
    )


def suffix_array_ranks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_h: int = 4096,
) -> DataFrame:
    """The generalized suffix array: ``(doc, pos, sa_rank)`` where
    ``sa_rank`` is the DENSE rank of the suffix ``substring(text,
    pos)`` under plain string ordering over every suffix of every
    document (ties = identical suffix strings share a rank; a total
    order is ``(sa_rank, doc, pos)``).  Pure prefix doubling: rounds
    ``h = 1, 2, 4, ...`` rank the pair ``(rank_h(pos), rank_h(pos+h)
    or 0)`` — 0 for the missing half sorts first, which matches
    string ordering because a suffix that is a proper prefix of
    another sorts before it.  Rounds stop at ``max_h`` (callers pass
    anything >= the longest document; rounds beyond the longest
    actual repeat only re-rank identical data, so a generous bound is
    wasted work, not wrong answers)."""
    cur = _dense_rank(
        _positions(docs, text_col, id_col), ["__k1"], "__rk"
    ).select("doc", "pos", "__rk")
    h = 1
    while h < max_h:
        # per-round lineage cut: the round reads cur TWICE (left side +
        # its own shifted self) — uncut, the plan doubles every round
        # (the k_core/CC exponential-lineage class); DISK_ONLY for the
        # same heap-accumulation reason as suffix_repeat_tiers
        cur = cur.localCheckpoint(
            eager=True, storageLevel=StorageLevel.DISK_ONLY
        )
        shifted = cur.select(
            "doc",
            (F.col("pos") - h).alias("pos"),
            F.col("__rk").alias("__rk2"),
        )
        paired = cur.join(shifted, ["doc", "pos"], "left").na.fill(
            {"__rk2": 0}
        )
        cur = _dense_rank(paired, ["__rk", "__rk2"], "__rko").select(
            "doc", "pos", F.col("__rko").alias("__rk")
        )
        h *= 2
    return cur.select("doc", "pos", F.col("__rk").alias("sa_rank"))
