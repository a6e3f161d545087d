"""Skew-mitigation join helper (SURVEY.md brief: salting for skewed
keys).

AQE's skew-join split handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); explicit
salting remains the tool when one side's hot keys are known and the
other side is small enough to replicate — e.g. joining the games
fact on Player where a few bot accounts hold millions of rows
(reference corpus: german11 with 221k games, eda.ipynb:cell8).

``salted_join`` replicates the small side ``salt`` times and sprays
the big side's rows uniformly across the replicas, so a hot key's
rows land on ``salt`` tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small on key`` with a salted key.

    Result is identical to ``big.join(small, on, how)`` for inner and
    left joins (each big row matches exactly its salt replica).
    """
    assert how in ("inner", "left"), "salting replicates the small side"
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def _bloom_probe_idx(key_col, t: int, m_bits: int):
    """md5-derived probe index for hash function ``t`` — engine-
    portable (same conv-of-md5-prefix pattern as the winnow/CDC
    kits); keys are stringified so BIGINT and VARCHAR keys probe
    identically in Spark and the SQL oracle."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(key_col.cast("string"), F.lit(f"-{t}"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % m_bits
    )


def bloom_words(
    keys: DataFrame,
    key_col: str = "key",
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Build a portable Bloom filter over a key set as ``m_bits/32``
    bigint words holding 32 bits each: every key sets ``k``
    md5-derived probe bits; words are OR-folded with the ``bit_or``
    aggregate. 32-bit words deliberately — shifting into bit 63
    OVERFLOWS DuckDB's BIGINT ``<<`` (hard error) where Spark's
    shiftleft silently wraps to the sign bit; capping shifts at 31
    keeps both engines in defined territory. Deterministic given
    md5 — unlike Spark's engine-internal runtime filters, this one is
    oracle-hashable and survives engine swaps. Returns
    ``(word BIGINT, bits BIGINT)`` — at most m_bits/32 rows, built by
    ONE map-side-combinable groupBy over |keys| * k probe rows.

    At 100 TB this relation is the broadcast side of a probe-filter
    pass over the big table: the semi-join's shuffle of the big side
    is exactly what it removes; the price is the measured false-
    positive rate (see :func:`bloom_confusion`), never a false
    negative."""
    if m_bits % 32 != 0 or m_bits <= 0 or k < 1:
        raise ValueError(f"need m_bits > 0 divisible by 32, k >= 1: {m_bits}, {k}")
    probes = None
    kc = F.col(key_col)
    for t in range(k):
        p = keys.select(_bloom_probe_idx(kc, t, m_bits).alias("idx"))
        probes = p if probes is None else probes.unionAll(p)
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(idx % 32 AS INT))")
    return probes.groupBy((F.col("idx") / 32).cast("bigint").alias("word")).agg(
        F.bit_or(mask).alias("bits")
    )


def bloom_confusion(
    rows: DataFrame,
    keys: DataFrame,
    filt: DataFrame,
    key_col: str = "key",
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Probe every row of ``rows`` against a :func:`bloom_words`
    filter AND against the true key set, reporting the exact
    confusion summary: ``(n_events, n_bloom_pass, n_true_members,
    n_false_positives, n_false_negatives, false_positive_rate)``.
    The construction guarantees n_false_negatives == 0 (a member's
    probe bits are all set by definition); the FPR is the measured
    price of skipping the big-side shuffle."""
    kc = F.col(key_col)
    probes = None
    for t in range(k):
        p = rows.select(
            "event_id", kc.alias("__key"), _bloom_probe_idx(kc, t, m_bits).alias("idx")
        )
        probes = p if probes is None else probes.unionAll(p)
    probed = probes.withColumn(
        "word", (F.col("idx") / 32).cast("bigint")
    ).join(F.broadcast(filt), "word", "left")
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(idx % 32 AS INT))")
    hits = probed.groupBy("event_id", "__key").agg(
        F.count(
            F.when(
                F.col("bits").isNotNull() & (F.col("bits").bitwiseAND(mask) != 0),
                F.lit(1),
            )
        ).alias("n_set")
    )
    truth = keys.select(F.col(key_col).alias("__key"), F.lit(1).alias("__m")).distinct()
    lab = hits.join(F.broadcast(truth), "__key", "left").select(
        (F.col("n_set") == k).alias("bloom_pass"),
        F.col("__m").isNotNull().alias("is_member"),
    )
    bp, im = F.col("bloom_pass"), F.col("is_member")
    return lab.agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(bp.cast("int")).cast("bigint").alias("n_bloom_pass"),
        F.sum(im.cast("int")).cast("bigint").alias("n_true_members"),
        F.sum((bp & ~im).cast("int")).cast("bigint").alias("n_false_positives"),
        F.sum((im & ~bp).cast("int")).cast("bigint").alias("n_false_negatives"),
        (
            F.sum((bp & ~im).cast("int")).cast("double")
            / F.nullif(F.sum((~im).cast("int")), F.lit(0))
        ).alias("false_positive_rate"),
    )
