"""Suffix-array tier (operators/suffix.py + the suffix_repeat_tiers
catalog entry): brute-force pins for both the generalized suffix array
and the pruned repeat-tier scan, and the cross-engine dirty-corpus
check for the entry readout vs its DuckDB oracle."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from lichess_db_spark.operators.suffix import (
    suffix_array_ranks,
    suffix_repeat_tiers,
)

# empty text, NULL text, multi-byte (2- and 4-byte UTF-8), internal
# repeat inside ONE doc, cross-doc repeat, prefix-of-other suffix
_DOCS = [
    (1, "banana"),
    (2, "bandana"),
    (3, ""),
    (4, None),
    (5, "xyz"),
    (6, "héllo héllo wörld"),
    (7, "héllo wörld again"),
    (8, "a\U0001f600b\U0001f600"),
    (9, "abcabcabcabc"),
]


def _brute_sa(rows):
    sufs = sorted(
        (t[p - 1 :], d, p)
        for d, t in ((d, t or "") for d, t in rows)
        for p in range(1, len(t) + 1)
    )
    ranks, r, prev = {}, 0, object()
    for s, d, p in sufs:
        if s != prev:
            r, prev = r + 1, s
        ranks[(d, p)] = r
    return ranks


def _brute_tiers(rows, tiers):
    grams: dict = {}
    for d, t in rows:
        t = t or ""
        for h in tiers:
            for p in range(1, len(t) - h + 2):
                grams.setdefault((h, t[p - 1 : p - 1 + h]), []).append(
                    (d, p, h)
                )
    return {occ for v in grams.values() if len(v) >= 2 for occ in v}


def test_suffix_array_ranks_match_brute_force(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        (r.doc, r.pos): r.sa_rank
        for r in suffix_array_ranks(docs, max_h=32).collect()
    }
    assert got == _brute_sa(_DOCS)


def test_repeat_tiers_match_brute_force(spark):
    tiers = (1, 2, 4, 8)
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        (r.doc, r.pos, r.h)
        for r in suffix_repeat_tiers(docs, tiers=tiers).collect()
    }
    assert got == _brute_tiers(_DOCS, tiers)
    # the pow2-floor relationship the catalog entry's max_dup_tier
    # column relies on: dup at h <=> some maximal repeat >= h, so for
    # doc 9 ("abcabcabcabc", internal repeat of length 9: pos 1..9
    # vs 4..12) the max tier is 8, not 4
    assert (9, 1, 8) in got


def test_repeat_tiers_seeded_chain_equals_trivial_chain(spark):
    """The production seed-at-8 chain must agree with the
    seed-at-1 chain restricted to h >= 8 (the seed level keys on
    literal 8-grams; the doubling path reaches the same groups)."""
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    a = {
        (r.doc, r.pos, r.h)
        for r in suffix_repeat_tiers(docs, tiers=(8, 16)).collect()
    }
    b = {
        (r.doc, r.pos, r.h)
        for r in suffix_repeat_tiers(
            docs, tiers=(1, 2, 4, 8, 16)
        ).collect()
        if r.h >= 8
    }
    assert a == b


def test_lcp_path_matches_brute_force_and_doubling(spark):
    """suffix_repeat_lcp's per-position repeat length vs brute force,
    and the cross-path pin: thresholding lcp_max at each tier must
    reproduce suffix_repeat_tiers exactly (the two 100 TB plans can
    never drift)."""
    from lichess_db_spark.operators.suffix import suffix_repeat_lcp

    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        (r.doc, r.pos): r.lcp_max
        for r in suffix_repeat_lcp(docs, max_h=32).collect()
    }
    exp = {}
    texts = [(d, t or "") for d, t in _DOCS]
    for d, t in texts:
        for p in range(1, len(t) + 1):
            s = t[p - 1 :]
            best = 0
            for d2, t2 in texts:
                for q in range(1, len(t2) + 1):
                    if (d2, q) == (d, p):
                        continue
                    s2 = t2[q - 1 :]
                    l = 0
                    while l < min(32, len(s), len(s2)) and s[l] == s2[l]:
                        l += 1
                    best = max(best, l)
            exp[(d, p)] = best
    assert got == exp
    tiers = (2, 4, 8, 16)
    via_doubling = {
        (r.doc, r.pos, r.h)
        for r in suffix_repeat_tiers(docs, tiers=tiers).collect()
    }
    via_lcp = {
        (d, p, h) for (d, p), l in got.items() for h in tiers if l >= h
    }
    assert via_lcp == via_doubling


def test_repeat_tiers_rejects_non_doubling_chain(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    with pytest.raises(AssertionError):
        suffix_repeat_tiers(docs, tiers=(8, 24))


def test_entry_readout_matches_oracle_on_dirty_corpus(spark):
    """The catalog entry's Spark readout vs its DuckDB oracle text on
    a corpus the committed fixtures don't exercise: NULL/empty text,
    multi-byte characters (len/substr indexing must agree on
    CODEPOINTS in both engines), 4-byte emoji, and an internal
    same-doc repeat."""
    from lichess_db_spark.plans.catalog_staged import _suffix_tier_readout
    from lichess_db_spark.plans.registry import QUERIES

    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chars, r.max_dup_tier, r.n_pos_dup8, r.n_pos_dup64)
        for r in _suffix_tier_readout(docs).collect()
    }

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": [d for d, _ in _DOCS], "text": [t for _, t in _DOCS]}
        ),
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(QUERIES["suffix_repeat_tiers"].oracle).fetchall()
    }
    assert got == want
    # and the dirty rows landed where expected: empty/NULL -> all-zero
    assert got[3] == (0, 0, 0, 0) and got[4] == (0, 0, 0, 0)
    # the internal repeat: "abcabcabcabc" has 12 chars, maximal repeat
    # 9 ("abcabcabc" at pos 1 and 4) -> pow2 floor tier 8; positions
    # {1, 2, 4, 5} start duplicated full 8-grams (pos 3's "cabcabca"
    # occurs exactly once — the next aligned start would be 6 > 5)
    assert got[9] == (12, 8, 4, 0)
