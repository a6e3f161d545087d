"""Semantic tests for the curation operators (mixing, contamination,
packing) beyond the catalog oracle hash checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lichess_db_spark.io import load_table
from lichess_db_spark.operators.curation import (
    contamination_pairs,
    pack_sequences,
    sample_to_rates,
)

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents").cache()


def test_sample_to_rates_deterministic_and_monotone(spark, docs):
    """Same input -> identical sample; a higher rate keeps a SUPERSET
    (the md5-bucket rule is monotone in the rate, the property that
    makes mixing re-runnable and incrementally adjustable)."""
    lo = {s: 0.3 for s in ("src0", "src1")}
    hi = {s: 0.8 for s in ("src0", "src1")}
    pick = lambda r: {x.doc_id for x in sample_to_rates(docs, r, default_rate=0.0).collect()}
    lo_ids, lo_ids2, hi_ids = pick(lo), pick(lo), pick(hi)
    assert lo_ids == lo_ids2
    assert lo_ids <= hi_ids
    assert len(hi_ids) > len(lo_ids)


def test_sample_to_rates_default_rate(spark, docs):
    """Keys missing from the config fall back to default_rate (1.0
    keeps everything)."""
    out = sample_to_rates(docs, {"src0": 0.0}, default_rate=1.0)
    kept = out.groupBy("source").count().collect()
    by_src = {r.source: r["count"] for r in kept}
    assert "src0" not in by_src
    total = docs.where(F.col("source") != "src0").count()
    assert sum(by_src.values()) == total


def test_contamination_self_overlap(spark, docs):
    """Every eval doc with >= n words overlaps itself when included in
    both sides; disjoint docs with no shared 8-gram emit nothing."""
    ev = docs.where(F.col("doc_id") % 97 == 0)
    pairs = contamination_pairs(ev, ev, shingle_n=8).collect()
    long_ids = {
        r.doc_id
        for r in ev.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
        if r.n >= 8
    }
    self_pairs = {(r.train_id, r.eval_id) for r in pairs if r.train_id == r.eval_id}
    assert self_pairs == {(i, i) for i in long_ids}


def test_pack_sequences_accounting(spark, docs):
    """Token totals are conserved per stream; every sequence except a
    stream's last starts strictly inside seq_len of its predecessor
    (greedy packing leaves no empty sequence ids)."""
    out = pack_sequences(docs, seq_len=512).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    tok = {
        r.lang: r.total
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("total"))
        .collect()
    }
    for lang, rows in by_lang.items():
        assert sum(r.n_tokens for r in rows) == tok[lang]
        seq_ids = sorted(r.seq_id for r in rows)
        # no gaps: a doc lands in bin k only after bins < k have filled
        assert seq_ids == list(range(seq_ids[0], seq_ids[-1] + 1))
        assert seq_ids[0] == 0


def test_stratified_sample_fixed_size_and_stable(spark, docs):
    """Each group yields min(n, group_size) rows; the sample of a
    grown corpus contains churn only at the hash boundary (subset
    check against the n+5 sample)."""
    from lichess_db_spark.operators.curation import stratified_sample_n

    small = stratified_sample_n(docs, 10).collect()
    big = {(r.lang, r.doc_id) for r in stratified_sample_n(docs, 15).collect()}
    sizes = {}
    for r in small:
        sizes[r.lang] = sizes.get(r.lang, 0) + 1
        assert (r.lang, r.doc_id) in big  # n=10 sample ⊂ n=15 sample
    group_sizes = {
        r.lang: r["count"] for r in docs.groupBy("lang").count().collect()
    }
    for lang, k in sizes.items():
        assert k == min(10, group_sizes[lang])
