"""BPE merge learning vs a pure-Python reference implementation.

The iterative learning loop is not expressible as one ANSI-SQL oracle
(the r8 catalog entry will be rows-only); this exact twin is its
correctness gate, the same pattern as the HLL/GK entries. The
reference implements textbook BPE (Sennrich et al. 2016): count
adjacent symbol pairs weighted by word frequency, fuse the argmax
greedily left-to-right, repeat.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from lichess_db_spark.io import load_table
from lichess_db_spark.operators.tokenizer import (
    bpe_learn_merges,
    bpe_merge_table,
    build_word_vocab,
)

from .conftest import SF_SMALL


def _ref_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    wf = Counter(
        w for t in texts if t is not None for w in t.split(" ") if len(w) >= 2
    )
    vocab = {tuple(w): c for w, c in wf.items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        # max count, ties lexicographic on (a, b)
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        new_vocab: dict = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def test_bpe_merges_match_reference(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _ref_bpe(texts, 5)
    got = bpe_learn_merges(docs, 5)
    assert got == want
    assert len(got) == 5
    # counts are monotone non-increasing only per-pair availability —
    # but step 1 must equal bpe_pair_counts' rank-1 row
    from lichess_db_spark.plans import QUERIES

    top = (
        QUERIES["bpe_pair_counts"]
        .build(spark, SF_SMALL)
        .where(F.col("rnk") == 1)
        .collect()[0]
    )
    assert got[0][0] + got[0][1] == top["pair"]
    assert got[0][2] == top["pair_count"]


def test_bpe_merge_table_surface(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    t = bpe_merge_table(spark, docs, 3)
    rows = t.collect()
    assert [r["step"] for r in rows] == [1, 2, 3]
    assert all(r["pair_count"] > 0 for r in rows)


def test_bpe_greedy_overlap_semantics(spark):
    """'aaa' under merge (a,a): greedy left-to-right fuses the first
    two and leaves the third single — the merged accumulator tail must
    not re-fire the pattern."""
    docs = spark.createDataFrame([("aaa aaa",)], "text string")
    got = bpe_learn_merges(docs, 2)
    # step 1: (a, a) count 4 (two per 'aaa' occurrence... greedy ref
    # counts overlapping pairs: 'aaa' has pairs (a,a) twice -> 4 total)
    assert got[0] == ("a", "a", 4)
    # after fusing: each word becomes (aa, a); next merge is (aa, a)
    assert got[1] == ("aa", "a", 2)


def test_bpe_exhausts_cleanly(spark):
    """More merges than pairs exist: stops early, no error, vocab can
    fully fuse to single symbols."""
    docs = spark.createDataFrame([("ab ab",)], "text string")
    got = bpe_learn_merges(docs, 5)
    assert got == [("a", "b", 2)]


def test_bpe_bad_n_merges(spark):
    docs = spark.createDataFrame([("ab",)], "text string")
    with pytest.raises(ValueError, match="n_merges"):
        bpe_learn_merges(docs, 0)


def test_build_word_vocab_one_corpus_pass(spark):
    """The vocab build is the ONLY corpus-sized stage: its plan has
    exactly one exchange (the word groupBy) and no joins."""
    docs = load_table(spark, SF_SMALL, "documents")
    v = build_word_vocab(docs)
    plan = v._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        v._jdf.queryExecution(), "simple"
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan


def _ref_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    out: list[str] = []
    for w in text.split(" "):
        if not w:
            continue
        syms = list(w)
        for a, b in merges:
            nxt: list[str] = []
            for x in syms:
                if nxt and nxt[-1] == a and x == b:
                    nxt[-1] = a + b
                else:
                    nxt.append(x)
            syms = nxt
        out.extend(syms)
    return out


def test_bpe_encode_matches_reference(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    merges = [(a, b) for a, b, _ in bpe_learn_merges(docs, 4)]
    from lichess_db_spark.operators.tokenizer import bpe_encode

    got = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        ref = _ref_encode(r["text"], merges)
        assert got[r["doc_id"]] == (ref, len(ref)), r["doc_id"]


def test_bpe_encode_empty_words_and_map_only(spark):
    from lichess_db_spark.operators.tokenizer import bpe_encode

    docs = spark.createDataFrame([(1, "ab  ab"), (2, "a")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in bpe_encode(docs, [("a", "b")]).collect()}
    assert rows[1]["tokens"] == ["ab", "ab"]  # double space fabricates nothing
    assert rows[2]["tokens"] == ["a"]
    enc = bpe_encode(docs, [("a", "b")])
    plan = enc._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        enc._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_bpe_encode_requires_merges(spark):
    from lichess_db_spark.operators.tokenizer import bpe_encode

    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="merges"):
        bpe_encode(docs, [])


def test_bpe_encode_counts_matches_encode(spark):
    """The vocab-memoized count path equals size(tokens) from the
    naive per-char fold for every doc, and restores wordless docs as
    n_tokens = 0."""
    from lichess_db_spark.operators.tokenizer import bpe_encode, bpe_encode_counts

    docs = load_table(spark, SF_SMALL, "documents").limit(80)
    merges = [("e", "r"), ("t", "h")]
    want = {
        r["doc_id"]: r["n_tokens"] for r in bpe_encode(docs, merges).collect()
    }
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_encode_counts(docs, merges).collect()
    }
    assert got == want
    edge = spark.createDataFrame(
        [(1, "ab er"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    got_edge = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_encode_counts(edge, merges).collect()
    }
    assert got_edge == {1: 3, 2: 0, 3: 0}


def test_bpe_fold_random_words_vs_reference(spark):
    """Adversarial + seeded-random words through a CHAINED merge list
    (later merges consume earlier merges' output tokens, including a
    self-pair) — the greedy fold must match the Python reference on
    every word in one Spark round-trip."""
    import random

    from lichess_db_spark.operators.tokenizer import bpe_encode

    rng = random.Random(42)
    words = [
        "aaa", "abab", "abcabc", "aabbccabcabc", "cab", "ababab",
        "ba", "abc", "aabc", "abcc", "aaaa", "abba",
    ] + [
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 12)))
        for _ in range(200)
    ]
    merges = [("a", "b"), ("ab", "c"), ("a", "a")]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    for i, w in enumerate(words):
        assert got[i] == _ref_encode(w, merges), (w, got[i])
