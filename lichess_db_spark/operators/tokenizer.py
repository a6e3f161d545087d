"""BPE tokenizer-training operators (staged r7 -> r8 catalog entry).

``bpe_pair_counts`` (plans/catalog_north.py) computes merge step 1's
pair statistics; this module runs the actual LEARNING loop: n merge
iterations, each picking the most frequent adjacent symbol pair and
rewriting the vocabulary with it — the algorithm behind every
GPT/Llama-style tokenizer (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units").

Scale design (the part that matters at 100 TB): the corpus is touched
EXACTLY ONCE — one shuffle of bare whitespace tokens into a
(word, count) vocabulary. Every merge iteration after that operates on
the vocab relation only (Heaps-law sublinear in corpus size; ~10^5-10^7
rows for web-scale corpora), so adding iterations
costs vocab-sized work, not corpus scans. Each iteration is:

1. pair counts: one explode + groupBy over the vocab (weighted by
   word count);
2. argmax pair: a 1-row TakeOrderedAndProject (ties broken
   lexicographically so the learned merge sequence is deterministic);
3. vocab rewrite: a map-only ``aggregate`` higher-order expression
   applying the merge greedily left-to-right per word — no UDF, no
   corpus, no shuffle.

The vocab is persisted per iteration and the previous iteration's
cache released, so the lineage does not grow with n_merges (the
classic iterative-algorithm trap — same discipline as
``pagerank_part_affinity``).

Greedy-left-to-right semantics (matches reference BPE trainers): in
"aaa" with merge (a,a), the first two symbols fuse and the third stays
single — the fold's accumulator tail is the MERGED token, which no
longer equals the left element of the pair, so overlapping matches
cannot double-fire.

Exactness: counts are integers end to end; the learned merge list for
a given corpus is bit-deterministic (no RNG, total-order tiebreaks).
Verified against a pure-Python reference implementation in
tests/test_tokenizer.py, and — to depth 3 — against the driver's hash
gate: catalog:`bpe_learned_merges` unrolls three iterations in SQL by
rewriting each learned merge into a placeholder char (deeper merge
lists stay exact-twin tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def build_word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: whitespace words -> (syms array<string>, cnt).

    The ONLY corpus-sized operation in BPE training; everything after
    runs on this relation. Words shorter than 2 chars carry no pairs
    and are dropped (they cannot influence any merge decision).
    """
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
            .alias("syms"),
            "cnt",
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the vocab, weighted by word count."""
    pairs = vocab.where(F.size("syms") >= 2).select(
        # the size guard matters: Spark's sequence(1, 0) is DESCENDING
        # ([1, 0]), so a fully-fused 1-symbol word would emit two
        # null-member pairs instead of none
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i-1] AS a, syms[i] AS b))"
            )
        ).alias("p"),
        "cnt",
    )
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("cnt").alias("pair_count"))


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right fusion of adjacent (a, b) into a+b —
    a pure higher-order-function fold, no UDF."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, count)]
    in learning order. Deterministic: ties on count break on (a, b)
    lexicographically.

    The returned list is driver-sized by construction (n_merges
    rows); the corpus is scanned once and each iteration's work is
    vocab-relation-sized (see module docstring). Iteration stops
    early if no pair remains (vocab fully fused).

    Scale contract (VERDICT r7): each iteration is one Spark job that
    collects a single row, so production vocab sizes (32k merges)
    mean 32k sequential vocab-relation jobs. That is correct but
    latency-bound on job-scheduling overhead, not data volume; a
    production trainer amortizes it by maintaining pair counts
    INCREMENTALLY — when (a,b) merges, only pairs overlapping an
    (a,b) occurrence change, so the delta is computed from the rows
    that contained the pair rather than re-counting the vocab
    (classic Sennrich-style priority-queue maintenance, batched per
    K merges on a cluster). This entry deliberately keeps the
    re-count formulation: it is the hash-checkable semantics anchor
    (depth-3 oracle) and the vocab relation is Heaps-sublinear in the
    corpus, so the re-count per iteration is already corpus-free.
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    vocab = build_word_vocab(docs, text_col).persist()
    vocab.count()  # materialize before the loop
    merges: list[tuple[str, str, int]] = []
    # r15 optimization (guide §5, VERDICT r14 item 6 — fewer driver
    # actions per iteration): the old loop ran TWO jobs per merge (the
    # 1-row argmax plus a count() that existed only to materialize the
    # rewritten vocab's cache before releasing the previous one). The
    # NEXT iteration's argmax materializes that cache anyway, so defer
    # the unpersist by one iteration instead: keep at most TWO
    # vocab-relation caches alive (both Heaps-sublinear in the corpus)
    # and run exactly ONE job per merge. Same scans, same merges —
    # only the materializing action is fused away.
    prev: DataFrame | None = None
    try:
        for _ in range(n_merges):
            top = (
                _pair_counts(vocab)
                .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            # this action materialized vocab's cache, so the previous
            # iteration's vocab (prev) has no remaining reader
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["pair_count"])
            merges.append((a, b, cnt))
            nxt = vocab.select(
                _apply_merge(F.col("syms"), a, b).alias("syms"), "cnt"
            ).persist()
            prev = vocab
            vocab = nxt
    finally:
        vocab.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list: per whitespace
    word, split to characters and apply each merge in learning order
    (the standard BPE encode). Returns (id, tokens array<string>,
    n_tokens) — the real token-count column a packing/budgeting
    pipeline consumes (vs the whitespace proxy in text_stats).

    This is the CORPUS-SIDED half of BPE: it is deliberately map-only
    — the merge list is driver-sized (it came out of
    :func:`bpe_learn_merges`), each merge application is one
    higher-order fold over a word's symbol array, and no shuffle or
    join touches the documents. n_merges sequential folds per word is
    the textbook encode cost; real tokenizers trade this for a trie,
    which a Pandas-UDF variant could adopt if profiling ever demands
    it (it has not: expressions stay in codegen).
    """
    if not merges:
        raise ValueError("merges must be non-empty (learn them first)")
    # empty words from repeated separators must be dropped BEFORE the
    # char split: sequence(1, length("")) is sequence(1, 0), which
    # Spark generates DESCENDING ([1, 0]) — it would fabricate tokens
    words = F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) >= 1)

    def encode_expr(w: Column) -> Column:
        e = F.transform(
            F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, 1)
        )
        for a, b in merges:
            e = _apply_merge(e, a, b)
        return e

    toks = F.flatten(F.transform(words, encode_expr))
    return docs.select(
        F.col(id_col),
        toks.alias("tokens"),
        F.size(toks).alias("n_tokens"),
    )


def bpe_encode_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token COUNTS, vocab-memoized — the scale path.

    :func:`bpe_encode` folds over every corpus character; higher-order
    array functions are interpreted per element (not codegen), so that
    costs ~1.4us/char (measured 2.2s for 1.5M chars at sf0.1) and at
    100 TB it would burn the cluster on re-encoding repeated words.
    Tokenization is word-deterministic, so this variant encodes each
    DISTINCT word once (the fold runs over the Heaps-sublinear vocab
    relation) and joins the per-word token count back to per-(doc,
    word) occurrence counts: n_tokens(doc) = sum_w k(doc,w) * t(w)
    (join strategy left to AQE — the vocab broadcasts when it fits,
    shuffles on the word when it doesn't).
    Same memoization real tokenizer pipelines use (word-level cache).
    Documents with no words (empty/whitespace text) surface with
    n_tokens = 0 via the restoring left join.
    """
    if not merges:
        raise ValueError("merges must be non-empty (learn them first)")

    def encode_expr(w: Column) -> Column:
        e = F.transform(
            F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, 1)
        )
        for a, b in merges:
            e = _apply_merge(e, a, b)
        return e

    words = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) >= 1)
        ).alias("w"),
    )
    per = words.groupBy("__id", "w").agg(F.count("*").alias("__k"))
    vocab = (
        per.select("w")
        .distinct()
        .select("w", F.size(encode_expr(F.col("w"))).cast("bigint").alias("__t"))
    )
    # no broadcast HINT on the vocab side: Heaps-sublinear is not
    # broadcast-SIZED at 100 TB (hundreds of millions of distinct
    # words); AQE broadcasts it when it actually fits and otherwise
    # shuffles both sides on the word — the correct join either way
    counts = (
        per.join(vocab, "w")
        .groupBy("__id")
        .agg(F.sum(F.col("__k") * F.col("__t")).alias("__n"))
    )
    return docs.select(F.col(id_col)).join(
        counts, F.col(id_col) == F.col("__id"), "left"
    ).select(
        id_col, F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_tokens")
    )


def bpe_merge_table(
    spark: SparkSession, docs: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """The learned merge sequence as a DataFrame (step, left, right,
    pair_count) — the r8 catalog-entry surface."""
    merges = bpe_learn_merges(docs, n_merges, text_col)
    return spark.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "step int, lhs string, rhs string, pair_count bigint",
    )
