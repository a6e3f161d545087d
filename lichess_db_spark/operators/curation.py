"""Training-data curation operators: domain mixing, benchmark
contamination detection, sequence packing.

These are the last-mile ops of an LLM data pipeline (after dedup /
quality filtering, before tokenizer sharding). All three are
deterministic and engine-portable by construction, so each catalog
entry carries a full DuckDB oracle:

- mixing samples by md5 of the stable id against a RATES CONFIG TABLE
  (broadcast join — at 100 TB the config is a dim of tens of rows);
- contamination is an inverted-index equi-join on word n-grams — the
  same shuffle shape as exact-Jaccard dedup, bounded by eval-set size;
- packing is a per-partition-key running token count (one window, one
  shuffle); the greedy "cut at seq_len boundaries" rule is pure
  integer arithmetic on the running sum.

Reference parity: the reference pipeline has no curation layer (its
scope ends at EDA aggregates); this module is part of the
training-pipeline surface SURVEY.md §2.10 adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import word_shingles


def _md5_bucket(col, modulus: int):
    """Deterministic [0, modulus) bucket from the first 8 md5 hex
    digits of a stable id — reshuffle-proof (a row's bucket never
    changes as the corpus grows) and reproducible in ANSI SQL."""
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint"),
        F.lit(modulus),
    )


def sample_to_rates(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Domain mixing: downsample each ``key_col`` group to its target
    rate from an explicit config dict.

    The rates ship as a broadcast config-table join (not a when-chain):
    the idiomatic shape when the config comes from a file/catalog, and
    plan size stays O(1) as the domain count grows. Selection is
    ``md5_bucket(id) % 10000 < rate*10000`` — deterministic per row, so
    reruns and engine ports keep identical samples (``F.sample`` or
    ``rand()`` would not).

    Returns the kept rows with their group's ``rate_bp`` (basis
    points) attached. Map-side only after the broadcast.
    """
    spark = df.sparkSession
    rate_rows = [(k, int(round(v * 10000))) for k, v in sorted(rates.items())]
    config = F.broadcast(
        spark.createDataFrame(rate_rows, f"{key_col} string, rate_bp int")
    )
    joined = df.join(config, key_col, "left").withColumn(
        "rate_bp",
        F.coalesce(F.col("rate_bp"), F.lit(int(round(default_rate * 10000)))),
    )
    return joined.where(_md5_bucket(F.col(id_col), 10000) < F.col("rate_bp"))


def stratified_sample_n(
    df: DataFrame,
    n: int,
    part_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size stratified sample: the ``n`` rows per ``part_col``
    group that rank first by md5 of the stable id.

    The hash order is a deterministic, engine-portable stand-in for
    "uniformly random without an RNG": reruns pick the same rows, and
    growing a group only ever displaces the highest-hash members
    (bounded churn, unlike re-rolled rand() samples). One rank window
    per group key — a single hash shuffle; at 100 TB combine with a
    per-partition pre-filter (keep local top-n before the exchange)
    which Spark's rank-filter pushdown does not do automatically.
    """
    h = _md5_bucket(F.col(id_col), 1 << 32)
    w = Window.partitionBy(part_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
    )


def contamination_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark contamination: (train_doc, eval_doc) pairs sharing at
    least ``min_shared`` distinct word ``shingle_n``-grams.

    Inverted-index equi-join on the shingle string: shuffle keys are
    n-grams, candidate volume is bounded by the EVAL side (benchmarks
    are small — thousands of docs), so at 100 TB this scans the train
    corpus once, shuffles only shingles that occur in the eval set
    (semi-join prune below), and never goes quadratic in train size.
    """
    def shingles(df: DataFrame, out: str) -> DataFrame:
        # r15 (guide §2.5): spread the doc rows before the shingle
        # fold + explode — per-token compute on the scan's skewed
        # small-file splits (the r14 spread class); downstream is a
        # join + count, partition-order-free. Stash-paired drifter:
        # contamination_eval_overlap 1.42->0.89 and 1.74->0.97.
        from ._util import spread

        return spread(df.select(id_col, text_col)).select(
            F.col(id_col).alias(out),
            F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias(
                "shingle"
            ),
        )

    tr = shingles(train, "train_id")
    ev = shingles(eval_df, "eval_id")
    # semi-join prune: only train shingles that exist in the eval set
    # reach the pairing shuffle. The probe set broadcasts as int64
    # xxhash64 fingerprints, not strings — ~6x smaller broadcast and a
    # long-compare hash table instead of string equality (measured
    # 1.2x end-to-end at sf0.1). A fingerprint collision only lets a
    # non-matching train shingle THROUGH the prune; the pairing join
    # below still compares the exact strings, so the result is
    # bit-identical to the unhashed prune (tested).
    ev_fp = ev.select(F.xxhash64("shingle").alias("__fp")).distinct()
    pruned = tr.join(
        F.broadcast(ev_fp), F.xxhash64(tr["shingle"]) == F.col("__fp")
    ).drop("__fp")
    return (
        pruned.join(ev, "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    part_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Greedy sequence packing: concatenate documents (in stable id
    order, per ``part_col`` stream) and cut every ``seq_len`` tokens;
    a document's sequence id is its starting offset // seq_len.

    One running-sum window per stream key — a single hash shuffle; at
    100 TB the stream key is the shard (here: lang), so no global
    order is ever materialized. Token counting: by default the
    whitespace-split proxy over ``text_col`` (bit-for-bit the r4
    semantics); pass ``tokens_col`` naming a precomputed integer
    token-count column (e.g. ``tokenizer.bpe_encode_counts``'s
    n_tokens) to pack by REAL tokenizer counts — the packing plan is
    unchanged, only the per-doc length input swaps. Returns
    per-(stream, seq_id) accounting: docs packed and exact token
    count (integers -> engine-portable).
    """
    tokens = (
        F.col(tokens_col).cast("bigint")
        if tokens_col is not None
        else F.size(F.split(F.col(text_col), " "))
    )
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = df.select(
        F.col(part_col), F.col(id_col), tokens.alias("n_tok")
    ).withColumn("cum_end", F.sum("n_tok").over(w))
    seq = ((F.col("cum_end") - F.col("n_tok")) / seq_len).cast("bigint")
    return (
        staged.select(part_col, seq.alias("seq_id"), "n_tok")
        .groupBy(part_col, "seq_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )


def temperature_resample(
    df: DataFrame,
    alpha: float = 0.5,
    key_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based group rebalancing (the multilingual-sampling
    rule: post-sample sizes ∝ n_g^alpha, alpha<1 flattens the
    distribution toward the small groups).

    Per-group keep rate = (min_n / n_g)^(1-alpha), so the smallest
    group keeps everything and larger groups are downsampled toward
    the flattened target. Selection is md5-of-id against the rate in
    basis points — deterministic, reshuffle-proof, engine-portable
    (same discipline as :func:`sample_to_rates`).

    The group counts and their min are aggregates of the input itself
    (no driver-side collect): counts are a 1-row-per-group aggregate,
    the min is a 1-row aggregate of THAT, and both broadcast back —
    at 100 TB the group table is dims-sized (languages, domains).

    alpha=0.5 keeps the rate inside sqrt(), which is correctly rounded
    in IEEE 754 — bit-identical across engines. Other alphas go
    through pow(), which is only faithfully rounded (≤1 ulp) and may
    disagree across libm implementations in the last bit; floor() at
    basis-point granularity makes that visible only if the rate lands
    within 1e-16 of a boundary.
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("n_g"))
    mn = counts.agg(F.min("n_g").alias("min_n"))
    if alpha == 0.5:
        rate = F.sqrt(F.col("min_n") / F.col("n_g"))
    else:
        rate = F.pow(F.col("min_n") / F.col("n_g"), F.lit(1.0 - alpha))
    rated = counts.join(F.broadcast(mn)).select(
        key_col,
        "n_g",
        F.floor(rate * 10000).cast("int").alias("rate_bp"),
    )
    return df.join(F.broadcast(rated), key_col).where(
        _md5_bucket(F.col(id_col), 10000) < F.col("rate_bp")
    )


def repeated_passages(
    df: DataFrame,
    chunk_words: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Passage-level duplication scan: split each document into
    non-overlapping ``chunk_words``-word chunks and surface chunks that
    appear in at least ``min_docs`` distinct documents.

    This is the sub-document complement of whole-document dedup: the
    boilerplate / licence-header / template detector. Shuffle key is
    the chunk digest — one exchange, group sizes bounded by chunk
    frequency (a hot chunk is exactly the thing being measured).
    Ragged tails (< chunk_words words) are dropped so chunk identity
    is length-stable in both engines.
    """
    words = F.split(F.col(text_col), " ")
    n_chunks = F.floor(F.size(words) / chunk_words).cast("int")
    chunk_idx = F.explode(F.sequence(F.lit(0), n_chunks - 1))
    # guard: sequence(0, -1) would COUNT DOWN for a sub-chunk doc;
    # drop those rows before the explode
    df = df.where(F.size(words) >= chunk_words)
    chunked = df.select(
        F.col(id_col), words.alias("__words"), chunk_idx.alias("__ci")
    ).select(
        F.col(id_col),
        F.array_join(
            F.slice(F.col("__words"), F.col("__ci") * chunk_words + 1, chunk_words),
            " ",
        ).alias("passage"),
    )
    return (
        chunked.groupBy("passage")
        .agg(
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def dataset_split(
    df: DataFrame,
    fractions: dict[str, int] | None = None,
    id_col: str = "doc_id",
    salt: str = "-split",
) -> DataFrame:
    """Deterministic named train/val/test assignment: each row gets a
    ``split`` label by its md5(id || salt) percent-bucket, carved into
    cumulative ranges in ``fractions`` insertion order (percents must
    sum to 100). The generalized form of export_plan's 2-way tag: the
    assignment is a pure function of the id — reshuffle-proof, stable
    as the corpus grows (a doc never migrates splits when new data
    arrives, the property eval-set hygiene depends on), and
    reproducible in ANSI SQL. Map-only at any scale; change ``salt``
    to draw an independent assignment.
    """
    fractions = fractions or {"train": 80, "val": 10, "test": 10}
    if any(
        not isinstance(v, int) or isinstance(v, bool) for v in fractions.values()
    ):
        # floats can pass the sum check yet silently starve a split:
        # buckets are integers 0..99, so {'train': 99.5, 'val': 0.5}
        # gives val ZERO buckets forever
        raise ValueError(f"fractions must be integer percents: {fractions}")
    if sum(fractions.values()) != 100 or any(v <= 0 for v in fractions.values()):
        raise ValueError(f"fractions must be positive and sum to 100: {fractions}")
    bucket = _md5_bucket(
        F.concat(F.col(id_col).cast("string"), F.lit(salt)), 100
    )
    expr = None
    cum = 0
    for name, pct in fractions.items():
        cum += pct
        expr = (
            F.when(bucket < cum, name)
            if expr is None
            else expr.when(bucket < cum, name)
        )
    return df.withColumn("split", expr)


def upsample_epochs(
    df: DataFrame,
    epochs: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    default: float = 1.0,
) -> DataFrame:
    """Per-source epoch replication for a training mix: a source with
    ``epochs[src] = 2.5`` emits every doc twice plus a deterministic
    md5-selected half a third time (the standard small-high-quality-
    source upsampling; fractional epochs select a stable id subset, so
    reruns and engines agree). Output rows carry ``epoch`` (1-based
    pass index); a rate <= 0 drops the source. Plan shape: one
    when-chain (the epochs dict is dims-sized) + explode of a
    row-local sequence — map-only, output size = sum of rates x rows,
    no shuffle; the epoch index is what downstream shard writers
    interleave on so repeated passes don't cluster.
    """
    full_expr = None
    frac_expr = None
    for src, e in epochs.items():
        fl = int(e) if e > 0 else 0
        fb = max(0, min(10000, round((e - fl) * 10000))) if e > 0 else 0
        cond = F.col(key_col) == src
        full_expr = (
            F.when(cond, fl) if full_expr is None else full_expr.when(cond, fl)
        )
        frac_expr = (
            F.when(cond, fb) if frac_expr is None else frac_expr.when(cond, fb)
        )
    d_fl = int(default) if default > 0 else 0
    d_fb = max(0, min(10000, round((default - d_fl) * 10000))) if default > 0 else 0
    full_expr = (full_expr.otherwise(d_fl)) if full_expr is not None else F.lit(d_fl)
    frac_expr = (frac_expr.otherwise(d_fb)) if frac_expr is not None else F.lit(d_fb)
    extra = F.when(
        _md5_bucket(F.concat(F.col(id_col).cast("string"), F.lit("-ep")), 10000)
        < frac_expr,
        1,
    ).otherwise(0)
    n_ep = (full_expr + extra).cast("int")
    # sequence(1, 0) generates DESCENDING [1, 0] — filter before explode
    return (
        df.withColumn("__n_ep", n_ep)
        .where(F.col("__n_ep") >= 1)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("__n_ep"))))
        .drop("__n_ep")
    )


def quality_verdict(
    text_col: str = "text",
    dup2_threshold: float = 0.05,
    quality_floor: float = 0.40,
) -> "F.Column":
    """The composed quality-gate verdict as a single map-only column:
    'drop_repetition' (dup-2gram fraction over threshold), else
    'drop_quality' (composite score under floor), else 'keep'.

    Shared by the batch catalog entry (quality_filter_pipeline) and
    the streaming curation sink so both paths apply bit-identical
    rules. Callers should select from a projection that pre-projects
    ``__ts`` (token array) and ``__g2`` (2-gram shingles) — see the
    CollapseProject multi-reference rule in plans/catalog_north.py.
    """
    from ..functions.text import quality_score

    g2 = F.col("__g2")
    dup2 = F.when(
        F.size(g2) > 0,
        F.lit(1) - F.size(F.array_distinct(g2)).cast("double") / F.size(g2),
    )
    return (
        F.when(dup2 > dup2_threshold, "drop_repetition")
        .when(quality_score(text_col, ts=F.col("__ts")) < quality_floor, "drop_quality")
        .otherwise("keep")
    )


def curation_projection(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pre-project the arrays quality_verdict needs (once per row)."""
    return df.select(
        "*",
        F.split(text_col, " ").alias("__ts"),
        word_shingles(text_col, 2).alias("__g2"),
    )


def export_plan(
    df: DataFrame,
    *,
    rates: dict[str, float] | None = None,
    seq_len: int = 2048,
    train_pct: int = 90,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_col: str = "source",
    stream_col: str = "lang",
) -> DataFrame:
    """The export's logical plan — everything ``export_training_shards``
    computes before the write (dedup → mixing → split tag → sequence
    ids). Split out so the physical shape is plan-fingerprintable
    (tests/test_scale_design.py): the write side of a sink has no
    .explain surface, and a silently added exchange here multiplies at
    every rerun of the export."""
    keep = df.groupBy(F.md5(text_col).alias("__dg")).agg(
        F.min(id_col).alias(id_col)
    )
    base = df.join(keep.select(id_col), id_col)
    if rates is not None:
        base = sample_to_rates(base, rates, key_col=key_col, id_col=id_col).drop(
            "rate_bp"
        )
    split_bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit("-split"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(100),
    )
    tagged = base.withColumn(
        "split", F.when(split_bucket < train_pct, "train").otherwise("test")
    )
    n_tok = F.size(F.split(F.col(text_col), " "))
    w = (
        Window.partitionBy("split", stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return tagged.withColumn("n_tok", n_tok).withColumn(
        "seq_id",
        ((F.sum("n_tok").over(w) - F.col("n_tok")) / seq_len).cast("bigint"),
    )


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    *,
    rates: dict[str, float] | None = None,
    seq_len: int = 2048,
    train_pct: int = 90,
    max_records_per_file: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_col: str = "source",
    stream_col: str = "lang",
) -> DataFrame:
    """The last mile of the curation pipeline: exact dedup → domain
    mixing → train/test split → sequence-id assignment → partitioned,
    size-controlled parquet shards a tokenizer job can consume.

    Layout: ``out_dir/split=train|test/<stream>-partitioned files``
    with ``maxRecordsPerFile`` capping shard size (the S5 file-sizing
    contract). Partitioning by split gives the training job partition
    pruning (read train without listing test); the per-stream sequence
    ids come from the single-window packing rule, so a downstream
    tokenizer can group rows by (stream, seq_id) into fixed-length
    examples without re-scanning.

    Every stage is the md5-deterministic operator verified elsewhere
    (dedup keep-min-id, config-rate mixing, salted split hash,
    running-token packing) — the export is reshuffle-proof: rerunning
    on the same corpus writes byte-identical row sets.

    Returns the per-(split, stream) accounting DataFrame (docs,
    tokens) computed FROM THE WRITTEN FILES — the read-back is the
    export's own verification.
    """
    spark = df.sparkSession
    staged = export_plan(
        df,
        rates=rates,
        seq_len=seq_len,
        train_pct=train_pct,
        id_col=id_col,
        text_col=text_col,
        key_col=key_col,
        stream_col=stream_col,
    )
    (
        staged.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("split")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir)
    return back.groupBy("split", stream_col).agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021, App.
    A1.1) as one map-only pass: per-document boolean rule flags plus
    the conjunctive ``passes_gopher`` verdict — the heuristic gate
    most LLM curation pipelines (Gopher, RefinedWeb, Dolma, FineWeb)
    run before any model-based filter.

    Every rule is an exact integer-multiply comparison (no float
    division anywhere): mean-word-length in [3, 10] is
    ``3*nw <= nch <= 10*nw``; the ellipsis count stays in its x3 form
    (``len - len(replace(text,'...'))``) so the symbol-ratio rule is
    ``10*(3*n_hash + n_ell3) <= 3*nw``. That makes the flag table
    bit-portable to any engine (catalog: gopher_quality_rules).

    Scale shape: zero shuffles — a narrow projection that fuses into
    whatever scan precedes it; at 100 TB this gate costs one codegen
    stage riding the ingest read.
    """
    t = F.col(text_col)
    ws = F.split(text_col, " ")
    ls = F.split(text_col, "\n")
    nw = F.size(ws).cast("bigint")
    nch = F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("bigint")
    nhash = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).cast(
        "bigint"
    )
    nell3 = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))).cast(
        "bigint"
    )
    n_bullet = F.size(
        F.filter(ls, lambda l: l.startswith("-") | l.startswith("*"))
    ).cast("bigint")
    n_ell_end = F.size(F.filter(ls, lambda l: l.endswith("..."))).cast("bigint")
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("bigint")
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(ws, s),
        )
    ).cast("bigint")
    n_lines = F.size(ls).cast("bigint")
    rules = {
        "r_word_count": (nw >= 50) & (nw <= 100000),
        "r_mean_word_len": (3 * nw <= nch) & (nch <= 10 * nw),
        "r_symbol_ratio": 10 * (3 * nhash + nell3) <= 3 * nw,
        "r_bullet": 10 * n_bullet <= n_lines,
        "r_ellipsis": 10 * n_ell_end <= 3 * n_lines,
        "r_alpha_words": 5 * n_alpha >= 4 * nw,
        "r_stopwords": n_stop >= 2,
    }
    passes = None
    n_passed = None
    for c in rules.values():
        passes = c if passes is None else (passes & c)
        i = c.cast("int").cast("bigint")
        n_passed = i if n_passed is None else (n_passed + i)
    # n_rules_passed supports the soft-gate variant (>= k of 7) most
    # pipelines actually deploy — e.g. a corpus whose text register
    # lacks natural stopword distribution gates on the 6 structural
    # rules (catalog: curation_funnel_report)
    return df.select(
        id_col,
        nw.alias("n_words"),
        *[c.alias(n) for n, c in rules.items()],
        n_passed.alias("n_rules_passed"),
        passes.alias("passes_gopher"),
    )


def dsir_importance(
    df: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    scale: int = 1_000_000,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, Data Selection via
    Importance Resampling): score every document by how target-like
    its hashed n-gram profile is — the published recipe for picking
    in-domain pretraining data out of a raw crawl.

    ``target_pred`` is a boolean Column marking the in-domain rows
    (e.g. ``F.col('lang') == 'en'``, or membership in a trusted
    source). Features are unigrams + bigrams hashed into ``n_buckets``
    md5 buckets; both the target and raw bucket counts come from ONE
    exploded scan (count + filtered count in the same bounded-size
    groupBy); per-doc score = sum over feature occurrences of the
    add-1-smoothed target/raw ratio as an EXACT scaled integer
    (``(scale*(tc+1)) div (rc+1)`` — integer div is engine-portable
    where IEEE log is not; the paper's log-ratio sum is the same
    selection signal through a monotone per-feature map and drops in
    via one expression swap when hash-portability is not required).

    Scale shape: two corpus scans (counts, then scores — DSIR's own
    two passes), a bounded n_buckets-sized count aggregate that
    BROADCASTS back, and one doc-keyed exchange for the final
    per-doc sum (catalog: dsir_importance_weights).
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    ws = F.split(text_col, " ")
    bis = F.zip_with(
        F.slice(ws, 1, F.size(ws) - 1),
        F.slice(ws, 2, F.size(ws) - 1),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    # r14 optimization (guide §2.5 input skew): the unigram+bigram
    # explode and md5 bucketing are interpreted per-token work that
    # inherited the scan's few skewed splits on a small single-file
    # corpus; spread() the doc rows first so BOTH DSIR passes run at
    # the session's full parallelism. Each pass carries its OWN
    # round-robin exchange of the raw doc rows — ReuseExchange never
    # merges nondeterministic round-robin exchanges (see the +2
    # exchange fingerprint note in tests/test_scale_design.py).
    # Aggregations downstream are partition-order-free.
    from ._util import spread

    exploded = spread(
        df.select(F.col(id_col), target_pred.alias("is_target"), F.col(text_col))
    ).select(
        F.col(id_col),
        F.col("is_target"),
        F.explode(F.concat(ws, bis)).alias("f"),
    ).select(
        id_col,
        "is_target",
        F.pmod(
            F.conv(F.substring(F.md5("f"), 1, 8), 16, 10).cast("bigint"),
            F.lit(n_buckets),
        ).alias("b"),
    )
    ratios = (
        exploded.groupBy("b")
        .agg(
            F.count("*").alias("rc"),
            F.count_if("is_target").alias("tc"),
        )
        .select(
            "b",
            F.expr(f"({scale} * (tc + 1)) div (rc + 1)").alias("ratio"),
        )
    )
    return (
        exploded.join(F.broadcast(ratios), "b")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("ratio").alias("score_scaled"),
        )
    )


def unimax_allocation(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    epoch_cap: int = 1,
    budget_num: int = 4,
    budget_den: int = 5,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023): distribute a
    token budget across languages/domains as equally as possible,
    capping every group at ``epoch_cap`` epochs of its own data — the
    published alternative to temperature sampling that never repeats
    tail-language data past the cap while head languages absorb the
    remainder.

    The water-filling solution is computed as a pure window-function
    waterfall over the G-row per-group token counts (G = #groups, a
    few hundred at most): rank groups by capacity ascending; group i
    is CAPPED iff granting every group from rank i up its own
    capacity still fits the remaining budget
    (``cap_i*(G-i+1) + prefix_i <= B`` — anti-monotone in i, the
    water-filling crossover), and every uncapped group gets the equal
    share ``(B - sum(capped caps)) div (#uncapped)``. All arithmetic
    is exact integers (budget = ``(T*budget_num) div budget_den`` of
    the corpus total; integer division, remainder deliberately
    unallocated); the reported ``alloc_epochs`` is the single IEEE
    division alloc/n_tokens, so the whole table is engine-portable
    (catalog: unimax_lang_allocation).

    Scale shape: ONE corpus scan + group-keyed count aggregate; the
    waterfall runs over the G-row relation (two 1-row broadcast
    joins, one G-row window) — nothing corpus-sized moves after the
    first aggregate.
    """
    if epoch_cap <= 0 or budget_num <= 0 or budget_den <= 0:
        raise ValueError(
            f"epoch_cap, budget_num, budget_den must be positive, got "
            f"{epoch_cap}, {budget_num}, {budget_den}"
        )
    # ONE corpus scan: the G-row count relation collects to the driver
    # (bounded state, like k-means centroids — G = #languages/domains,
    # hundreds at most) and the waterfall runs over the literal
    # relation; without the cut, the three waterfall branches each
    # re-scan the corpus (ReuseExchange only partially dedupes them)
    count_rows = (
        df.select(
            F.col(group_col).alias("grp"),
            F.size(F.split(text_col, " ")).cast("bigint").alias("__t"),
        )
        .groupBy("grp")
        .agg(F.sum("__t").alias("n_tokens"))
        .collect()
    )
    counts = df.sparkSession.createDataFrame(
        [(r.grp, r.n_tokens) for r in count_rows], "grp string, n_tokens bigint"
    ).withColumn("cap_tokens", F.col("n_tokens") * F.lit(epoch_cap))
    totals = counts.agg(
        F.sum("n_tokens").alias("__T"), F.count("*").alias("__G")
    )
    w = Window.orderBy("cap_tokens", "grp")
    ranked = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn(
            "__B", F.expr(f"(__T * {budget_num}) div {budget_den}")
        )
        .withColumn("__i", F.row_number().over(w))
        .withColumn(
            "__prefix",
            F.coalesce(
                F.sum("cap_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("bigint"),
            ),
        )
        .withColumn(
            "capped",
            F.col("cap_tokens") * (F.col("__G") - F.col("__i") + 1)
            + F.col("__prefix")
            <= F.col("__B"),
        )
    )
    spent = ranked.agg(
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("cap_tokens"))),
            F.lit(0).cast("bigint"),
        ).alias("__S"),
        F.count_if("capped").alias("__C"),
    )
    return (
        ranked.crossJoin(F.broadcast(spent))
        .withColumn(
            "alloc_tokens",
            F.when(F.col("capped"), F.col("cap_tokens")).otherwise(
                F.expr("(__B - __S) div (__G - __C)")
            ),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_tokens",
            "cap_tokens",
            "capped",
            "alloc_tokens",
            (F.col("alloc_tokens") / F.col("n_tokens")).alias("alloc_epochs"),
        )
    )


def export_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    content_cols: dict[str, str] | None = None,
    shard_max_records: int = 1000,
    prefix: str = "shard",
) -> DataFrame:
    """WebDataset-style tar shard export — the standard multimodal
    training-data format: one ``<prefix>-NNNNNN.tar`` per shard, each
    record a group of member files ``<key>.<ext>`` (readable by the
    webdataset / torchdata loaders). ``content_cols`` maps extension
    -> column (default ``{"txt": "text"}``); string columns are
    UTF-8-encoded, binary columns written verbatim, NULL cells skip
    that member.

    Deterministic BYTES: keys are zero-padded global ranks in
    ``id_col`` order, shard membership is rank // shard_max_records,
    members are written in (key, ext) order with mtime/uid/gid
    zeroed (USTAR format) — re-running on the same corpus writes
    byte-identical shards, so exports are content-addressable and
    diffable by hash.

    Scale shape: one range exchange for the global rank
    (operators/rank.global_rank — never a single-partition window),
    one hash exchange on shard id so each task owns WHOLE shards,
    then each task streams its records through stdlib tarfile.
    Crash safety: write-aside + atomic rename per shard (a task that
    dies mid-write never leaves a partial tar under the final name;
    a speculative re-run replaces it with the same bytes). Paths are
    posix-local here; on an object store write locally and upload —
    the member layout is unchanged.

    Returns per-shard accounting parsed FROM THE WRITTEN TARS
    (binaryFile read-back + stdlib tarfile) — the export's own
    verification, same discipline as :func:`export_training_shards`.
    """
    import os

    from .rank import global_rank

    content_cols = dict({"txt": "text"} if content_cols is None else content_cols)
    if not content_cols:
        raise ValueError("content_cols must map at least one ext -> column")
    if shard_max_records <= 0:
        raise ValueError(f"shard_max_records must be positive, got {shard_max_records}")
    exts = sorted(content_cols)
    spark = df.sparkSession

    staged = global_rank(
        df.select(
            F.col(id_col).alias("__id"),
            *[F.col(content_cols[e]).alias(f"__c_{e}") for e in exts],
        ),
        "__id",
        rank_col="__rn",
    ).withColumn(
        "__shard", ((F.col("__rn") - 1) / F.lit(shard_max_records)).cast("bigint")
    )

    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows) -> None:
        import io as _io
        import os as _os
        import tarfile
        import uuid

        _os.makedirs(out_dir, exist_ok=True)
        buckets: dict = {}
        for r in rows:
            buckets.setdefault(r["__shard"], []).append(r)
        for shard, rs in buckets.items():
            rs.sort(key=lambda r: r["__rn"])
            final = _os.path.join(out_dir, f"{prefix}-{shard:06d}.tar")
            tmp = f"{final}.__tmp-{uuid.uuid4().hex[:12]}"
            with tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT) as tf:
                for r in rs:
                    key = f"{r['__rn'] - 1:09d}"
                    for e in exts:
                        v = r[f"__c_{e}"]
                        if v is None:
                            continue
                        data = (
                            v.encode("utf-8") if isinstance(v, str) else bytes(v)
                        )
                        ti = tarfile.TarInfo(name=f"{key}.{e}")
                        ti.size = len(data)
                        ti.mtime = 0
                        ti.uid = 0
                        ti.gid = 0
                        ti.uname = ""
                        ti.gname = ""
                        tf.addfile(ti, _io.BytesIO(data))
            _os.replace(tmp, final)

    staged.repartition("__shard").foreachPartition(write_partition)
    with open(os.path.join(out_dir, "_SUCCESS"), "w"):
        pass

    tars = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"{prefix}-*.tar")
        .load(out_dir)
    )

    def count_members(batches):
        import io as _io
        import tarfile

        import pandas as pd

        for pdf in batches:
            names, n_rec, n_mem, n_b = [], [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=_io.BytesIO(bytes(content))) as tf:
                    members = tf.getmembers()
                names.append(path.rsplit("/", 1)[-1])
                n_rec.append(len({m.name.split(".", 1)[0] for m in members}))
                n_mem.append(len(members))
                n_b.append(len(content))
            yield pd.DataFrame(
                {
                    "shard_file": names,
                    "n_records": n_rec,
                    "n_members": n_mem,
                    "n_bytes": n_b,
                }
            )

    return tars.select("path", "content").mapInPandas(
        count_members,
        "shard_file string, n_records bigint, n_members bigint, n_bytes bigint",
    )


def read_webdataset(
    spark,
    path: str,
    prefix: str = "shard",
) -> DataFrame:
    """Loader side of the WebDataset contract: tar shards ->
    one row per member file (key, ext, data, shard_file) — the
    ingestion edge for tar-packed multimodal corpora (including the
    shards :func:`export_webdataset_shards` writes; round-trip
    pinned by test).

    Scale shape: ``binaryFile`` hands each tar to one task (shards
    are the parallelism unit, exactly how WebDataset loaders consume
    them); the stdlib-tarfile parse streams members out of the
    in-memory blob through Arrow batches. At 100 TB keep shards in
    the 100 MB-1 GB band — one shard is one task's working set."""

    def parse(batches):
        import io as _io
        import tarfile

        import pandas as pd

        for pdf in batches:
            keys, exts, datas, shards = [], [], [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = p.rsplit("/", 1)[-1]
                with tarfile.open(fileobj=_io.BytesIO(bytes(content))) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        key, _, ext = m.name.partition(".")
                        keys.append(key)
                        exts.append(ext)
                        datas.append(tf.extractfile(m).read())
                        shards.append(shard)
            yield pd.DataFrame(
                {"key": keys, "ext": exts, "data": datas, "shard_file": shards}
            )

    tars = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"{prefix}-*.tar")
        .load(path)
    )
    return tars.select("path", "content").mapInPandas(
        parse, "key string, ext string, data binary, shard_file string"
    )


def temperature_allocation(
    df: DataFrame,
    sqrt_depth: int = 1,
    budget_num: int = 4,
    budget_den: int = 5,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture allocation (the mT5/XLM-R recipe
    UniMax superseded, still the baseline every mix report quotes):
    language l gets budget share proportional to ``n_l^alpha`` — small
    languages are up-weighted relative to their share, the head is
    damped. ``alpha = 0.5 ** sqrt_depth`` (depth 1 -> alpha 0.5,
    depth 2 -> 0.25): powers are computed as CHAINS OF IEEE SQRT over
    the 1e12-scaled integer token count, because sqrt is the one
    power both Spark and an ANSI oracle round identically (pow(x, .3)
    is not correctly-rounded-guaranteed cross-engine); the weight is
    floored back to BIGINT, so everything after — the weight total,
    the quota split ``B * w // W`` — is exact integer arithmetic.
    Reported ``alloc_epochs`` is the single IEEE division.

    Scale shape: ONE corpus scan for the per-lang token counts;
    everything else runs on G rows (one 1-row broadcast total). The
    companion :func:`unimax_allocation` is the epoch-capped
    water-filling allocator; this one never caps, so a dominant head
    language still takes the largest share (the failure mode UniMax
    fixes — run both and diff, that IS the mix-design review)."""
    if sqrt_depth < 1 or sqrt_depth > 3:
        raise ValueError(f"sqrt_depth must be 1..3, got {sqrt_depth}")
    if budget_num <= 0 or budget_den <= 0 or budget_num > budget_den:
        raise ValueError(
            f"budget fraction must be in (0, 1]: {budget_num}/{budget_den}"
        )
    toks = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.sum(F.size(F.split(text_col, " "))).cast("bigint").alias("n_tokens")
    )
    # cast to double BEFORE scaling: a bigint n_tokens * 10**12 overflows
    # int64 past ~9.2e6 tokens per language (ANSI exception in Spark 4,
    # silent wraparound with ANSI off) — exactly the 100 TB regime this
    # allocator targets — while the oracle computes
    # CAST(n_tokens AS DOUBLE) * 1e12. IEEE double multiply is correctly
    # rounded in both engines, so the scaled weight (and every sqrt of
    # it) stays bit-identical cross-engine at ANY corpus size, and is
    # integer-exact below 2^53 anyway (ADVICE r10).
    w = F.col("n_tokens").cast("double") * F.lit(1e12)
    for _ in range(sqrt_depth):
        w = F.sqrt(w)
    weighted = toks.withColumn("weight_scaled", F.floor(w).cast("bigint"))
    tot = weighted.agg(
        F.sum("weight_scaled").cast("bigint").alias("W"),
        F.sum("n_tokens").cast("bigint").alias("T"),
    )
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_tokens",
            "weight_scaled",
            # integral `div` throughout: (x / y).cast("bigint") would
            # round-trip through double and can drop an ulp at the
            # floor boundary — the oracle's `//` is exact
            F.expr(f"(T * {budget_num}) div {budget_den}").alias("__B"),
            "W",
        )
        .select(
            "lang",
            "n_tokens",
            "weight_scaled",
            F.expr("(__B * weight_scaled) div W").alias("alloc_tokens"),
        )
        .withColumn(
            "alloc_epochs",
            F.col("alloc_tokens") / F.col("n_tokens").cast("double"),
        )
    )
