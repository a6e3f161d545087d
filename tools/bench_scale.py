"""Scaling-evidence bench for the text-dedup family.

The per-round bench (bench.py) measures wall-clock at ONE size
(sf0.1); this tool measures how that wall-clock GROWS. It builds
replica-scaled corpora — N copies of sf0.1 documents, every replica's
tokens salted with a replica prefix so cross-replica duplication is
ZERO and the corpus-wide duplication RATE stays constant while volume
grows N-fold (naive unsalted replication would instead make every
gram a duplicate, a worst-case stress, not a scaling measurement) —
and times the dedup operators at each factor.

The quantity that matters for the 100 TB claim is the fitted scaling
exponent alpha in t ~ volume^alpha between successive factors: the
designs claim (near-)linear shuffle volume, so alpha should sit near
1.0 (sub-linear at small sizes while fixed per-job overhead still
dominates). Super-linear growth would falsify the "survives 100x"
story before any cluster does.

Usage: python tools/bench_scale.py [--factors 1,8,64] [--samples 2]
Writes BENCH_SCALE.json at the repo root (one JSON document).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKDIR = "/tmp/scale_bench"
OFFSET = 10_000_000


def scaled_docs(
    spark, base_dir: str, factor: int, path: str, keep_all=False, salt_mode="token"
):
    """N salted replicas of sf documents -> parquet at ``path``.
    ``keep_all`` carries the non-text columns (lang/source/...) through
    verbatim for operators that stream or stratify by them.

    ``salt_mode``:
    - "token" (default): prefix every token with ``r{i}_`` — replicas
      share no exact tokens/shingles, so TOKEN-level dedup ops see a
      constant duplication rate. But the replicas stay byte-level
      NEAR-identical (one short prefix per token), so byte/perceptual
      ops (pHash) correctly see every replica of a doc as a near-dup —
      the corpus then measures a factor-x-near-duplicated world, and
      candidate volume grows ~factor^2 BY CONSTRUCTION (the r9 finding
      on mm_phash_dedup, alpha 1.18 uncapped).
    - "bytes": REWRITE every token to an 8-hex md5 slice of
      (replica-tag ‖ token) — the mapping is consistent within a
      replica (within-replica similarity structure preserved) while
      cross-replica bytes are unrelated, so byte-level ops also see a
      constant dup rate as volume grows. Use for perceptual-hash
      cells."""
    from pyspark.sql import functions as F

    from lichess_db_spark.io import load_table

    if salt_mode not in ("token", "bytes"):
        raise ValueError(f"unknown salt_mode {salt_mode!r}")
    base = load_table(spark, base_dir, "documents")
    extra = [c for c in base.columns if c not in ("doc_id", "text")] if keep_all else []
    parts = []
    for i in range(factor):
        tag = F.lit(f"r{i}_")
        if salt_mode == "token":
            salted = F.transform(F.split("text", " "), lambda t: F.concat(tag, t))
        else:
            salted = F.transform(
                F.split("text", " "),
                lambda t: F.substring(F.md5(F.concat(tag, t)), 1, 8),
            )
        parts.append(
            base.select(
                (F.col("doc_id") + (i * OFFSET)).alias("doc_id"),
                F.concat_ws(" ", salted).alias("text"),
                *extra,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.write.mode("overwrite").parquet(path)


def scaled_embeddings(spark, base_dir: str, factor: int, path: str):
    """N replicas of sf embeddings, each under a deterministic
    per-replica SIGN PATTERN (v -> v * s_r, s_r in {-1,+1}^dim): all
    WITHIN-replica pairwise cosines are exactly invariant (a common
    sign flip cancels in every dot product), while CROSS-replica
    cosines become sign-scrambled sums that land near zero — so the
    near-dup structure per replica is preserved bit-for-bit and the
    duplication rate stays constant as volume grows, the same
    invariant the token salt gives the text family."""
    from pyspark.sql import functions as F

    from lichess_db_spark.io import load_table

    base = load_table(spark, base_dir, "embeddings").select("vec_id", "embedding")
    parts = []
    for i in range(factor):
        sign = lambda x, d: x * F.when(  # noqa: E731
            F.pmod(F.xxhash64(F.lit(i), d), 2) == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0)).cast("float")
        parts.append(
            base.select(
                (F.col("vec_id") + (i * OFFSET)).alias("vec_id"),
                F.transform("embedding", sign).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.write.mode("overwrite").parquet(path)


def viral_embeddings(d):
    """Every 5th vector becomes ONE constant vector — identical
    signatures bucket together in EVERY table, the worst-case
    concentration for a bucket self-join (exact dedup would normally
    remove these first; the skew cells measure the cap holding when
    it hasn't). Shared by the emb-family timing cells and
    tools/mutual_lsh_recall.py so both diagnostics measure the SAME
    corpus."""
    from pyspark.sql import functions as F

    return d.select(
        "vec_id",
        F.when(
            F.pmod("vec_id", F.lit(5)) == 0,
            F.expr("transform(embedding, x -> CAST(0.125 AS FLOAT))"),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )


def scaled_tpch(spark, base_dir: str, factor: int, path_dir: str):
    """An sf-dir LOOK-ALIKE with orders+lineitem replicated N-fold
    (order keys offset per replica, so every replica is a disjoint,
    join-consistent slice of extra history for the SAME dimension
    rows — customers/parts/suppliers each accumulate N-fold more
    orders, which is how a fact table actually grows) and the small
    dimension tables copied verbatim. Catalog builders run against it
    unchanged via their ``sf_dir`` parameter."""
    from pyspark.sql import functions as F

    from lichess_db_spark.io import load_table

    os.makedirs(path_dir, exist_ok=True)
    for dim in ("region", "nation", "customer", "supplier", "part"):
        src = f"{base_dir}/{dim}.parquet"
        dst = f"{path_dir}/{dim}.parquet"
        if os.path.isdir(src):
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(src, dst)
        else:
            shutil.copyfile(src, dst)
    for fact, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        base = load_table(spark, base_dir, fact)
        parts = [
            base.select(
                *[
                    (F.col(c) + (i * OFFSET)).alias(c) if c == key else F.col(c)
                    for c in base.columns
                ]
            )
            for i in range(factor)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.write.mode("overwrite").parquet(f"{path_dir}/{fact}.parquet")
    # events grow along BOTH natural axes: each replica is a disjoint
    # slice of extra history (event ids offset, timestamps shifted by
    # 400 days per replica -> the hourly series gets N-fold longer)
    # from a disjoint user population (user ids offset) — so calendar-
    # bounded aggregates (autocorr) and distinct-cardinality sketches
    # (KMV) scale along the axes they claim to be bounded by
    ev = load_table(spark, base_dir, "events")
    eparts = [
        ev.select(
            (F.col("event_id") + (i * OFFSET)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i * 9600} HOURS")).alias("ts"),
            (F.col("user_id") + (i * OFFSET)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in range(factor)
    ]
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionAll(p)
    eout.write.mode("overwrite").parquet(f"{path_dir}/events.parquet")
    # documents replicate verbatim with offset ids: enough for cells
    # whose cost axis is doc COUNT (wordpiece recursion, profiling) —
    # text-similarity cells need the salted scaled_docs corpora instead
    dv = load_table(spark, base_dir, "documents")
    dparts = [
        dv.select(
            (F.col("doc_id") + (i * OFFSET)).alias("doc_id"),
            *[c for c in dv.columns if c != "doc_id"],
        )
        for i in range(factor)
    ]
    dout = dparts[0]
    for p in dparts[1:]:
        dout = dout.unionAll(p)
    dout.write.mode("overwrite").parquet(f"{path_dir}/documents.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,8,64")
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--ops",
        default=None,
        help="comma-separated subset of the family's ops to run "
        "(skip ops whose cost model forbids the top factor, e.g. "
        "fixed-k SemDeDup's quadratic pair work at x64)",
    )
    ap.add_argument(
        "--json",
        default=None,
        help="output path; defaults to BENCH_SCALE.json for the text "
        "family and BENCH_SCALE_<FAMILY>.json otherwise, so a "
        "forgotten flag can never clobber another family's artifact",
    )
    ap.add_argument(
        "--family",
        default="text",
        choices=("text", "emb", "oltp", "curation"),
        help="text = dedup ops over scaled documents; emb = SemDeDup "
        "fixed-k vs corpus-scaled-k + embedding LSH over scaled "
        "embeddings (the docstring's 'choose k so clusters hold "
        "~1-10k vectors' claim, measured); oltp = TPC-H-style scan/"
        "join/MV catalog entries over N-fold replicated fact tables "
        "with verbatim dimensions; curation = global shuffle rank, "
        "greedy packing, DLT top-k sample and token-budget fill over "
        "scaled documents (the range-exchange / window-heavy ops)",
    )
    ap.add_argument(
        "--salt-mode",
        default="token",
        choices=("token", "bytes"),
        help="replica salt for scaled documents: 'token' (prefix tag; "
        "constant dup rate for TOKEN-level ops, but replicas stay "
        "byte-near-identical so perceptual ops correctly see them as "
        "near-dups) or 'bytes' (md5 token rewrite; constant dup rate "
        "for BYTE-level ops too — use for pHash cells)",
    )
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]
    if len(set(factors)) < 2:
        ap.error("--factors needs >= 2 distinct values (alpha is a "
                 "ratio between the two largest) — fail BEFORE the "
                 "hours-long timing loop, not after")
    if args.json is None:
        args.json = (
            "BENCH_SCALE.json"
            if args.family == "text"
            else f"BENCH_SCALE_{args.family.upper()}.json"
        )

    # same tuned session as bench.py (1MB parquet splits keep all
    # cores busy on the single-file local fixtures; AQE on) so the
    # absolute numbers are comparable to the per-round bench artifact
    from lichess_db_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("bench-scale")
    spark.sparkContext.setLogLevel("ERROR")

    from lichess_db_spark.operators import dedup as dd

    if args.family == "text":
        def _docs(spark_, sf, f_, path_):
            scaled_docs(spark_, sf, f_, path_, salt_mode=args.salt_mode)

        def _suffix_readout(d):
            from lichess_db_spark.plans.catalog_staged import (
                _suffix_tier_readout,
            )

            return _suffix_tier_readout(d)

        build, table = _docs, "documents"
        ops = {
            "exact_dedup_groups": lambda d, f: dd.exact_dedup_groups(d),
            "minhash_dedup_pairs": lambda d, f: dd.minhash_dedup_pairs(
                d, threshold=0.5
            ),
            "exact_substring_dedup": lambda d, f: dd.exact_substring_dedup(d, k=10),
            "exact_substring_clean": lambda d, f: dd.exact_substring_clean(d, k=10),
            # r14: the suffix-array repeat-tier entry (pruned prefix
            # doubling, 7 pow2 levels 8..512). Cost model: the seed +
            # low tiers are corpus-sized window aggregates (linear);
            # levels 32+ hold only currently-duplicated positions, so
            # with the salted corpus's constant dup fraction the level
            # relations scale linearly too — expected alpha ~1 with
            # the per-level constants amortizing (alpha < 1) as volume
            # grows past scheduling overhead
            "suffix_repeat_tiers": lambda d, f: _suffix_readout(d),
            # CDC chunk dedup (r11): O(len) md5 boundary predicates per
            # doc inside ONE codegen array expression (no per-position
            # explode), then the digest-keyed dedup aggregate. The
            # md5-per-position cost is the oracle-exact shape the entry
            # documents (gear-hash Arrow kernel is the production
            # swap); this cell pins its fitted exponent.
            "cdc_chunk_dedup": lambda d, f: dd.cdc_chunk_report(d),
            # source-pair TV matrix (r11): token-salt replicas grow the
            # VOCAB ~linearly with f, so the shared-token self-join and
            # the complement arithmetic both scale with V x S(S-1)/2 —
            # the cell pins that the decomposition (no V x S zero-fill
            # grid) holds sub-quadratic as vocabulary grows. Inline =
            # the catalog shape minus the slot persist (harness clears
            # caches per sample).
            "source_unigram_tv": lambda d, f: _tv_cell(d),
            # winnowing (r11 s2): map-only selection in codegen array
            # expressions (one md5 per gram, window mins over the
            # pre-projected key array) + one explode of the ~0.4x
            # selected fraction — expect alpha ~1 with a flat constant
            "winnow_fingerprints": lambda d, f: dd.winnow_fingerprints(
                d, k=8, w=4
            ),
            # MOSS pairing (r11 s2): posting shuffle + count-first cap
            # + cap-bounded fp self-join; token salt keeps the
            # cross-replica fp space disjoint so pairs grow linearly
            "winnow_match_pairs": lambda d, f: dd.winnow_match_pairs(
                d, k=16, w=4, min_shared=8, max_docs_per_fp=16
            ),
            # sorted-neighborhood (r11 s2): distributed rank (range
            # exchange) + w-fold equi-join on rank+delta — n log n
            # sort cost, linear pair verify
            "dedup_sorted_neighborhood": lambda d, f: dd.sorted_neighborhood_pairs(
                d, window=4, key_chars=24
            ),
        }

        def _tv_cell(d):
            from pyspark.sql import functions as F

            # scaled_docs (keep_all=False) carries only doc_id+text;
            # derive a stable 20-source partition so S stays fixed
            # while the vocabulary grows with the replica factor —
            # vocab growth is the axis this cell measures
            d = d.withColumn(
                "source", F.concat(F.lit("src"), (F.col("doc_id") % 20))
            )
            c = (
                d.where(F.col("text").isNotNull())
                .select("source", F.explode(F.split("text", " ")).alias("t"))
                .groupBy("source", "t")
                .agg(F.count("*").alias("n"))
                .persist()
            )
            tot = c.groupBy("source").agg(F.sum("n").cast("bigint").alias("tN"))
            ca = c.select(
                F.col("source").alias("src_a"),
                F.col("t").alias("ta"),
                F.col("n").alias("cna"),
            )
            cb = c.select(
                F.col("source").alias("src_b"),
                F.col("t").alias("tb"),
                F.col("n").alias("cnb"),
            )
            tota = tot.select(F.col("source").alias("pa"), F.col("tN").alias("na"))
            totb = tot.select(F.col("source").alias("pb"), F.col("tN").alias("nb"))
            sagg = (
                ca.join(
                    cb,
                    (F.col("ta") == F.col("tb")) & (F.col("src_a") < F.col("src_b")),
                )
                .join(F.broadcast(tota), F.col("pa") == F.col("src_a"))
                .join(F.broadcast(totb), F.col("pb") == F.col("src_b"))
                .groupBy("src_a", "src_b")
                .agg(
                    F.sum(
                        F.abs(F.col("cna") * F.col("nb") - F.col("cnb") * F.col("na"))
                    )
                    .cast("bigint")
                    .alias("s_abs"),
                    F.sum("cna").cast("bigint").alias("sa"),
                    F.sum("cnb").cast("bigint").alias("sb"),
                )
            )
            pairs = (
                tota.crossJoin(totb)
                .where(F.col("pa") < F.col("pb"))
                .select("pa", "pb", "na", "nb")
            )
            j = pairs.join(
                sagg,
                (F.col("src_a") == F.col("pa")) & (F.col("src_b") == F.col("pb")),
                "left",
            )
            num = (
                F.coalesce(F.col("s_abs"), F.lit(0))
                + (F.col("na") - F.coalesce(F.col("sa"), F.lit(0))) * F.col("nb")
                + (F.col("nb") - F.coalesce(F.col("sb"), F.lit(0))) * F.col("na")
            )
            return j.select(
                F.col("pa").alias("src_a"),
                F.col("pb").alias("src_b"),
                num.cast("bigint").alias("tv_num"),
                (
                    num.cast("double")
                    / (F.lit(2) * F.col("na") * F.col("nb")).cast("double")
                ).alias("tv_distance"),
            )
    elif args.family == "curation":
        from pyspark.sql import functions as F

        from lichess_db_spark.multimodal.media import ahash_images, audio_fingerprints
        from lichess_db_spark.operators.curation import (
            dsir_importance,
            pack_sequences,
        )
        from lichess_db_spark.operators.rank import global_rank
        from lichess_db_spark.operators.sampling import (
            priority_sample,
            sample_token_budget,
        )

        def _keep_all_docs(spark_, sf, f_, path_):
            scaled_docs(
                spark_, sf, f_, path_, keep_all=True, salt_mode=args.salt_mode
            )

        build, table = _keep_all_docs, "documents"

        def _viralize(d):
            """Every 5th doc becomes ONE constant blob — a single
            signature owning 20% of the corpus (the viral-image hot
            key the bucket cap exists for)."""
            return d.select(
                "doc_id",
                F.encode(
                    F.when(
                        F.col("doc_id") % 5 == 0,
                        F.lit("the same viral meme image bytes " * 20),
                    ).otherwise(F.col("text")),
                    "UTF-8",
                ).alias("data"),
            )

        def _viralize_audio(d):
            """Every 5th doc becomes ONE constant multi-window byte
            blob — the audio analogue of _viralize: a single window
            fingerprint (x5 windows per track) owning 20% of the
            corpus, the hot-bucket regime the bucket cap exists for."""
            return d.select(
                "doc_id",
                F.encode(
                    F.when(
                        F.col("doc_id") % 5 == 0,
                        F.lit("the same viral waveform byte span " * 100),
                    ).otherwise(F.col("text")),
                    "UTF-8",
                ).alias("data"),
            )

        def _postcap_pairs(sigs, n_bits=64, bands=4, max_hamming=3, cap=256):
            """The r9 pairing shape, inlined for the A/B cell only:
            groupBy -> collect_list materializes EVERY bucket (the hot
            one included), THEN the size filter drops over-cap buckets
            — measuring exactly what the r10 pre-cap removes."""
            seg = n_bits // bands
            banded = sigs.select(
                F.col("doc_id").alias("__id"),
                F.col("phash").alias("__sig"),
                F.posexplode(
                    F.array(
                        *[
                            F.substring("phash", b * seg + 1, seg)
                            for b in range(bands)
                        ]
                    )
                ).alias("__b", "__key"),
            )
            buckets = banded.groupBy("__b", "__key").agg(
                F.sort_array(F.collect_list(F.struct("__id", "__sig"))).alias("ms")
            )
            cand = (
                buckets.where((F.size("ms") > 1) & (F.size("ms") <= cap))
                .select(
                    F.explode(
                        F.flatten(
                            F.transform(
                                F.sequence(F.lit(0), F.size("ms") - 2),
                                lambda i: F.transform(
                                    F.slice(F.col("ms"), i + 2, F.size("ms")),
                                    lambda m: F.struct(
                                        F.element_at(F.col("ms"), i + 1).alias("a"),
                                        m.alias("b"),
                                    ),
                                ),
                            )
                        )
                    ).alias("p")
                )
                .select(
                    F.col("p.a.__id").alias("id_lo"),
                    F.col("p.b.__id").alias("id_hi"),
                    F.col("p.a.__sig").alias("__s1"),
                    F.col("p.b.__sig").alias("__s2"),
                )
                .distinct()
            )
            return (
                cand.withColumn(
                    "hamming",
                    dd.bitstring_hamming(F.col("__s1"), F.col("__s2"), n_bits),
                )
                .where(F.col("hamming") <= max_hamming)
                .select("id_lo", "id_hi", "hamming")
            )

        def _w(d):
            return d.withColumn(
                "w", F.size(F.split("text", " ")).cast("bigint")
            )

        ops = {
            # TeraSort-style range exchange + per-partition offsets —
            # the scalable global order (single-partition windows are
            # the anti-pattern this operator exists to avoid)
            "global_shuffle_rank": lambda d, f: global_rank(
                d.select(
                    "doc_id",
                    F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit("-s"))).alias("h"),
                ),
                F.col("h"),
                F.col("doc_id"),
            ),
            # one running-sum window per lang stream
            "pack_sequences_lang": lambda d, f: pack_sequences(d, seq_len=2048),
            # top-k via TakeOrderedAndProject + one k-row window
            "priority_sample_topk": lambda d, f: priority_sample(
                _w(d), "doc_id", "w", k=10_000
            ),
            # distributed prefix sum (range exchange + offset fold);
            # budget scales with f so the fill depth stays proportional
            "sample_token_budget": lambda d, f: sample_token_budget(
                _w(d), "doc_id", "w", budget=30_000 * f
            ),
            # DSIR (r9): exploded n-gram scan -> bounded 1024-bucket
            # count agg broadcast back -> one doc-keyed exchange; the
            # replica token salt grows the BUCKET collision mix but the
            # bucket relation stays fixed-size, so the design predicts
            # linear-or-below
            "dsir_importance": lambda d, f: dsir_importance(
                d, target_pred=F.col("lang") == "en"
            ),
            # DSIR RESAMPLING (r9): the weight passes + one
            # TakeOrderedAndProject; k scales with f so the cut depth
            # stays proportional
            "dsir_resample": lambda d, f: priority_sample(
                dsir_importance(d, target_pred=F.col("lang") == "en"),
                "doc_id",
                "score_scaled",
                k=1000 * f,
            ),
            # Heaps-law vocab curve (r9): one exploded scan feeding the
            # first-occurrence min-agg (vocab-sized: the token salt
            # grows vocab ~linearly with replicas) + volume counts
            "vocab_growth": lambda d, f: (
                lambda tok: (
                    tok.groupBy("t")
                    .agg(F.min("doc_id").alias("first_doc"))
                    .crossJoin(
                        F.broadcast(tok.agg(F.max("doc_id").alias("mx")))
                    )
                    .where(F.col("first_doc") * 2 <= F.col("mx"))
                    .agg(F.count("*").alias("vocab_at_half"))
                )
            )(d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))),
            # pHash image dedup (r9): map-only aHash signature pass +
            # one (band, key) exchange + candidate-only Hamming verify;
            # salted replicas share no bytes, so candidate volume per
            # replica is constant by construction. r10: signatures are
            # PERSISTED per the operator contract (both catalog
            # entries do; the count-first pre-cap reads the banded
            # relation twice, and without the cache that doubles the
            # Arrow kernel — the harness clearCaches per sample, so
            # the persist cost itself is inside the timing).
            "mm_phash_dedup": lambda d, f: dd.bitstring_near_dup_pairs(
                ahash_images(
                    d.select("doc_id", F.encode("text", "UTF-8").alias("data")),
                    use_real=False,
                ).persist(),
                max_hamming=3,
                bands=4,
            ),
            # A/B pair for the r10 pre-cap fix on a VIRAL corpus (run
            # with --salt-mode bytes so the baseline pairing work stays
            # small and the hot-key handling dominates): every 5th doc
            # is replaced by one constant text, so ONE signature owns
            # 20% of the corpus — f*1000 copies, far over the 256 cap.
            # precap = the shipped shape (over-cap keys dropped
            # map-side before collect_list); postcap = the r9 shape
            # reimplemented inline for measurement (collect the hot
            # bucket, THEN filter it out) — the straggler/OOM pattern
            # the r9 VERDICT flagged weak.
            "mm_phash_viral_precap": lambda d, f: dd.bitstring_near_dup_pairs(
                ahash_images(_viralize(d), use_real=False).persist(),
                max_hamming=3,
                bands=4,
            ),
            "mm_phash_viral_postcap": lambda d, f: _postcap_pairs(
                ahash_images(_viralize(d), use_real=False).persist()
            ),
            # Audio-fingerprint tier under VIRAL duplication (VERDICT
            # r10 item 4): the fixture's band buckets max out at 31 —
            # nothing exercised the 4-band/64-bit config with the cap
            # BINDING. Every 5th doc becomes one constant ~3.4 KB byte
            # span (5 overlapping 1024/512 windows, all five hashing
            # identically), so ONE window fingerprint owns 20% of the
            # corpus x 5 windows/track: f*1000 window rows per band
            # bucket at x1, 64x that at the top factor — far over the
            # 256 cap at every factor. Measures the shipped count-first
            # pre-cap on the composite-(track,window)-id relation; the
            # catalog entry's exact pairing config (n_bits=64,
            # max_hamming=3, bands=4), signatures persisted per the
            # operator contract.
            "audio_fp_viral_precap": lambda d, f: dd.bitstring_near_dup_pairs(
                audio_fingerprints(_viralize_audio(d))
                .select(
                    (F.col("doc_id") * 100000 + F.col("window_idx")).alias(
                        "wid"
                    ),
                    "afp",
                )
                .persist(),
                sig_col="afp",
                id_col="wid",
                n_bits=64,
                max_hamming=3,
                bands=4,
            ),
            # r13: the PRODUCTION audio config since the wide-signature
            # fix — 128-bit dHash++aHash windows, 4 x 32-bit band keys
            # (the audio tier's window fan-out n_bytes/hop exceeds the
            # video tier whose 16-bit keys measurably saturated)
            "audio_fp_viral_precap_wide": lambda d, f: dd.bitstring_near_dup_pairs(
                audio_fingerprints(_viralize_audio(d), wide=True)
                .select(
                    (F.col("doc_id") * 100000 + F.col("window_idx")).alias(
                        "wid"
                    ),
                    "afp",
                )
                .persist(),
                sig_col="afp",
                id_col="wid",
                n_bits=128,
                max_hamming=3,
                bands=4,
            ),
            # Video tier under VIRAL duplication (VERDICT r11 item 5):
            # the most expensive driver entry (frame explode x aHash x
            # shared Hamming kit) gets its duplication-stress exponent.
            # Every 5th doc becomes ONE constant ~3.4 KB text, so its
            # 4 evenly-spaced frame byte-spans are identical across all
            # re-uploads — FOUR frame signatures each owning 20% of the
            # corpus x f*1000 copies, far over the 256 cap at every
            # factor, with the frame fan-out multiplying the hot-key
            # row count 4x relative to the audio cell. Exact catalog
            # composition: frame_sample -> span slice -> aHash ->
            # count-first pre-cap pairing -> track-level aggregation.
            "video_fp_viral_precap": lambda d, f: _video_viral_pairs(d),
            # The mitigation cell for the 64-bit tier's measured
            # super-linearity (alpha 1.24 at 64x): the 4-band/16-bit
            # key space (2^16 keys/band) SATURATES under the frame
            # fan-out — measured 259k of 262k possible (band, key)
            # values occupied at 64x, under-cap candidate pairs
            # growing 72x for an 8x corpus (birthday collisions on
            # uniform-random stub signatures), every one rejected by
            # the Hamming verify. Widening the band key is the scale
            # knob: a 128-bit signature (aHash ++ dHash, both real
            # perceptual-hash rules from the same kit) banded 4 x
            # 32-bit keeps the pigeonhole guarantee (4 bands >
            # max_hamming 3) and lifts the key space to 2^32/band.
            "video_fp_viral_precap_wide": lambda d, f: _video_viral_pairs(
                d, wide=True
            ),
            # KMV distinct sketch (r12): one distinct-hash aggregation
            # + a per-group rank window that Spark 4 runs through the
            # partial/final WindowGroupLimit pair (top-k pruned BEFORE
            # the exchange, so only k rows per group cross the wire) —
            # the map-side-prune claim gets its fitted exponent.
            # Group = lang (bounded), value = text: hash cardinality
            # scales with the corpus while state stays k x |langs|.
            "kmv_lang_sketch": lambda d, f: _kmv_cell(d),
            # passage-duplication growth curve (r10): the catalog
            # entry's exact single-pass shape — one 8-gram exploded
            # scan into ONE gram-keyed aggregate carrying the
            # first-occurrence doc + per-prefix volume counts, then a
            # vocab-sized second aggregate. The most expensive entry
            # in the r9 suite (3.08 s) gets its fitted exponent.
            "passage_dup_curve": lambda d, f: _passage_curve(d),
            # connected components over chain graphs whose DIAMETER
            # grows with scale (~2*sqrt(f): 4/7/18-long chains at
            # 1/8/64) — the r9 localCheckpoint-every-5 lineage cut
            # measured, not just the OOM anecdote: the top factor
            # crosses the cut 3 times; per-round cost stays flat and
            # the driver survives where the uncut plan tree grew
            # 2^rounds. Super-linear alpha is BY DESIGN here (work ~
            # nodes x diameter); the cell watches the per-round shape.
            "cc_chain_diameter": lambda d, f: dd.connected_components(
                _chain_edges(d.sparkSession, 5000 * f, int(2 * f**0.5) + 2),
                a_col="a",
                b_col="b",
                max_iter=30,
                strict=True,
            ),
            # LPA communities (r12): FIXED superstep count (3, the
            # catalog config) over chain graphs growing linearly in
            # nodes/edges — one shuffle per superstep, work ~ edges x
            # supersteps, so the expected exponent is ~1 (contrast
            # cc_chain_diameter, whose round count grows with the
            # diameter BY DESIGN).
            "lpa_chain_communities": lambda d, f: _lpa_chains(d.sparkSession, f),
        }

        def _lpa_chains(spark_, f):
            from lichess_db_spark.operators.clustering import label_propagation

            return label_propagation(
                _chain_edges(spark_, 5000 * f, 8),
                steps=3,
                src_col="a",
                dst_col="b",
            )

        def _kmv_cell(d):
            from lichess_db_spark.operators.aggregates import kmv_sketch

            return kmv_sketch(d, "lang", "text", k=64)

        def _video_viral_pairs(d, wide=False):
            from lichess_db_spark.multimodal.media import frame_sample

            vt = d.select(
                "doc_id",
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.lit("the same viral video byte span " * 110),
                )
                .otherwise(F.col("text"))
                .alias("text"),
            )
            blobs = vt.select(
                "doc_id", "text", F.encode("text", "UTF-8").alias("data")
            )
            frames = frame_sample(blobs, max_frames=4, stride_bytes=256)
            nf = F.least(
                F.lit(4).cast("bigint"),
                F.lit(1) + (F.col("n_bytes") / F.lit(256)).cast("bigint"),
            )
            span = F.floor(F.col("n_bytes") / nf)
            frame_blobs = frames.join(vt.select("doc_id", "text"), "doc_id").select(
                (F.col("doc_id") * 100 + F.col("frame_idx")).alias("fid"),
                F.encode(
                    F.substring(
                        "text",
                        (F.col("byte_offset") + 1).cast("int"),
                        span.cast("int"),
                    ),
                    "UTF-8",
                ).alias("data"),
            )
            # wide=True is the PRODUCTION path since r13: single-pass
            # 128-bit aHash++dHash kernel (method="ahash_dhash"), not
            # the r12 mitigation cell's join-of-two-passes shape
            method = "ahash_dhash" if wide else "ahash"
            n_bits = 128 if wide else 64
            fsig = ahash_images(
                frame_blobs, id_col="fid", use_real=False, method=method
            ).select(
                F.col("doc_id").alias("fid"), F.col("phash").alias("vfp")
            ).persist()
            pairs = dd.bitstring_near_dup_pairs(
                fsig,
                sig_col="vfp",
                id_col="fid",
                n_bits=n_bits,
                max_hamming=3,
                bands=4,
            )
            return (
                pairs.select(
                    F.floor(F.col("id_lo") / 100).alias("track_lo"),
                    F.floor(F.col("id_hi") / 100).alias("track_hi"),
                    "hamming",
                )
                .where(F.col("track_lo") != F.col("track_hi"))
                .groupBy("track_lo", "track_hi")
                .agg(
                    F.count("*").cast("bigint").alias("n_frame_matches"),
                    F.min("hamming").cast("bigint").alias("min_hamming"),
                )
            )

        def _chain_edges(spark_, n_nodes, chain_len):
            return spark_.range(n_nodes).select(
                F.col("id").alias("a"), (F.col("id") + 1).alias("b")
            ).where(F.col("id") % chain_len != chain_len - 1)

        def _passage_curve(d):
            ts = F.split("text", " ")
            gram_arr = F.when(
                F.size(ts) >= 8,
                F.transform(
                    F.sequence(F.lit(1), F.size(ts) - 7),
                    lambda i: F.md5(F.array_join(F.slice(ts, i, 8), " ")),
                ),
            ).otherwise(F.array().cast("array<string>"))
            grams = d.select("doc_id", F.explode(gram_arr).alias("gk"))
            marks = (10, 25, 50, 100)
            mx = d.where(F.size(ts) >= 8).agg(F.max("doc_id").alias("mx"))
            per_gram = (
                grams.crossJoin(F.broadcast(mx))
                .groupBy("gk")
                .agg(
                    F.min("doc_id").alias("first_doc"),
                    F.max("mx").alias("mx"),
                    *[
                        F.sum(
                            F.when(
                                F.col("doc_id") * 100 <= F.col("mx") * F.lit(p), 1
                            ).otherwise(0)
                        ).alias(f"c{p}")
                        for p in marks
                    ],
                )
            )
            marks_df = d.sparkSession.range(1).select(
                F.explode(F.array(*[F.lit(p) for p in marks])).alias("pct")
            )
            return (
                per_gram.crossJoin(F.broadcast(marks_df))
                .groupBy("pct")
                .agg(
                    F.sum(
                        F.when(F.col("pct") == 10, F.col("c10"))
                        .when(F.col("pct") == 25, F.col("c25"))
                        .when(F.col("pct") == 50, F.col("c50"))
                        .otherwise(F.col("c100"))
                    ).alias("n_grams"),
                    F.sum(
                        F.when(
                            F.col("first_doc") * 100
                            <= F.col("mx") * F.col("pct"),
                            1,
                        ).otherwise(0)
                    ).alias("n_distinct"),
                )
            )
    elif args.family == "oltp":
        build, table = scaled_tpch, None
        from lichess_db_spark.plans import QUERIES as CATQ

        def _catq(name):
            return lambda d, f: CATQ[name].build(spark, d)

        ops = {
            n: _catq(n)
            for n in (
                "q1_pricing_summary",       # pure scan + hash agg
                "q9_profit_by_nation_year",  # multi-join, broadcast dims
                "q18_large_orders",          # agg -> semi filter -> join
                "incremental_agg_orders",    # MV delta merge
                # r11 s2: replicated orders duplicate each order's item
                # set, so the distinct co-purchase EDGE set stays
                # constant while wedge volume grows N-fold — the cell
                # measures the edge-derivation dedup under fact growth,
                # with the 3 LPA supersteps a constant term on top
                "label_prop_communities",
                # r13: k-core shares LPA's derivation (constant edge
                # set under fact growth); the 3 peel rounds on top are
                # per-round-checkpointed id-pair relations, so the
                # fitted exponent should track the wedge dedup like
                # LPA's (alpha 0.25 at 64x)
                "kcore_copurchase",
                # r11 s2: (cust, part) pair set constant, qty sums grow
                # — pure map-side-combine scaling on the fact join
                "als_user_factors",
                # r11 s2 (events axis): filter build constant, probe
                # side scans N-fold more events map-only
                "bloom_prefilter_join",
                # r11 s2 (events axis): hourly series N-fold LONGER
                # (calendar growth), lag join stays calendar-bounded
                "events_autocorr_lags",
                # r11 s2 (events axis): distinct users grow N-fold;
                # WindowGroupLimit prunes to k rows per type map-side
                "kmv_distinct_users",
                # r11 s2 (events axis): two rank windows over the
                # type-keyed exchange at N-fold volume
                "stats_mad_by_type",
                # r11 s2 wave 3: distributed prefix-sum classification
                # over the dimension-sized per-part aggregate
                "orders_abc_analysis",
                # r11 s2 wave 3: recursion depth CONSTANT (64-char
                # prefix cap) while doc count grows N-fold — the cell
                # pins that rCTE iteration overhead is flat, volume
                # rides inside each iteration
                "wordpiece_prefix_segment",
                # r11 s2 wave 3: replicated orders duplicate item sets,
                # so the distinct edge relation is constant and the
                # cost measured is path enumeration + dedup under
                # N-fold wedge volume
                "recursive_cte_reachability",
            )
        }

        def _ce(d, mode):
            from pyspark.sql import functions as F

            from lichess_db_spark.io import load_table
            from lichess_db_spark.plans.catalog_scale import _copurchase_edges

            li = load_table(spark, d, "lineitem").select(
                "l_orderkey", "l_partkey"
            )
            if mode == "join":
                return _copurchase_edges(li)
            # grouped: ONE exchange of the base fact (groupBy orderkey,
            # bounded collect_set — TPC-H orders cap at 7 items) then
            # map-side pair expansion; the wedge-volume DISTINCT term
            # is unchanged, so any alpha gap vs the join shape is pure
            # exchange count, not asymptotics
            items = li.groupBy("l_orderkey").agg(
                F.sort_array(F.collect_set("l_partkey")).alias("its")
            )
            return (
                items.select(F.posexplode("its").alias("i", "src"), "its")
                .select(
                    "src",
                    F.explode(
                        F.expr("slice(its, i + 2, size(its))")
                    ).alias("dst"),
                )
                .distinct()
            )

        # r14 (VERDICT r13 item 5): the edge-DERIVATION term every
        # co-purchase graph entry (CC/LPA/PageRank/BFS/triangles/
        # k-core) pays before its own supersteps, isolated: _join is
        # the shipped _copurchase_edges (self-join on orderkey, two
        # base exchanges, wedge-volume DISTINCT with map-side partial
        # dedup), _grouped swaps the self-join for a per-order
        # collect_set + slice/explode pair expansion (one base
        # exchange, same DISTINCT term)
        ops["copurchase_edges_join"] = lambda d, f: _ce(d, "join")
        ops["copurchase_edges_grouped"] = lambda d, f: _ce(d, "grouped")
    else:
        from pyspark.sql import functions as F

        from lichess_db_spark.operators.similarity import matryoshka_topk, mmr_topk

        build, table = scaled_embeddings, "embeddings"
        ops = {
            # fixed k: sum_c n_c^2 pair work grows quadratically with
            # volume — the documented FAILURE mode of running SemDeDup
            # with a constant cluster count
            "semdedup_fixed_k8": lambda d, f: dd.semdedup(
                d, k=8, eps=0.3, use_arrow=True
            ),
            # the paper's recipe: k grows with the corpus so clusters
            # keep a bounded population -> linear pair work
            "semdedup_scaled_k": lambda d, f: dd.semdedup(
                d, k=8 * f, eps=0.3, use_arrow=True
            ),
            # auto-sized hyperplane buckets (n_planes=None): the
            # designed linear path for embedding near-dup
            "embedding_lsh_pairs": lambda d, f: dd.embedding_lsh_dedup_pairs(
                d, n_planes=None
            ),
            # two-stage Matryoshka ANN (r10): fixed 10-query set
            # against the scaled corpus — coarse pass is a broadcast-
            # queries x corpus map-side scan carrying only ids +
            # 16-dim prefixes (the r10 projection fix), so the cell
            # should run linear in corpus volume with a flat
            # per-query constant
            "matryoshka_rerank": lambda d, f: matryoshka_topk(
                d,
                d.where(F.col("vec_id") < 10),
                k=5,
                prefix_dim=16,
                overfetch=50,
            ),
            # MMR diversification (r10): pool cut + pairwise sims are
            # eagerly checkpointed, so the greedy chain is O(pool^2)
            # driver-bounded work and the corpus is scanned exactly
            # twice — the cell should be flat-plus-linear-scan
            "mmr_rerank": lambda d, f: mmr_topk(
                d, d.where(F.col("vec_id") < 10), k=3, pool=20, lam=0.7
            ),
            # top-PC power iteration (r11): the Gramian pass explodes
            # n x d^2 pair rows (the oracle-exact shape the entry
            # documents; an Arrow outer-product kernel is the 100 TB
            # swap) — the cell pins that cost honestly: alpha ~1 in
            # corpus volume, iterations flat (d^2 rows). Inline shape
            # = the catalog builder minus the slot persist (the
            # harness clears caches per sample anyway).
            "embedding_top_pc": lambda d, f: _top_pc_cell(d, use_arrow=False),
            # the production Gramian path (r11): per-batch outer-product
            # partials through reused buffers — batches x d^2 exchange
            # rows instead of n x d^2 explode; bit-identical integers
            "embedding_top_pc_arrow": lambda d, f: _top_pc_cell(
                d, use_arrow=True
            ),
            # mutual-kNN quadratic baseline (r11 s2): the documented
            # O(n^2) brute-force build — run at LOW factors only
            # (--factors 1,2,4) to pin alpha ~2 honestly; the linear
            # scale path swaps in the IVF/LSH edge tiers
            "mutual_knn_bruteforce": lambda d, f: _mutual_edges(d),
            # the ANN-built composition (r12, VERDICT r11 item 4): the
            # whole scale path end to end — lsh_self_topk_portable's
            # bucket self-equi-join (auto-scaled plane count keeps
            # expected occupancy ~16, so candidate volume stays
            # ~linear in corpus rows) feeding mutual_filter. This is
            # the cell that replaces mutual_knn_bruteforce's honest
            # quadratic at scale; sign-pattern replica salting keeps
            # within-replica neighbor structure and near-zero
            # cross-replica cosines.
            "mutual_knn_lsh": lambda d, f: _mutual_lsh(d),
            # r13 (VERDICT r12 item 6): the pre-cap's recall/runtime
            # trade at the concentration the 100 TB story assumes.
            # capped = max_bucket_size 256 engaged on the plain
            # sign-salted corpus (cap verified non-binding there: max
            # bucket 181 at 64x — safety must be free);
            # viral_capped = every 5th vector replaced by ONE constant
            # vector, a single signature owning 20% of the corpus in
            # EVERY table (the mass near-dup flood the count-first
            # pre-cap exists for) with the cap engaged;
            # viral_uncapped = the same flood without the cap — run at
            # LOW factors only (--factors 1,8): its candidate volume
            # is (0.2n)^2 by construction.
            "mutual_knn_lsh_capped": lambda d, f: _mutual_lsh(d, cap=256),
            "mutual_knn_lsh_viral_capped": lambda d, f: _mutual_lsh(
                viral_embeddings(d), cap=256
            ),
            "mutual_knn_lsh_viral_uncapped": lambda d, f: _mutual_lsh(
                viral_embeddings(d)
            ),
            # the mutual STEP alone (r11 s2): synthetic n*k edge list
            # (xor partner -> mutual, ring -> asymmetric) through the
            # reversed-key self-join — the design claim is that
            # mutuality is LINEAR in edges regardless of the kNN tier
            "mutual_knn_step": lambda d, f: _mutual_step(d),
        }

        def _mutual_edges(d):
            from lichess_db_spark.operators.similarity import mutual_knn_edges

            return mutual_knn_edges(d, k=4, use_arrow=True)

        def _mutual_lsh(d, cap=None):
            from lichess_db_spark.operators.similarity import (
                lsh_self_topk_portable,
                mutual_filter,
            )

            edges = lsh_self_topk_portable(
                d, k=4, max_bucket_size=cap
            ).localCheckpoint(eager=True)
            return mutual_filter(edges)

        def _mutual_step(d):
            ids = d.select(F.col("vec_id").alias("query_id"))
            e = ids.select(
                "query_id",
                F.explode(F.sequence(F.lit(1), F.lit(4))).alias("j"),
            ).select(
                "query_id",
                F.when(
                    F.col("j") == 1,
                    F.col("query_id").bitwiseXOR(F.lit(1)),
                )
                .otherwise(F.col("query_id") + F.col("j"))
                .alias("neighbor_id"),
                F.lit(0.5).alias("score"),
                F.col("j").cast("int").alias("rank"),
            ).localCheckpoint(eager=True)
            back = e.select(
                F.col("neighbor_id").alias("query_id"),
                F.col("query_id").alias("neighbor_id"),
                F.col("rank").alias("rank_back"),
            )
            return e.join(back, ["query_id", "neighbor_id"]).select(
                "query_id", "neighbor_id", "score", "rank", "rank_back"
            )

        def _top_pc_cell(emb, use_arrow):
            from lichess_db_spark.operators.clustering import gramian_exact_arrow

            if use_arrow:
                g = gramian_exact_arrow(emb)
            else:
                pairs = emb.select(
                    F.posexplode("embedding").alias("i0", "xi"), "embedding"
                ).select("i0", "xi", F.posexplode("embedding").alias("j0", "xj"))
                g = pairs.groupBy(
                    (F.col("i0") + 1).alias("i"), (F.col("j0") + 1).alias("j")
                ).agg(
                    F.sum(
                        F.round(
                            F.col("xi").cast("double")
                            * F.col("xj").cast("double")
                            * F.lit(1e12)
                        ).cast("bigint")
                    )
                    .cast("bigint")
                    .alias("gv")
                )
            g1 = g.select("i", "j", F.expr("gv div 1000000").alias("g1")).persist()
            spark_ = emb.sparkSession
            v = spark_.range(1, 65).select(
                F.col("id").cast("bigint").alias("pos"),
                F.lit(125000).cast("bigint").alias("v"),
            )
            for _ in range(3):
                w = (
                    g1.join(v, g1["j"] == v["pos"])
                    .groupBy("i")
                    .agg(F.sum(F.col("g1") * F.col("v")).cast("bigint").alias("w"))
                )
                nrm = w.agg(
                    F.sqrt(
                        F.sum(
                            F.col("w").cast("decimal(38,0)")
                            * F.col("w").cast("decimal(38,0)")
                        ).cast("double")
                    ).alias("nrm")
                )
                v = w.crossJoin(F.broadcast(nrm)).select(
                    F.col("i").cast("bigint").alias("pos"),
                    F.round(F.col("w").cast("double") / F.col("nrm") * F.lit(1e6))
                    .cast("bigint")
                    .alias("v"),
                )
            return v

    if args.ops:
        wanted = set(args.ops.split(","))
        unknown = wanted - set(ops)
        if unknown:
            ap.error(f"unknown ops for family {args.family}: {sorted(unknown)}")
        ops = {n: fn for n, fn in ops.items() if n in wanted}

    report: dict = {
        "family": args.family,
        "note": (
            "replica-scaled sf0.1 corpus (per-replica salt — token "
            "prefix for documents, sign pattern for embeddings — keeps "
            "the duplication rate constant, zero cross-replica dups); "
            "median of kept samples per cell; alpha = fitted scaling "
            "exponent log(t_hi/t_lo)/log(f_hi/f_lo) between the two "
            "largest factors (1.0 = linear)"
        ),
        "factors": factors,
        "samples": args.samples,
        "cells": {},
        "alpha": {},
    }

    def handle(f: int):
        """What ops consume: an sf-dir path (oltp) or a DataFrame."""
        if table is None:
            return f"{WORKDIR}/x{f}"
        return spark.read.parquet(f"{WORKDIR}/x{f}/{table}.parquet")

    sizes = {}
    for f in factors:
        if table is None:
            path = f"{WORKDIR}/x{f}"
            build(spark, args.sf, f, path)
            n = spark.read.parquet(f"{path}/lineitem.parquet").count()
        else:
            path = f"{WORKDIR}/x{f}/{table}.parquet"
            build(spark, args.sf, f, path)
            n = spark.read.parquet(path).count()
        sizes[f] = n
    report["rows"] = {str(f): sizes[f] for f in factors}
    report["salt_mode"] = args.salt_mode

    for name, fn in ops.items():
        report["cells"][name] = {}
        # one untimed warmup at the smallest factor: first execution
        # pays whole-stage codegen compilation + Python/Arrow worker
        # startup, which would otherwise land in the x1 cell and
        # flatten the fitted exponent
        fn(handle(factors[0]), factors[0]).write.mode("overwrite").format(
            "noop"
        ).save()
        for f in factors:
            docs = handle(f)
            ts = []
            for _ in range(args.samples):
                spark.catalog.clearCache()
                t0 = time.time()
                # noop sink (same execution mode as bench.py): full
                # materialization — count() would let Catalyst
                # ELIMINATE the final left join (aggregate right side
                # is unique on the key and contributes no columns),
                # silently benching a truncated plan
                fn(docs, f).write.mode("overwrite").format("noop").save()
                ts.append(round(time.time() - t0, 3))
            ts.sort()
            report["cells"][name][str(f)] = {
                "median_s": ts[len(ts) // 2],
                "samples": ts,
            }
            print(f"{name} x{f}: {ts}", flush=True)
        lo, hi = factors[-2], factors[-1]
        t_lo = report["cells"][name][str(lo)]["median_s"]
        t_hi = report["cells"][name][str(hi)]["median_s"]
        report["alpha"][name] = round(
            math.log(t_hi / t_lo) / math.log(hi / lo), 3
        )

    with open(args.json, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({k: report["alpha"][k] for k in ops}))
    shutil.rmtree(WORKDIR, ignore_errors=True)


if __name__ == "__main__":
    main()
