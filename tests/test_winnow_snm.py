"""Winnowing (MOSS), sorted-neighborhood and mutual-kNN properties.

The driver-facing catalog entries are oracle-hashed by driver_sim /
tests/test_catalog_oracle.py; these tests pin the ALGORITHMIC
contracts the hash alone can't see:

- winnowing selection == an independent pure-Python twin (same md5
  hashes, same min-with-rightmost-tie rule), incl. the all-ties text
  that isolates the tie-break;
- the paper's guarantee: a shared substring of length >= w + k - 1
  always yields a shared fingerprint;
- density lands in the expected 2/(w+1) band on real fixture text;
- sorted-neighborhood pairs are exactly the rank-window pairs and an
  exact duplicate is always caught with is_dup;
- mutual-kNN edges are symmetric with consistent back-ranks, and a
  planted far-away vector is flagged isolated.
"""

from __future__ import annotations

import hashlib

import pytest

from lichess_db_spark.operators.dedup import (
    sorted_neighborhood_pairs,
    winnow_fingerprints,
    winnow_match_pairs,
)
from lichess_db_spark.operators.similarity import knn_isolation, mutual_knn_edges

from .conftest import SF_SMALL


def _py_winnow(text: str, k: int = 8, w: int = 4) -> set[tuple[int, int]]:
    """Independent reference: (fp, pos) selected by robust winnowing."""
    n_k = len(text) - k + 1
    if n_k < w:
        return set()
    hv = [
        int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(n_k)
    ]
    out = set()
    for j in range(n_k - w + 1):
        # min hash, rightmost position on ties
        best = min(range(j, j + w), key=lambda i: (hv[i], -i))
        out.add((hv[best], best + 1))
    return out


def _spark_fps(spark, rows, k=8, w=4):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = winnow_fingerprints(df, k=k, w=w).collect()
    by_doc: dict[int, set[tuple[int, int]]] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, set()).add((r.fp, r.pos))
    return by_doc


def test_winnow_matches_python_twin(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "abcdefghijklmnopqrstuvwxyz0123456789",
        "xy " * 30,  # heavy internal repetition
        "short",  # below k: no grams at all
        "elevenchars",  # exactly k + w - 1 = 11 chars at k=8, w=4
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    by_doc = _spark_fps(spark, rows)
    for i, t in enumerate(texts):
        assert by_doc.get(i, set()) == _py_winnow(t), f"doc {i}"


def test_winnow_rightmost_tie_break(spark):
    # all k-grams identical -> every window's min is its RIGHTMOST slot
    t = "a" * 20  # n_k = 13 grams, windows j=1..10 select pos j+3
    by_doc = _spark_fps(spark, [(0, t)])
    assert by_doc[0] == _py_winnow(t)
    assert {p for _, p in by_doc[0]} == set(range(4, 14))


def test_winnow_null_and_short_yield_no_rows(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "tiny"), (2, "abcdefghij")],  # 10 chars < k+w-1
        "doc_id long, text string",
    )
    assert winnow_fingerprints(df, k=8, w=4).count() == 0


def test_winnow_guarantee_shared_span(spark):
    # Schleimer et al. theorem: a shared substring of length >= w+k-1
    # guarantees >= 1 shared selected hash. 11-char shared span inside
    # otherwise-disjoint text.
    span = "GUARANTEED!"  # 11 chars = w + k - 1
    a = "aaaaaaaaaaaaaaa " + span + " bbbbbbbbbbbbbbbb"
    b = "cccccccccccccccccc " + span + " ddddddddddd"
    by_doc = _spark_fps(spark, [(0, a), (1, b)])
    shared = {h for h, _ in by_doc[0]} & {h for h, _ in by_doc[1]}
    assert shared, "w+k-1 shared span must produce a shared fingerprint"


def test_winnow_density_band(spark):
    from lichess_db_spark.io import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, SF_SMALL, "documents").where(F.length("text") >= 100)
    fps = winnow_fingerprints(d, k=8, w=4)
    agg = (
        fps.groupBy("doc_id")
        .count()
        .join(d.select("doc_id", F.length("text").alias("ln")), "doc_id")
        .select((F.col("count") / (F.col("ln") - 10)).alias("density"))
        .agg(F.avg("density").alias("avg"), F.min("density").alias("mn"))
        .first()
    )
    # expected density 2/(w+1) = 0.4; paper lower bound 1.5/(w+1) = 0.3
    assert 0.3 <= agg["avg"] <= 0.55, agg
    assert agg["mn"] >= 1.5 / 5 * 0.8  # slack under the lower bound


def test_winnow_match_pairs_finds_planted_copy(spark):
    base = (
        "the training corpus pipeline deduplicates documents by winnowed "
        "fingerprints selected from sliding windows of gram hashes over "
        "the normalized text body of every ingested record"
    )
    rows = [(0, base), (1, base[: len(base) * 3 // 4]), (2, "zq " * 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_match_pairs(df, k=16, w=4, min_shared=8, max_docs_per_fp=16)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (0, 1) in got
    assert all(2 not in p for p in got)


def test_winnow_match_pairs_cap_drops_common_fp(spark):
    # one 19-char span shared by ALL docs: with the cap below the doc
    # count the fingerprints of that span are dropped and no pair forms
    span = "common boilerplate!"
    rows = [(i, f"{'u' * (i + 1)} {span} {'v' * (i + 2)}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = winnow_match_pairs(df, k=8, w=4, min_shared=1, max_docs_per_fp=3)
    uncapped = winnow_match_pairs(df, k=8, w=4, min_shared=1, max_docs_per_fp=64)
    assert uncapped.count() > 0
    # every fp from the shared span occurs in all 6 docs -> over cap 3
    assert capped.count() < uncapped.count()


def test_winnow_validates_params():
    with pytest.raises(ValueError):
        winnow_fingerprints(None, k=0)
    with pytest.raises(ValueError):
        winnow_match_pairs(None, min_shared=0)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(None, window=0)
    with pytest.raises(ValueError):
        mutual_knn_edges(None, k=0)


def test_snm_pairs_are_exactly_rank_window(spark):
    rows = [(i, f"{chr(97 + i)} token body {i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = sorted_neighborhood_pairs(df, window=3, key_chars=24).collect()
    # blocking key = full ordering by first char here -> rank == doc_id+1
    got = {(r.doc_a, r.doc_b, r.gap) for r in pairs}
    want = {
        (a, a + g, g) for a in range(10) for g in range(1, 4) if a + g < 10
    }
    assert got == want


def test_snm_exact_duplicate_is_caught(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),  # exact dup
        (2, "omega psi chi phi upsilon tau"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b): r for r in sorted_neighborhood_pairs(df).collect()}
    dup = pairs[(0, 1)]
    assert dup.is_dup and dup.inter_tokens == dup.union_tokens == 6
    assert dup.gap == 1  # identical key -> adjacent ranks (id tiebreak)


def test_snm_jaccard_counts_are_set_semantics(spark):
    rows = [
        (0, "a a a b c"),  # distinct tokens {a,b,c}
        (1, "a b b d"),  # distinct tokens {a,b,d}
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = sorted_neighborhood_pairs(df, window=2).collect()[0]
    # duplicates inside a doc never inflate the counts
    assert (r.inter_tokens, r.union_tokens) == (2, 4)
    assert r.is_dup  # 2*2 >= 4: the >= 0.5 boundary is inclusive


def test_snm_jaccard_boundary_is_inclusive(spark):
    rows = [(0, "a b c d"), (1, "a b e f")]  # inter 2, union 6 -> 4 < 6
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = sorted_neighborhood_pairs(df, window=2).collect()[0]
    assert (r.inter_tokens, r.union_tokens, r.is_dup) == (2, 6, False)
    rows2 = [(0, "a b c d"), (1, "a b c e")]  # inter 3, union 5: 6 >= 5
    r2 = sorted_neighborhood_pairs(
        spark.createDataFrame(rows2, "doc_id long, text string"), window=2
    ).collect()[0]
    assert (r2.inter_tokens, r2.union_tokens, r2.is_dup) == (3, 5, True)


def _vec(*xs):
    return [float(x) for x in xs] + [0.0] * (4 - len(xs))


def test_mutual_knn_symmetric_and_consistent(spark):
    from lichess_db_spark.io import load_table

    emb = load_table(spark, SF_SMALL, "embeddings").limit(64)
    edges = mutual_knn_edges(emb, k=3).collect()
    es = {(r.query_id, r.neighbor_id): r for r in edges}
    assert es, "expected some mutual edges"
    for (q, n), r in es.items():
        back = es.get((n, q))
        assert back is not None, "mutual edges must come in both directions"
        assert back.rank == r.rank_back and back.rank_back == r.rank
        assert back.score == r.score  # exact-cosine symmetry survives ROUND


def test_knn_isolation_flags_planted_outlier(spark):
    # two tight 3-vector clusters + one far-off vector: with k=2 each
    # cluster member's top-2 is exactly the other two members (score
    # ties round to 1.0; id tiebreak keeps the set inside the cluster),
    # so clusters are fully mutual while nobody lists the outlier
    rows = (
        [(i, [1.0, float(i) * 1e-4, 0.0, 0.0]) for i in range(3)]
        + [(10 + i, [0.0, 1.0, float(i) * 1e-4, 0.0]) for i in range(3)]
        + [(99, [0.0, 0.0, 0.0, 1.0])]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    iso = {r.vec_id: r for r in knn_isolation(df, k=2).collect()}
    assert len(iso) == 7
    assert iso[99].is_isolated and iso[99].mutual_degree == 0
    for i in (0, 1, 2, 10, 11, 12):
        assert iso[i].mutual_degree == 2 and not iso[i].is_isolated


def test_mutual_knn_arrow_bit_identical(spark):
    """use_arrow=True must select the SAME edges with the SAME scores
    as the interpreted expression path — over every fixture pair (the
    semdedup use_arrow contract, applied to the all-pairs kNN)."""
    from lichess_db_spark.io import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    fast = mutual_knn_edges(emb, k=4, use_arrow=True).collect()
    slow = mutual_knn_edges(emb, k=4, use_arrow=False).collect()
    key = lambda r: (r.query_id, r.neighbor_id)  # noqa: E731
    assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))
    assert len({key(r) for r in fast}) == len(fast)


def test_knn_isolation_degree_matches_edge_list(spark):
    from lichess_db_spark.io import load_table

    emb = load_table(spark, SF_SMALL, "embeddings").limit(50)
    edges = mutual_knn_edges(emb, k=4).collect()
    deg: dict[int, int] = {}
    for r in edges:
        deg[r.query_id] = deg.get(r.query_id, 0) + 1
    iso = {r.vec_id: r.mutual_degree for r in knn_isolation(emb, k=4).collect()}
    assert len(iso) == 50
    for v, d in iso.items():
        assert d == deg.get(v, 0)


def test_kcore_cascade_peels_chain_one_node_per_round(spark):
    """The hand-traced cascade that distinguishes k-core from a plain
    degree filter: a 4-clique with a 3-node chain hanging off it
    (4-5-6-7, using clique node 3 as the anchor via edge 3-5). At
    k=2 the chain END (7, degree 1) dies in round 1, which drops 6
    to degree 1 (dies round 2), which drops 5 (dies round 3) — one
    node per round, exactly ``rounds=3`` to reach the true 2-core
    (the clique, every member at core_degree 3). rounds=1 must stop
    after the first peel (5 and 6 still in)."""
    from lichess_db_spark.operators.clustering import k_core

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(3, 5), (5, 6), (6, 7)]
    edges = spark.createDataFrame(clique + chain, "src long, dst long")

    full = {r.node: (r.core_degree, r.in_core)
            for r in k_core(edges, k=2, rounds=3).collect()}
    assert set(full) == {0, 1, 2, 3, 4, 5, 6, 7} - {4}
    for n in (0, 1, 2, 3):
        assert full[n] == (3, True)
    for n in (5, 6, 7):
        assert full[n] == (0, False)

    one = {r.node: r.in_core for r in k_core(edges, k=2, rounds=1).collect()}
    assert one[7] is False
    assert one[5] is True and one[6] is True

    # every input node is reported exactly once; dropped nodes carry 0
    assert len(full) == 7

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k >= 1"):
        k_core(edges, k=0)
    with _pytest.raises(ValueError, match="rounds >= 1"):
        k_core(edges, rounds=0)


def test_kcore_converged_equals_true_core(spark):
    """On a graph whose peel converges within the round budget, the
    fixed-round output IS the true k-core: survivors all have
    core_degree >= k and one more round changes nothing."""
    from lichess_db_spark.operators.clustering import k_core

    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    spokes = [(0, 100), (1, 101), (2, 102)]
    edges = spark.createDataFrame(clique + spokes, "src long, dst long")
    r2 = {(r.node, r.core_degree, r.in_core)
          for r in k_core(edges, k=3, rounds=2).collect()}
    r3 = {(r.node, r.core_degree, r.in_core)
          for r in k_core(edges, k=3, rounds=3).collect()}
    assert r2 == r3
    for node, deg, in_core in r2:
        if in_core:
            assert deg >= 3 and node < 5


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: after 3 synchronous
    min-tie sweeps every clique member carries its clique's minimum
    label (the bridge is outvoted by within-clique neighbors)."""
    from lichess_db_spark.operators.clustering import label_propagation

    clique_a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    clique_b = [(10 + a, 10 + b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(
        clique_a + clique_b + [(3, 10)], "src long, dst long"
    )
    got = {r.node: r.label for r in label_propagation(edges, steps=3).collect()}
    assert {got[n] for n in (0, 1, 2, 3)} == {0}
    assert {got[n] for n in (10, 11, 12, 13)} == {10}


def test_label_propagation_star_min_tie(spark):
    """A star: leaves see only the hub; the hub sees every leaf once,
    all tied at count 1 -> min-tie picks the smallest leaf label.
    Step-2 state is then a pure function of that choice — pinned
    against the hand-computed synchronous trace."""
    from lichess_db_spark.operators.clustering import label_propagation

    edges = spark.createDataFrame(
        [(100, leaf) for leaf in (5, 7, 9)], "src long, dst long"
    )
    one = {r.node: r.label for r in label_propagation(edges, steps=1).collect()}
    assert one == {5: 100, 7: 100, 9: 100, 100: 5}
    two = {r.node: r.label for r in label_propagation(edges, steps=2).collect()}
    # leaves adopt the hub's step-1 label (5); hub sees three '100's
    assert two == {5: 5, 7: 5, 9: 5, 100: 100}


def test_label_propagation_validates():
    from lichess_db_spark.operators.clustering import label_propagation

    with pytest.raises(ValueError):
        label_propagation(None, steps=0)


def test_autocorr_perfect_periodicity(spark):
    """A strictly 2-hour-periodic hourly count series: autocorr at the
    even lags is exactly +1.0 and at odd lags exactly -1.0 (IEEE
    arithmetic over exact integer moments can represent both)."""
    import datetime as dt

    from lichess_db_spark.plans.catalog import QUERIES

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(48):
        # alternate 2 events / 4 events per hour
        for _ in range(2 if h % 2 == 0 else 4):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=7)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        got = {
            r.lag: r
            for r in QUERIES["events_autocorr_lags"].build(spark, td).collect()
        }
    for lag in (2, 4, 6):
        assert got[lag].autocorr == 1.0, got[lag]
    for lag in (1, 3, 5):
        assert got[lag].autocorr == -1.0, got[lag]
    assert got[1].n_pairs == 47


def test_autocorr_constant_series_is_null(spark):
    import datetime as dt
    import tempfile

    from lichess_db_spark.plans.catalog import QUERIES

    base = dt.datetime(2024, 1, 1)
    rows = [(h, base + dt.timedelta(hours=h)) for h in range(24)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        out = QUERIES["events_autocorr_lags"].build(spark, td).collect()
    assert out and all(r.autocorr is None for r in out)


def test_kmv_mergeability_law(spark):
    """min-k of a union == min-k over concatenated per-partition
    min-k's — the property that makes KMV an MV-grade mergeable
    summary. Also: estimate is exact below k, and within the
    ~1/sqrt(k-2) error band above it."""
    import hashlib

    from lichess_db_spark.operators.aggregates import kmv_sketch

    rows = [("g", i) for i in range(1000)] + [("small", i) for i in range(20)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {r.grp: r for r in kmv_sketch(df, "grp", "v", k=64).collect()}

    # python twin of the sketch for group g
    hv = sorted(
        {
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            for i in range(1000)
        }
    )
    assert got["g"].kth_hash == hv[63]
    assert got["g"].kmv_estimate == 63 * 4294967296.0 / hv[63]
    assert abs(got["g"].kmv_estimate - 1000) / 1000 < 3 / (62**0.5)

    # below k: exact, kth_hash NULL
    assert got["small"].kmv_estimate == 20.0 and got["small"].kth_hash is None

    # mergeability: split the values into 4 parts, take per-part min-64,
    # union the partials, re-sketch -> identical kth hash
    partial = sorted(
        h
        for p in range(4)
        for h in sorted(
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            for i in range(1000)
            if i % 4 == p
        )[:64]
    )
    assert partial[63] == hv[63]


def test_kmv_validates():
    from lichess_db_spark.operators.aggregates import kmv_sketch

    with pytest.raises(ValueError):
        kmv_sketch(None, "g", "v", k=1)


def test_mad_hand_computed(spark):
    """values {1..7, 100}: lower median = 4 (rank 4 of 8); deviations
    {3,2,1,0,1,2,3,96} sorted -> lower median (rank 4) = 2."""
    import tempfile

    from lichess_db_spark.plans.catalog import QUERIES

    from pyspark.sql import functions as F

    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", i, "t", float(v), None)
        for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 100])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        out = QUERIES["stats_mad_by_type"].build(spark, td).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.median_value, r.mad) == (8, 4.0, 2.0)


def test_mad_outlier_resistance(spark):
    """Replacing one value with a huge outlier must not move the MAD
    (50% breakdown), while the exact stddev explodes."""
    import tempfile

    from lichess_db_spark.plans.catalog import QUERIES

    base = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]

    def run(vals):
        rows = [
            (i, f"2024-01-01 00:{i:02d}:00", i, "t", float(v), None)
            for i, v in enumerate(vals)
        ]
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(f"{td}/events.parquet")
            return QUERIES["stats_mad_by_type"].build(spark, td).collect()[0]

    clean = run(base)
    dirty = run(base[:-1] + [1e9])
    assert clean.mad == 2.0
    assert dirty.mad == 2.0  # unmoved by the outlier


def test_bloom_no_false_negatives_and_fpr(spark):
    """Every true member passes (construction guarantee); FPR on
    non-members sits under ~3x the (1-e^(-kn/m))^k theory bound."""
    import math

    from lichess_db_spark.operators.skew import bloom_confusion, bloom_words

    keys = spark.createDataFrame([(i,) for i in range(200)], "key long")
    rows = spark.createDataFrame(
        [(i, i % 500) for i in range(2000)], "event_id long, key long"
    )
    filt = bloom_words(keys, m_bits=1024, k=3)
    out = bloom_confusion(rows, keys, filt, m_bits=1024, k=3).collect()[0]
    assert out.n_false_negatives == 0
    assert out.n_true_members == 2000 * 200 // 500
    fill = 1 - math.exp(-3 * 200 / 1024)
    assert out.false_positive_rate <= 3 * fill**3 + 0.02


def test_bloom_saturated_filter_passes_everything(spark):
    from lichess_db_spark.operators.skew import bloom_confusion, bloom_words

    keys = spark.createDataFrame([(i,) for i in range(5000)], "key long")
    rows = spark.createDataFrame(
        [(i, 100000 + i) for i in range(200)], "event_id long, key long"
    )
    filt = bloom_words(keys, m_bits=64, k=3)  # 2 words, fully saturated
    out = bloom_confusion(rows, keys, filt, m_bits=64, k=3).collect()[0]
    assert out.n_bloom_pass == 200 and out.false_positive_rate == 1.0


def test_bloom_validates():
    from lichess_db_spark.operators.skew import bloom_words

    with pytest.raises(ValueError):
        bloom_words(None, m_bits=100, k=3)  # not divisible by 32
    with pytest.raises(ValueError):
        bloom_words(None, m_bits=1024, k=0)


def test_als_factors_solve_ridge_exactly(spark):
    """The Cramer solve must equal numpy's ridge solution, and any
    perturbation of x must increase the regularized loss (optimality
    of the normal-equations solution)."""
    import tempfile

    import numpy as np

    from lichess_db_spark.plans.catalog import QUERIES

    li = [(1, p, float(q)) for p, q in [(10, 3), (11, 7), (12, 2)]]
    orders = [(1, 42)]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            li, "l_orderkey long, l_partkey long, l_quantity double"
        ).write.parquet(f"{td}/lineitem.parquet")
        spark.createDataFrame(
            orders, "o_orderkey long, o_custkey long"
        ).write.parquet(f"{td}/orders.parquet")
        out = QUERIES["als_user_factors"].build(spark, td).collect()
    assert len(out) == 1
    r = out[0]

    import hashlib

    def f(pk, tag):
        return int(hashlib.md5(f"{pk}{tag}".encode()).hexdigest()[:8], 16) % 19 - 9

    V = np.array([[f(p, "-f1"), f(p, "-f2")] for p in (10, 11, 12)], dtype=float)
    rv = np.array([3.0, 7.0, 2.0])
    A = V.T @ V + np.eye(2)
    b = V.T @ rv
    x = np.linalg.solve(A, b)
    assert abs(r.x1 - x[0]) < 1e-9 and abs(r.x2 - x[1]) < 1e-9
    assert r.det == round(np.linalg.det(A))

    def loss(xv):
        return ((V @ xv - rv) ** 2).sum() + (xv**2).sum()

    base = loss(np.array([r.x1, r.x2]))
    for d in ([0.01, 0], [-0.01, 0], [0, 0.01], [0, -0.01]):
        assert loss(np.array([r.x1, r.x2]) + np.array(d)) > base


def test_kmv_null_values_excluded(spark):
    """NULL values must be excluded BEFORE ranking: a NULL md5 hash
    would rank NULLS-FIRST in Spark but NULLS-LAST in DuckDB, silently
    diverging the kth hash on any corpus with NULL keys."""
    from lichess_db_spark.operators.aggregates import kmv_sketch

    rows = [("g", i if i % 3 else None) for i in range(30)]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = kmv_sketch(df, "grp", "v", k=64).collect()[0]
    # 20 non-null distinct values, all below k -> exact
    assert out.n_hashes == 20 and out.kmv_estimate == 20.0


def test_mutual_filter_pluggable_tiers(spark):
    """mutual_filter over an ANN tier's edge list: wherever the LSH
    tier recalls exactly the brute-force edges, the mutual sets agree
    — the pluggability claim made executable."""
    from lichess_db_spark.io import load_table
    from lichess_db_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk_portable,
        mutual_filter,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").limit(80)
    bf = brute_force_topk(emb, emb, k=3).localCheckpoint(eager=True)
    lsh = lsh_topk_portable(emb, emb, k=3).localCheckpoint(eager=True)
    mb = {(r.query_id, r.neighbor_id) for r in mutual_filter(bf).collect()}
    ml = {(r.query_id, r.neighbor_id) for r in mutual_filter(lsh).collect()}
    bfe = {(r.query_id, r.neighbor_id) for r in bf.collect()}
    le = {(r.query_id, r.neighbor_id) for r in lsh.collect()}
    # queries whose full edge set the LSH tier recalled exactly
    agree = {
        q
        for q in {e[0] for e in bfe}
        if {e for e in bfe if e[0] == q} == {e for e in le if e[0] == q}
    }
    assert agree, "expected some fully-recalled queries"
    for q, n in list(mb):
        if q in agree and n in agree:
            assert (q, n) in ml


def test_containment_catches_subset_jaccard_misses(spark):
    """A short quote fully contained in a long doc: containment 1.0,
    Jaccard far below the 0.5 near-dup bar — the asymmetric detector
    exists precisely for this pair."""
    from lichess_db_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    words = [f"w{i}" for i in range(40)]
    a = " ".join(words)
    b = " ".join(words[:12])  # 8 shingles, all inside a's 36
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    cont = {
        (r.doc_src, r.doc_dst): r
        for r in containment_pairs(df, threshold=0.9).collect()
    }
    assert (2, 1) in cont and cont[(2, 1)].containment == 1.0
    assert (1, 2) not in cont  # the long doc is NOT contained in the quote
    jac = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert not jac  # symmetric Jaccard (8/36) misses the pair entirely


def test_containment_validates():
    from lichess_db_spark.operators.dedup import containment_pairs

    with pytest.raises(ValueError):
        containment_pairs(None, threshold=0.0)


def test_abc_analysis_hand_computed(spark):
    """Revenues 50/30/15/5: cumulative shares 50/80/95/100 -> classes
    A, A (80% boundary inclusive), B (95% boundary inclusive), C."""
    import tempfile

    from lichess_db_spark.plans.catalog import QUERIES

    rows = [
        (1, 101, 50.0, 0.0),
        (2, 102, 30.0, 0.0),
        (3, 103, 15.0, 0.0),
        (4, 104, 5.0, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_extendedprice double, l_discount double"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/lineitem.parquet")
        out = {r.partkey: r for r in QUERIES["orders_abc_analysis"].build(spark, td).collect()}
    assert [out[k].abc_class for k in (101, 102, 103, 104)] == ["A", "A", "B", "C"]
    assert [out[k].rnk for k in (101, 102, 103, 104)] == [1, 2, 3, 4]


def test_abc_ranks_unique_and_total(spark):
    from lichess_db_spark.io import load_table
    from lichess_db_spark.plans.catalog import QUERIES

    out = QUERIES["orders_abc_analysis"].build(spark, SF_SMALL).collect()
    n_parts = (
        load_table(spark, SF_SMALL, "lineitem").select("l_partkey").distinct().count()
    )
    assert len(out) == n_parts
    assert sorted(r.rnk for r in out) == list(range(1, n_parts + 1))
    assert {r.abc_class for r in out} <= {"A", "B", "C"}


def test_wordpiece_greedy_matches_python_twin(spark):
    """The recursive-CTE segmentation equals an independent Python
    greedy longest-match over the same vocab, for every fixture doc
    prefix (64 chars)."""
    import tempfile

    from lichess_db_spark.plans.catalog import QUERIES
    from lichess_db_spark.plans.catalog_staged import (
        _WP_CAP,
        _WP_V2,
        _WP_V3,
        _WP_V4,
    )

    def vset(s):
        return {x.strip("'") for x in s.replace("','", "'|'").split("|")}

    v4, v3, v2 = vset(_WP_V4), vset(_WP_V3), vset(_WP_V2)

    def py_seg(text):
        text = text[:_WP_CAP]
        pos, pieces, unk = 0, 0, 0
        while pos < len(text):
            if text[pos : pos + 4] in v4:
                pos += 4
            elif text[pos : pos + 3] in v3:
                pos += 3
            elif text[pos : pos + 2] in v2:
                pos += 2
            else:
                pos += 1
                unk += 1
            pieces += 1
        return pieces, unk

    texts = [
        "the fast key order sort table scan merge part window small",
        "zzzz qqqq xxxx",  # all-UNK-ish
        "scanscanscan",  # back-to-back 4-pieces
        "ab",  # shorter than every tier but 2
        "x",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/documents.parquet")
        out = {
            r.doc_id: (r.n_pieces, r.n_unk)
            for r in QUERIES["wordpiece_prefix_segment"].build(spark, td).collect()
        }
    for i, t in enumerate(texts):
        assert out[i] == py_seg(t), (i, t)


def test_cusum_detects_planted_level_shift(spark):
    """48 quiet hours then 24 elevated hours: the CUSUM peak must land
    at the LAST hour (max cumulative positive deviation accrues to the
    end of the elevated run) and cusum values match a python twin."""
    import datetime as dt
    import tempfile

    from lichess_db_spark.plans.catalog import QUERIES

    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    counts = [2] * 48 + [10] * 24
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=1)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        out = sorted(
            QUERIES["events_cusum_changepoint"].build(spark, td).collect(),
            key=lambda r: r.hour_sec,
        )
    n, tot = len(counts), sum(counts)
    pref, mn, want = 0, 0, []
    for c in counts:
        pref += c * n - tot
        mn = min(mn, pref)
        want.append(pref - mn)
    assert [r.cusum for r in out] == want
    peaks = [i for i, r in enumerate(out) if r.is_change_peak]
    assert peaks == [want.index(max(want))]
    assert peaks == [71]  # deviation keeps accruing to the series end


def test_neyman_favors_high_variance_stratum(spark):
    """Two strata, equal sizes: the one with spread lengths must earn
    (nearly) the whole budget; a zero-variance stratum earns none."""
    import tempfile

    from lichess_db_spark.plans.catalog import QUERIES

    rows = [(i, "flat", "x" * 100) for i in range(50)] + [
        (100 + i, "spread", "y" * (10 + 37 * (i % 9))) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/documents.parquet")
        out = {
            r.lang: r
            for r in QUERIES["neyman_allocation_docs"].build(spark, td).collect()
        }
    assert out["flat"].w_scaled == 0 and out["flat"].alloc == 0
    assert out["spread"].alloc == 10000


def test_mutual_lsh_recall_on_planted_clusters(spark):
    """VERDICT r11 item 4: the ANN-built mutual-kNN path
    (lsh_self_topk_portable -> mutual_filter) must recover the
    brute-force mutual edge set on planted near-dup clusters — the
    regime the LSH tier exists for. 15 clusters x 3 vectors (base +
    two 1e-3 perturbations, cosine ~0.9999): with k=2 the brute-force
    mutual graph is exactly the within-cluster pairs, and perturbed
    copies share hyperplane signs with near-certainty across 8
    tables, so recall on this fixture must be ~1.0 (pinned >= 0.95;
    measured 1.0)."""
    import numpy as np

    from lichess_db_spark.operators.similarity import (
        lsh_self_topk_portable,
        mutual_filter,
        mutual_knn_edges,
    )

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for _ in range(15):
        base = rng.randn(64)
        base /= np.linalg.norm(base)
        for j in range(3):
            v = base + (j * 1e-3) * rng.randn(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    bf = {
        (r.query_id, r.neighbor_id)
        for r in mutual_knn_edges(emb, k=2).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in mutual_filter(
            lsh_self_topk_portable(emb, k=2).localCheckpoint(eager=True)
        ).collect()
    }
    assert bf, "fixture must produce brute-force mutual edges"
    # every vector's true top-2 is its two cluster mates -> 3 pairs
    # per cluster, both directions
    assert len(bf) == 15 * 3 * 2
    recall = len(bf & lsh) / len(bf)
    assert recall >= 0.95, f"mutual-edge recall {recall} below pin"


def test_mutual_lsh_precap_drops_flooded_buckets(spark):
    """max_bucket_size is the count-first silent-recall guard: an
    over-cap (table, bucket) group must vanish BEFORE pairing, and a
    cap above every bucket's size must be a no-op vs cap=None."""
    import numpy as np

    from lichess_db_spark.operators.similarity import lsh_self_topk_portable

    rng = np.random.RandomState(11)
    rows = [
        (i, [float(x) for x in rng.randn(64)]) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = {
        tuple(r)
        for r in lsh_self_topk_portable(emb, k=3, max_bucket_size=None).collect()
    }
    wide = {
        tuple(r)
        for r in lsh_self_topk_portable(emb, k=3, max_bucket_size=10**6).collect()
    }
    assert base == wide
    # cap=1 leaves no bucket with two occupants -> zero candidates
    assert lsh_self_topk_portable(emb, k=3, max_bucket_size=1).count() == 0

    # r13: the Observation silent-recall guard (API symmetry with
    # embedding_lsh_dedup_pairs) — metrics ride the bucket-size job
    # and results are unchanged by observing
    from pyspark.sql import Observation

    obs = Observation("lsh_self_cap")
    observed = {
        tuple(r)
        for r in lsh_self_topk_portable(
            emb, k=3, max_bucket_size=1, observation=obs
        ).collect()
    }
    assert observed == set()
    got = obs.get
    assert got["capped_buckets"] > 0
    assert got["max_bucket_size_seen"] >= 2

    obs2 = Observation("lsh_self_nocap")
    unchanged = {
        tuple(r)
        for r in lsh_self_topk_portable(
            emb, k=3, max_bucket_size=None, observation=obs2
        ).collect()
    }
    assert unchanged == base
    assert obs2.get["capped_buckets"] == 0


def test_mutual_lsh_edges_share_a_bucket_and_ranks_dense(spark):
    """Structural invariants of lsh_self_topk_portable: every returned
    edge's endpoints share at least one (table, bucket); per-query
    ranks are dense 1..deg with (score DESC, neighbor_id ASC) order;
    and the quantized cosine is exactly symmetric when both directions
    survive the top-k cut."""
    import numpy as np

    from lichess_db_spark.io import load_table
    from lichess_db_spark.operators.dedup import (
        auto_n_planes,
        portable_bucket_udf,
    )
    from lichess_db_spark.operators.similarity import lsh_self_topk_portable

    from pyspark.sql import functions as F

    # deterministic subset: limit() without ordering may pick different
    # rows across the two independent jobs below on a multi-file scan
    emb = load_table(spark, SF_SMALL, "embeddings").where(F.col("vec_id") < 200)
    edges = lsh_self_topk_portable(emb, k=4).collect()
    assert edges

    n = emb.count()
    p = auto_n_planes(n)
    _buckets = portable_bucket_udf(64, 8, p)
    bk = {
        r.vec_id: set((t, b) for t, b in enumerate(r.bks))
        for r in emb.select(
            "vec_id", _buckets("embedding").alias("bks")
        ).collect()
    }
    per_q: dict[int, list] = {}
    for r in edges:
        assert bk[r.query_id] & bk[r.neighbor_id], (
            "edge endpoints never collided in any LSH table"
        )
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        ordered = sorted(rs, key=lambda r: (-r.score, r.neighbor_id))
        assert [r.rank for r in ordered] == list(range(1, len(rs) + 1))
    es = {(r.query_id, r.neighbor_id): r.score for r in edges}
    sym = [(a, b) for (a, b) in es if (b, a) in es]
    assert sym, "fixture should yield some reciprocal edges"
    for a, b in sym:
        assert es[(a, b)] == es[(b, a)]  # exact quantized-cosine symmetry


def test_auto_n_planes_matches_sql_derivation():
    """The oracle twin of auto_n_planes is a SQL MIN(p) over integer
    shifts (see _MUTUAL_LSH_CTES / dedup_embedding_lsh). Pin the two
    derivations equal across the whole relevant corpus-size range,
    including every power-of-two boundary where a float log2 path
    would risk a 1-ulp disagreement."""
    import duckdb

    from lichess_db_spark.operators.dedup import auto_n_planes

    sizes = [0, 1, 15, 16, 17, 255, 256, 257, 500, 2000, 16000, 128000]
    for p in range(4, 25):
        b = 16 << p
        sizes += [b - 1, b, b + 1]
    for n in sizes:
        want = auto_n_planes(n)
        got = duckdb.sql(
            f"""
            SELECT LEAST(24, GREATEST(4, COALESCE(
                (SELECT MIN(p.p) FROM range(0, 25) p(p)
                 WHERE 16 * (1::BIGINT << p.p) >= {n}), 24)))
            """
        ).fetchone()[0]
        assert got == want, f"n={n}: sql {got} != python {want}"


def test_validity_gate_sql_twin_equivalence(spark):
    """The single-source SQL twin (dedup.VECTOR_VALIDITY_WHERE_SQL,
    interpolated into all three dependent oracles) must keep exactly
    the same vectors as the Spark gate (filter_valid_vectors) on a
    DIRTY corpus — committed fixtures carry no invalid vectors, so
    driver rows never exercise the gates' disagreement surface; this
    test does, predicate for predicate: NULL vector, ragged, NULL
    element, NaN element, +/-inf, |x| at and around the 32.0 domain
    boundary, -0.0, and the all-sub-2^-20 zero-quantized-norm edge."""
    import duckdb
    import pandas as pd

    from lichess_db_spark.operators.dedup import (
        VECTOR_VALIDITY_WHERE_SQL,
        filter_valid_vectors,
    )

    eps = 1.0 / 1048576  # 2^-20, the quantization step
    rows = [
        (0, [0.5] * 64),                             # clean
        (1, None),                                   # NULL vector
        (2, [0.5] * 32),                             # ragged
        (3, [None] + [0.5] * 63),                    # NULL element
        (4, [float("nan")] + [0.5] * 63),            # NaN element
        (5, [float("inf")] + [0.5] * 63),            # +inf
        (6, [float("-inf")] + [0.5] * 63),           # -inf
        (7, [32.0] + [0.5] * 63),                    # at the domain bound
        (8, [31.999999] + [0.5] * 63),               # just inside
        (9, [-32.0] + [0.5] * 63),                   # negative bound
        (10, [-0.0] * 64),                           # -0.0: quantizes to 0
        (11, [eps / 2] * 64),                        # all sub-step -> zero norm
        (12, [eps] + [0.0] * 63),                    # exactly one step -> valid
        (13, [-eps / 2] + [0.0] * 63),               # negative floors to -1 -> valid
    ]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    spark_kept = {
        r.vec_id for r in filter_valid_vectors(sdf, "embedding", 64).collect()
    }

    pdf = pd.DataFrame(
        {"vec_id": [i for i, _ in rows], "embedding": [v for _, v in rows]}
    )
    con = duckdb.connect()
    con.register("embeddings", pdf)
    sql_kept = {
        r[0]
        for r in con.execute(
            f"SELECT vec_id FROM embeddings {VECTOR_VALIDITY_WHERE_SQL}"
        ).fetchall()
    }
    assert spark_kept == sql_kept == {0, 8, 12, 13}, (
        f"spark={sorted(spark_kept)} sql={sorted(sql_kept)}"
    )
    # the boundary semantics worth naming: |x| >= 32 excludes BOTH
    # signs at exactly 32.0 (rows 7, 9); -0.0 does NOT count as
    # quantized-nonzero (IEEE -0.0 < 0 is false and floor(-0.0 * 2^20)
    # is 0 in numpy and both engines — row 10 is a zero-norm vector);
    # one element at exactly 2^-20 quantizes to 1 (row 12 valid); one
    # negative sub-step element floors to -1 (row 13 valid).


def test_validity_where_sql_constant_matches_parameterized_fn():
    """ADVICE r14: the byte-stable oracle constant (interpolated into
    three driver-window oracle texts, so it must not change bytes) and
    the parameterized generator must be the SAME string at the
    embedding/64 instantiation — this pin is what makes the pair
    single-source despite the literal."""
    from lichess_db_spark.operators.dedup import (
        VECTOR_VALIDITY_WHERE_SQL,
        vector_validity_where_sql,
    )

    assert vector_validity_where_sql("embedding", 64) == VECTOR_VALIDITY_WHERE_SQL
    # and the parameterization actually parameterizes
    other = vector_validity_where_sql("vec", 128)
    assert "vec IS NOT NULL" in other and "len(vec) = 128" in other
    assert "embedding" not in other


def test_mutual_lsh_excludes_null_and_ragged_vectors(spark):
    """NULL / wrong-dim vectors are EXCLUDED, not a worker crash: the
    quantization kernel hard-errors on ragged input, so the operator
    filters to valid dim-length vectors up front (the dot_exact_arrow
    NULL-mask precedent)."""
    from lichess_db_spark.operators.similarity import lsh_self_topk_portable

    rows = [
        (0, [1.0] * 64),
        (1, [1.0] * 64),
        (2, None),
        (3, [0.5] * 32),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = lsh_self_topk_portable(df, k=2).collect()
    ids = {r.query_id for r in got} | {r.neighbor_id for r in got}
    assert ids == {0, 1}
    assert {(r.query_id, r.neighbor_id, r.rank) for r in got} == {
        (0, 1, 1),
        (1, 0, 1),
    }


def test_shared_kit_validity_gate_all_consumers(spark):
    """r13 shared-kit hardening (VERDICT r12 item 3 + ADVICE): every
    portable-LSH-kit consumer (embedding_lsh_dedup_pairs,
    lsh_topk_portable, lsh_self_topk_portable) runs the SHARED
    validity gate, so a dirty corpus degrades to exclusion — results
    equal the clean-corpus run — instead of a kernel crash
    (NULL/ragged), silent floor(NaN) garbage (NULL/NaN element, huge
    element past the |x|<32 exactness domain), or a 0-denominator
    cosine (all elements quantize to 0)."""
    import math

    from pyspark.sql import functions as F

    from lichess_db_spark.operators.dedup import (
        embedding_lsh_dedup_pairs,
        filter_valid_vectors,
    )
    from lichess_db_spark.operators.similarity import (
        lsh_self_topk_portable,
        lsh_topk_portable,
    )

    def vec(seed):
        return [math.sin(seed * 7 + j) for j in range(64)]

    clean_rows = [(i, vec(i)) for i in range(6)] + [
        (6, vec(0))  # near-exact dup of vec 0 -> a guaranteed pair
    ]
    dirty_rows = [
        (100, None),                                   # NULL vector
        (101, [0.5] * 32),                             # ragged
        (102, [None] + [0.5] * 63),                    # NULL element
        (103, [float("nan")] + [0.5] * 63),            # NaN element
        (104, [1.0e10] + [0.5] * 63),                  # out-of-domain
        (105, [float("inf")] + [0.5] * 63),            # non-finite
        (106, [1.0e-9] * 64),                          # zero quantized norm
    ]
    schema = "vec_id long, embedding array<double>"
    clean = spark.createDataFrame(clean_rows, schema)
    dirty = spark.createDataFrame(clean_rows + dirty_rows, schema)

    # the gate itself: exactly the clean ids survive
    kept = {r.vec_id for r in filter_valid_vectors(dirty, "embedding", 64).collect()}
    assert kept == {i for i, _ in clean_rows}

    def pairs(df):
        return {
            (r.vec_a, r.vec_b)
            for r in embedding_lsh_dedup_pairs(df, threshold=0.9).collect()
        }

    assert pairs(dirty) == pairs(clean) and (0, 6) in pairs(clean)

    def self_edges(df):
        return {
            (r.query_id, r.neighbor_id, r.rank)
            for r in lsh_self_topk_portable(df, k=2).collect()
        }

    assert self_edges(dirty) == self_edges(clean)

    def topk(df):
        q = df.where(F.col("vec_id").isin(0, 100, 103, 106))
        return {
            (r.query_id, r.neighbor_id, r.rank)
            for r in lsh_topk_portable(df, q, k=2).collect()
        }

    got = topk(dirty)
    assert got == topk(clean)
    assert {q for q, _, _ in got} <= {0}  # dirty queries excluded too


def test_mutual_lsh_plan_shape(spark):
    """Plan regression guards for lsh_self_topk_portable's scoring
    stage (everything above the eager bucket checkpoint): the qcos
    kernel must appear EXACTLY once (asNondeterministic blocks
    Catalyst from cloning it below a referencing filter — the
    portable_qcos lesson), and no BroadcastNestedLoopJoin /
    CartesianProduct may sneak in (the candidate join is an equi-join
    by construction)."""
    from lichess_db_spark.io import load_table
    from lichess_db_spark.operators.similarity import lsh_self_topk_portable

    emb = load_table(spark, SF_SMALL, "embeddings").limit(100)
    plan = lsh_self_topk_portable(emb, k=3)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
