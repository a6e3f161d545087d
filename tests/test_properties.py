"""Property-based checks (hypothesis) for scalar building blocks —
SURVEY.md §5 item 4: oracles are weak here, invariants are strong."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lichess_db_spark.operators.similarity import _hyperplane
from lichess_db_spark.sources.pgn import parse_pgn_partitions
from lichess_db_spark.sources.staging import chunk_pgn_lines


@given(st.integers(min_value=0, max_value=2**40))
def test_stable_unit_hash_formula_in_range(uid):
    # python twin of the SQL formula (catalog w5_stable_unit_tag)
    tag = (uid * 2654435761 % 2**32) / 2**32
    assert 0.0 <= tag < 1.0


@given(st.integers(0, 10), st.integers(0, 10))
def test_hyperplanes_deterministic_and_distinct(t, p):
    a = _hyperplane(8, t, p)
    b = _hyperplane(8, t, p)
    assert a == b
    assert all(-1.0 <= v < 1.0 for v in a)
    if (t, p) != (t, p + 1):
        assert a != _hyperplane(8, t, p + 1)


@st.composite
def pgn_games(draw):
    n = draw(st.integers(1, 6))
    out = []
    for i in range(n):
        headers = {
            "Event": "Rated Blitz game",
            "Site": f"https://lichess.org/game{i:04d}",
            "White": draw(st.sampled_from(["a", "b", "c"])),
            "Black": draw(st.sampled_from(["x", "y", "z"])),
            "Result": draw(st.sampled_from(["1-0", "0-1", "1/2-1/2"])),
        }
        if draw(st.booleans()):
            headers["WhiteTitle"] = "GM"
        lines = [f'[{k} "{v}"]' for k, v in headers.items()]
        lines += ["", "1. e4 e5 " + headers["Result"], ""]
        out.append((headers, lines))
    return out


@given(pgn_games())
@settings(max_examples=30, deadline=None)
def test_parser_roundtrips_any_game_sequence(games):
    lines = [line for _, game_lines in games for line in game_lines]
    parsed = list(parse_pgn_partitions(iter(lines)))
    assert len(parsed) == len(games)
    for (headers, _), row in zip(games, parsed):
        for k, v in headers.items():
            assert row[k] == v


@given(pgn_games(), st.integers(50, 400))
@settings(max_examples=20, deadline=None)
def test_chunker_never_splits_games(tmp_path_factory, games, budget):
    tmp = tmp_path_factory.mktemp("chunks")
    lines = [line for _, game_lines in games for line in game_lines]
    paths = list(chunk_pgn_lines(lines, str(tmp), "t", chunk_bytes=budget))
    reparsed = []
    for p in sorted(paths):
        with open(p) as fh:
            reparsed.extend(parse_pgn_partitions(fh))
    assert len(reparsed) == len(games)


@given(st.integers(0, 7), st.integers(0, 3), st.integers(2, 64))
def test_portable_planes_deterministic_bounded(t, p, dim):
    from lichess_db_spark.operators.dedup import _lsh_plane_coeffs

    C = _lsh_plane_coeffs(dim, t + 1, p + 1)
    assert C.shape == ((t + 1) * (p + 1), dim)
    assert (C >= -1_000_000).all() and (C < 1_000_000).all()
    C2 = _lsh_plane_coeffs(dim, t + 1, p + 1)
    assert (C == C2).all()


@given(st.integers(0, 10**12), st.integers(1, 1024))
def test_auto_n_planes_properties(n, target):
    """The derived plane count actually delivers the occupancy bound
    it promises: target * 2^np >= n (unless clamped at the int32-safe
    ceiling), stays in [4, 24], and is monotone in n."""
    from lichess_db_spark.operators.dedup import auto_n_planes

    np_ = auto_n_planes(n, target_bucket=target)
    assert 4 <= np_ <= 24
    if np_ < 24:
        assert target * (2 ** np_) >= n
    if np_ > 4:
        # minimality: one fewer plane would under-deliver
        assert target * (2 ** (np_ - 1)) < n
    assert auto_n_planes(n + 1, target_bucket=target) >= np_


@given(st.lists(st.integers(0, 5000), min_size=1, max_size=200),
       st.integers(1, 4096))
@settings(max_examples=200)
def test_greedy_packing_gapless_and_conserving(toks, seq_len):
    # python twin of pack_sequences' window formula: seq_id from the
    # running token count must be non-decreasing, gapless from 0, and
    # conserve every token.
    cum = 0
    seq_ids = []
    for n in toks:
        seq_ids.append(cum // seq_len)
        cum += n
    assert seq_ids[0] == 0
    # non-decreasing; a jump is bounded by how many seq_len blocks the
    # PREVIOUS doc spans (a long doc legitimately skips bins — no doc
    # STARTS inside it)
    for (a, b), n_prev in zip(zip(seq_ids, seq_ids[1:]), toks):
        assert 0 <= b - a <= n_prev // seq_len + 1


def test_global_rank_invariant_to_partition_count(spark):
    """The distributed global rank must be a pure function of the data
    and the sort keys — NOT of the physical partition count. This is
    the property a deployment depends on when executor counts change
    between runs (3-task and 7-task layouts must give byte-identical
    training order)."""
    from pyspark.sql import functions as F

    from lichess_db_spark.io import load_table
    from lichess_db_spark.operators.rank import global_rank

    from .conftest import SF_SMALL

    d = load_table(spark, SF_SMALL, "documents").select(
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("-inv"))).alias("h"),
    )
    a = global_rank(d, F.col("h"), F.col("doc_id"), num_partitions=3)
    b = global_rank(d, F.col("h"), F.col("doc_id"), num_partitions=7)
    ra = {(r.doc_id, r.rn) for r in a.collect()}
    rb = {(r.doc_id, r.rn) for r in b.collect()}
    assert ra == rb
    assert len(ra) == d.count()


# ---------------------------------------------------------------------------
# edit_distance_join losslessness (catalog_scale)
# ---------------------------------------------------------------------------

_ADVERSARIAL_VOCABS = [
    # zero-shared-bigram ed=1 pairs below the q+k*q length threshold
    ["abc", "adc", "xbc", "ab", "ba", "a", "b", ""],
    # repeated grams: multiset occurrence logic must not over- or
    # under-count ("aaaa" vs "aaab" share 'aa' twice, not three times)
    ["aaaa", "aaab", "abab", "baba", "aaaaa", "aaa", "aabaa", "ababab"],
    # mixed lengths around the threshold with transpositions/deletes
    ["abcd", "abdd", "acbd", "abc", "abcde", "bbcd", "abcf", "zbcd", "azcd"],
]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_join_lossless_on_adversarial_vocabs(spark):
    from lichess_db_spark.plans.catalog_scale import edit_distance_join

    for vocab in _ADVERSARIAL_VOCABS:
        for q, k in ((2, 1), (2, 2), (3, 1)):
            df = spark.createDataFrame([(v,) for v in vocab], ["name"])
            got = {
                (r.name_a, r.name_b, r.dist)
                for r in edit_distance_join(df, q=q, k=k).collect()
            }
            want = {
                (a, b, _lev(a, b))
                for a in vocab
                for b in vocab
                if a < b and _lev(a, b) <= k
            }
            assert got == want, (q, k, vocab, got ^ want)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),  # group
            st.one_of(
                st.none(),
                # money values as exact cents, both signs, up to 1e13
                # cents (~1e11 money units — inside decimal(19,2))
                st.integers(-(10**13), 10**13),
            ),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 5),  # partition count
)
def test_two_level_scaled_agg_property(spark, rows, parts):
    """For ANY value set and ANY partitioning, the two-level shape
    equals the decimal accumulation bit-for-bit (same exact rational
    -> same IEEE double), including NULL handling and negatives."""
    from lichess_db_spark.operators.aggregates import (
        decimal_sum,
        two_level_scaled_agg,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(g, None if c is None else c / 100.0) for g, c in rows],
        "g int, x double",
    ).repartition(parts)
    want = {
        r["g"]: (r["s"], r["n"])
        for r in df.groupBy("g")
        .agg(decimal_sum("x", 2, "s"), F.count("*").alias("n"))
        .collect()
    }
    got = {
        r["g"]: (r["s"], r["n"])
        for r in two_level_scaled_agg(
            df, ["g"], [("x", 2, "s")], count_alias="n"
        ).collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from([f"src{i}" for i in range(6)]),
        st.floats(0.0, 3.5, allow_nan=False),
        max_size=4,
    ),
    st.floats(0.0, 2.0, allow_nan=False),
)
def test_upsample_epochs_matches_python_twin(spark, epochs, default):
    """For ANY rate dict, every doc's pass count equals the Python
    twin of the md5 fractional-selection rule — the determinism a mix
    config depends on when re-run on different clusters."""
    import hashlib

    from pyspark.sql import functions as F

    from lichess_db_spark.io import load_table
    from lichess_db_spark.operators.curation import upsample_epochs

    from .conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").where(
        F.col("doc_id") < 60
    )
    out = upsample_epochs(docs, epochs, default=default)
    got = {}
    for r in out.select("doc_id", "source", "epoch").collect():
        got[(r.doc_id, r.source)] = max(
            got.get((r.doc_id, r.source), 0), r.epoch
        )

    def n_ep(doc_id, source):
        e = epochs.get(source, default)
        fl = int(e) if e > 0 else 0
        fb = max(0, min(10000, round((e - fl) * 10000))) if e > 0 else 0
        b = int(hashlib.md5(f"{doc_id}-ep".encode()).hexdigest()[:8], 16) % 10000
        return fl + (1 if b < fb else 0)

    for r in docs.select("doc_id", "source").collect():
        want = n_ep(r.doc_id, r.source)
        assert got.get((r.doc_id, r.source), 0) == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(1, 97), min_size=1, max_size=4).filter(
        lambda xs: sum(xs) < 100
    )
)
def test_dataset_split_matches_python_twin(spark, cuts):
    """For ANY integer fraction layout, each doc's split equals the
    Python md5 percent-bucket twin (growth-stable assignment)."""
    import hashlib

    from pyspark.sql import functions as F

    from lichess_db_spark.io import load_table
    from lichess_db_spark.operators.curation import dataset_split

    from .conftest import SF_SMALL

    fractions = {f"s{i}": c for i, c in enumerate(cuts)}
    fractions["rest"] = 100 - sum(cuts)
    docs = load_table(spark, SF_SMALL, "documents").where(F.col("doc_id") < 60)
    got = {r.doc_id: r.split for r in dataset_split(docs, fractions).collect()}

    names, bounds = list(fractions), []
    cum = 0
    for n in names:
        cum += fractions[n]
        bounds.append(cum)
    for doc_id, split in got.items():
        b = int(hashlib.md5(f"{doc_id}-split".encode()).hexdigest()[:8], 16) % 100
        want = next(n for n, hi in zip(names, bounds) if b < hi)
        assert split == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 50), min_size=2, max_size=12).filter(
        lambda h: sum(h) > 0
    ),
    st.sampled_from([0.1, 0.5, 0.9, 0.99, 1.0]),
)
def test_hist_quantile_matches_python_twin(spark, hist, q):
    """For ANY bin-count vector and quantile, the array-expression
    prefix-sum read equals the Python twin: rank = ceil(q*total),
    answer = upper edge of the first bin whose cumulative reaches it
    (empty bins occupy slots — the hist_quantile_orders oracle
    lesson, pinned here on arbitrary vectors)."""
    import math

    from lichess_db_spark.operators.incremental import hist_quantile

    lo, width = 10.0, 2.5
    df = spark.createDataFrame([(hist,)], "h array<bigint>")
    got = df.select(
        hist_quantile("h", q, lo, width).alias("v")
    ).first()["v"]

    total = sum(hist)
    rank = math.ceil(q * total)
    cum, idx = 0, 0
    for i, c in enumerate(hist):
        cum += c
        if cum >= rank:
            idx = i
            break
    want = lo + (idx + 1) * width
    assert got == want


_GOPHER_WORDS = [
    "the", "of", "and", "with", "table", "row", "###", "a...", "12345",
    "x", "somewhatlongerword", "-", "...",
]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_GOPHER_WORDS), min_size=1, max_size=80),
        min_size=1,
        max_size=4,
    )
)
def test_gopher_rules_match_python_twin(spark, lines):
    """For ANY text assembled from a mixed alphabet (stopwords,
    symbols, bullets, ellipses, numerics, newlines), every Gopher rule
    flag equals a straight-line Python twin of the published
    definitions — pinning the integer-multiply expressions to the
    semantics they encode, beyond the crafted-doc cases."""
    from lichess_db_spark.operators.curation import GOPHER_STOPWORDS, gopher_rules

    text = "\n".join(" ".join(ln) for ln in lines)
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    got = gopher_rules(df).first()

    ws = text.split(" ")
    ls = text.split("\n")
    nw = len(ws)
    nch = len(text.replace(" ", ""))
    nhash = text.count("#")
    nell3 = len(text) - len(text.replace("...", ""))
    want = {
        "r_word_count": 50 <= nw <= 100000,
        "r_mean_word_len": 3 * nw <= nch <= 10 * nw,
        "r_symbol_ratio": 10 * (3 * nhash + nell3) <= 3 * nw,
        "r_bullet": 10 * sum(l.startswith(("-", "*")) for l in ls) <= len(ls),
        "r_ellipsis": 10 * sum(l.endswith("...") for l in ls) <= 3 * len(ls),
        "r_alpha_words": 5 * sum(any(c.isascii() and c.isalpha() for c in w) for w in ws)
        >= 4 * nw,
        "r_stopwords": sum(s in ws for s in GOPHER_STOPWORDS) >= 2,
    }
    for k, v in want.items():
        assert getattr(got, k) == v, (k, text)
    assert got.n_words == nw
    assert got.n_rules_passed == sum(want.values())
    assert got.passes_gopher == all(want.values())


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(1, 500), min_size=1, max_size=7),
    st.sampled_from([(1, 2), (4, 5), (1, 1), (3, 2)]),
    st.sampled_from([1, 2]),
)
def test_unimax_matches_python_twin(spark, sizes, budget, epoch_cap):
    """For ANY group-size vector, budget fraction and epoch cap, the
    window-waterfall allocation equals a straight-line Python
    water-filling twin, conserves the budget (sum(alloc) <= B, slack
    only from integer division or an all-capped surplus), and never
    exceeds any group's capacity."""
    from lichess_db_spark.operators.curation import unimax_allocation

    num, den = budget
    rows = [(f"g{i:02d}", "w " * (n - 1) + "w") for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {
        r.lang: r
        for r in unimax_allocation(
            df, epoch_cap=epoch_cap, budget_num=num, budget_den=den
        ).collect()
    }

    # python twin: ascending-capacity water-filling with integer div
    caps = sorted(
        (n * epoch_cap, f"g{i:02d}", n) for i, n in enumerate(sizes)
    )
    T = sum(sizes)
    G = len(sizes)
    B = (T * num) // den
    alloc, prefix, n_capped, spent = {}, 0, 0, 0
    for i, (cap, name, n) in enumerate(caps, start=1):
        if cap * (G - i + 1) + prefix <= B:
            alloc[name] = cap
            n_capped += 1
            spent += cap
        prefix += cap
    for cap, name, n in caps:
        if name not in alloc:
            alloc[name] = (B - spent) // (G - n_capped)

    capped_names = {name for _, name, _ in caps[:n_capped]}
    assert set(got) == set(alloc)
    for name, want in alloc.items():
        r = got[name]
        assert r.alloc_tokens == want, (name, sizes, budget, epoch_cap)
        assert r.alloc_tokens <= r.cap_tokens
        assert r.capped == (name in capped_names), (name, sizes, budget, epoch_cap)
    total_alloc = sum(r.alloc_tokens for r in got.values())
    # budget conservation: never overspent; slack only from integer
    # division (< #uncapped) or every group being capped (surplus)
    if n_capped < G:
        assert total_alloc <= B
        assert B - total_alloc < G - n_capped
    else:
        assert total_alloc == sum(c for c, _, _ in caps)


# ---------------------------------------------------------------------------
# exact_substring dedup Python twin (operators/dedup.py)
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=14),
        min_size=1,
        max_size=7,
    )
)
def test_exact_substring_matches_python_twin(spark, corpora):
    """For ANY corpus over a tiny alphabet (dense k-gram collisions),
    BOTH ExactSubstr views must equal a straight-line Python twin of
    the published rule: duplicated overlapping k-grams, globally-first
    keeper, per-doc interval-union removal — counts AND the cleaned
    token sequence itself."""
    from lichess_db_spark.operators.dedup import (
        exact_substring_clean,
        exact_substring_dedup,
    )

    k = 3
    toks_by_id = {i: t for i, t in enumerate(corpora)}
    occ: dict = {}
    for d in sorted(toks_by_id):
        t = toks_by_id[d]
        for i in range(len(t) - k + 1):
            occ.setdefault(tuple(t[i : i + k]), []).append((d, i + 1))
    victims: dict = {}
    for g, lst in occ.items():
        for d, s in sorted(lst)[1:]:
            victims.setdefault(d, []).append((s, s + k - 1))
    want = {}
    for d, t in toks_by_id.items():
        merged: list = []
        for s, e in sorted(victims.get(d, [])):
            if merged and s <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        removed = sum(e - s + 1 for s, e in merged)
        kept = [
            t[i - 1]
            for i in range(1, len(t) + 1)
            if not any(s <= i <= e for s, e in merged)
        ]
        want[d] = (len(t), len(merged), removed, " ".join(kept))

    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in toks_by_id.items()],
        "doc_id int, text string",
    )
    stats = {
        r.doc_id: (r.n_tokens, r.n_spans_removed, r.n_tokens_removed)
        for r in exact_substring_dedup(docs, k=k).collect()
    }
    clean = {
        r.doc_id: (r.n_tokens_kept, r.clean_text)
        for r in exact_substring_clean(docs, k=k).collect()
    }
    assert set(stats) == set(want) == set(clean)
    for d, (n, n_spans, removed, text) in want.items():
        assert stats[d] == (n, n_spans, removed), (d, corpora)
        assert clean[d] == (n - removed, text), (d, corpora)


@given(
    st.integers(min_value=1, max_value=5000),
    st.sampled_from([(1024, 512), (256, 128), (100, 100)]),
)
def test_audio_window_count_formula(n_bytes, wh):
    """The windowing contract both the Arrow kernel and the DuckDB
    oracle implement: nw = max((n - window) // hop + 1, 1), every
    window starts at a hop multiple, the last window never starts past
    n, and consecutive windows overlap by window - hop bytes."""
    window, hop = wh
    nw = max((n_bytes - window) // hop + 1, 1)
    assert nw >= 1
    starts = [w * hop for w in range(nw)]
    assert all(s < n_bytes for s in starts)
    if nw > 1:
        # the next window after the last would start beyond coverage
        assert starts[-1] + window <= n_bytes + hop - 1 + window
        assert (nw) * hop > n_bytes - window  # no window was skipped


@given(
    st.lists(
        st.integers(min_value=1, max_value=10**9),
        min_size=1,
        max_size=8,
    )
)
def test_temperature_allocation_arithmetic_invariants(counts):
    """Python twin of temperature_mix_allocation's exact-integer
    arithmetic: quotas never exceed the budget in total, are monotone
    in the group's token count, and equal groups get equal quotas (no
    positional dependence)."""
    import math

    W = 0
    ws = []
    for n in counts:
        w = math.floor(math.sqrt(n * 10**12))
        ws.append(w)
        W += w
    T = sum(counts)
    B = (T * 4) // 5
    quotas = [(B * w) // W for w in ws]
    assert sum(quotas) <= B  # floor split never oversubscribes
    order = sorted(range(len(counts)), key=lambda i: counts[i])
    for i, j in zip(order, order[1:]):
        assert quotas[i] <= quotas[j]  # monotone in n_tokens
    for i in range(len(counts)):
        for j in range(len(counts)):
            if counts[i] == counts[j]:
                assert quotas[i] == quotas[j]
