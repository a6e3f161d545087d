"""Incremental (mergeable-state) aggregate maintenance.

The materialized-view-upkeep primitive: an aggregate over an
append-only fact table is kept fresh by merging the *partial
aggregate of the new batch* into the stored per-group state, instead
of rescanning history.  This is the same algebra Spark itself uses
for map-side partial aggregation (``HashAggregate(partial)`` /
``HashAggregate(final)``): any commutative-associative state
(count, sum, min, max — and sketches such as HLL, see
``hll_sketch_union_estimate``) can be merged pairwise, so

    agg(history UNION delta)  ==  merge(agg(history), agg(delta))

holds exactly when the per-value accumulation is order-independent
(we route double sums through ``DECIMAL`` for that, mirroring
``operators.aggregates.decimal_sum``).  COUNT(DISTINCT x) joins the
family as HLL-sketch state via the ``"hll"`` algebra: build per-batch
sketches with ``F.hll_sketch_agg``, merge with register-wise max
(``F.hll_union_agg``), read estimates with ``F.hll_sketch_estimate``
— the merged estimate is bit-equal to the one-shot estimate.

Reference anchor: the reference pipeline recomputes its monthly
aggregates from the full parquet each run
(``/root/reference/eda.ipynb`` re-reads everything); at 100 TB the
recompute is the cost driver, and this operator replaces it with a
delta-sized job: scan ONLY the new batch, one shuffle on the group
keys (state is re-grouped in the same exchange via union — no join),
write back state.  State size = number of groups, independent of
history length.

``AVG``-style ratios are derived at *read* time from (sum, count)
state columns rather than stored, so they stay mergeable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: state-column merge algebras: how two partial states combine.
#: "hll" carries a Datasketches HLL sketch (built per batch with
#: F.hll_sketch_agg) — sketch union is register-wise max, so it is
#: associative/commutative like the others and the merged estimate
#: EXACTLY equals the full-recompute estimate (tested); this is how
#: COUNT(DISTINCT x) becomes maintainable state (read back with
#: F.hll_sketch_estimate).
_MERGES = {
    "sum": F.sum,  # counts and decimal sums merge by adding
    "min": F.min,
    "max": F.max,
    "hll": F.hll_union_agg,
}


def _topk_merge(k: int):
    """The order-statistics algebra: state is the DESC-sorted array of
    a group's k largest values; two states merge by flatten + re-sort
    + re-slice. Associative/commutative because
    topk(A ∪ B) == topk(topk(A) ∪ topk(B)) — dropping anything below
    a partial's k-th value can never evict a global top-k member.
    This is how a leaderboard stays maintainable MV state: refresh
    touches only the delta, state is k values per group.

    NULL elements in a caller-supplied state array are dropped before
    the re-sort (ADVICE r6): ``array_sort`` orders NULLs LAST but
    ``reverse`` then puts them FIRST, where they would displace real
    top-k members and propagate through every future merge."""

    def merge(col: Column | str) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        flat = F.filter(
            F.flatten(F.collect_list(c)), lambda x: x.isNotNull()
        )
        return F.slice(F.reverse(F.array_sort(flat)), 1, k)

    return merge


def _hist_merge(n: int):
    """The distribution algebra: state is a length-``n`` BIGINT
    bin-count vector (equi-width histogram, or any fixed-width count
    vector); two states merge by element-wise addition — associative/
    commutative because integer vector addition is. This is how a
    histogram/percentile dashboard stays maintainable MV state: refresh
    touches only the delta, state is n counters per group, and any
    quantile is read from the merged vector by prefix-summing bins.
    Caller contract (mirrors topk's no-NULL-elements contract): state
    arrays are length n with no NULL cells — a NULL cell is coalesced
    to 0 defensively, a NULL state *row* is dropped by
    ``collect_list``, and an OVER-length array is truncated to its
    first n cells (ADVICE r7: ``zip_with`` runs to the longer length,
    so without the ``F.slice`` an over-length vector would widen the
    accumulator with NULL cells that poison every future merge —
    NULL + x stays NULL). Under-length arrays zero-fill (the zip's
    missing tail coalesces to 0)."""

    def merge(col: Column | str) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        zero = F.array_repeat(F.lit(0).cast("bigint"), n)
        return F.aggregate(
            F.collect_list(c),
            zero,
            lambda acc, x: F.zip_with(
                acc,
                F.slice(x, 1, n),
                lambda a, b: a + F.coalesce(b, F.lit(0).cast("bigint")),
            ),
        )

    return merge


def bins_to_array(n_bins: int, bin_col: str, cnt_col: str) -> Column:
    """Aggregate expression assembling per-(group, bin) count rows into
    the length-``n_bins`` BIGINT vector the ``hist:<n>`` algebra
    merges. Use AFTER a ``groupBy(keys, bin).count()`` — that first
    aggregate is map-combinable on the fact table, so the vector
    assembly only ever touches the tiny (groups x bins) relation.
    Missing bins become 0; the bin column must be INT in [0, n_bins)
    and non-NULL (clamp + null-filter upstream). Rows must already be
    one-per-(group, bin) — a duplicate bin key fails loud inside
    ``map_from_entries`` (DUPLICATED_MAP_KEY) rather than silently
    keeping one count."""
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col(bin_col), F.col(cnt_col)))
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bins - 1)),
        lambda i: F.coalesce(F.element_at(m, i), F.lit(0).cast("bigint")),
    )


def hist_quantile(
    hist_col: Column | str, q: float, lo: float, width: float
) -> Column:
    """Read an approximate quantile off a merged ``hist:<n>`` state
    vector: the value at rank ceil(q * total) assuming bin b covers
    [lo + b*width, lo + (b+1)*width). Returns the UPPER EDGE of the
    bin containing that rank — error is bounded by one bin width,
    which is the histogram-MV accuracy contract (tighten by adding
    bins, not by rescanning history). Pure array expressions
    (prefix-sum via aggregate + filter), so it runs wherever the
    state lives — including right after ``merge_agg_state`` with no
    extra shuffle. The prefix-sum expression is O(n^2) adds per STATE
    ROW (slice+fold per bin) — trivial at MV-state cardinality (one
    row per group), wrong for corpus-sized relations."""
    if not (0.0 < q <= 1.0):
        raise ValueError(f"quantile must be in (0, 1], got {q}")
    h = F.col(hist_col) if isinstance(hist_col, str) else hist_col
    total = F.aggregate(h, F.lit(0).cast("bigint"), lambda a, x: a + x)
    rank = F.ceil(F.lit(q) * total).cast("bigint")
    # index of the first bin whose cumulative count reaches the rank:
    # count the bins whose PRECEDING cumulative total stays below it
    cum = F.transform(
        F.sequence(F.lit(0), F.size(h) - 1),
        lambda i: F.aggregate(
            F.slice(h, 1, i + 1), F.lit(0).cast("bigint"), lambda a, x: a + x
        ),
    )
    bin_idx = F.size(F.filter(cum, lambda c: c < rank))
    return F.lit(lo) + (bin_idx + 1) * F.lit(width)


def _set_merge(col: Column | str) -> Column:
    """The exact-distinct algebra for BOUNDED domains: state is the
    sorted array of a group's distinct values; merge = flatten +
    re-distinct + re-sort (set union — associative/commutative/
    idempotent). Unlike "hll" this is exact, and unlike it the state
    grows with the domain, so the caller contract is a domain small
    enough to hold per group (categories, countries, status codes —
    NOT user ids; reach for "hll" there). Read COUNT(DISTINCT) back as
    ``size(col)``; the idempotence also makes replayed batches
    harmless. Registered r7 as ``incremental_distinct_years_orders``.
    NULL elements are dropped like in the topk algebra: a NULL is not
    a domain value, and keeping it would make ``size(col)`` overcount
    COUNT(DISTINCT) by one."""
    c = F.col(col) if isinstance(col, str) else col
    flat = F.filter(F.flatten(F.collect_list(c)), lambda x: x.isNotNull())
    return F.array_sort(F.array_distinct(flat))


def _fi_merge(max_tracked: int):
    """The frequent-items algebra (Spark 4 ``approx_top_k`` sketch —
    Misra-Gries-style heavy hitters): state is the sketch struct from
    ``approx_top_k_accumulate(col, max_tracked)``; merge is
    ``approx_top_k_combine`` at the same capacity. CAPACITY-EXACT like
    approx_topk_terms: when max_tracked >= the group's distinct-value
    count the sketch degrades to exact counting, so the merged top-k
    equals the exact GROUP BY — tested; beyond capacity it is the
    standard approximate heavy-hitter guarantee. Read back with
    ``approx_top_k_estimate(state, k)``. Completes the sketch corner
    of the mergeable family next to "hll" (distinct counts) and the
    exact "topk:<k>" (order statistics): this one ranks by FREQUENCY.
    Staged r7; the r8 catalog entry is rows-only with the exact twin,
    like mv_hll_maintenance_orders."""

    def merge(col: Column | str) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        return F.call_function("approx_top_k_combine", c, F.lit(max_tracked))

    return merge


def fi_accumulate(col: Column | str, max_tracked: int) -> Column:
    """Partial-build helper for the ``fi:<n>`` algebra (the accumulate
    side of the sketch; use inside the per-batch groupBy agg)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.call_function("approx_top_k_accumulate", c, F.lit(max_tracked))


def fi_estimate(col: Column | str, k: int) -> Column:
    """Read the top-k (item, count) structs off merged ``fi`` state."""
    c = F.col(col) if isinstance(col, str) else col
    return F.call_function("approx_top_k_estimate", c, F.lit(k))


_CM_DEFAULT_W, _CM_DEFAULT_D = 32, 4


def cm_bin(item: Column | str, j: int, w: int = _CM_DEFAULT_W) -> Column:
    """CountMin bin for hash row ``j``: ``(j-1)*w + md5-bucket(item‖-j)
    % w`` — the repo's standard engine-portable md5 slice, one FLAT bin
    index so both state forms (long-form ``(group, bin)`` relation and
    the dense ``cm:<w>x<d>`` vector) share the same position space."""
    c = F.col(item) if isinstance(item, str) else item
    col = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(c, F.lit(f"-{j}"))), 1, 8), 16, 10
        ).cast("bigint"),
        F.lit(w),
    )
    return F.lit((j - 1) * w) + col


def cm_bins(
    item: Column | str, w: int = _CM_DEFAULT_W, d: int = _CM_DEFAULT_D
) -> Column:
    """Array of the ``d`` flat bin positions an item touches."""
    return F.array(*[cm_bin(item, j, w) for j in range(1, d + 1)])


def cm_accumulate(
    df: DataFrame,
    grp: str = "grp",
    item: str = "item",
    w: int = _CM_DEFAULT_W,
    d: int = _CM_DEFAULT_D,
) -> DataFrame:
    """Long-form (sparse) CountMin partial: one (group, bin, cnt) row
    per touched counter — the accumulate half of the algebra. Sparse
    long form beats a dense w*d array at high group cardinality (most
    counters are zero) and makes the MERGE a plain union +
    re-groupBy SUM, exactly the relational shape of the other
    mergeable-MV algebras (hist/set/topk). Unified here from
    plans/catalog_staged.py in r9 (ROADMAP 0b); the dense twin is the
    ``cm:<w>x<d>`` StateCol algebra below."""
    return (
        df.select(F.col(grp), F.explode(cm_bins(F.col(item), w, d)).alias("bin"))
        .groupBy(grp, "bin")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cm_merge(*states: DataFrame) -> DataFrame:
    """Merge long-form CountMin states: union + re-groupBy SUM —
    counters add, the defining mergeability of the sketch (delta-cost
    refresh, no history rescan)."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    grp_cols = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*grp_cols).agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    state: DataFrame,
    probes: DataFrame,
    grp: str = "grp",
    item: str = "item",
    w: int = _CM_DEFAULT_W,
    d: int = _CM_DEFAULT_D,
) -> DataFrame:
    """Point-query estimates off long-form state: min over the d
    probed counters — the CountMin read. Guaranteed >= the true count
    (each counter holds the true count plus non-negative collision
    mass). Probe relation is (group, item) pairs; the join is
    (group, bin)-keyed against the bounded state."""
    pb = probes.select(grp, item, F.explode(cm_bins(F.col(item), w, d)).alias("bin"))
    return (
        pb.join(state, [grp, "bin"], "left")
        .groupBy(grp, item)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cm_estimate"))
    )


def _cm_merge(w: int, d: int):
    """The ``cm:<w>x<d>`` STATE-COLUMN algebra: state is the dense
    length-``w*d`` BIGINT counter vector (the d hash rows laid out
    flat); two states merge by element-wise addition — literally the
    ``hist:<n>`` vector-add algebra at n = w*d, because a CountMin
    sketch IS d stacked count histograms over hashed bins. Same
    caller contract as hist (no NULL cells; over-length truncates,
    under-length zero-fills). Build per-batch partials with
    :func:`cm_accumulate_vec`; read point estimates with
    :func:`cm_estimate_expr` — no extra shuffle, the read is a pure
    array expression over merged state."""
    return _hist_merge(w * d)


def cm_accumulate_vec(
    df: DataFrame,
    keys: list[str],
    item: str = "item",
    w: int = _CM_DEFAULT_W,
    d: int = _CM_DEFAULT_D,
    out_col: str = "cm",
) -> DataFrame:
    """Dense-vector CountMin partial for the ``cm:<w>x<d>`` StateCol
    algebra: explode the d bin positions, count per (keys, bin) —
    map-combinable on the fact table — then assemble the length-w*d
    vector with :func:`bins_to_array`, touching only the tiny
    (groups x touched-bins) relation."""
    binned = (
        df.select(
            *keys,
            # bins_to_array's map is keyed by the INT sequence index
            # (cast the ARRAY, not the exploded column — a generator
            # can't be nested in a cast expression)
            F.explode(cm_bins(F.col(item), w, d).cast("array<int>")).alias("bin"),
        )
        .groupBy(*keys, "bin")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    return binned.groupBy(*keys).agg(
        bins_to_array(w * d, "bin", "cnt").alias(out_col)
    )


def cm_estimate_expr(
    state_col: Column | str,
    item: Column | str,
    w: int = _CM_DEFAULT_W,
    d: int = _CM_DEFAULT_D,
) -> Column:
    """Point-query read off a merged ``cm:<w>x<d>`` state vector: min
    over the item's d probed cells. Pure array expression (no join,
    no shuffle) — usable right after ``merge_agg_state``; missing
    cells read 0 like the long-form LEFT-join read."""
    s = F.col(state_col) if isinstance(state_col, str) else state_col
    return F.array_min(
        F.transform(
            cm_bins(item, w, d),
            lambda p: F.coalesce(
                F.element_at(s, (p + 1).cast("int")), F.lit(0).cast("bigint")
            ),
        )
    )


def _merge_fn(how: str):
    if how.startswith("cm:"):
        # cm:<w>x<d> — malformed specs ("cm:", "cm:32", "cm:0x4",
        # "cm:axb") report through the unified unknown-algebra error
        try:
            w_s, d_s = how.split(":", 1)[1].split("x", 1)
            w, d = int(w_s), int(d_s)
        except ValueError:
            return None
        if w <= 0 or d <= 0:
            return None
        return _cm_merge(w, d)
    if how.startswith("fi:"):
        try:
            n = int(how.split(":", 1)[1])
        except ValueError:
            return None
        if n <= 0:
            return None
        return _fi_merge(n)
    if how.startswith("topk:"):
        # malformed specs ("topk:", "topk:abc", "topk:0") report
        # through the unified unknown-algebra error (ADVICE r6), not a
        # bare int() ValueError from inside validation
        try:
            k = int(how.split(":", 1)[1])
        except ValueError:
            return None
        if k <= 0:
            return None
        return _topk_merge(k)
    if how.startswith("hist:"):
        # same malformed-spec handling as topk (ADVICE r6)
        try:
            n = int(how.split(":", 1)[1])
        except ValueError:
            return None
        if n <= 0:
            return None
        return _hist_merge(n)
    if how == "set":
        return _set_merge
    return _MERGES.get(how)


@dataclass(frozen=True)
class StateCol:
    """One mergeable state column: ``name`` both in the partial-agg
    output and the stored state, merged with ``how``
    (sum|min|max|hll|topk:<k>|set|hist:<n>|fi:<n> — "hll" unions DataSketches
    HLL sketches built with ``F.hll_sketch_agg``, the maintainable
    approximate COUNT(DISTINCT); "topk:<k>" merges DESC-sorted top-k
    value arrays, the maintainable leaderboard; "set" unions sorted
    distinct-value arrays, the EXACT count-distinct for bounded
    domains; "hist:<n>" adds length-n bin-count vectors element-wise,
    the maintainable histogram/quantile distribution; "fi:<n>" combines
    Spark-4 approx_top_k sketches, the maintainable frequency heavy
    hitters — capacity-exact when n covers the domain; "cm:<w>x<d>"
    adds dense length-w*d CountMin counter vectors element-wise, the
    maintainable point-frequency sketch — build partials with
    cm_accumulate_vec, read with cm_estimate_expr)."""

    name: str
    how: str

    def merge_expr(self) -> Column:
        fn = _merge_fn(self.how)
        if fn is None:  # pragma: no cover - guarded by merge_agg_state
            raise ValueError(f"unknown merge algebra {self.how!r}")
        return fn(F.col(self.name)).alias(self.name)


def merge_agg_state(
    state: DataFrame, delta_partial: DataFrame, keys: list[str], cols: list[StateCol]
) -> DataFrame:
    """Merge a batch's partial aggregate into the stored state.

    Both inputs must have schema ``keys + [c.name for c in cols]``
    (the partial aggregate of their respective row sets).  Shape:
    ``unionByName`` then one ``groupBy(keys)`` — a single shuffle on
    the group keys and NO join; groups present on only one side fall
    out naturally (no null-coalescing edge cases, unlike the
    full-outer-join formulation).  Works for k-way merges by folding.
    """
    expect = set(keys) | {c.name for c in cols}
    for side, df in (("state", state), ("delta", delta_partial)):
        missing = expect - set(df.columns)
        if missing:
            raise ValueError(f"{side} side missing state columns: {sorted(missing)}")
    bad = [c.how for c in cols if _merge_fn(c.how) is None]
    if bad:
        raise ValueError(f"unknown merge algebra(s): {bad}")
    merged = (
        state.select(*keys, *[c.name for c in cols])
        .unionByName(delta_partial.select(*keys, *[c.name for c in cols]))
        .groupBy(*keys)
        .agg(*[c.merge_expr() for c in cols])
    )
    return merged
