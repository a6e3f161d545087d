"""merge_agg_state: mergeable-state algebra == full recompute.

The operator's contract is merge(agg(A), agg(B)) == agg(A U B) for
commutative-associative state columns; the catalog entry
``incremental_agg_orders`` proves one 2-way split against the DuckDB
oracle, these tests prove arbitrary k-way splits (the nightly-batch
fold) and the input-validation guards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lichess_db_spark.io import load_table
from lichess_db_spark.operators.incremental import StateCol, merge_agg_state

SF_SMALL = "/root/testdata/sf0.001"

COLS = [
    StateCol("n_orders", "sum"),
    StateCol("total", "sum"),
    StateCol("first_date", "min"),
    StateCol("last_date", "max"),
]


def _partial(df):
    return df.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(30,4)")).alias("total"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("k", [2, 5])
def test_kway_fold_equals_full_agg(spark, k):
    orders = load_table(spark, SF_SMALL, "orders")
    full = _partial(orders)

    batches = [
        _partial(orders.where(F.col("o_orderkey") % k == i)) for i in range(k)
    ]
    state = batches[0]
    for b in batches[1:]:
        state = merge_agg_state(state, b, ["o_orderpriority"], COLS)

    assert _canon(state) == _canon(full)


def test_merge_with_disjoint_groups(spark):
    """Groups present on only one side must survive the merge intact
    (the union+groupBy shape has no outer-join null edge cases)."""
    orders = load_table(spark, SF_SMALL, "orders")
    one_prio = orders.select("o_orderpriority").distinct().limit(1).collect()[0][0]
    a = _partial(orders.where(F.col("o_orderpriority") == one_prio))
    b = _partial(orders.where(F.col("o_orderpriority") != one_prio))
    merged = merge_agg_state(a, b, ["o_orderpriority"], COLS)
    assert _canon(merged) == _canon(_partial(orders))


def test_missing_state_column_raises(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    good = _partial(orders)
    bad = good.drop("total")
    with pytest.raises(ValueError, match="missing state columns"):
        merge_agg_state(good, bad, ["o_orderpriority"], COLS)


def test_unknown_algebra_raises(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    p = _partial(orders)
    with pytest.raises(ValueError, match="unknown merge algebra"):
        merge_agg_state(p, p, ["o_orderpriority"], [StateCol("n_orders", "avg")])


# ---------------------------------------------------------------------------
# scaled_int_sum: bit-identical fast twin of decimal_sum (staged for the
# r6 q1 switch — see ROADMAP)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("scale", [2, 4, 6])
def test_scaled_int_sum_equals_decimal_sum(spark, scale):
    from lichess_db_spark.operators.aggregates import decimal_sum, scaled_int_sum

    li = load_table(spark, SF_SMALL, "lineitem")
    expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    got = li.groupBy("l_returnflag", "l_linestatus").agg(
        decimal_sum(expr, scale, "dec"),
        scaled_int_sum(expr, scale, "fast"),
    ).collect()
    assert got, "empty result"
    for r in got:
        # bit-identical, not approx: both rebuild the same exact rational
        assert r["dec"] == r["fast"], (r["l_returnflag"], r["l_linestatus"])


def test_scaled_int_sum_null_and_negative(spark):
    from lichess_db_spark.operators.aggregates import decimal_sum, scaled_int_sum

    df = spark.createDataFrame(
        [(1, 0.125), (1, None), (1, -2.675), (2, None)], "g int, x double"
    )
    got = df.groupBy("g").agg(
        decimal_sum("x", 2, "dec"), scaled_int_sum("x", 2, "fast")
    ).collect()
    by_g = {r["g"]: r for r in got}
    assert by_g[1]["dec"] == by_g[1]["fast"]
    # all-null group: both must yield NULL, not 0
    assert by_g[2]["dec"] is None and by_g[2]["fast"] is None


def test_two_level_scaled_agg_equals_decimal(spark):
    """two_level_scaled_agg == decimal_sum bit-for-bit on real data,
    at every scale, and invariant to the input partitioning (each
    partitioning splits the int64 partials differently; the exact
    decimal merge erases the difference)."""
    from lichess_db_spark.operators.aggregates import (
        decimal_sum,
        two_level_scaled_agg,
    )

    li = load_table(spark, SF_SMALL, "lineitem")
    expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    want = {
        (r["l_returnflag"], r["l_linestatus"]): (r["s2"], r["s6"], r["n"])
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            decimal_sum(expr, 2, "s2"),
            decimal_sum(expr, 6, "s6"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    for parts in (1, 7):
        got = two_level_scaled_agg(
            li.repartition(parts),
            ["l_returnflag", "l_linestatus"],
            [(expr, 2, "s2"), (expr, 6, "s6")],
            count_alias="n",
        ).collect()
        assert {
            (r["l_returnflag"], r["l_linestatus"]): (r["s2"], r["s6"], r["n"])
            for r in got
        } == want


def test_two_level_scaled_agg_null_groups(spark):
    from lichess_db_spark.operators.aggregates import two_level_scaled_agg

    df = spark.createDataFrame(
        [(1, 0.125), (1, None), (1, -2.675), (2, None)], "g int, x double"
    )
    by_g = {
        r["g"]: r
        for r in two_level_scaled_agg(
            df, ["g"], [("x", 2, "s")], count_alias="n"
        ).collect()
    }
    assert by_g[1]["s"] == 0.125 - 2.675 and by_g[1]["n"] == 3
    # all-null group: sum NULL (not 0), count still counts rows
    assert by_g[2]["s"] is None and by_g[2]["n"] == 1


def test_scan_memo_opt_in(spark, monkeypatch):
    """io.load_table memoizes per (session, dir, table) ONLY when
    SPARK_GRAFT_CACHE_SCANS=1 (bench mode); correctness paths get a
    fresh scan relation per call."""
    import lichess_db_spark.io as io

    monkeypatch.delenv("SPARK_GRAFT_CACHE_SCANS", raising=False)
    a = io.load_table(spark, SF_SMALL, "orders")
    b = io.load_table(spark, SF_SMALL, "orders")
    assert a is not b

    monkeypatch.setenv("SPARK_GRAFT_CACHE_SCANS", "1")
    io._SCAN_MEMO.clear()
    c = io.load_table(spark, SF_SMALL, "orders")
    d = io.load_table(spark, SF_SMALL, "orders")
    assert c is d
    assert io.load_table(spark, SF_SMALL, "part") is not c
    io._SCAN_MEMO.clear()


# ---------------------------------------------------------------------------
# adversarial-NULL parity: the fixture tables carry no NULL
# o_orderdate/o_totalprice, so the driver gate can never exercise the
# three-valued-logic hazards in snapshot_diff (NULL<->value must be
# 'changed') and incremental_agg (NULL dates must land in exactly one
# slice). Run builder AND oracle over a synthetic orders table that has
# both.
# ---------------------------------------------------------------------------


@pytest.fixture()
def null_orders_dir(spark, tmp_path):
    rows = []
    for k in range(1, 400):
        rows.append(
            (
                k,
                k % 50,
                "O",
                None if k % 13 == 0 else float(k) * 7.25,
                None if k % 17 == 0 else f"{1995 + k % 6}-0{1 + k % 9}-01",
                f"P{k % 3}",
            )
        )
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate_s string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate_s AS TIMESTAMP) AS o_orderdate", "o_orderpriority",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize(
    "name", ["snapshot_diff_orders", "incremental_agg_orders"]
)
def test_null_tolerant_parity(spark, null_orders_dir, name):
    import duckdb

    from lichess_db_spark.plans import QUERIES
    from .oracle_utils import compare

    q = QUERIES[name]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"'{null_orders_dir}/orders.parquet/*.parquet'"
    )
    spark_df = q.build(spark, null_orders_dir)
    # sanity: the synthetic table genuinely exercises the hazards
    if name == "snapshot_diff_orders":
        # the %19 NULL redaction must surface as 'changed' rows whose
        # new_price is NULL — a bare <> would have dropped every one
        assert (
            spark_df.where(
                "change_type = 'changed' AND new_price IS NULL "
                "AND old_price IS NOT NULL"
            ).count()
            > 0
        )
    compare(spark_df, con, q.oracle, name)


def test_hll_state_merge_equals_full_estimate(spark):
    """COUNT(DISTINCT) as mergeable MV state: per-batch HLL sketches
    merged across k batches yield EXACTLY the estimate of a one-shot
    sketch over everything (sketch union is register-wise max —
    associative), alongside the exact-count columns."""
    orders = load_table(spark, SF_SMALL, "orders")
    cols = [StateCol("n_orders", "sum"), StateCol("cust_sketch", "hll")]

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_orders"),
            F.hll_sketch_agg("o_custkey").alias("cust_sketch"),
        )

    k = 4
    batches = [partial(orders.where(F.col("o_orderkey") % k == i)) for i in range(k)]
    state = batches[0]
    for b in batches[1:]:
        state = merge_agg_state(state, b, ["o_orderpriority"], cols)

    got = {
        r["o_orderpriority"]: (r["n_orders"], r["est"])
        for r in state.select(
            "o_orderpriority",
            "n_orders",
            F.hll_sketch_estimate("cust_sketch").alias("est"),
        ).collect()
    }
    want = {
        r["o_orderpriority"]: (r["n_orders"], r["est"])
        for r in partial(orders)
        .select(
            "o_orderpriority",
            "n_orders",
            F.hll_sketch_estimate("cust_sketch").alias("est"),
        )
        .collect()
    }
    assert got == want


def test_scaled_int_sum_overflow_fails_loud(spark):
    """Under Spark 4's default ANSI mode a value outside
    decimal(19,scale) raises instead of silently vanishing from the
    sum — the caller-contract bound is enforced, not papered over."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    from lichess_db_spark.operators.aggregates import scaled_int_sum

    df = spark.createDataFrame([(1, 1e16)], "g int, x double")
    with pytest.raises(Exception, match="(?i)overflow|cannot be represented|CAST"):
        df.groupBy("g").agg(scaled_int_sum("x", 4, "s")).collect()


def test_mv_hll_entry_exact_cols_and_estimate(spark):
    """The mv_hll_maintenance_orders driver entry: exact columns match
    the full recompute bit-for-bit, and the maintained HLL estimate
    (a) equals the one-shot estimate over all of orders and (b) lands
    within HLL error of the exact distinct count."""
    from lichess_db_spark.plans import QUERIES

    sf = SF_SMALL
    got = {
        r["o_orderpriority"]: r
        for r in QUERIES["mv_hll_maintenance_orders"].build(spark, sf).collect()
    }
    orders = load_table(spark, sf, "orders")
    want = {
        r["o_orderpriority"]: r
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("o_custkey").alias("nd"),
            F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey"))
            .cast("bigint")
            .alias("one_shot"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k, r in got.items():
        assert r["n_orders"] == want[k]["n"], k
        assert r["approx_customers"] == want[k]["one_shot"], k  # merged == one-shot
        assert abs(r["approx_customers"] - want[k]["nd"]) <= 0.05 * want[k]["nd"], k


def test_topk_state_merge_equals_full(spark):
    """topk:k algebra: folding per-batch top-k partials over ANY batch
    split equals the one-shot top-k — dropping below a partial's k-th
    value can never evict a global top-k member."""
    from lichess_db_spark.operators.incremental import StateCol, merge_agg_state

    orders = load_table(spark, SF_SMALL, "orders")

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.slice(
                F.reverse(F.array_sort(F.collect_list("o_totalprice"))), 1, 5
            ).alias("top")
        )

    want = {r["o_orderpriority"]: r["top"] for r in partial(orders).collect()}
    # 3-way fold over a modulo split (uneven batch sizes on purpose)
    state = partial(orders.where(F.col("o_orderkey") % 7 < 2))
    for lo, hi in ((2, 3), (3, 7)):
        delta = partial(
            orders.where(
                (F.col("o_orderkey") % 7 >= lo) & (F.col("o_orderkey") % 7 < hi)
            )
        )
        state = merge_agg_state(
            state, delta, keys=["o_orderpriority"], cols=[StateCol("top", "topk:5")]
        )
    got = {r["o_orderpriority"]: r["top"] for r in state.collect()}
    assert got == want


def test_topk_state_unknown_algebra_rejected(spark):
    from lichess_db_spark.operators.incremental import StateCol, merge_agg_state

    df = spark.createDataFrame([(1, [1.0])], "g int, top array<double>")
    with pytest.raises(ValueError, match="unknown merge algebra"):
        merge_agg_state(df, df, keys=["g"], cols=[StateCol("top", "topk")])


def test_set_state_merge_exact_distinct(spark):
    """'set' algebra: folding per-batch distinct-value arrays over any
    split equals the one-shot distinct set — exact COUNT(DISTINCT) as
    mergeable state for bounded domains; idempotent under batch replay
    (set union of a batch with itself changes nothing)."""
    from lichess_db_spark.operators.incremental import StateCol, merge_agg_state

    orders = load_table(spark, SF_SMALL, "orders")

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.array_sort(F.collect_set(F.year("o_orderdate"))).alias("years")
        )

    want = {r["o_orderpriority"]: r["years"] for r in partial(orders).collect()}
    cols = [StateCol("years", "set")]
    state = partial(orders.where(F.col("o_orderkey") % 3 == 0))
    for m in (1, 2):
        delta = partial(orders.where(F.col("o_orderkey") % 3 == m))
        state = merge_agg_state(state, delta, keys=["o_orderpriority"], cols=cols)
    # replay batch 2 (idempotence): the set union absorbs it
    replay = partial(orders.where(F.col("o_orderkey") % 3 == 2))
    state = merge_agg_state(state, replay, keys=["o_orderpriority"], cols=cols)
    got = {r["o_orderpriority"]: r["years"] for r in state.collect()}
    assert got == want


def test_topk_state_null_elements_dropped(spark):
    """ADVICE r6: a NULL element in a caller-supplied state array must
    not displace real top-k members (reverse(array_sort) orders NULLs
    first); the merge filters NULLs before sorting."""
    state = spark.createDataFrame(
        [(1, [9.0, None, 7.0])], "g int, top array<double>"
    )
    delta = spark.createDataFrame([(1, [8.0, 6.0])], "g int, top array<double>")
    merged = merge_agg_state(
        state, delta, keys=["g"], cols=[StateCol("top", "topk:3")]
    )
    [row] = merged.collect()
    assert row["top"] == [9.0, 8.0, 7.0]


def test_set_state_null_elements_dropped(spark):
    """'set' algebra drops NULL elements: NULL is not a domain value,
    and keeping it would make size(state) overcount COUNT(DISTINCT)."""
    state = spark.createDataFrame([(1, [2020, None])], "g int, years array<int>")
    delta = spark.createDataFrame([(1, [2019, 2020])], "g int, years array<int>")
    merged = merge_agg_state(
        state, delta, keys=["g"], cols=[StateCol("years", "set")]
    )
    [row] = merged.collect()
    assert row["years"] == [2019, 2020]


@pytest.mark.parametrize("bad", ["topk:", "topk:abc", "topk:0", "topk:-1"])
def test_malformed_topk_spec_unified_error(spark, bad):
    """ADVICE r6: malformed topk specs surface through the unified
    unknown-algebra message, not a bare int() ValueError."""
    df = spark.createDataFrame([(1, [1.0])], "g int, top array<double>")
    with pytest.raises(ValueError, match="unknown merge algebra"):
        merge_agg_state(df, df, keys=["g"], cols=[StateCol("top", bad)])


def test_hist_state_merge_equals_full(spark):
    """'hist:n' algebra: folding per-batch bin-count vectors over any
    split equals the one-shot histogram — integer vector addition is
    associative/commutative, so hist(A∪B) == hist(A) + hist(B)."""
    from lichess_db_spark.operators.incremental import (
        StateCol,
        bins_to_array,
        merge_agg_state,
    )

    orders = load_table(spark, SF_SMALL, "orders")
    bin_expr = (
        F.least(
            F.lit(15), F.greatest(F.lit(0), F.floor(F.col("o_totalprice") / 31250.0))
        )
        .cast("int")
        .alias("__bin")
    )

    def partial(df):
        counts = df.select("o_orderpriority", bin_expr).groupBy(
            "o_orderpriority", "__bin"
        ).agg(F.count("*").cast("bigint").alias("__c"))
        return counts.groupBy("o_orderpriority").agg(
            bins_to_array(16, "__bin", "__c").alias("h")
        )

    want = {r["o_orderpriority"]: r["h"] for r in partial(orders).collect()}
    cols = [StateCol("h", "hist:16")]
    state = partial(orders.where(F.col("o_orderkey") % 5 < 2))
    for lo, hi in ((2, 3), (3, 5)):
        delta = partial(
            orders.where(
                (F.col("o_orderkey") % 5 >= lo) & (F.col("o_orderkey") % 5 < hi)
            )
        )
        state = merge_agg_state(state, delta, keys=["o_orderpriority"], cols=cols)
    got = {r["o_orderpriority"]: r["h"] for r in state.collect()}
    assert got == want
    # sanity: vectors are length 16 and total to the group's row count
    n_rows = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    for g, h in got.items():
        assert len(h) == 16
        assert sum(h) == n_rows[g]


def test_hist_state_null_cells_coalesced(spark):
    """A NULL cell in a caller-supplied state vector contributes 0
    instead of nulling the merged bin (a + NULL would poison every
    future merge); a NULL state ROW is dropped by collect_list."""
    from lichess_db_spark.operators.incremental import StateCol, merge_agg_state

    state = spark.createDataFrame(
        [(1, [2, None, 1]), (1, None)], "g int, h array<bigint>"
    )
    delta = spark.createDataFrame([(1, [1, 4, 0])], "g int, h array<bigint>")
    merged = merge_agg_state(state, delta, keys=["g"], cols=[StateCol("h", "hist:3")])
    [row] = merged.collect()
    assert row["h"] == [3, 4, 1]


def test_hist_merge_overlength_state_truncated(spark):
    """ADVICE r7: an over-length state vector is truncated to its
    first n cells instead of widening the accumulator with NULL bins
    (zip_with runs to the LONGER length; NULL + x stays NULL and would
    silently poison those bins through all future merges)."""
    from lichess_db_spark.operators.incremental import StateCol, merge_agg_state

    state = spark.createDataFrame(
        [(1, [2, 1, 9, 9])], "g int, h array<bigint>"  # len 4 > n=2
    )
    delta = spark.createDataFrame([(1, [1, 4])], "g int, h array<bigint>")
    merged = merge_agg_state(state, delta, keys=["g"], cols=[StateCol("h", "hist:2")])
    [row] = merged.collect()
    assert row["h"] == [3, 5]  # length stays 2, no NULL cells
    # and the result merges cleanly again (no poisoned bins)
    again = merge_agg_state(
        merged, delta, keys=["g"], cols=[StateCol("h", "hist:2")]
    )
    assert again.collect()[0]["h"] == [4, 9]


def test_hist_group_only_in_delta(spark):
    """A group absent from state appears in the merged result with the
    delta's vector (union+re-groupBy has no null-coalescing edge)."""
    from lichess_db_spark.operators.incremental import StateCol, merge_agg_state

    state = spark.createDataFrame([(1, [5, 0])], "g int, h array<bigint>")
    delta = spark.createDataFrame([(2, [0, 7])], "g int, h array<bigint>")
    merged = merge_agg_state(state, delta, keys=["g"], cols=[StateCol("h", "hist:2")])
    got = {r["g"]: r["h"] for r in merged.collect()}
    assert got == {1: [5, 0], 2: [0, 7]}


@pytest.mark.parametrize("bad", ["hist:", "hist:abc", "hist:0", "hist:-4"])
def test_malformed_hist_spec_unified_error(spark, bad):
    from lichess_db_spark.operators.incremental import StateCol, merge_agg_state

    df = spark.createDataFrame([(1, [1])], "g int, h array<bigint>")
    with pytest.raises(ValueError, match="unknown merge algebra"):
        merge_agg_state(df, df, keys=["g"], cols=[StateCol("h", bad)])


def test_bins_to_array_missing_bins_zero(spark):
    """bins_to_array fills absent bins with 0 and orders by bin index."""
    from lichess_db_spark.operators.incremental import bins_to_array

    rows = spark.createDataFrame(
        [(1, 0, 3), (1, 2, 5)], "g int, b int, c bigint"
    )
    [r] = rows.groupBy("g").agg(bins_to_array(4, "b", "c").alias("h")).collect()
    assert r["h"] == [3, 0, 5, 0]


def test_hist_quantile_within_one_bin(spark):
    """hist_quantile reads p50/p90/p99 off the merged hist:16 state
    within one bin width of the exact quantile (the histogram-MV
    accuracy contract), using only array expressions."""
    from lichess_db_spark.operators.incremental import (
        StateCol,
        bins_to_array,
        hist_quantile,
        merge_agg_state,
    )

    orders = load_table(spark, SF_SMALL, "orders")
    width, lo = 31250.0, 0.0
    bin_expr = (
        F.least(
            F.lit(15), F.greatest(F.lit(0), F.floor(F.col("o_totalprice") / width))
        )
        .cast("int")
        .alias("__bin")
    )

    def partial(df):
        counts = df.select("o_orderpriority", bin_expr).groupBy(
            "o_orderpriority", "__bin"
        ).agg(F.count("*").cast("bigint").alias("__c"))
        return counts.groupBy("o_orderpriority").agg(
            bins_to_array(16, "__bin", "__c").alias("h")
        )

    state = merge_agg_state(
        partial(orders.where(F.col("o_orderkey") % 2 == 0)),
        partial(orders.where(F.col("o_orderkey") % 2 == 1)),
        keys=["o_orderpriority"],
        cols=[StateCol("h", "hist:16")],
    )
    got = state.select(
        "o_orderpriority",
        hist_quantile("h", 0.5, lo, width).alias("p50"),
        hist_quantile("h", 0.9, lo, width).alias("p90"),
        hist_quantile("h", 0.99, lo, width).alias("p99"),
    ).collect()
    # exact value at the SAME rank definition (element at ceil(q*n)):
    # hist_quantile must return the upper edge of the bin CONTAINING
    # that element — i.e. the exact value lies in (edge - width, edge]
    exact = {
        r["o_orderpriority"]: (r["e50"], r["e90"], r["e99"])
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.sort_array(F.collect_list("o_totalprice")).alias("v"),
            F.count("*").alias("n"),
        )
        .select(
            "o_orderpriority",
            *[
                F.element_at("v", F.ceil(F.lit(q) * F.col("n")).cast("int")).alias(a)
                for q, a in ((0.5, "e50"), (0.9, "e90"), (0.99, "e99"))
            ],
        )
        .collect()
    }
    assert len(got) > 0
    for r in got:
        for col, ex in zip(("p50", "p90", "p99"), exact[r["o_orderpriority"]]):
            assert r[col] - width < ex <= r[col], (
                r["o_orderpriority"], col, r[col], ex,
            )


def test_hist_quantile_bad_q_raises(spark):
    from lichess_db_spark.operators.incremental import hist_quantile

    for q in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="quantile"):
            hist_quantile("h", q, 0.0, 1.0)


def test_hist_merge_random_folds_vs_python(spark):
    """Seeded-random bin vectors folded in random group splits — the
    hist algebra must equal element-wise Python sums regardless of
    how rows are distributed over merge batches."""
    import random

    from lichess_db_spark.operators.incremental import StateCol, merge_agg_state

    rng = random.Random(7)
    n, groups = 6, 4
    rows = [
        (g, [rng.randint(0, 1000) for _ in range(n)])
        for g in range(groups)
        for _ in range(rng.randint(1, 8))
    ]
    want = {}
    for g, h in rows:
        acc = want.setdefault(g, [0] * n)
        for i, x in enumerate(h):
            acc[i] += x
    # random 3-way split, folded pairwise
    rng.shuffle(rows)
    parts = [rows[0::3], rows[1::3], rows[2::3]]
    dfs = [
        spark.createDataFrame(p, "g int, h array<bigint>")
        .groupBy("g")
        .agg(StateCol("h", f"hist:{n}").merge_expr())
        for p in parts
        if p
    ]
    state = dfs[0]
    for d in dfs[1:]:
        state = merge_agg_state(
            state, d, keys=["g"], cols=[StateCol("h", f"hist:{n}")]
        )
    got = {r["g"]: list(r["h"]) for r in state.collect()}
    assert got == want


def test_fi_state_merge_capacity_exact(spark):
    """'fi:n' algebra (Spark 4 approx_top_k sketch): with capacity >=
    the distinct-value count the sketch is EXACT, so folding per-batch
    sketches over any split must reproduce the exact per-group
    frequency ranking — and the merged estimate must equal the
    one-shot sketch estimate (the hll-style merge contract)."""
    from lichess_db_spark.operators.incremental import (
        StateCol,
        fi_accumulate,
        fi_estimate,
        merge_agg_state,
    )

    orders = load_table(spark, SF_SMALL, "orders").withColumn(
        "cust_bucket", (F.col("o_custkey") % 20).cast("string")
    )
    cap = 64  # >> the 20 distinct cust_bucket values

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            fi_accumulate("cust_bucket", cap).alias("fi")
        )

    cols = [StateCol("fi", f"fi:{cap}")]
    state = partial(orders.where(F.col("o_orderkey") % 3 == 0))
    for m in (1, 2):
        delta = partial(orders.where(F.col("o_orderkey") % 3 == m))
        state = merge_agg_state(state, delta, keys=["o_orderpriority"], cols=cols)

    got = {
        r["o_orderpriority"]: [(e["item"], e["count"]) for e in r["top"]]
        for r in state.select(
            "o_orderpriority", fi_estimate("fi", 3).alias("top")
        ).collect()
    }
    # one-shot sketch == merged sketch estimate
    oneshot = {
        r["o_orderpriority"]: [(e["item"], e["count"]) for e in r["top"]]
        for r in partial(orders)
        .select("o_orderpriority", fi_estimate("fi", 3).alias("top"))
        .collect()
    }
    assert got == oneshot
    # and capacity-exact: counts match the exact GROUP BY top-3
    exact = {}
    for r in (
        orders.groupBy("o_orderpriority", "cust_bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    ):
        exact.setdefault(r["o_orderpriority"], []).append(
            (r["cust_bucket"], r["n"])
        )
    for g, top in got.items():
        want_counts = sorted((n for _, n in exact[g]), reverse=True)[: len(top)]
        assert [n for _, n in top] == want_counts, (g, top, want_counts)
        by_item = dict(exact[g])
        for item, n in top:
            assert by_item[item] == n


@pytest.mark.parametrize("bad", ["fi:", "fi:abc", "fi:0", "fi:-2"])
def test_malformed_fi_spec_unified_error(spark, bad):
    from lichess_db_spark.operators.incremental import StateCol, merge_agg_state

    df = spark.createDataFrame([(1, "x")], "g int, fi string")
    with pytest.raises(ValueError, match="unknown merge algebra"):
        merge_agg_state(df, df, keys=["g"], cols=[StateCol("fi", bad)])


def test_countmin_never_underestimates_and_merges(spark):
    """CountMin guarantees: estimate >= exact count for EVERY probe
    (each counter holds the true count plus non-negative collision
    mass), collisions actually occur at w=32 over 97 items (the
    overestimate side is exercised, not vacuous), and the merged
    hist+delta state point-reads identically to a one-shot sketch of
    the union (counters add)."""
    from pyspark.sql import functions as F

    from lichess_db_spark.io import load_table
    from lichess_db_spark.plans.catalog_staged import (
        cm_accumulate,
        cm_estimate,
        cm_merge,
    )
    from lichess_db_spark.plans.registry import QUERIES

    from .conftest import SF_SMALL

    out = QUERIES["countmin_mv_orders"].build(spark, SF_SMALL).cache()
    assert out.where(F.col("cm_estimate") < F.col("exact_count")).count() == 0
    assert out.where(F.col("cm_estimate") > F.col("exact_count")).count() > 0
    out.unpersist()

    o = load_table(spark, SF_SMALL, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_custkey") % 97).cast("string").alias("item"),
        "o_orderkey",
    )
    merged = cm_merge(
        cm_accumulate(base.where(F.col("o_orderkey") % 10 != 0)),
        cm_accumulate(base.where(F.col("o_orderkey") % 10 == 0)),
    )
    oneshot = cm_accumulate(base)
    probes = base.select("grp", "item").distinct()
    a = {
        (r.grp, r.item, r.cm_estimate)
        for r in cm_estimate(merged, probes).collect()
    }
    b = {
        (r.grp, r.item, r.cm_estimate)
        for r in cm_estimate(oneshot, probes).collect()
    }
    assert a == b


def test_cm_vector_state_merge_equals_long_form(spark):
    """The dense 'cm:<w>x<d>' StateCol algebra must agree with the
    long-form relational algebra the catalog entry drives: folding
    per-batch cm_accumulate_vec partials through merge_agg_state and
    reading with cm_estimate_expr gives EXACTLY the long-form
    cm_merge + cm_estimate values (same md5 bin space), and every
    estimate >= the exact count."""
    from lichess_db_spark.operators.incremental import (
        StateCol,
        cm_accumulate,
        cm_accumulate_vec,
        cm_estimate,
        cm_estimate_expr,
        cm_merge,
        merge_agg_state,
    )

    w, d = 32, 4
    orders = load_table(spark, SF_SMALL, "orders")
    base = orders.select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_custkey") % 97).cast("string").alias("item"),
        "o_orderkey",
    )
    cols = [StateCol("cm", f"cm:{w}x{d}")]
    state = cm_accumulate_vec(
        base.where(F.col("o_orderkey") % 3 == 0), ["grp"], "item", w, d
    )
    for m in (1, 2):
        delta = cm_accumulate_vec(
            base.where(F.col("o_orderkey") % 3 == m), ["grp"], "item", w, d
        )
        state = merge_agg_state(state, delta, keys=["grp"], cols=cols)

    probes = base.select("grp", "item").distinct()
    vec_reads = {
        (r.grp, r.item, r.est)
        for r in probes.join(state, "grp")
        .select(
            "grp", "item", cm_estimate_expr("cm", F.col("item"), w, d).alias("est")
        )
        .collect()
    }
    long_reads = {
        (r.grp, r.item, r.cm_estimate)
        for r in cm_estimate(
            cm_merge(
                cm_accumulate(base.where(F.col("o_orderkey") % 3 == 0)),
                cm_accumulate(base.where(F.col("o_orderkey") % 3 == 1)),
                cm_accumulate(base.where(F.col("o_orderkey") % 3 == 2)),
            ),
            probes,
        ).collect()
    }
    assert vec_reads == long_reads and len(vec_reads) > 0
    exact = {
        (r.grp, r.item): r.n
        for r in base.groupBy("grp", "item").agg(F.count("*").alias("n")).collect()
    }
    for g, item, est in vec_reads:
        assert est >= exact[(g, item)]


def test_cm_merge_random_folds_vs_python(spark):
    """Seeded-random items folded in random batch splits — the cm
    vector algebra must equal a Python CountMin (same md5 bins)
    regardless of how rows are distributed over merge batches."""
    import hashlib
    import random

    from lichess_db_spark.operators.incremental import (
        StateCol,
        cm_accumulate_vec,
        cm_estimate_expr,
        merge_agg_state,
    )

    w, d = 8, 3
    rng = random.Random(11)
    rows = [(rng.randint(0, 1), f"it{rng.randint(0, 30)}") for _ in range(200)]

    def pybins(item: str) -> list[int]:
        return [
            (j - 1) * w
            + int(hashlib.md5(f"{item}-{j}".encode()).hexdigest()[:8], 16) % w
            for j in range(1, d + 1)
        ]

    sketch: dict[int, list[int]] = {}
    counts: dict[tuple[int, str], int] = {}
    for g, item in rows:
        vec = sketch.setdefault(g, [0] * (w * d))
        for p in pybins(item):
            vec[p] += 1
        counts[(g, item)] = counts.get((g, item), 0) + 1

    rng.shuffle(rows)
    parts = [rows[0::3], rows[1::3], rows[2::3]]
    cols = [StateCol("cm", f"cm:{w}x{d}")]
    state = None
    for p in parts:
        df = spark.createDataFrame(p, "g int, item string")
        partial = cm_accumulate_vec(df, ["g"], "item", w, d)
        state = (
            partial
            if state is None
            else merge_agg_state(state, partial, keys=["g"], cols=cols)
        )
    got = {r["g"]: list(r["cm"]) for r in state.collect()}
    assert got == sketch
    # point reads match the python min-over-bins too
    probes = spark.createDataFrame(
        sorted(counts), "g int, item string"
    ).join(state, "g")
    reads = {
        (r.g, r.item): r.est
        for r in probes.select(
            "g", "item", cm_estimate_expr("cm", F.col("item"), w, d).alias("est")
        ).collect()
    }
    for (g, item), est in reads.items():
        assert est == min(sketch[g][p] for p in pybins(item))
        assert est >= counts[(g, item)]


@pytest.mark.parametrize("bad", ["cm:", "cm:32", "cm:0x4", "cm:4x0", "cm:ax4", "cm:4xb", "cm:-2x4"])
def test_malformed_cm_spec_unified_error(spark, bad):
    from lichess_db_spark.operators.incremental import StateCol, merge_agg_state

    df = spark.createDataFrame([(1, [0, 0])], "g int, cm array<bigint>")
    with pytest.raises(ValueError, match="unknown merge algebra"):
        merge_agg_state(df, df, keys=["g"], cols=[StateCol("cm", bad)])
