"""Reference-parity relational queries (SURVEY.md §2.1-§2.8).

Every operator class the reference exercises — scans, projections,
filters, joins, aggregations, running windows, sorts/top-k, set ops,
scalar functions — expressed Spark-first over the driver fixtures.
The lichess-shaped analogs (eda.ipynb cells 4-12) run on ``events``
(user_id ≈ Player, event_type ≈ game type, ts ≈ DateTime) per
FIXTURES.md §4's mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.aggregates import (
    decimal_sum,
    group_count,
    scaled_int_sum,
    with_proportion,
)
from ..operators.topk import top_k
from ..functions.scalar import question_to_null, recode, stable_unit_hash
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# §2.1 scans
# --------------------------------------------------------------------------


@register(
    "s6_scan_projection",
    "SELECT p_partkey, p_brand FROM part",
    "S6: parquet glob scan with column pruning — .explain shows ReadSchema "
    "with exactly the two projected columns (eda.ipynb:cell2 lazy scan).",
)
def s6_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").select("p_partkey", "p_brand")


# --------------------------------------------------------------------------
# §2.4 aggregations (A1-A5) — eda.ipynb cells 4-8
# --------------------------------------------------------------------------


@register(
    "a1_count",
    "SELECT COUNT(*) AS n_events FROM events",
    "A1: ungrouped count (eda.ipynb:cell4).",
)
def a1_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").agg(F.count("*").alias("n_events"))


@register(
    "a2_approx_distinct",
    None,  # HLL sketches differ per engine; exact twin below is the gate
    "A2: approx_count_distinct / HyperLogLog++ (eda.ipynb:cell5). "
    "Rows-only check: sketch estimates are engine-specific.",
)
def a2_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.approx_count_distinct("event_type").alias("approx_types"),
    )


@register(
    "a2_exact_distinct",
    "SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, "
    "CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types FROM events",
    "A2 (exact twin): COUNT DISTINCT — the oracle-checkable variant of cell5.",
)
def a2_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "a3_group_count",
    "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
    "A3: hash group-by + count (eda.ipynb:cell6/7 shape). Partial+final "
    "agg: only 5 group rows cross the shuffle.",
)
def a3_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return group_count(_t(spark, sf_dir, "events"), "event_type", alias="n")


@register(
    "a4_proportions",
    """
    SELECT event_type, COUNT(*) AS n,
           COUNT(*) * 1.0 / SUM(COUNT(*)) OVER () AS proportion
    FROM events GROUP BY event_type
    """,
    "A4: grand-total-normalized proportions (eda.ipynb:cell6/7) — scalar "
    "total broadcast into each group row via an empty-partition window "
    "over the *aggregated* (tiny) frame.",
)
def a4_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = group_count(_t(spark, sf_dir, "events"), "event_type", alias="n")
    return with_proportion(g, "n")


@register(
    "a5_j1_color_join",
    """
    WITH c AS (SELECT user_id, COUNT(*) AS n_click FROM events
               WHERE event_type = 'click' GROUP BY user_id),
         v AS (SELECT user_id, COUNT(*) AS n_view FROM events
               WHERE event_type = 'view' GROUP BY user_id)
    SELECT c.user_id, c.n_click, v.n_view, c.n_click + v.n_view AS n_total
    FROM c JOIN v USING (user_id)
    """,
    "J1+A5: self-join of two grouped scans (games-as-white vs games-as-"
    "black, eda.ipynb:cell8) + horizontal sum. Inner join deliberately "
    "drops one-sided users (reference semantics, SURVEY §2.3). Both sides "
    "share a shuffle key; AQE may broadcast the smaller aggregate.",
)
def a5_j1_color_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click").groupBy("user_id").agg(F.count("*").alias("n_click"))
    )
    views = (
        ev.where(F.col("event_type") == "view").groupBy("user_id").agg(F.count("*").alias("n_view"))
    )
    return clicks.join(views, "user_id", "inner").select(
        "user_id", "n_click", "n_view", (F.col("n_click") + F.col("n_view")).alias("n_total")
    )


@register(
    "a3_daily_counts",
    "SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n FROM events GROUP BY 1",
    "A3 on a date key: games-per-day (eda.ipynb:cell10 shape). The day "
    "key is a string: pandas date-vs-datetime64 dtype coercion differs "
    "between engines when NULLs appear, strings never do.",
)
def a3_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count("*").alias("n")
    )


# --------------------------------------------------------------------------
# §2.6 sorts / top-k (O1-O4)
# --------------------------------------------------------------------------


@register(
    "o1_global_sort_rank",
    """
    SELECT o_orderkey, o_orderdate,
           ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
    """,
    "O1: multi-key global sort (ingester.py:404) materialized as a rank so "
    "the order itself is value-checked. Scale note: a global row_number "
    "single-partitions the sort tail; at 100 TB use zipWithIndex on the "
    "range-partitioned sort or accept per-partition offsets.",
)
def o1_global_sort_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderdate", "o_orderkey")
    return o.select("o_orderkey", "o_orderdate", F.row_number().over(w).alias("rn"))


@register(
    "o1_global_rank_scalable",
    """
    SELECT o_orderkey, o_orderdate,
           ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
    """,
    "O1 at scale: same global rank as o1_global_sort_rank (same oracle) "
    "but distributed — range-partitioned sort + JVM-side local offsets "
    "+ broadcast per-partition counts (operators/rank.py). No "
    "single-partition Window anywhere near the data; o1_global_sort_rank "
    "stays registered as the single-partition oracle twin.",
)
def o1_global_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import global_rank

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return global_rank(o, "o_orderdate", "o_orderkey", rank_col="rn")


@register(
    "o3_topk_head",
    """
    SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ORDER BY n DESC, user_id LIMIT 20
    """,
    "O3: top-20 players by game count (eda.ipynb:cell8 head(20)); "
    "TakeOrderedAndProject — no global sort. Full tiebreaker (user_id) "
    "for a deterministic set.",
)
def o3_topk_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = group_count(_t(spark, sf_dir, "events"), "user_id", alias="n")
    return top_k(g, 20, F.desc("n"), F.asc("user_id"))


@register(
    "o4_topk_tail",
    """
    SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ORDER BY n ASC, user_id LIMIT 20
    """,
    "O4: sort-asc + tail(20) (eda.ipynb:cell12) normalized to "
    "orderBy(asc).limit — df.tail is a driver-side collect, avoided.",
)
def o4_topk_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = group_count(_t(spark, sf_dir, "events"), "user_id", alias="n")
    return top_k(g, 20, F.asc("n"), F.asc("user_id"))


# --------------------------------------------------------------------------
# §2.2 projections / filters (P1, P5-P9)
# --------------------------------------------------------------------------


@register(
    "p1_computed_columns",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           l_quantity > 25 AS bulk_flag
    FROM lineitem
    """,
    "P1: withColumns-style computed projection (ingester.py:334-343). The "
    "2dp*2dp product is exactly a 4-decimal value; DECIMAL(18,4) recovers "
    "it identically in both engines.",
)
def p1_computed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("revenue"),
        (F.col("l_quantity") > 25).alias("bulk_flag"),
    )


@register(
    "p5_dtype_selector",
    "SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem",
    "P5: dtype-based column selection (eda.ipynb:cell8 pl.col(pl.UInt32)) "
    "— list comprehension over df.dtypes.",
)
def p5_dtype_selector(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    bigint_cols = [c for c, t in li.dtypes if t == "bigint"]
    return li.select(*bigint_cols)


@register(
    "p6_question_null",
    """
    SELECT o_orderkey, NULLIF(o_orderpriority, '?') AS priority,
           NULLIF(o_orderpriority, '?') IS NULL AS was_unknown
    FROM orders
    """,
    "P6: '?' -> NULL normalization (ingester.py:334) as a when-without-"
    "otherwise.",
)
def p6_question_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cleaned = question_to_null("o_orderpriority")
    return o.select(
        "o_orderkey", cleaned.alias("priority"), cleaned.isNull().alias("was_unknown")
    )


@register(
    "p7_conjunctive_filter",
    """
    SELECT event_id, user_id, value FROM events
    WHERE value > 100 AND event_type = 'purchase'
    """,
    "P7: conjunctive predicate (eda.ipynb:cell11 dual Elo filter); both "
    "conjuncts reach the parquet scan as PushedFilters.",
)
def p7_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.where((F.col("value") > 100) & (F.col("event_type") == "purchase")).select(
        "event_id", "user_id", "value"
    )


@register(
    "p8_membership_filter",
    """
    SELECT o_orderstatus, COUNT(*) AS n FROM orders
    WHERE o_orderstatus IN ('O', 'F') GROUP BY o_orderstatus
    """,
    "P8: isin membership filter (eda.ipynb:cell6 winner filter).",
)
def p8_membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderstatus").isin("O", "F"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


@register(
    "p9_null_flags",
    """
    SELECT props IS NOT NULL AS has_props, COUNT(*) AS n
    FROM events GROUP BY props IS NOT NULL
    """,
    "P9: is_not_null -> boolean flag (ingester.py:341-342 title flags).",
)
def p9_null_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.col("props").isNotNull().alias("has_props")).agg(
        F.count("*").alias("n")
    )


# --------------------------------------------------------------------------
# §2.8 scalar functions (F2-F12)
# --------------------------------------------------------------------------


@register(
    "f2f3f5_string_ops",
    """
    SELECT doc_id,
           CAST(REPLACE(source, 'src', '') AS BIGINT) AS source_num,
           UPPER(lang) AS lang_uc,
           lang || ':' || source AS lang_source
    FROM documents
    """,
    "F2/F3/F5: regex-replace (plus-strip shape, ingester.py:337), literal "
    "prefix strip (Site->ID, ingester.py:339), string concat (DateTime "
    "build, ingester.py:227).",
)
def f2f3f5_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace("source", "src", "").cast("bigint").alias("source_num"),
        F.upper("lang").alias("lang_uc"),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
    )


@register(
    "f4_timestamp_roundtrip",
    """
    SELECT event_id,
           strftime(ts, '%Y.%m.%d %H:%M:%S') AS ts_str,
           strptime(strftime(ts, '%Y.%m.%d %H:%M:%S'), '%Y.%m.%d %H:%M:%S') AS ts_parsed
    FROM events
    """,
    "F4: the reference's '%Y.%m.%d %H:%M:%S' string->timestamp parse "
    "(ingester.py:338) — format out, parse back (second precision).",
)
def f4_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = F.date_format("ts", "yyyy.MM.dd HH:mm:ss")
    return ev.select(
        "event_id",
        s.alias("ts_str"),
        F.to_timestamp(s, "yyyy.MM.dd HH:mm:ss").alias("ts_parsed"),
    )


@register(
    "f6_contains_flags",
    """
    SELECT contains(text, 'spark') AS mentions_spark, COUNT(*) AS n
    FROM documents GROUP BY contains(text, 'spark')
    """,
    "F6: substring-test flags (Tournament / Evaluation_flag, "
    "ingester.py:147,168).",
)
def f6_contains_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.col("text").contains("spark").alias("mentions_spark")).agg(
        F.count("*").alias("n")
    )


@register(
    "f7_split_truncate",
    """
    SELECT doc_id,
           TRIM(string_split(text, 'data')[1]) AS before_kw,
           LENGTH(TRIM(string_split(text, 'data')[1])) AS before_len
    FROM documents
    """,
    "F7: split + first-element truncation (moves cut at '4.', "
    "ingester.py:156-158; event name strip at :149).",
)
def f7_split_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    first = F.trim(F.element_at(F.split("text", "data"), 1))
    return d.select("doc_id", first.alias("before_kw"), F.length(first).alias("before_len"))


@register(
    "f8_dict_recode",
    """
    SELECT CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'fulfilled'
                              WHEN 'P' THEN 'pending' END AS status_label,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
    "F8: dict recode as a native when-chain (winner map, eda.ipynb:cell6; "
    "also de-UDFs the reference's map_elements at ingester.py:377).",
)
def f8_dict_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    label = recode("o_orderstatus", {"O": "open", "F": "fulfilled", "P": "pending"})
    return o.groupBy(label.alias("status_label")).agg(F.count("*").alias("n"))


@register(
    "f11_binning",
    """
    SELECT CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS bal_sum
    FROM customer GROUP BY 1
    """,
    "F11: numeric binning (PlayerElo_bin, ingester.py:406) via floor "
    "arithmetic; the polars-interval-label twin is functions.scalar."
    "elo_bin (golden-tested).",
)
def f11_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.groupBy(
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_bin")
    ).agg(F.count("*").alias("n"), decimal_sum("c_acctbal", 2, "bal_sum"))


@register(
    "w5_stable_unit_tag",
    """
    SELECT DISTINCT user_id,
           (user_id * 2654435761 % 4294967296) / 4294967296.0 AS user_tag
    FROM events
    """,
    "W5: stable per-player random tag. The reference draws unseeded "
    "random() on first appearance (ingester.py:180-196, not reproducible); "
    "a Knuth multiplicative hash gives the same sampling power with zero "
    "state and full determinism.",
)
def w5_stable_unit_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select("user_id").distinct().select(
        "user_id", stable_unit_hash("user_id").alias("user_tag")
    )


# --------------------------------------------------------------------------
# §2.3/§2.7 joins & set ops — TPC-H-shaped multi-join chains
# --------------------------------------------------------------------------


@register(
    "u1_union_unpivot",
    """
    SELECT o_custkey AS party_id, 'customer' AS role FROM orders
    UNION ALL
    SELECT s_suppkey AS party_id, 'supplier' AS role FROM supplier
    """,
    "U1: dual-perspective union (white/black unpivot, ingester.py:402-404) "
    "— unionByName of two role-tagged projections.",
)
def u1_union_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("party_id"), F.lit("customer").alias("role")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_id"), F.lit("supplier").alias("role")
    )
    return o.unionByName(s)


@register(
    "set_intersect",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "Parity-plus set op (SURVEY §2.7): users who both clicked and "
    "purchased.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@register(
    "set_except",
    """
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    "Parity-plus set op: viewers who never hit an error.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "view").select("user_id")
    b = ev.where(F.col("event_type") == "error").select("user_id")
    return a.subtract(b)


@register(
    "semi_join_multi_item_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_linenumber >= 5)
    """,
    "Parity-plus semi join (EXISTS; SURVEY §2.3 notes the reference has "
    "none): orders having a 5th line item. left_semi never duplicates "
    "or widens rows — the probe side streams.",
)
def semi_join_multi_item_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_linenumber") >= 5)
    return o.join(
        li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    ).select("o_orderkey", "o_totalprice")


@register(
    "anti_join_customers_no_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "Parity-plus anti join (NOT EXISTS): customers who never ordered.",
)
def anti_join_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "having_active_users",
    """
    SELECT user_id, COUNT(*) AS n FROM events
    GROUP BY user_id HAVING COUNT(*) > 80
    """,
    "HAVING: post-aggregation filter (planned as Filter over the final "
    "hash agg — no second shuffle).",
)
def having_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(F.count("*").alias("n")).where(F.col("n") > 80)


@register(
    "above_avg_balance",
    """
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
                              / COUNT(*) FROM customer)
    """,
    "Scalar-subquery shape: customers above the mean balance. The "
    "scalar is a broadcast of one row; the mean uses exact decimal "
    "moments so the predicate cut is engine-portable.",
)
def above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    mean = c.agg(
        (decimal_sum("c_acctbal", 2) / F.count("*")).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(mean))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_acctbal")
    )


@register(
    "approx_quantiles_value",
    None,  # sketch-based; engine-specific like HLL
    "Approximate quantiles (Greenwald-Khanna sketch) of event values — "
    "the quantile twin of A2's HLL. Rows-only: sketches differ per "
    "engine; the exact rank-based twin is median_disc_by_type.",
)
def approx_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.percentile_approx("value", [0.25, 0.5, 0.75, 0.99], 10000).alias("quantiles")
    )


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 shape: the flagship scan->filter->hash-agg. Exercises "
    "predicate pushdown + partial aggregation; all money sums are "
    "exact and order-independent via the two-level scaled-int shape "
    "(operators/aggregates.py two_level_scaled_agg): int64 partials "
    "per (group, input partition) — plain codegen long adds on the "
    "hot path — merged by DECIMAL(38,0) adds over the tiny partial "
    "relation. Bit-identical to the r1-r5 decimal formulation (same "
    "exact rational, same oracle), measured 1.5x at sf0.1, and "
    "unbounded in per-group rows: Q1's 4 groups would overflow a "
    "single-level int64 accumulator around SF60 at scale 6, but a "
    "partial never spans more than one input partition (~1e6 rows at "
    "128MB splits, 9x inside int64 for scale-6 charge terms).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import two_level_scaled_agg

    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    agg = two_level_scaled_agg(
        li.where(F.col("l_shipdate") <= F.lit("1999-09-02").cast("timestamp")),
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", 2, "sum_qty"),
            ("l_extendedprice", 2, "sum_base_price"),
            (disc_price, 4, "sum_disc_price"),
            (charge, 6, "sum_charge"),
            ("l_discount", 2, "__sum_disc"),
        ],
        count_alias="count_order",
    )
    # avgs derive from the exact sums at read time (double / bigint,
    # the same IEEE division the oracle's CAST(...)/COUNT(*) computes)
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
        (F.col("__sum_disc") / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "TPC-H Q3 shape: 3-way join -> agg -> top-10. customer side is "
    "dimension-sized -> broadcast hint; lineitem never shuffles for the "
    "join, only for the final (tiny) aggregate. The per-order revenue "
    "sum rides scaled_int_sum (int64 accumulator): grouping by "
    "orderkey bounds a group at ~7 lineitems, so |sum|*10^4 < 1e10 — "
    "eight orders of magnitude inside the int64 contract at ANY SF.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(
        F.broadcast(o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        scaled_int_sum(revenue, 4, "revenue")
    )
    return top_k(agg, 10, F.desc("revenue"), F.asc("l_orderkey")).select(
        "l_orderkey", "revenue", "o_orderdate", "o_orderpriority"
    )


@register(
    "q5_region_revenue",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN supplier ON s_nationkey = n_nationkey
                JOIN lineitem ON l_suppkey = s_suppkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    "TPC-H Q5 shape: snowflake join chain region->nation->supplier->"
    "lineitem. All dimension sides broadcast: the fact table is joined "
    "with zero shuffles; the only exchange carries the tiny "
    "(nation x partition) scaled-int partials (two_level_scaled_agg — "
    "5 groups is the unbounded-rows-per-group regime, so the int64 "
    "accumulation is split per input partition; exact and "
    "bit-identical to the decimal oracle).",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import two_level_scaled_agg

    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    dim = s.join(
        F.broadcast(n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return two_level_scaled_agg(
        li.join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey")),
        ["n_name"],
        [(revenue, 4, "revenue")],
    )


@register(
    "brand_revenue_topk",
    """
    SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY revenue DESC, p_brand LIMIT 10
    """,
    "Fact-dim broadcast join + agg + top-k (the Opening top-20 shape of "
    "eda.ipynb:cell12 with a join).",
)
def brand_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,4)")
    agg = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.sum(revenue).cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )
    return top_k(agg, 10, F.desc("revenue"), F.asc("p_brand"))


# --------------------------------------------------------------------------
# §2.5 running-state windows (W1-W4) — the d_cum_games features
# --------------------------------------------------------------------------

_W_ORDER = ["ts", "event_id"]


@register(
    "w1_running_count_by_type",
    """
    SELECT event_id, user_id, event_type,
           CAST(COUNT(*) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS cum_games_type
    FROM events
    """,
    "W1: running per-player count per game type incl. current row "
    "(d_cum_games[type][player] += 1, ingester.py:186-197).",
)
def w1_running_count_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import running_count, running_frame

    ev = _t(spark, sf_dir, "events")
    w = running_frame(["user_id", "event_type"], _W_ORDER)
    return ev.select(
        "event_id", "user_id", "event_type", running_count(w).cast("int").alias("cum_games_type")
    )


@register(
    "w2_running_count_total",
    """
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS cum_games_total
    FROM events
    """,
    "W2: running per-player total count (d_cum_games['All'], "
    "ingester.py:180-198).",
)
def w2_running_count_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import running_count, running_frame

    ev = _t(spark, sf_dir, "events")
    w = running_frame(["user_id"], _W_ORDER)
    return ev.select("event_id", "user_id", running_count(w).cast("int").alias("cum_games_total"))


@register(
    "w3_running_max",
    """
    SELECT event_id, user_id, event_type,
           MAX(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_max
    FROM events
    """,
    "W3: running max own-Elo per (type, player) incl. current row "
    "(ingester.py:200-208); MAX ignores NULLs so '?'-null carries "
    "forward for free.",
)
def w3_running_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import running_frame, running_max

    ev = _t(spark, sf_dir, "events")
    w = running_frame(["user_id", "event_type"], _W_ORDER)
    return ev.select("event_id", "user_id", "event_type", running_max("value", w).alias("value_max"))


@register(
    "w4_running_max_faced",
    """
    SELECT event_id, user_id,
           CAST(MAX(LENGTH(props)) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS faced_max
    FROM events
    """,
    "W4: 'max Elo faced' — implements the *intended* semantics (running "
    "max over a second column), not the reference bug that reuses the "
    "player's own Elo (ingester.py:210-218; SURVEY §2.5 W4).",
)
def w4_running_max_faced(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import running_frame, running_max

    ev = _t(spark, sf_dir, "events")
    w = running_frame(["user_id"], _W_ORDER)
    return ev.select(
        "event_id", "user_id", running_max(F.length("props"), w).cast("int").alias("faced_max")
    )


@register(
    "rank_lag_lead",
    """
    SELECT event_id, user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
    "Parity-plus ranking windows (SURVEY §2.5 notes the reference has "
    "none): row_number / lag / lead per player timeline.",
)
def rank_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "distinct_agg_by_group",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
    "Parity-plus distinct-aggregation (SURVEY §2.4: reference lacks it): "
    "per-type distinct users. Spark expands to a two-phase agg "
    "(partial distinct then final) automatically.",
)
def distinct_agg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events")
    )


@register(
    "pivot_user_type_counts",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events GROUP BY user_id
    """,
    "Parity-plus pivot: per-user event-type count matrix via "
    "groupBy().pivot() with explicit values (no extra distinct-scan; "
    "one shuffle).",
)
def pivot_user_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    out = ev.groupBy("user_id").pivot("event_type", types).agg(F.count(F.lit(1)))
    # pivot leaves NULL for absent combos; FILTER-count yields 0
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


@register(
    "sample_stable_fraction",
    """
    SELECT user_id, COUNT(*) AS n FROM events
    WHERE (user_id * 2654435761 % 4294967296) / 4294967296.0 < 0.3
    GROUP BY user_id
    """,
    "Reproducible sampling — the *purpose* of the reference's "
    "{player}_random tags (readme usage): a deterministic hash tag "
    "selects a stable ~30% user cohort on every engine and every run.",
)
def sample_stable_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(stable_unit_hash("user_id") < 0.3)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )


@register(
    "json_extract_props",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    "F13 twin (json handling): extract a field from the props JSON "
    "column (get_json_object -> JVM-side JSON path).",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6 shape: the pure pushdown showcase — every predicate "
    "reaches the parquet scan (range + between + comparison), then a "
    "single exact-decimal sum. At 100 TB this is row-group-stat "
    "skipping territory.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(30,4)"))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q12_conditional_agg",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
    GROUP BY l_linestatus
    """,
    "TPC-H Q12 shape: conditional aggregation (SUM(CASE WHEN)) over a "
    "fact-fact equi-join with a non-equi residual predicate.",
)
def q12_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_linestatus")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = li.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey")).where(
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


@register(
    "median_disc_by_type",
    """
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM events
    )
    SELECT event_type, MAX(CASE WHEN rn = (cnt + 1) // 2 THEN value END) AS median_value
    FROM ranked GROUP BY event_type
    """,
    "Parity-plus percentile: discrete (lower) median per group. "
    "Deliberately rank-based rather than percentile()/quantile_cont — "
    "interpolation formulas differ across engines in the last ulp; the "
    "picked-element median is exactly portable and needs only one "
    "window pass.",
)
def median_disc_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("cnt"),
    )
    return ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.floor((F.col("cnt") + 1) / 2), F.col("value"))
        ).alias("median_value")
    )


@register(
    "stddev_exact_by_type",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(value * value AS DECIMAL(30,4))) AS DOUBLE) AS s2,
           sqrt((COUNT(*) * CAST(SUM(CAST(value * value AS DECIMAL(30,4))) AS DOUBLE)
                 - CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE)
                   * CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE))
                / (COUNT(*) * (COUNT(*) - 1))) AS stddev_value
    FROM events GROUP BY event_type
    """,
    "Parity-plus variance/stddev via exact decimal moments: built-in "
    "stddev is a float fold whose result depends on accumulation order; "
    "sum and sum-of-squares over DECIMAL are exact (2-dec values square "
    "to exactly 4 decimals), so n*s2 - s1^2 is engine-portable.",
)
def stddev_exact_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s1 = F.sum(F.col("value").cast("decimal(30,2)")).cast("double")
    s2 = F.sum((F.col("value") * F.col("value")).cast("decimal(30,4)")).cast("double")
    n = F.count("*")
    agg = ev.groupBy("event_type").agg(
        n.alias("n"), s1.alias("s1"), s2.alias("s2")
    )
    return agg.select(
        "event_type",
        "n",
        "s1",
        "s2",
        F.sqrt(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
            / (F.col("n") * (F.col("n") - 1))
        ).alias("stddev_value"),
    )


@register(
    "map_explode_props",
    """
    WITH kv AS (
        SELECT unnest(json_keys(props)) AS prop_key, props FROM events
    )
    SELECT prop_key,
           CAST(SUM(CAST(json_extract_string(props, '$.' || prop_key) AS BIGINT)) AS BIGINT) AS value_sum,
           COUNT(*) AS n
    FROM kv GROUP BY prop_key
    """,
    "Map-column functions: props JSON -> map<string,int> -> explode -> "
    "per-key aggregate (from_json + map explode; the reference has no "
    "nested columns, SURVEY §1.2 — parity-plus for the fixtures').",
)
def map_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,int>")).alias("prop_key", "v")
    )
    return kv.groupBy("prop_key").agg(
        F.sum(F.col("v").cast("bigint")).alias("value_sum"), F.count("*").alias("n")
    )


@register(
    "cube_type_day",
    """
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
    FROM events GROUP BY CUBE (event_type, strftime(ts, '%Y-%m-%d'))
    """,
    "Parity-plus cube: all grouping-set combinations of (type, day).",
)
def cube_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    return ev.cube("event_type", "day").agg(F.count("*").alias("n"))


@register(
    "rollup_type_day",
    """
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
    FROM events GROUP BY ROLLUP (event_type, strftime(ts, '%Y-%m-%d'))
    """,
    "Parity-plus rollup (SURVEY §2.4 notes reference lacks it): "
    "(type, day) hierarchy with subtotal and grand-total rows. String "
    "day key (see a3_daily_counts).",
)
def rollup_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    return ev.rollup("event_type", "day").agg(F.count("*").alias("n"))
