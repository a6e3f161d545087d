"""TPC-H-adapted join/aggregate breadth (SURVEY.md §2.3/§2.4 extensions).

The reference's EDA surface is star-schema OLAP (joins of aggregates,
grouped sums, top-k over joins — eda.ipynb cells 4-12); this module
widens the already-verified q1/q3/q5/q6/q12 spine to the rest of the
classic TPC-H query shapes expressible over the driver fixtures
(no partsupp table, no commit/receipt dates — those queries are
adapted, and say so in their docstrings).

Scale notes apply per entry, but the common rules:
- dimension sides (region/nation/supplier/part/customer ≤ O(SF·150k))
  broadcast; fact-fact joins (lineitem↔orders) shuffle on the join key
  and never broadcast — at 100 TB orders is ~1/4 of lineitem, so a
  broadcast there would be a driver OOM (the round-2 asof lesson).
- every money sum accumulates in DECIMAL (order-independent bit-exact
  totals regardless of partitioning); ratios divide the exact totals
  as the final step in both engines (identical IEEE doubles).
- every top-k carries a full tiebreaker so LIMIT is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.aggregates import scaled_int_sum, scaled_int_term
from ..operators.topk import top_k
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _revenue() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,4)"
    )


def _revenue_raw() -> F.Column:
    """The un-cast revenue term, for the scaled-int accumulators
    (scaled_int_term applies its own HALF_UP decimal(19,4) rounding —
    identical to _revenue()'s for every in-range value)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))"


@register(
    "q7_nation_volume",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
             {_REV_SQL} AS volume
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
      WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
         OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7 shape: bidirectional nation-pair shipping volume by year. "
    "lineitem↔orders is the one fact-fact join: shuffle on orderkey "
    "(never broadcast — orders scales with the fact table); both nation "
    "dims and supplier broadcast, customer broadcasts after its nation "
    "filter cuts it to 1/25th.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .where(F.col("supp_nation").isin("NATION_1", "NATION_2"))
        .select("s_suppkey", "supp_nation")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .where(F.col("cust_nation").isin("NATION_1", "NATION_2"))
        .select("c_custkey", "cust_nation")
    )
    o = _t(spark, sf_dir, "orders").join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "cust_nation")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
    )
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).where(
        (
            (F.col("supp_nation") == "NATION_1")
            & (F.col("cust_nation") == "NATION_2")
        )
        | (
            (F.col("supp_nation") == "NATION_2")
            & (F.col("cust_nation") == "NATION_1")
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE) AS nation_volume,
           CAST(SUM(volume) AS DOUBLE) AS total_volume
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             {_REV_SQL} AS volume, ns.n_name AS supp_nation
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region   ON nc.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
      WHERE r_name = 'ASIA'
    )
    GROUP BY o_year
    """,
    "TPC-H Q8 shape: one nation's market share inside a region, per "
    "year. The ratio divides two exact decimal totals as the last step "
    "(identical IEEE division in both engines); numerator and "
    "denominator are also emitted so a share mismatch is debuggable.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nc = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_dim = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nc.join(
                    F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .select("s_suppkey", "supp_nation")
    )
    o = _t(spark, sf_dir, "orders").join(
        F.broadcast(cust_dim), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
    )
    vol = _revenue()
    zero = F.lit(0).cast("decimal(30,4)")
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(zero)
    ).cast("double")
    total_vol = F.sum(vol).cast("double")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_year")
        .agg(
            (nation_vol / total_vol).alias("mkt_share"),
            nation_vol.alias("nation_volume"),
            total_vol.alias("total_volume"),
        )
    )


@register(
    "q9_profit_by_nation_year",
    """
    SELECT n_name, l_year,
           CAST(SUM(amount) AS DOUBLE) AS profit
    FROM (
      SELECT ns.n_name,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
             CAST(l_extendedprice * (1 - l_discount)
                  - p_retailprice * CAST(0.05 AS DOUBLE) * l_quantity
                  AS DECIMAL(30,6)) AS amount
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
    )
    GROUP BY n_name, l_year
    """,
    "TPC-H Q9 shape (adapted: no partsupp table, so supply cost is "
    "proxied by 5% of p_retailprice per unit; year from l_shipdate "
    "instead of o_orderdate to keep it a pure dim-join query). part and "
    "supplier→nation broadcast — the fact table never shuffles for the "
    "joins, only the tiny (nation x year x partition) scaled-int "
    "partials cross the wire (two_level_scaled_agg: ~175 groups is "
    "the unbounded-rows-per-group regime, and scale-6 terms would "
    "overflow a single-level int64 accumulator around SF60).",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import two_level_scaled_agg

    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), "n_name"
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .select("s_suppkey", "n_name")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    li = _t(spark, sf_dir, "lineitem")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.05).cast("double") * F.col("l_quantity")
    )
    return two_level_scaled_agg(
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("l_year", F.year("l_shipdate")),
        ["n_name", "l_year"],
        [(amount, 6, "profit")],
    )


@register(
    "q10_returned_top_customers",
    f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "TPC-H Q10 shape: who returned the most revenue last half-year. "
    "lineitem filters on returnflag before the orderkey shuffle join to "
    "date-filtered orders; customer+nation broadcast onto the result; "
    "top-20 via TakeOrderedAndProject with c_custkey tiebreaker. The "
    "per-customer revenue sum is a scaled_int_sum: TPC-H holds "
    "orders-per-customer constant as SF grows, so |sum|*10^4 stays "
    "~1e12 — far inside the int64 contract at any SF.",
)
def q10_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    agg = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(scaled_int_sum(_revenue_raw(), 4, "revenue"))
    )
    return top_k(agg, 20, F.desc("revenue"), F.asc("c_custkey")).select(
        "c_custkey", "c_name", "revenue", "c_acctbal", "n_name"
    )


@register(
    "q13_order_count_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    "TPC-H Q13 shape: distribution of per-customer order counts, "
    "including zero-order customers (LEFT join with the priority filter "
    "in the join condition, not WHERE — the classic outer-join trap). "
    "Two aggregations: per-customer (shuffle on custkey), then the tiny "
    "histogram.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_share",
    f"""
    SELECT CAST(100.0 AS DOUBLE)
             * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                             ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE)
             / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_share,
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                         ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-06-01'
      AND l_shipdate < TIMESTAMP '1998-07-01'
    """,
    "TPC-H Q14 shape: promo revenue share for one month. Conditional "
    "decimal aggregation over a broadcast part join; the percentage is "
    "computed from the two exact totals at the end.",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    rev = _revenue()
    zero = F.lit(0).cast("decimal(30,4)")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
        "double"
    )
    total = F.sum(rev).cast("double")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).agg(
            (F.lit(100.0).cast("double") * promo / total).alias("promo_share"),
            promo.alias("promo_revenue"),
            total.alias("total_revenue"),
        )
    )


@register(
    "q15_top_suppliers",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_REV_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    "TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue. "
    "The max is a 1-row aggregate of the (≤ |supplier|) revenue table "
    "joined back broadcast — no global sort; equality compares the "
    "exact scaled-int64 totals (lineitems-per-supplier is "
    "SF-constant in TPC-H, so |sum|*10^4 ~ 1e12 sits far inside the "
    "int64 contract), never doubles.",
)
def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(scaled_int_term(_revenue_raw(), 4)).alias("total_rev_i")
    )
    mx = rev.agg(F.max("total_rev_i").alias("max_rev_i"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_rev_i") == F.col("max_rev_i"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_rev_i").cast("decimal(38,0)") / 10**4)
            .cast("double")
            .alias("total_revenue"),
        )
    )


@register(
    "q16_part_supplier_counts",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20
    """,
    "TPC-H Q16 shape (adapted: lineitem stands in for partsupp as the "
    "part↔supplier link). COUNT(DISTINCT) over a broadcast-join: Spark "
    "expands to a two-phase distinct-then-count aggregate, shuffling "
    "once on the group keys + suppkey.",
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    agg = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )
    return top_k(
        agg,
        20,
        F.desc("supplier_cnt"),
        F.asc("p_brand"),
        F.asc("p_type"),
        F.asc("p_size"),
    )


@register(
    "q17_small_qty_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
             / CAST(7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) ON l_partkey = pk
    WHERE l_quantity < CAST(0.3 AS DOUBLE) * avg_qty
    """,
    "TPC-H Q17 shape: revenue lost to small orders — each row compares "
    "against its part's average quantity. The per-part average is a "
    "first aggregate over the same fact table, joined back; Spark "
    "shuffles lineitem once on partkey and AQE is free to broadcast the "
    "(|part|-sized) average side. The average divides an exact decimal "
    "sum so the filter threshold is bit-identical across engines.",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(30,2)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("pk"))
        .where(F.col("l_quantity") < F.lit(0.3).cast("double") * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(30,2)")).cast(
                    "double"
                )
                / F.lit(7.0).cast("double")
            ).alias("avg_yearly")
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum_qty AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_orderkey AS big_okey,
             SUM(CAST(l_quantity AS DECIMAL(30,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(30,2))) > 160
    )
    JOIN orders ON big_okey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "TPC-H Q18 shape: large-volume orders. The HAVING filter runs on "
    "the exact scaled-int64 sum before any join (cuts the fact side "
    "~5x here, far more at TPC-H skew; a group is one order, ≤7 "
    "lineitems, so the int64 contract holds at any SF and the "
    "threshold compares exact integers); orders joins on the shuffled "
    "orderkey, customer broadcasts; top-100 with orderkey tiebreaker.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_okey"))
        .agg(F.sum(scaled_int_term("l_quantity", 2)).alias("sum_qty_i"))
        .where(F.col("sum_qty_i") > 160 * 100)
        .select(
            "big_okey",
            (F.col("sum_qty_i").cast("decimal(38,0)") / 100)
            .cast("double")
            .alias("sum_qty_d"),
        )
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = (
        big.join(o, F.col("big_okey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty_d").alias("sum_qty"),
        )
    )
    return top_k(joined, 100, F.desc("o_totalprice"), F.asc("o_orderkey"))


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
    "TPC-H Q19 shape: disjunction of brand/size/quantity conjunctions. "
    "The lineitem-only conjunct of each OR arm (quantity ranges) is "
    "pushable; the join stays a single broadcast hash join with the "
    "residual OR evaluated post-join — one pass over the fact table.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem")
    arm1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(arm1 | arm2 | arm3)
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q22_idle_balance",
    """
    SELECT n_name, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
                     / COUNT(*)
            FROM customer WHERE c_acctbal > 0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01'
          )
    GROUP BY n_name
    """,
    "TPC-H Q22 shape: rich customers with no recent orders (adapted: "
    "the fixture has no zero-order customers, so 'idle' means no order "
    "since 2000 — keeps the result non-trivial), by nation. The "
    "global average is a 1-row aggregate broadcast into the filter; the "
    "no-orders test is a LEFT ANTI join on custkey (orders shuffles on "
    "custkey — at scale the anti join is the expensive exchange, and "
    "the acctbal filter runs first to shrink the probe side).",
)
def q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(30,2)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = cust.join(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return (
        idle.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(30,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "q4_priority_late_orders",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4 shape (adapted: no commit/receipt dates, so 'late' means "
    "any line shipped >60 days after the order date). EXISTS compiles "
    "to a LEFT SEMI join on orderkey — the correlated date condition "
    "rides the join as a residual, and each order is emitted at most "
    "once regardless of how many lines are late (the distinct-ness a "
    "plain inner join would get wrong).",
)
def q4_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q11_important_part_values",
    """
    WITH val AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(30,4))) AS v
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(v AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) * 0.0006 FROM val)
    """,
    "TPC-H Q11 shape (adapted: lineitem value per part stands in for "
    "partsupp stock value). Group-vs-global-share: the global total is "
    "a 1-row re-aggregate of the grouped values, broadcast back as the "
    "filter threshold — the fact table shuffles once (on partkey); "
    "both engines compare identical doubles derived from exact "
    "decimal sums.",
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(30,4)")
        ).alias("v")
    )
    thresh = val.agg(
        (F.sum("v").cast("double") * F.lit(0.0006)).alias("threshold")
    )
    return (
        val.join(F.broadcast(thresh))
        .where(F.col("v").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("v").cast("double").alias("part_value"))
    )


@register(
    "q20_top_brand_suppliers",
    """
    WITH sv AS (
      SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS q
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#5'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, sv.q AS brand_qty
    FROM supplier JOIN sv ON s_suppkey = l_suppkey
    WHERE sv.q > (SELECT SUM(q) * 0.012 FROM sv)
    """,
    "TPC-H Q20 shape (adapted: 'suppliers who ship a disproportionate "
    "share of one brand' replaces the partsupp availability check). "
    "Nested aggregate threshold over a filtered broadcast join; the "
    "supplier dim joins broadcast onto the (≤|supplier|) rollup.",
)
def q20_top_brand_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#5").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem")
    sv = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,2)")).cast("double").alias("q"))
    )
    thresh = sv.agg((F.sum("q") * F.lit(0.012)).alias("threshold"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sv.join(F.broadcast(thresh))
        .where(F.col("q") > F.col("threshold"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("q").alias("brand_qty"))
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
               AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    mn AS (
      SELECT l_partkey AS pk, MIN(unit_price) AS min_price
      FROM unit GROUP BY l_partkey
    )
    SELECT p_partkey, p_brand, s_suppkey, s_name, unit_price
    FROM unit
      JOIN mn ON l_partkey = pk AND unit_price = min_price
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size <= 5
    ORDER BY unit_price, p_partkey, s_suppkey LIMIT 50
    """,
    "TPC-H Q2 shape (adapted: observed average unit price from "
    "lineitem replaces partsupp supply cost). Per-group ARGMIN via "
    "min join-back: the per-(part,supplier) rollup re-aggregates to "
    "per-part minima and equi-joins back on (part, price) — ties keep "
    "every minimal supplier, deterministically. Both engines derive "
    "the price from the same exact-decimal totals, so the double "
    "equality join matches identically. The rollup and the min are "
    "partkey-partitioned (one fact shuffle); part and supplier dims "
    "broadcast onto the (≤ |part x supplier|) result.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(30,2)")).cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(30,2)")).cast("double")
        ).alias("unit_price")
    )
    mn = unit.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("unit_price").alias("min_price")
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_size") <= 5).select(
        "p_partkey", "p_brand"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    argmin = unit.join(
        mn,
        (F.col("l_partkey") == F.col("pk"))
        & (F.col("unit_price") == F.col("min_price")),
    )
    out = (
        argmin.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "unit_price")
    )
    return top_k(
        out, 50, F.asc("unit_price"), F.asc("p_partkey"), F.asc("s_suppkey")
    )


@register(
    "q21_waiting_supplier",
    """
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_last
      FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    per_order AS (
      SELECT l_orderkey AS ok, MAX(supp_last) AS order_last,
             COUNT(*) AS n_supps
      FROM per_supp GROUP BY l_orderkey
    ),
    at_last AS (
      SELECT s.l_orderkey AS ok2, COUNT(*) AS n_at_last
      FROM per_supp s JOIN per_order o ON s.l_orderkey = o.ok
      WHERE s.supp_last = o.order_last
      GROUP BY s.l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM per_supp s
      JOIN per_order o ON s.l_orderkey = o.ok
      JOIN at_last a ON s.l_orderkey = a.ok2
      JOIN supplier ON s_suppkey = s.l_suppkey
    WHERE o.n_supps >= 2 AND a.n_at_last = 1
      AND s.supp_last = o.order_last
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
    "TPC-H Q21 shape (adapted: no receipt/commit dates, so the "
    "'supplier who kept the order waiting' is the unique supplier "
    "whose last shipment is the order's last, among multi-supplier "
    "orders). The reference formulation is a double correlated "
    "EXISTS/NOT-EXISTS; re-expressed as three orderkey-partitioned "
    "aggregates joined back — ONE fact shuffle on (orderkey) feeds "
    "every stage, the join-backs are co-partitioned, and the "
    "correlated subqueries never execute per row.",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_last")
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("supp_last").alias("order_last"), F.count("*").alias("n_supps")
    )
    at_last = (
        per_supp.join(per_order, F.col("l_orderkey") == F.col("ok"))
        .where(F.col("supp_last") == F.col("order_last"))
        .groupBy(F.col("l_orderkey").alias("ok2"))
        .agg(F.count("*").alias("n_at_last"))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    waiting = (
        per_supp.join(per_order, F.col("l_orderkey") == F.col("ok"))
        .join(at_last, F.col("l_orderkey") == F.col("ok2"))
        .where(
            (F.col("n_supps") >= 2)
            & (F.col("n_at_last") == 1)
            & (F.col("supp_last") == F.col("order_last"))
        )
    )
    agg = (
        waiting.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
    return top_k(agg, 20, F.desc("numwait"), F.asc("s_name"))
