"""Scale-evidence and algorithm-family queries (round 5 continuation).

Two groups:

* **Physical-layout operators** that only matter at cluster scale —
  bucketed (pre-shuffled) fact-fact joins and multi-dimensional
  z-order clustering for file skipping.  On 60k rows they are
  overhead; the catalog entries exist so the *plans* can be asserted
  (zero join exchanges; z-range scan) and so the layout code has a
  driver-checked correctness row.
* **Algorithm families** the reference's users reach for beyond plain
  SQL: distributed triangle counting and BFS over the co-purchase
  graph (complementing `pagerank_part_affinity` and
  `connected_components`), a filter-verify string-similarity join,
  and window/grouping API fill-ins (ntile/percent_rank/cume_dist,
  GROUPING SETS, 2-D skyline).

Determinism contract as everywhere in the catalog: exact integer or
decimal arithmetic in every aggregate, full tiebreakers on every
rank, identical output aliases in the Spark builder and the DuckDB
oracle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.aggregates import decimal_sum
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _sf_tag(sf_dir: str) -> str:
    return sf_dir.rstrip("/").split("/")[-1].replace(".", "_")


def _scratch(sf_dir: str, tag: str) -> str:
    return os.path.join(
        tempfile.gettempdir(), f"lichess_db_spark_{tag}_{_sf_tag(sf_dir)}"
    )


# --------------------------------------------------------------------------
# bucketed (pre-shuffled) fact-fact join
# --------------------------------------------------------------------------

_N_BUCKETS = 8  # local[32] test setting; a 100 TB fact pair wants ~2048


@register(
    "bucketed_join_revenue",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
    "Bucketed fact-fact join: orders and lineitem are first written "
    "as bucketed tables (bucketBy(orderkey) + sortBy) so the join "
    "needs NO exchange on either side — the shuffle is paid once at "
    "layout time and amortized over every subsequent join, which is "
    "how a 100 TB orders/lineitem pair should live at rest (the "
    "tests pin the join section of the plan to zero Exchanges under "
    "a disabled broadcast threshold). The only runtime exchange left "
    "is the final groupBy's. Oracle replays the same join+aggregate "
    "from the raw parquet, so a hash match also proves the bucketed "
    "write/read round trip lost nothing.",
)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = write_bucketed_pair(spark, sf_dir)
    j = orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_items"),
        decimal_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            alias="revenue",
        ),
    )


def write_bucketed_pair(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Write orders+lineitem as bucketed external tables and return
    readers. Idempotent per (session, sf); table names carry the sf
    tag so driver runs at several scale factors don't collide."""
    tag = _sf_tag(sf_dir)
    t_orders, t_li = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    base = _scratch(sf_dir, "bucketed")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    for tbl, df, key in (
        (t_orders, orders, "o_orderkey"),
        (t_li, li, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.write.mode("overwrite")
            .option("path", os.path.join(base, tbl))
            .bucketBy(_N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
    return spark.table(t_orders), spark.table(t_li)


# --------------------------------------------------------------------------
# z-order clustering (multi-dimensional data skipping)
# --------------------------------------------------------------------------

_Z_BITS = 8


def _z_sql(x: str, y: str, bits: int, shl: str, shr: str) -> str:
    """Bit-interleaved z-value expression, generated once for both
    engines so the arithmetic is identical by construction.
    ``shl``/``shr`` are engine-specific shift spellings with {v} and
    {n} placeholders (Spark: shiftleft function; DuckDB: operators)."""
    terms = []
    for i in range(bits):
        xb = shr.format(v=x, n=i)
        yb = shr.format(v=y, n=i)
        terms.append(shl.format(v=f"(({xb}) & 1)", n=2 * i))
        terms.append(shl.format(v=f"(({yb}) & 1)", n=2 * i + 1))
    return "(" + " | ".join(terms) + ")"


_ZX = "CAST(p_size AS BIGINT)"
_ZY = "(CAST(floor(p_retailprice) AS BIGINT) - 900)"
_Z_SPARK = _z_sql(_ZX, _ZY, _Z_BITS, "shiftleft({v}, {n})", "shiftright({v}, {n})")
_Z_DUCK = _z_sql(_ZX, _ZY, _Z_BITS, "(({v}) << {n})", "(({v}) >> {n})")

# 2-D query box, chosen to be non-empty at every fixture SF (sf0.001
# prices span only [900, 920)).
_BOX_SIZE = (10, 20)
_BOX_PRICE = (906.0, 914.0)


@register(
    "zorder_cluster_scan",
    f"""
    SELECT p_partkey, p_size, p_retailprice,
           CAST({_Z_DUCK} AS BIGINT) AS zvalue
    FROM part
    WHERE p_size BETWEEN {_BOX_SIZE[0]} AND {_BOX_SIZE[1]}
      AND p_retailprice >= {_BOX_PRICE[0]} AND p_retailprice < {_BOX_PRICE[1]}
    """,
    "Z-order clustering: interleave the bits of two filter dimensions "
    "(p_size, floor(p_retailprice)) into one sort key, write the table "
    "range-partitioned+sorted on it, then answer a 2-D box query from "
    "the clustered copy. Locality in z-value implies locality in BOTH "
    "dimensions, so per-file min/max stats prune files for either "
    "predicate — the same trick Delta OPTIMIZE ZORDER uses; "
    "tests/test_scale_design.py measures the pruning ratio vs an "
    "unclustered layout from the written files' own footer stats. The "
    "z-value expression is pure codegen bit math generated from one "
    "spec for Spark and DuckDB, and the oracle runs on the ORIGINAL "
    "parquet — a hash match proves the clustered rewrite preserved "
    "the data exactly.",
)
def zorder_cluster_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = write_zorder_parts(spark, sf_dir)
    back = spark.read.parquet(path)
    return back.where(
        F.col("p_size").between(*_BOX_SIZE)
        & (F.col("p_retailprice") >= _BOX_PRICE[0])
        & (F.col("p_retailprice") < _BOX_PRICE[1])
    ).select("p_partkey", "p_size", "p_retailprice", "zvalue")


def write_zorder_parts(spark: SparkSession, sf_dir: str, n_files: int = 8) -> str:
    """Write part z-ordered on (p_size, floor(price)); returns path."""
    path = _scratch(sf_dir, "zorder_part")
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice",
        F.expr(_Z_SPARK).cast("bigint").alias("zvalue"),
    )
    (
        part.repartitionByRange(n_files, "zvalue")
        .sortWithinPartitions("zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


# --------------------------------------------------------------------------
# string-similarity join (q-gram count filter + levenshtein verify)
# --------------------------------------------------------------------------


@register(
    "fuzzy_name_match",
    """
    WITH names AS (
        SELECT p_name AS name, COUNT(*) AS n_parts
        FROM part GROUP BY p_name
    )
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b ON a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 1
    """,
    "Filter-verify string-similarity join over the part-name "
    "dictionary (edit distance <= 1): candidates are generated by "
    "joining on shared positional 2-gram occurrences and kept only "
    "when the multiset q-gram overlap reaches the count-filter bound "
    "max(|a|,|b|) - q + 1 - k*q (Gravano et al., VLDB'01) — a "
    "LOSSLESS prune for ed<=k, so the final levenshtein verify "
    "touches only candidate pairs, never the d^2 cross product the "
    "oracle computes. Dictionary-sized state: the gram join shuffles "
    "distinct names (64 at sf0.01), not the 2k/20k/100 TB of part "
    "rows behind them — fuzzy vocabulary clustering is exactly this "
    "shape on a web corpus's token dictionary.",
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        _t(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count("*").alias("n_parts"))
    )
    pairs = edit_distance_join(names, q=2, k=1)
    meta = names.select("name", "n_parts")
    return (
        pairs.join(
            meta.select(
                F.col("name").alias("name_a"), F.col("n_parts").alias("n_parts_a")
            ),
            "name_a",
        )
        .join(
            meta.select(
                F.col("name").alias("name_b"), F.col("n_parts").alias("n_parts_b")
            ),
            "name_b",
        )
        .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b")
    )


def edit_distance_join(names: DataFrame, q: int = 2, k: int = 1) -> DataFrame:
    """Filter-verify similarity self-join over a string dictionary:
    all pairs (name_a < name_b) with levenshtein distance <= ``k``.

    Candidate generation joins on shared q-gram OCCURRENCES (gram +
    per-name occurrence index), so the per-pair match count is the
    multiset intersection |G(a) ∩ G(b)| = Σ_g min(count_a(g),
    count_b(g)); the count-filter bound max(|a|,|b|) - q + 1 - k*q
    (Gravano et al., VLDB'01) is LOSSLESS for edit distance <= k —
    tests/test_properties.py drives adversarial vocabularies
    (repeated grams, short strings) against the unblocked cross
    join. The bound only admits every true pair when it is >= 1,
    i.e. when max(|a|,|b|) >= q + k*q (e.g. 'abc' vs 'adc' at ed=1
    share ZERO bigrams, and 3 < 4); strings below that length go
    through a length-band all-pairs fallback branch instead (tiny
    by definition), and any pair whose longer side clears the
    threshold shares >= 1 gram, so the gram join itself cannot
    drop it.

    Input: a dataframe with a ``name`` column (distinct values).
    Output columns: name_a, name_b, dist (int).
    """
    names = names.select("name").withColumn("len", F.length("name"))
    # strings too short for the q-gram bound to admit all true pairs:
    # below q + k*q chars an ed<=k pair can share ZERO q-grams.
    min_len = q + k * q
    short = names.where(F.col("len") < min_len)
    longn = names.where(F.col("len") >= min_len)
    grams = longn.select(
        "name",
        "len",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length(name) - {q - 1}),"
                f" i -> substring(name, i, {q}))"
            )
        ).alias("pos", "gram"),
    )
    occ_w = Window.partitionBy("name", "gram").orderBy("pos")
    grams = grams.select(
        "name", "len", "gram", F.row_number().over(occ_w).alias("occ")
    )
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.occ") == F.col("b.occ"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .groupBy(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("a.len").alias("len_a"),
            F.col("b.len").alias("len_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    cand = shared.where(
        F.col("n_shared")
        >= F.greatest(
            F.greatest("len_a", "len_b") - F.lit(q - 1) - F.lit(k * q),
            F.lit(1),
        )
    ).select("name_a", "name_b")
    # short strings: length-banded all-pairs (|len_a - len_b| <= k is
    # a necessary condition for ed<=k). The short set is tiny by
    # definition (names below q+k chars), so the cross pairing is
    # bounded; short-long pairs only need the long side within k.
    # pair on != (not <): the short name may sort AFTER its long
    # partner, and the long side never appears as ``s`` — least/
    # greatest canonicalizes, distinct() below dedupes short-short
    # pairs seen from both sides (caught by the adversarial test).
    s, n2 = short.alias("s"), names.alias("n2")
    short_pairs = s.join(
        n2,
        (F.col("s.name") != F.col("n2.name"))
        & (
            F.abs(F.col("s.len") - F.col("n2.len")) <= F.lit(k)
        ),
    ).select(
        F.least("s.name", "n2.name").alias("name_a"),
        F.greatest("s.name", "n2.name").alias("name_b"),
    )
    return (
        cand.union(short_pairs)
        .distinct()
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
        )
        .where(F.col("dist") <= k)
    )


# --------------------------------------------------------------------------
# graph family: triangle counting + BFS hop distance
# --------------------------------------------------------------------------

_EDGE_SQL = """
    e AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
"""


def _copurchase_edges(li: DataFrame) -> DataFrame:
    """Distinct co-purchase edges oriented src < dst (each undirected
    edge appears exactly once). Orientation by id bounds the triangle
    join: every triangle {a<b<c} is produced exactly once as
    (a,b)x(b,c) closed by (a,c).

    r15 optimization (guide §2.5 input skew): the wedge join plans as
    a broadcast hash join, so its probe stage — the wedge fan-out plus
    the DISTINCT's map-side partial dedup, the derivation's whole
    compute — inherits the scan's skewed small-file splits; spread()
    the probe side so it runs at full parallelism (interleaved
    min-of-4 at sf0.1: 1.86 -> 1.18 s, edge set identical; the same
    fix measured on the broadcast side was worse, 1.54 s). Downstream
    consumers aggregate or DISTINCT, so partition order is free."""
    from ..operators._util import spread

    a, b = spread(li).alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )


_TRI_TOPK = 20


@register(
    "triangle_copurchase_topk",
    f"""
    WITH {_EDGE_SQL},
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM e e1
        JOIN e e2 ON e2.src = e1.dst
        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    pernode AS (
        SELECT node, COUNT(*) AS n_triangles FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY node
    )
    SELECT partkey, n_triangles, rnk FROM (
        SELECT node AS partkey, n_triangles,
               CAST(ROW_NUMBER() OVER (ORDER BY n_triangles DESC, node)
                    AS INT) AS rnk
        FROM pernode
    ) WHERE rnk <= {_TRI_TOPK}
    """,
    "Distributed triangle counting over the co-purchase graph: edges "
    "oriented by id (src < dst) so each triangle is enumerated exactly "
    "once as a wedge (a,b)-(b,c) closed by the (a,c) edge-existence "
    "join — the classic two-shuffle MapReduce formulation (Suri & "
    "Vassilvitskii, WWW'11). Per-node participation counts come from "
    "unpivoting the triangle's three corners; top-20 with full "
    "tiebreakers. At 100 TB the orientation should be by DEGREE, not "
    "id (low-degree vertex first bounds wedge fanout by sqrt(m)); id "
    "orientation keeps the oracle exactly replayable and the join "
    "shape identical.",
)
def triangle_copurchase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Id-oriented wedge enumeration, chosen over the textbook
    degree-oriented node-iterator after MEASURING both at sf0.1: this
    co-purchase graph has near-uniform degrees, so degree orientation
    cut wedges only 17% (41M vs 49M) while its orientation joins and
    relabeling doubled wall-clock (14.3s vs 7.0s). On a skewed graph
    the degree-oriented variant (direct each edge from its lower-
    (degree,id) endpoint, pair out-neighbors of the low vertex) is
    the right choice — its wedge bound is O(m^1.5) independent of
    skew; swap the orientation, the closure probe is unchanged."""
    from ..operators.topk import top_k

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = _copurchase_edges(li)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    pernode = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    ranked = top_k(
        pernode, _TRI_TOPK, F.desc("n_triangles"), F.asc("node")
    ).select(F.col("node").alias("partkey"), "n_triangles")
    w = Window.orderBy(F.desc("n_triangles"), F.asc("partkey"))
    return ranked.withColumn("rnk", F.row_number().over(w).cast("int"))


_BFS_STEPS = 3
_BFS_SEED_MOD = 97


def _bfs_step_sql(i: int) -> str:
    return f"""
    d{i} AS (
        SELECT node, MIN(hop) AS hop FROM (
            SELECT node, hop FROM d{i - 1}
            UNION ALL
            SELECT s.dst AS node, {i} AS hop
            FROM sym s JOIN d{i - 1} d ON d.node = s.src
        ) GROUP BY node
    )"""


@register(
    "bfs_copurchase_hops",
    f"""
    WITH {_EDGE_SQL},
    sym AS (
        SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e
    ),
    d0 AS (
        SELECT p_partkey AS node, 0 AS hop FROM part
        WHERE p_partkey % {_BFS_SEED_MOD} = 0
    ),
    {",".join(_bfs_step_sql(i) for i in range(1, _BFS_STEPS + 1))}
    SELECT node AS partkey, CAST(hop AS INT) AS hop FROM d{_BFS_STEPS}
    """,
    "Multi-source BFS: minimum hop distance (<= 3 supersteps) from a "
    "seed set of parts over the undirected co-purchase graph — the "
    "Pregel iteration shape as a driver loop over one distributed "
    "join+min-aggregate per superstep, exactly like "
    "pagerank_part_affinity. The frontier table carries (node, hop) "
    "only; each superstep is one shuffle on dst. Every step of the "
    "oracle replays the same union+min, so intermediate states match "
    "too, not just the final fixpoint. For deep graphs checkpoint "
    "every ~10 supersteps to cut lineage; 3 stays shallow.",
)
def bfs_copurchase_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = _copurchase_edges(li)
    # r15: explode-derived symmetrization (the k_core/LPA fix) —
    # union(e, swap(e)) embedded the wedge-join derivation in both
    # branches, so materializing the persisted sym paid it twice;
    # explode preserves the multiset exactly.
    sym = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
                )
            ).alias("__p")
        )
        .select("__p.src", "__p.dst")
        .persist()
    )
    d = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_partkey") % _BFS_SEED_MOD == 0)
        .select(F.col("p_partkey").alias("node"), F.lit(0).alias("hop"))
    )
    for i in range(1, _BFS_STEPS + 1):
        nbr = sym.join(d, sym["src"] == d["node"]).select(
            F.col("dst").alias("node"), F.lit(i).alias("hop")
        )
        d = d.union(nbr).groupBy("node").agg(F.min("hop").alias("hop"))
    return d.select(F.col("node").alias("partkey"), F.col("hop").cast("int").alias("hop"))


# --------------------------------------------------------------------------
# window / grouping API fill-ins
# --------------------------------------------------------------------------


@register(
    "window_ntile_deciles",
    """
    SELECT event_id, event_type,
           CAST(ntile(10) OVER w AS INT) AS decile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    QUALIFY event_id % 10 = 0
    """,
    "Distribution window functions: ntile / percent_rank / cume_dist "
    "per event_type, ordered by (value, event_id) so ties are fully "
    "broken and both engines see one total order. percent_rank and "
    "cume_dist are ratios of exact row counts — bit-identical IEEE "
    "divisions, no rounding. The output keeps every 10th event (a "
    "post-window predicate: the window still computes over ALL rows, "
    "which is what QUALIFY means), bounding the driver compare while "
    "the distributed work stays full-size.",
)
def window_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "event_type",
            F.ntile(10).over(w).cast("int").alias("decile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .where(F.col("event_id") % 10 == 0)
    )


@register(
    "grouping_sets_revenue",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    "Explicit GROUPING SETS (finer than rollup/cube, which the "
    "catalog already covers): per (flag,status), per flag, and grand "
    "total in ONE pass — Catalyst plans an Expand (3 output rows per "
    "input row) feeding a single hash aggregate, so at 100 TB the "
    "cost is one scan + one shuffle regardless of how many sets are "
    "requested. Group keys have no NULLs in the data, so the "
    "COALESCE('ALL') sentinel is unambiguous and portable (grouping "
    "bit functions differ across engines).",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # project the decimal term BEFORE the grouping so the multiply+cast
    # runs once per input row, not once per Expand replica
    li = li.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(30,4)")
        .alias("__rev"),
    )
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count("*").alias("n_items"),
            F.sum("__rev").cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "revenue",
        )
    )


@register(
    "skyline_pareto_parts",
    """
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
          AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice)
    )
    """,
    "2-D skyline (Pareto frontier: maximize size, minimize price) "
    "without the oracle's quadratic NOT EXISTS: aggregate to one "
    "(size -> min price) row per distinct size (bounded domain, one "
    "map-side-combinable shuffle), take the running min price over "
    "strictly larger sizes with a window over those <=50 rows, and "
    "broadcast the per-size thresholds back onto the corpus — a part "
    "survives iff its price beats every strictly-larger size's best "
    "price and strictly beats its own size's best otherwise-equal "
    "offer. The only single-partition window runs on the size-level "
    "aggregate, never the data.",
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    sizes = part.groupBy("p_size").agg(
        F.min("p_retailprice").alias("min_price_same")
    )
    w = Window.orderBy(F.desc("p_size")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    thresholds = sizes.select(
        "p_size",
        "min_price_same",
        F.min("min_price_same").over(w).alias("min_price_larger"),
    )
    joined = part.join(F.broadcast(thresholds), "p_size")
    dominated = (
        F.col("min_price_larger").isNotNull()
        & (F.col("min_price_larger") <= F.col("p_retailprice"))
    ) | (F.col("min_price_same") < F.col("p_retailprice"))
    return joined.where(~dominated).select(
        "p_partkey", "p_size", "p_retailprice"
    )


# --------------------------------------------------------------------------
# MERGE driver row + exact moments + trailing decay
# --------------------------------------------------------------------------


@register(
    "merge_upsert_orders",
    """
    WITH target AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 4 <> 3
    ),
    upd AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice + 100 AS o_totalprice
        FROM orders WHERE o_orderkey % 8 = 1 OR o_orderkey % 4 = 3
    ),
    del AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 16 = 2)
    SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice FROM target t
    WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
      AND t.o_orderkey NOT IN (SELECT o_orderkey FROM del)
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd
    """,
    "Row-level MERGE driven end to end through the snapshot machinery "
    "(operators/merge.py): seed a parquet snapshot with 3/4 of "
    "orders, MERGE a deterministic delta (updates for keys ≡1 mod 8, "
    "inserts for the withheld ≡3 mod 4 quarter, deletes for ≡2 mod "
    "16 — update/delete sets disjoint per the ANSI guard), then read "
    "the snapshot back. The oracle replays the same MERGE in pure "
    "SQL, so a hash match verifies matched-update / not-matched-"
    "insert / delete semantics AND the crash-safe rename-aside swap "
    "left a byte-faithful table. Scale shape: the delta joins are "
    "key-only and broadcastable; the rewrite is the snapshot "
    "pattern's known O(target) cost — merge_upsert_partitioned "
    "bounds it to touched partitions.",
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..operators.merge import merge_upsert, read_snapshot

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    orders = _t(spark, sf_dir, "orders").select(*cols)
    target_dir = _scratch(sf_dir, "merge_orders")
    shutil.rmtree(target_dir, ignore_errors=True)
    orders.where(F.col("o_orderkey") % 4 != 3).write.mode("overwrite").parquet(
        target_dir
    )
    updates = orders.where(
        (F.col("o_orderkey") % 8 == 1) | (F.col("o_orderkey") % 4 == 3)
    ).withColumn("o_totalprice", F.col("o_totalprice") + 100)
    deletes = orders.where(F.col("o_orderkey") % 16 == 2).select("o_orderkey")
    merge_upsert(
        spark,
        target_dir,
        updates,
        keys="o_orderkey",
        deletes=deletes,
        broadcast_updates=True,
        compute_stats=False,
    )
    return read_snapshot(spark, target_dir).select(*cols)


# second moments stay in int64 through SF 1: x = floor(10*value) <= 6e3,
# per-type n <= ~2e5, so n*Σx² <= 2e5 * (2e5*3.6e7) ≈ 1.4e18 < 2^63.
# Beyond that, CAST the moment sums to DECIMAL(38,0) in both engines.
_MOM_SCALE = 10


@register(
    "stats_moments_exact",
    f"""
    WITH m AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(floor(value * {_MOM_SCALE}) AS BIGINT)) AS BIGINT) AS sx,
               CAST(SUM(CAST(floor(value * {_MOM_SCALE}) AS BIGINT)
                        * CAST(floor(value * {_MOM_SCALE}) AS BIGINT)) AS BIGINT) AS sxx,
               CAST(SUM(CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sy,
               CAST(SUM(CAST(hour(ts) AS BIGINT) * CAST(hour(ts) AS BIGINT))
                    AS BIGINT) AS syy,
               CAST(SUM(CAST(floor(value * {_MOM_SCALE}) AS BIGINT)
                        * CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sxy
        FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(sx AS DOUBLE) / n / {_MOM_SCALE} AS mean_value,
           CAST(n * sxx - sx * sx AS DOUBLE)
               / (CAST(n AS DOUBLE) * n * {_MOM_SCALE} * {_MOM_SCALE}) AS var_value,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_value_hour
    FROM m
    """,
    "Exact distributed second moments: mean / population variance / "
    "Pearson correlation (value vs hour-of-day) per event type, "
    "computed from INTEGER power sums (x quantized at 1 decimal) so "
    "every accumulation is associative and order-free — a float "
    "Welford or naive double Σx² would differ in the last ulps per "
    "partitioning and never hash-match. The only floating steps are "
    "the final divisions and IEEE-correctly-rounded sqrt, identical "
    "on both engines. One map-side-combinable shuffle; int64 holds "
    "through SF 1 (see _MOM_SCALE comment), DECIMAL(38,0) beyond.",
)
def stats_moments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * _MOM_SCALE).cast("bigint").alias("x"),
        F.hour("ts").cast("bigint").alias("y"),
    )
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    s2 = F.lit(_MOM_SCALE * _MOM_SCALE)
    return m.select(
        "event_type",
        "n",
        (sx.cast("double") / n / _MOM_SCALE).alias("mean_value"),
        (
            (n * sxx - sx * sx).cast("double")
            / (n.cast("double") * n * s2)
        ).alias("var_value"),
        (
            (n * sxy - sx * sy).cast("double")
            / (
                F.sqrt((n * sxx - sx * sx).cast("double"))
                * F.sqrt((n * syy - sy * sy).cast("double"))
            )
        ).alias("corr_value_hour"),
    )


_EWMA_K = 8  # trailing window length; weights 2^(K-1-lag)


def _ewma_terms_sql() -> tuple[str, str]:
    num = " + ".join(
        f"COALESCE(CAST(floor(lag(value * 1000, {i}) OVER w) AS BIGINT)"
        f" * {2 ** (_EWMA_K - 1 - i)}, 0)"
        for i in range(_EWMA_K)
    )
    den = " + ".join(
        f"(CASE WHEN lag(value, {i}) OVER w IS NOT NULL"
        f" THEN {2 ** (_EWMA_K - 1 - i)} ELSE 0 END)"
        for i in range(_EWMA_K)
    )
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_terms_sql()


@register(
    "events_ewma_decay",
    f"""
    SELECT event_id, user_id,
           CAST({_EWMA_NUM} AS BIGINT) AS ewma_scaled,
           CAST({_EWMA_NUM} AS DOUBLE) / ({_EWMA_DEN}) / 1000 AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    QUALIFY event_id % 10 = 0
    """,
    "Exponentially-decayed trailing average (half-per-step weights "
    "over the last 8 events per user): each weight is an exact power "
    "of two and each term an integer, so the windowed sum is a "
    "single BIGINT — reproducible under any partitioning, unlike a "
    "float recurrence s = a*x + (1-a)*s whose value depends on "
    "evaluation order. One user_id shuffle carries all 8 lag terms "
    "(one Window node); the bounded window is what makes the decayed "
    "signal expressible as a fixed lag combination at all — a true "
    "infinite-horizon EWMA needs the streaming state path "
    "(applyInPandasWithState), which streaming/ingest.py covers.",
)
def events_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = F.floor(F.col("value") * 1000).cast("bigint")
    num = None
    den = None
    for i in range(_EWMA_K):
        wgt = 2 ** (_EWMA_K - 1 - i)
        term = F.coalesce(
            (F.lag(x, i).over(w) * F.lit(wgt)).cast("bigint"), F.lit(0)
        )
        dterm = F.when(F.lag(F.col("value"), i).over(w).isNotNull(), wgt).otherwise(0)
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    ev = _t(spark, sf_dir, "events")
    # materialize num/den once: referencing `num` in two output
    # expressions makes Spark instantiate every lag twice (24 window
    # functions instead of 16 in the Window node)
    staged = ev.select(
        "event_id",
        "user_id",
        num.cast("bigint").alias("ewma_scaled"),
        den.alias("__den"),
    ).where(F.col("event_id") % 10 == 0)
    return staged.select(
        "event_id",
        "user_id",
        "ewma_scaled",
        (F.col("ewma_scaled").cast("double") / F.col("__den") / 1000).alias("ewma"),
    )


# --------------------------------------------------------------------------
# incremental aggregate maintenance (materialized-view upkeep)
# --------------------------------------------------------------------------

_INCR_CUTOFF = "1999-01-01"


@register(
    "incremental_agg_orders",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
               AS total_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
               / COUNT(*) AS avg_price,
           strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_date,
           strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_date
    FROM orders
    GROUP BY o_orderpriority
    """,
    "Materialized-view maintenance via mergeable aggregate state "
    "(operators/incremental.py): history (o_orderdate < 1999-01-01) "
    "is aggregated ONCE into per-priority state (count, decimal sum, "
    "min/max date), then the delta batch's partial aggregate is "
    "merged in by union + re-groupBy — one shuffle on the group "
    "keys, NO join, and the history rows are never rescanned. The "
    "oracle is the full recompute over all of orders, so a hash "
    "match proves merge(agg(hist), agg(delta)) == agg(hist U delta) "
    "exactly — which holds because every state column is "
    "commutative-associative (the double sum rides DECIMAL(30,4)). "
    "Ratios (avg_price) are derived at read time from (sum, count) "
    "state so the state itself stays mergeable. At 100 TB this is "
    "the nightly-refresh pattern: per-batch cost scales with the "
    "delta, state size with the number of groups, independent of "
    "history length; the same algebra folds k batches (tested) and "
    "is what HLL-sketch state extends to count-distinct "
    "(hll_sketch_union_estimate).",
)
def incremental_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import StateCol, merge_agg_state

    orders = _t(spark, sf_dir, "orders")
    cut = F.lit(_INCR_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,4)")).alias("__total"),
            F.min("o_orderdate").alias("__first"),
            F.max("o_orderdate").alias("__last"),
        )

    # NULL dates route to the history side: a `< cut` / `>= cut` pair
    # drops NULL rows from BOTH slices (three-valued logic), and the
    # full-recompute oracle would then count rows the merge never saw
    state = partial(
        orders.where((F.col("o_orderdate") < cut) | F.col("o_orderdate").isNull())
    )
    delta = partial(orders.where(F.col("o_orderdate") >= cut))
    merged = merge_agg_state(
        state,
        delta,
        keys=["o_orderpriority"],
        cols=[
            StateCol("n_orders", "sum"),
            StateCol("__total", "sum"),
            StateCol("__first", "min"),
            StateCol("__last", "max"),
        ],
    )
    return merged.select(
        "o_orderpriority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("__total").cast("double").alias("total_price"),
        (F.col("__total").cast("double") / F.col("n_orders")).alias("avg_price"),
        F.date_format("__first", "yyyy-MM-dd").alias("first_date"),
        F.date_format("__last", "yyyy-MM-dd").alias("last_date"),
    )


@register(
    "revenue_mom_growth",
    """
    WITH m AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
                   AS revenue
        FROM orders
        WHERE o_orderdate IS NOT NULL
        GROUP BY strftime(o_orderdate, '%Y-%m')
    )
    SELECT month, revenue,
           LAG(revenue) OVER (ORDER BY month) AS prev_revenue,
           (revenue - LAG(revenue) OVER (ORDER BY month))
               / LAG(revenue) OVER (ORDER BY month) AS growth
    FROM m
    """,
    "Window-over-aggregate (the month-over-month BI staple): monthly "
    "revenue via two_level_scaled_agg (a month is an unbounded-rows "
    "group at 100 TB — int64 partials per input partition, exact "
    "decimal merge), then lag/growth over the months relation. The "
    "global-ORDER window runs AFTER aggregation, on #months rows — "
    "the SinglePartition exchange carries a dims-sized relation, "
    "never the fact table. growth = one IEEE division of two exact "
    "doubles, NULL for the first month; month keys ride as strings "
    "(engine-portable date formatting).",
)
def revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import two_level_scaled_agg

    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate").isNotNull())
    monthly = two_level_scaled_agg(
        orders.withColumn("month", F.date_format("o_orderdate", "yyyy-MM")),
        ["month"],
        [("o_totalprice", 2, "revenue")],
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        ((F.col("revenue") - prev) / prev).alias("growth"),
    )


@register(
    "mv_hll_maintenance_orders",
    None,  # DataSketches HLL estimates are engine-specific, like
    # hll_sketch_union_estimate; the exact-algebra twin with a full
    # DuckDB oracle is incremental_agg_orders, and the estimate's
    # semantics are pinned locally: merged-state estimate == one-shot
    # estimate BIT-EQUAL (tests/test_incremental.py
    # test_hll_state_merge_equals_full_estimate) and within HLL error
    # of the exact count.
    "COUNT(DISTINCT) as maintainable materialized-view state: the "
    "incremental_agg_orders pipeline extended with the 'hll' merge "
    "algebra (operators/incremental.py). History (o_orderdate < "
    "1999-01-01, NULLs routed to history) is aggregated once into "
    "per-priority state carrying a DataSketches HLL sketch of "
    "o_custkey (F.hll_sketch_agg); the delta batch's partial merges "
    "in by union + re-groupBy where sketch union = register-wise max "
    "(F.hll_union_agg) — associative/commutative like sum/min/max, "
    "so the merged estimate EXACTLY equals the one-shot estimate. "
    "This is what makes distinct-count reports refreshable at 100 TB "
    "without rescanning history: per-batch cost is delta-sized, "
    "state is (groups x sketch_size), and the same sketches roll up "
    "across any grouping. Exact columns (n_orders) ride the same "
    "merge and match the full recompute bit-for-bit.",
)
def mv_hll_maintenance_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import StateCol, merge_agg_state

    orders = _t(spark, sf_dir, "orders")
    cut = F.lit(_INCR_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_orders"),
            F.hll_sketch_agg("o_custkey").alias("__cust_hll"),
        )

    state = partial(
        orders.where((F.col("o_orderdate") < cut) | F.col("o_orderdate").isNull())
    )
    delta = partial(orders.where(F.col("o_orderdate") >= cut))
    merged = merge_agg_state(
        state,
        delta,
        keys=["o_orderpriority"],
        cols=[StateCol("n_orders", "sum"), StateCol("__cust_hll", "hll")],
    )
    return merged.select(
        "o_orderpriority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.hll_sketch_estimate("__cust_hll").cast("bigint").alias("approx_customers"),
    )


@register(
    "incremental_topk_orders",
    """
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC) AS rnk
        FROM orders
    )
    SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk,
           o_totalprice AS price
    FROM ranked WHERE rnk <= 5
    """,
    "Maintainable leaderboard: per-priority top-5 order prices kept as "
    "mergeable MV state via the 'topk:5' algebra "
    "(operators/incremental.py) — topk(A∪B) == topk(topk(A)∪topk(B)), "
    "so history (o_orderdate < 1999-01-01, NULLs routed to history) is "
    "reduced ONCE to 5 values per group and each delta batch's top-5 "
    "partial merges in by union + re-groupBy (flatten, re-sort, "
    "re-slice — array expressions, no UDF): dropping anything below a "
    "partial's k-th value can never evict a global top-k member. The "
    "oracle is the full recompute over all of orders, so the hash "
    "match proves the merge exact; ties are unambiguous because the "
    "output is the value multiset, not row identities (the state "
    "array is posexploded to (rank, price) rows at read time — "
    "scalar columns cross the oracle boundary, array cells do not "
    "hash portably through pandas). At 100 TB this "
    "is how a dashboard's top-N stays fresh at delta cost with "
    "k-values-per-group state — the order-statistics member of the "
    "count/sum/min/max/hll mergeable family.",
)
def incremental_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import StateCol, merge_agg_state

    orders = _t(spark, sf_dir, "orders")
    cut = F.lit(_INCR_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.slice(
                F.reverse(F.array_sort(F.collect_list("o_totalprice"))), 1, 5
            ).alias("top_prices")
        )

    state = partial(
        orders.where((F.col("o_orderdate") < cut) | F.col("o_orderdate").isNull())
    )
    delta = partial(orders.where(F.col("o_orderdate") >= cut))
    merged = merge_agg_state(
        state,
        delta,
        keys=["o_orderpriority"],
        cols=[StateCol("top_prices", "topk:5")],
    )
    return merged.select(
        "o_orderpriority", F.posexplode("top_prices").alias("rnk", "price")
    ).select("o_orderpriority", (F.col("rnk") + 1).cast("bigint").alias("rnk"), "price")


@register(
    "incremental_distinct_years_orders",
    """
    SELECT DISTINCT o_orderpriority,
           CAST(year(o_orderdate) AS INT) AS order_year
    FROM orders
    WHERE o_orderdate IS NOT NULL
    """,
    "EXACT maintainable COUNT/SET(DISTINCT) for BOUNDED domains: the "
    "per-priority set of distinct order YEARS kept as mergeable MV "
    "state via the 'set' algebra (operators/incremental.py) — state "
    "is the sorted distinct-value array, merge = flatten + "
    "re-distinct + re-sort, i.e. set union: associative, commutative "
    "AND idempotent, so replayed delta batches are harmless (unlike "
    "'sum'). History (o_orderdate < 1999-01-01, NULLs routed to "
    "history) is reduced ONCE to one array per group; each delta "
    "batch's distinct-set partial merges in by union + re-groupBy — "
    "one shuffle, no join, no history rescan. The oracle is the full "
    "DISTINCT recompute, so the hash match proves "
    "set(A∪B) == set(set(A)∪set(B)) exactly; the state array is "
    "exploded to (priority, year) rows at read time (scalar columns "
    "cross the oracle boundary — array cells do not hash portably "
    "through pandas, per the incremental_topk note). NULL dates "
    "vanish from the state (collect_set drops NULLs) exactly as the "
    "oracle's WHERE drops them. Caller contract: domain small enough "
    "to hold per group (years/categories/status codes — for user-id "
    "cardinalities reach for the 'hll' twin, "
    "mv_hll_maintenance_orders). Completes the mergeable-state "
    "family: count/sum/min/max + hll + topk:<k> + set.",
)
def incremental_distinct_years_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import StateCol, merge_agg_state

    orders = _t(spark, sf_dir, "orders")
    cut = F.lit(_INCR_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.array_sort(F.collect_set(F.year("o_orderdate"))).alias("years")
        )

    state = partial(
        orders.where((F.col("o_orderdate") < cut) | F.col("o_orderdate").isNull())
    )
    delta = partial(orders.where(F.col("o_orderdate") >= cut))
    merged = merge_agg_state(
        state, delta, keys=["o_orderpriority"], cols=[StateCol("years", "set")]
    )
    return merged.select(
        "o_orderpriority", F.explode("years").alias("order_year")
    )


@register(
    "incremental_histogram_orders",
    """
    WITH binned AS (
        SELECT o_orderpriority,
               CAST(LEAST(15, GREATEST(0, FLOOR(o_totalprice / 31250.0)))
                    AS INT) AS bin
        FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT o_orderpriority, bin, CAST(COUNT(*) AS BIGINT) AS bin_count
    FROM binned GROUP BY o_orderpriority, bin
    """,
    "Maintainable DISTRIBUTION state: per-priority 16-bin equi-width "
    "histogram of order value kept as mergeable MV state via the "
    "'hist:16' algebra (operators/incremental.py) — state is a "
    "length-16 BIGINT bin-count vector, merge = element-wise addition "
    "(zip_with), associative/commutative like sum. History "
    "(o_orderdate < 1999-01-01, NULLs routed to history) is reduced "
    "ONCE; each delta batch's vector partial merges in by union + "
    "re-groupBy — one shuffle, no join, no history rescan. The "
    "partial itself is two-stage for scale: groupBy(keys, bin).count() "
    "is map-combinable ON THE FACT TABLE (the corpus-wide wire carries "
    "(group, bin, count) rows, never vectors), then bins_to_array "
    "assembles vectors over the tiny (groups x 16) relation. The "
    "oracle is the full GROUP BY recompute, so the hash match proves "
    "hist(A∪B) == hist(A) + hist(B) exactly; vectors are posexploded "
    "to (priority, bin, count) scalar rows at read time with empty "
    "bins dropped to mirror the oracle's present-groups-only output. "
    "At 100 TB this is how a latency/price/length distribution "
    "dashboard — and any percentile read off it by prefix-summing "
    "bins — stays fresh at delta cost with n counters per group. "
    "Completes the mergeable-state family: count/sum/min/max + hll + "
    "topk:<k> + set + hist:<n>.",
)
def incremental_histogram_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import StateCol, bins_to_array, merge_agg_state

    orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice").isNotNull())
    cut = F.lit(_INCR_CUTOFF).cast("timestamp")
    bin_expr = (
        F.least(
            F.lit(15), F.greatest(F.lit(0), F.floor(F.col("o_totalprice") / 31250.0))
        )
        .cast("int")
        .alias("__bin")
    )

    def partial(df: DataFrame) -> DataFrame:
        counts = df.select("o_orderpriority", bin_expr).groupBy(
            "o_orderpriority", "__bin"
        ).agg(F.count("*").cast("bigint").alias("__c"))
        return counts.groupBy("o_orderpriority").agg(
            bins_to_array(16, "__bin", "__c").alias("price_hist")
        )

    state = partial(
        orders.where((F.col("o_orderdate") < cut) | F.col("o_orderdate").isNull())
    )
    delta = partial(orders.where(F.col("o_orderdate") >= cut))
    merged = merge_agg_state(
        state, delta, keys=["o_orderpriority"], cols=[StateCol("price_hist", "hist:16")]
    )
    return (
        merged.select(
            "o_orderpriority", F.posexplode("price_hist").alias("bin", "bin_count")
        )
        .where(F.col("bin_count") > 0)
        .select(F.col("o_orderpriority"), F.col("bin").cast("int"), "bin_count")
    )


@register(
    "hist_quantile_orders",
    """
    WITH binned AS (
        SELECT o_orderpriority,
               CAST(LEAST(15, GREATEST(0, FLOOR(o_totalprice / 31250.0)))
                    AS INT) AS bin
        FROM orders WHERE o_totalprice IS NOT NULL
    ),
    cnt AS (
        SELECT o_orderpriority, bin, CAST(COUNT(*) AS BIGINT) AS c
        FROM binned GROUP BY o_orderpriority, bin
    ),
    spine AS (SELECT DISTINCT o_orderpriority FROM binned),
    bins AS (
        SELECT s.o_orderpriority, CAST(g.b AS INT) AS bin
        FROM spine s, range(0, 16) g(b)
    ),
    full_cnt AS (
        SELECT b.o_orderpriority, b.bin, CAST(COALESCE(c.c, 0) AS BIGINT) AS c
        FROM bins b LEFT JOIN cnt c USING (o_orderpriority, bin)
    ),
    cum AS (
        SELECT o_orderpriority, bin,
               SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum_c
        FROM full_cnt
    ),
    tot AS (
        SELECT o_orderpriority, CAST(SUM(c) AS BIGINT) AS n
        FROM full_cnt GROUP BY o_orderpriority
    ),
    ranks AS (
        SELECT t.o_orderpriority, v.q, CAST(CEIL(v.q * t.n) AS BIGINT) AS rnk
        FROM tot t CROSS JOIN (VALUES (0.5), (0.9), (0.99)) v(q)
    )
    SELECT r.o_orderpriority, r.q,
           (CAST(COUNT(CASE WHEN c.cum_c < r.rnk THEN 1 END) AS BIGINT) + 1)
               * 31250.0 AS quantile_value
    FROM ranks r JOIN cum c ON c.o_orderpriority = r.o_orderpriority
    GROUP BY r.o_orderpriority, r.q
    """,
    "QUANTILES read off the merged histogram MV state — the payoff of "
    "incremental_histogram_orders: p50/p90/p99 of order value per "
    "priority computed from the SAME maintainable 'hist:16' state "
    "(history reduced once, delta merged by vector addition), with "
    "operators/incremental.hist_quantile's pure array-expression "
    "prefix-sum read — rank = ceil(q x total), the answer is the "
    "upper edge of the bin holding that rank (one-bin-width accuracy "
    "contract: tighten by adding bins, never by rescanning history). "
    "Everything is integer counts, one IEEE multiply per quantile — "
    "fully hash-checked against the SQL recompute, which must pad "
    "ALL 16 bins before prefix-summing (empty bins occupy slots in "
    "the state vector's cumulative array, so a present-bins-only "
    "cumulative would misindex whenever a rank lands past a gap). "
    "At 100 TB this is a latency/price dashboard percentile served "
    "at MV-refresh cost: the read touches (groups x 16) state rows, "
    "never the fact table.",
)
def hist_quantile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import (
        StateCol,
        bins_to_array,
        hist_quantile,
        merge_agg_state,
    )

    orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice").isNotNull())
    cut = F.lit(_INCR_CUTOFF).cast("timestamp")
    bin_expr = (
        F.least(
            F.lit(15), F.greatest(F.lit(0), F.floor(F.col("o_totalprice") / 31250.0))
        )
        .cast("int")
        .alias("__bin")
    )

    def partial(df: DataFrame) -> DataFrame:
        counts = df.select("o_orderpriority", bin_expr).groupBy(
            "o_orderpriority", "__bin"
        ).agg(F.count("*").cast("bigint").alias("__c"))
        return counts.groupBy("o_orderpriority").agg(
            bins_to_array(16, "__bin", "__c").alias("price_hist")
        )

    state = partial(
        orders.where((F.col("o_orderdate") < cut) | F.col("o_orderdate").isNull())
    )
    delta = partial(orders.where(F.col("o_orderdate") >= cut))
    merged = merge_agg_state(
        state, delta, keys=["o_orderpriority"], cols=[StateCol("price_hist", "hist:16")]
    )
    return merged.select(
        "o_orderpriority",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        hist_quantile("price_hist", q, 0.0, 31250.0).alias(
                            "quantile_value"
                        ),
                    )
                    for q in (0.5, 0.9, 0.99)
                ]
            )
        ).alias("e"),
    ).select("o_orderpriority", F.col("e.q").alias("q"), F.col("e.quantile_value").alias("quantile_value"))


@register(
    "incremental_freq_items_orders",
    """
    WITH b AS (
        SELECT o_orderpriority,
               CAST(o_custkey % 20 AS VARCHAR) AS cust_bucket
        FROM orders
    ),
    tot AS (
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_orderpriority
    ),
    cnt AS (
        SELECT o_orderpriority, cust_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_bucket
        FROM b GROUP BY o_orderpriority, cust_bucket
    )
    SELECT o_orderpriority, n_orders, cust_bucket, n_bucket, rnk FROM (
        SELECT c.o_orderpriority, t.n_orders, c.cust_bucket, c.n_bucket,
               CAST(ROW_NUMBER() OVER (PARTITION BY c.o_orderpriority
                    ORDER BY c.n_bucket DESC, c.cust_bucket) AS INT) AS rnk
        FROM cnt c JOIN tot t USING (o_orderpriority)
    ) WHERE rnk <= 3
    """,
    "Maintainable HEAVY-HITTER state (the 'fi:<n>' frequent-items "
    "algebra, VERDICT r7 #2): per-priority customer-bucket frequency "
    "kept as a Spark 4 approx_top_k sketch — history (o_orderdate < "
    "1999-01-01, NULLs routed to history) is sketched ONCE, each "
    "delta batch's sketch merges in via approx_top_k_combine (union + "
    "re-groupBy, no history rescan), and the top items are read with "
    "approx_top_k_estimate. FULLY hash-checked, not rows-only: "
    "capacity 64 >> the 20-value bucket domain makes the sketch "
    "degrade to exact counting (the approx_topk_terms argument), the "
    "estimate is read at FULL capacity so the sketch's internal tie "
    "order never matters, and a deterministic re-rank (count DESC, "
    "item ASC) cuts to 3 — the oracle is the exact GROUP BY "
    "recompute, so the hash match proves accumulate -> combine -> "
    "estimate exact end to end. Completes the sketch corner of the "
    "mergeable family next to 'hll' (distinct cardinality) and exact "
    "'topk:<k>' (order statistics): this one ranks by FREQUENCY. "
    "Beyond capacity the standard Misra-Gries heavy-hitter guarantee "
    "applies — state stays n entries per group at any corpus size.",
)
def incremental_freq_items_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import (
        StateCol,
        fi_accumulate,
        fi_estimate,
        merge_agg_state,
    )

    cap = 64
    orders = _t(spark, sf_dir, "orders").withColumn(
        "cust_bucket", (F.col("o_custkey") % 20).cast("string")
    )
    cut = F.lit(_INCR_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").cast("bigint").alias("n_orders"),
            fi_accumulate("cust_bucket", cap).alias("__fi"),
        )

    state = partial(
        orders.where((F.col("o_orderdate") < cut) | F.col("o_orderdate").isNull())
    )
    delta = partial(orders.where(F.col("o_orderdate") >= cut))
    merged = merge_agg_state(
        state,
        delta,
        keys=["o_orderpriority"],
        cols=[StateCol("n_orders", "sum"), StateCol("__fi", f"fi:{cap}")],
    )
    pairs = merged.select(
        "o_orderpriority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.explode(fi_estimate("__fi", cap)).alias("e"),
    ).select(
        "o_orderpriority",
        "n_orders",
        F.col("e.item").alias("cust_bucket"),
        F.col("e.count").cast("bigint").alias("n_bucket"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("n_bucket"), F.asc("cust_bucket")
    )
    return pairs.withColumn("rnk", F.row_number().over(w).cast("int")).where(
        F.col("rnk") <= 3
    )


# --------------------------------------------------------------------------
# association rules (market-basket lift) over order/brand baskets
# --------------------------------------------------------------------------


@register(
    "assoc_rules_brands",
    """
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ),
    totals AS (SELECT COUNT(DISTINCT okey) AS n_baskets FROM baskets),
    brand_cnt AS (SELECT brand, COUNT(*) AS c FROM baskets GROUP BY brand),
    pairs AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS pair_cnt
        FROM baskets a JOIN baskets b
          ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY a.brand, b.brand
    )
    SELECT brand_a, brand_b,
           CAST(pair_cnt AS BIGINT) AS pair_cnt,
           CAST(ca.c AS BIGINT) AS cnt_a,
           CAST(cb.c AS BIGINT) AS cnt_b,
           CAST(n_baskets AS BIGINT) AS n_baskets,
           CAST(pair_cnt * n_baskets AS DOUBLE) / (ca.c * cb.c) AS lift
    FROM pairs
    CROSS JOIN totals
    JOIN brand_cnt ca ON ca.brand = brand_a
    JOIN brand_cnt cb ON cb.brand = brand_b
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 25
    """,
    "Association-rule mining (market-basket lift) over order->brand "
    "baskets. The oracle spells the textbook self-join of the "
    "distinct (order, brand) relation; the Spark plan instead folds "
    "each basket to ONE sorted brand-set row (collect_set dedups in "
    "the same hash aggregate) and emits the a<b pairs by a nested "
    "codegen explode — so the basket relation crosses the wire ONCE "
    "(the groupBy(okey) exchange) instead of three times "
    "(distinct + both self-join sides); measured 1.4x at sf0.1. "
    "lift = pair*N/(ca*cb) as ONE IEEE division of exact integer "
    "counts (bit-identical across engines), full (lift, brand_a, "
    "brand_b) tiebreak on the top-k. Scale shape: the pair blow-up "
    "is bounded by the max basket size (<=11 distinct brands/order "
    "here, so <=55 pairs/order — the item->brand rollup is WHY this "
    "is tractable; raw partkey baskets would explode), and the "
    "per-brand priors (25 rows) and the scalar total join back via "
    "broadcast. This is the a-priori first pass that seeds "
    "recommender candidates at catalog scale.",
)
def assoc_rules_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    baskets = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li["l_partkey"] == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
    )
    sets = baskets.groupBy("okey").agg(
        F.array_sort(F.collect_set("brand")).alias("bs")
    )
    pairs = (
        sets.select(F.explode("bs").alias("brand_a"), "bs")
        .select(
            "brand_a",
            F.explode(
                F.filter("bs", lambda x: x > F.col("brand_a"))
            ).alias("brand_b"),
        )
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("pair_cnt"))
    )
    exploded = sets.select(F.explode("bs").alias("brand"))
    brand_cnt = exploded.groupBy("brand").agg(F.count("*").alias("c"))
    totals = sets.agg(F.count("*").alias("n_baskets"))
    ca = brand_cnt.select(F.col("brand").alias("__ba"), F.col("c").alias("cnt_a"))
    cb = brand_cnt.select(F.col("brand").alias("__bb"), F.col("c").alias("cnt_b"))
    out = (
        pairs.crossJoin(F.broadcast(totals))
        .join(F.broadcast(ca), F.col("brand_a") == F.col("__ba"))
        .join(F.broadcast(cb), F.col("brand_b") == F.col("__bb"))
        .select(
            "brand_a",
            "brand_b",
            F.col("pair_cnt").cast("bigint").alias("pair_cnt"),
            F.col("cnt_a").cast("bigint").alias("cnt_a"),
            F.col("cnt_b").cast("bigint").alias("cnt_b"),
            F.col("n_baskets").cast("bigint").alias("n_baskets"),
            ((F.col("pair_cnt") * F.col("n_baskets")).cast("double")
             / (F.col("cnt_a") * F.col("cnt_b"))).alias("lift"),
        )
    )
    return out.orderBy(F.desc("lift"), "brand_a", "brand_b").limit(25)


# --------------------------------------------------------------------------
# CDC snapshot diff
# --------------------------------------------------------------------------


@register(
    "snapshot_diff_orders",
    """
    WITH snap_old AS (
        SELECT o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey % 97 <> 0
    ),
    snap_new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 19 = 0 THEN NULL
                    WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END
                   AS o_totalprice
        FROM orders WHERE o_orderkey % 89 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           o.o_totalprice AS old_price,
           n.o_totalprice AS new_price
    FROM snap_old o FULL OUTER JOIN snap_new n
      ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    """,
    "Change-data-capture diff of two table snapshots: full outer "
    "join on the primary key, classify added / removed / changed, "
    "drop the unchanged majority so the output is delta-sized. The "
    "two snapshots are derived deterministically from orders (rows "
    "missing from the old snapshot, rows deleted in the new one, a "
    "+1.0 price restatement on the %11 slice, a NULL redaction on "
    "the %19 slice) so the driver can "
    "hash-check every emitted row against the oracle's identical "
    "derivation — including value->NULL restatements, which the "
    "null-safe comparison must classify as 'changed' where a bare "
    "<> would silently drop them. Scale shape: a key-partitioned sort-merge join "
    "emitting only differing rows — at 100 TB both snapshots live "
    "bucketed on the PK (bucketed_join_revenue shows the layout) so "
    "the diff runs with ZERO join exchanges; change detection is a "
    "null-safe column comparison, never a row-string hash, so adding "
    "tracked columns stays O(cols). This is the backfill-validation "
    "/ replication-audit primitive.",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    snap_old = orders.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    snap_new = orders.where(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 19 == 0, F.lit(None).cast("double"))
        .when(F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    o = snap_old.alias("o")
    n = snap_new.alias("n")
    joined = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    return joined.where(
        F.col("o.o_orderkey").isNull()
        | F.col("n.o_orderkey").isNull()
        # null-safe: a NULL-to-value (or value-to-NULL) restatement in
        # a nullable tracked column must classify as 'changed', not
        # vanish into three-valued logic
        | ~F.col("o.o_totalprice").eqNullSafe(F.col("n.o_totalprice"))
    ).select(
        F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("o.o_orderkey").isNull(), "added")
        .when(F.col("n.o_orderkey").isNull(), "removed")
        .otherwise("changed")
        .alias("change_type"),
        F.col("o.o_totalprice").alias("old_price"),
        F.col("n.o_totalprice").alias("new_price"),
    )


# --------------------------------------------------------------------------
# CDC changelog compaction (keep-latest with tombstones)
# --------------------------------------------------------------------------


@register(
    "cdc_log_compaction_orders",
    """
    WITH log AS (
        SELECT o_orderkey, o_totalprice, 1 AS seq FROM orders
        UNION ALL
        SELECT o_orderkey, o_totalprice + 1.0, 2
        FROM orders WHERE o_orderkey % 11 = 0
        UNION ALL
        SELECT o_orderkey, CAST(NULL AS DOUBLE), 3
        FROM orders WHERE o_orderkey % 19 = 0
    ),
    ranked AS (
        SELECT o_orderkey, o_totalprice, seq,
               ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                  ORDER BY seq DESC) AS rn
        FROM log
    )
    SELECT o_orderkey, o_totalprice, seq AS last_seq
    FROM ranked WHERE rn = 1 AND seq <> 3
    """,
    "CDC changelog compaction (VERDICT r6 #8): materialize the "
    "current table state from an insert/update/delete log — keep the "
    "newest entry per key, and a delete tombstone erases the key "
    "entirely. This is the read side of a Debezium/Kafka-compacted "
    "changelog and the batch twin of merge_upsert's incremental "
    "MERGE; it differs from latest_event_per_user exactly by the "
    "tombstone-drop (keep-latest alone would resurrect deleted "
    "rows). The changelog is derived deterministically from orders "
    "(seq 1 insert for every key, seq 2 price restatement on the "
    "%11 slice, seq 3 tombstone on the %19 slice) so the driver "
    "hash-checks every surviving row, including a %209 slice where "
    "an update is later tombstoned. ONE key exchange + one window "
    "+ rn=1 cut, filter-after-window for the tombstones — no "
    "groupBy-max-join-back, no second shuffle. At 100 TB the log is "
    "a real table partitioned by arrival batch; compaction "
    "partitions by key (AQE splits hot keys) and the seq tiebreaker "
    "(a changelog offset) makes the survivor total-ordered, so "
    "replaying a batch is idempotent.",
)
def cdc_log_compaction_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    log = (
        orders.select(
            "o_orderkey", "o_totalprice", F.lit(1).alias("seq")
        )
        .unionAll(
            orders.where(F.col("o_orderkey") % 11 == 0).select(
                "o_orderkey",
                (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
                F.lit(2).alias("seq"),
            )
        )
        .unionAll(
            orders.where(F.col("o_orderkey") % 19 == 0).select(
                "o_orderkey",
                F.lit(None).cast("double").alias("o_totalprice"),
                F.lit(3).alias("seq"),
            )
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("seq"))
    return (
        log.select(
            "o_orderkey", "o_totalprice", "seq",
            F.row_number().over(w).alias("__rn"),
        )
        .where((F.col("__rn") == 1) & (F.col("seq") != 3))
        .select("o_orderkey", "o_totalprice", F.col("seq").alias("last_seq"))
    )


# --------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences
# --------------------------------------------------------------------------


@register(
    "transition_matrix_events",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    pairs AS (
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT from_type, to_type,
           CAST(n AS BIGINT) AS n,
           CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
           CAST(n AS DOUBLE)
               / CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS prob
    FROM pairs
    """,
    "First-order Markov transition matrix over per-user event "
    "sequences (the next-action model behind funnel_conversion and "
    "session_top_paths): lead() pairs each event with its successor "
    "inside one (ts, event_id)-total-ordered window per user, pair "
    "counts aggregate to the |types|^2 matrix, and row-normalized "
    "probabilities come from a window sum over the TINY matrix "
    "relation — so the only big-data shuffles are the user-sequence "
    "window and the pair groupBy; the normalization touches "
    "|types|^2 rows regardless of corpus size. prob is one IEEE "
    "division of two exact counts (bit-identical); the DuckDB "
    "window SUM(BIGINT) is cast back from HUGEINT before the "
    "division so both engines divide the same types.",
)
def transition_matrix_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w_seq).alias("next_type"),
    )
    pairs = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"),
                 F.col("next_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.sum("n").over(w_from).cast("bigint").alias("n_from"),
        (F.col("n").cast("double") / F.sum("n").over(w_from)).alias("prob"),
    )
