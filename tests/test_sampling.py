"""priority_sample: deterministic weighted sampling without
replacement (operators/sampling.py) — staged for an r6 catalog entry
(ROADMAP); the DuckDB mirror here is the future oracle's core.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lichess_db_spark.io import load_table, table_path
from lichess_db_spark.operators.sampling import (
    PRIORITY_KEY_SQL,
    _U_SCALE,
    priority_sample,
)

SF_SMALL = "/root/testdata/sf0.001"
K = 50


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_partitioning_invariance(spark, docs):
    a = priority_sample(docs.repartition(1), "doc_id", "n_chars", K)
    b = priority_sample(docs.repartition(7, "lang"), "doc_id", "n_chars", K)
    assert _ids(a) == _ids(b)
    assert a.count() == K


def test_duckdb_mirror_selects_same_sample(spark, docs):
    """The exact-integer key reproduces bit-for-bit in DuckDB — the
    r6 oracle pattern (portable-twin discipline, cf. the minhash/LSH
    portable entries)."""
    got = priority_sample(docs, "doc_id", "n_chars", K)
    key = PRIORITY_KEY_SQL.format(w="n_chars", id="doc_id", scale=_U_SCALE)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{table_path(SF_SMALL, 'documents')}'"
    )
    want = con.sql(
        f"""
        SELECT doc_id, CAST({key} AS DECIMAL(38,0)) AS priority
        FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
        ORDER BY priority DESC, doc_id LIMIT {K}
        """
    ).fetchall()
    got_rows = sorted((r["doc_id"], int(r["priority"])) for r in got.collect())
    assert got_rows == sorted((i, int(p)) for i, p in want)


def test_weight_bias(spark):
    """Items with 100x weight must dominate the sample: two
    interleaved populations of equal size, heavy ids odd."""
    rows = [(i, 100 if i % 2 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    got = priority_sample(df, "doc_id", "w", 100)
    heavy = got.where("doc_id % 2 = 1").count()
    assert heavy >= 90, f"heavy items underrepresented: {heavy}/100"


def test_estimator_terms(spark, docs):
    """DLT structure: est_weight == max(w, tau) with ONE tau across
    the sample, tau = the (k+1)-th priority in weight units; and the
    whole-population subset-sum estimate lands near the true total
    (single-draw sanity, generous tolerance)."""
    got = priority_sample(docs, "doc_id", "n_chars", K).collect()
    taus = {round(r["est_weight"], 9) for r in got if r["est_weight"] > r["weight"]}
    assert len(taus) <= 1, f"multiple thresholds: {taus}"
    est_total = sum(r["est_weight"] for r in got)
    true_total = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert 0.5 * true_total <= est_total <= 2.0 * true_total


def test_small_population_keeps_everything(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 0)], "doc_id bigint, w bigint"
    )
    got = priority_sample(df, "doc_id", "w", 10).collect()
    # null/zero weights excluded; survivors' est_weight == exact weight
    assert sorted(r["doc_id"] for r in got) == [1, 2]
    assert all(r["est_weight"] == float(r["weight"]) for r in got)


def test_plan_is_top_k(spark, docs):
    df = priority_sample(docs, "doc_id", "n_chars", K)
    p = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "simple"
    )
    assert "TakeOrderedAndProject" in p
    assert "Join" not in p  # tau derives from a window, not a join
    # the r5 fix (VERDICT r5 item 1): tau and the k-row cut share ONE
    # TakeOrderedAndProject lineage, so the corpus is scanned once
    assert p.count("TakeOrderedAndProject") == 1
    assert p.count("Scan parquet") == 1


# ---------------------------------------------------------------------------
# priority_sample_grouped / sample_token_budget (r6)
# ---------------------------------------------------------------------------


def test_grouped_sample_matches_naive_window(spark, docs):
    """The skew-resistant two-window prune returns exactly what the
    naive single PARTITION BY group window would, under any input
    partitioning."""
    from pyspark.sql import Window

    from lichess_db_spark.operators.sampling import (
        _scored,
        priority_sample_grouped,
    )

    k = 10
    scored = _scored(docs, "doc_id", "n_chars", "lang")
    w = Window.partitionBy("lang").orderBy(F.desc("priority"), F.asc("doc_id"))
    ranked = scored.withColumn("rn", F.row_number().over(w)).withColumn(
        "tau",
        F.max(F.when(F.col("rn") == k + 1, F.col("priority"))).over(
            Window.partitionBy("lang")
        ),
    )
    naive = {
        (r["lang"], r["doc_id"]): (
            r["weight"],
            max(float(r["weight"]), float(r["tau"] or 0)),
        )
        for r in ranked.where(F.col("rn") <= k).collect()
    }
    for parts in (1, 7):
        got = {
            (r["lang"], r["doc_id"]): (r["weight"], r["est_weight"])
            for r in priority_sample_grouped(
                docs.repartition(parts), "doc_id", "n_chars", k, "lang"
            ).collect()
        }
        assert got == naive


def test_token_budget_fill_semantics(spark, docs):
    """Distributed prefix sum == the global-order running sum: every
    kept doc's cum_start is the exact sum of all higher-priority
    weights, the set stops exactly at the budget (overshoot at most
    one doc), and the result is invariant to partition count."""
    from lichess_db_spark.operators.sampling import sample_token_budget

    budget = 60_000
    base = sorted(
        (
            (r["doc_id"], r["n_tokens"], r["cum_start"])
            for r in sample_token_budget(
                docs, "doc_id", "n_chars", budget, partitions=1
            ).collect()
        ),
        key=lambda t: t[2],
    )
    assert base, "budget too small for fixture"
    # exact prefix property + budget cut
    cum = 0
    for _, w, start in base:
        assert start == cum and start < budget
        cum += w
    assert cum >= budget or len(base) == docs.where("n_chars > 0").count()
    for parts in (5, 17):
        got = sorted(
            (
                (r["doc_id"], r["n_tokens"], r["cum_start"])
                for r in sample_token_budget(
                    docs.repartition(7), "doc_id", "n_chars", budget, partitions=parts
                ).collect()
            ),
            key=lambda t: t[2],
        )
        assert got == base


def test_grouped_sample_hot_group_skew(spark):
    """Adversarial skew: one group holds 95% of the corpus. The
    two-window prune must still return exactly the naive per-group
    sample — the hot group's rows spread over input partitions, each
    contributing a local top-(k+1)."""
    from pyspark.sql import Window

    from lichess_db_spark.operators.sampling import (
        _scored,
        priority_sample_grouped,
    )

    k = 7
    rows = [(i, 10 + (i % 90), "hot" if i % 20 else "cold") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint, g string").repartition(13)
    scored = _scored(df, "doc_id", "w", "g")
    wN = Window.partitionBy("g").orderBy(F.desc("priority"), F.asc("doc_id"))
    naive = {
        (r["g"], r["doc_id"])
        for r in scored.withColumn("rn", F.row_number().over(wN))
        .where(F.col("rn") <= k)
        .collect()
    }
    got = {
        (r["g"], r["doc_id"])
        for r in priority_sample_grouped(df, "doc_id", "w", k, "g").collect()
    }
    assert got == naive and len(got) == 2 * k
