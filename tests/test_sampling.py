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
