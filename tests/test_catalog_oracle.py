"""Every oracle-checkable catalog query vs DuckDB at sf0.001.

This is the local twin of the driver's CORRECTNESS gate; it runs at
the smallest scale factor for speed (test_catalog_oracle_sf001_smoke
covers sf0.01 for a few heavy hitters).
"""

from __future__ import annotations

import pytest

from lichess_db_spark.plans import QUERIES

from .conftest import SF_MED, SF_SMALL
from .oracle_utils import compare, duck_con

ORACLE_QUERIES = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, q in QUERIES.items() if q.oracle is None)


@pytest.fixture(scope="module")
def con_small():
    con = duck_con(SF_SMALL)
    yield con
    con.close()


@pytest.fixture(scope="module")
def con_med():
    con = duck_con(SF_MED)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity_sf_small(spark, con_small, name):
    q = QUERIES[name]
    compare(q.build(spark, SF_SMALL), con_small, q.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    q = QUERIES[name]
    df = q.build(spark, SF_SMALL)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_approx_quantiles_rank_error_bracket(spark, sf_dir):
    """VERDICT r6 #7: pin the GK sketch's rank-error contract.

    percentile_approx(value, probs, accuracy=A) guarantees each
    reported quantile's true rank is within eps*N of p*N, eps = 1/A
    (Greenwald-Khanna; Spark ApproximatePercentile docs). The driver
    row stays rows-only (sketches differ per engine); this test makes
    the accuracy claim executable against DuckDB's exact rank counts.
    """
    import duckdb

    q = QUERIES["approx_quantiles_value"]
    probs = [0.25, 0.5, 0.75, 0.99]
    eps = 1.0 / 10000  # must match the builder's accuracy parameter
    quantiles = q.build(spark, sf_dir).collect()[0]["quantiles"]
    assert len(quantiles) == len(probs)

    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(value) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    for p, v in zip(probs, quantiles):
        lt, le = con.execute(
            f"SELECT count(*) FILTER (value < ?), count(*) FILTER (value <= ?) "
            f"FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL",
            [v, v],
        ).fetchone()
        # the reported value occupies rank interval (lt, le]; GK promises
        # some rank in that interval is within eps*N of the target (+1 for
        # integer rank-rounding at the boundary).
        target = p * n
        slack = eps * n + 1
        assert lt + 1 <= target + slack and le >= target - slack, (
            f"p={p}: value {v} spans ranks ({lt}, {le}], "
            f"target {target:.1f} ± {slack:.1f} of N={n}"
        )
    con.close()


HEAVY = ["q1_pricing_summary", "q3_shipping_priority", "knn_bruteforce_cosine",
         "dedup_ngram_jaccard", "w1_running_count_by_type", "events_session_windows",
         # r5: corpus-stats joins + auto-scaled LSH have size-dependent
         # plans — pin parity at the larger SF too
         "token_rarity_score", "bigram_lift_topk", "dedup_embedding_lsh",
         "classifier_margin_select",
         # r5 session 2: size-dependent join strategies / write paths
         "triangle_copurchase_topk", "bucketed_join_revenue",
         "merge_upsert_orders",
         # r8 staged trio+: cluster-bounded pair joins and the funnel
         # composition have size-dependent join strategies; the Arrow
         # dot kernel's exactness deserves the second tier in-suite
         "semdedup_embeddings", "semdedup_centroid_far",
         "exact_substring_dedup", "exact_substring_clean",
         "curation_funnel_report",
         "dsir_importance_weights", "bloom_novelty_docs",
         "unimax_lang_allocation", "gopher_quality_rules",
         "stupid_backoff_score", "countmin_mv_orders"]


@pytest.mark.parametrize("name", [n for n in HEAVY if n in ORACLE_QUERIES])
def test_oracle_parity_sf_med(spark, con_med, name):
    q = QUERIES[name]
    compare(q.build(spark, SF_MED), con_med, q.oracle, name)
