"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query at sf0.001; ``queries`` /
``oracle_sql`` expose the operator catalog (SURVEY.md §2) for the
driver's DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lichess_db_spark.plans import oracle_sql_map, queries_map

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1 shape (scan -> pushed filter -> hash agg): the spine of
    every reference EDA query (SURVEY.md §7 phase 1).
    """
    from lichess_db_spark.plans.catalog_core import q1_pricing_summary

    return q1_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each oracle-checkable query.

    Keys absent here (vs ``queries()``) use engine-specific hashing
    (xxhash64 minhash/simhash) or are approximate (HLL, LSH ANN) —
    the driver records the weaker rows-only check for those, and
    tests/test_north_star.py asserts their semantics against exact
    twins instead.
    """
    return oracle_sql_map()
