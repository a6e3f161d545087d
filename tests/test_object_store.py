"""S7 — object-store-style paths (SURVEY.md §2.1).

All engine IO goes through the Hadoop FileSystem abstraction, so any
configured scheme resolves identically: ``s3a://bucket/key`` in a real
deployment is just ``fs.s3a.impl`` + credentials config — no code
changes (COVERAGE.md §2.1). This container has no AWS jars, so the
contract is exercised with ``viewfs://`` (bundled with Hadoop): a
client-side mount table maps a virtual cluster path to a backing
store through the same scheme -> FileSystem-impl dispatch s3a uses.
These tests prove the IO layer never assumes a local filesystem path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lichess_db_spark.io import load_table, write_parquet

from .conftest import SF_SMALL


@pytest.fixture()
def viewfs(spark, tmp_path, request):
    """Mount tmp_path as viewfs://<unique>/warehouse and return the URI.

    The cluster name must be unique per test: Hadoop caches FileSystem
    instances by (scheme, authority), so a reused name would pin the
    first test's mount table for the whole JVM."""
    name = "".join(c for c in request.node.name if c.isalnum()).lower()
    hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    hconf.set(f"fs.viewfs.mounttable.{name}.link./warehouse", tmp_path.as_uri())
    return f"viewfs://{name}/warehouse"


def test_viewfs_parquet_roundtrip(spark, viewfs):
    """write_parquet + read back through a non-file: URI scheme."""
    src = load_table(spark, SF_SMALL, "region")
    write_parquet(src, f"{viewfs}/region_copy")
    back = spark.read.parquet(f"{viewfs}/region_copy")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_viewfs_partitioned_write_and_filtered_read(spark, viewfs):
    """The year=/month= hive layout (S5) works through the scheme, and
    a partition-key filter reads only the matching rows."""
    src = load_table(spark, SF_SMALL, "orders").withColumn(
        "o_year", F.year(F.to_date("o_orderdate"))
    )
    write_parquet(src, f"{viewfs}/orders_part", partition_by=["o_year"])
    back = spark.read.parquet(f"{viewfs}/orders_part")
    one_year = back.where(F.col("o_year") == 1995)
    want = src.where(F.col("o_year") == 1995).count()
    assert want > 0
    assert one_year.count() == want
    plan = one_year._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        one_year._jdf.queryExecution(), "simple"
    )
    assert "PartitionFilters: [isnotnull(o_year" in plan, plan[:1500]


def test_viewfs_pgn_parse(spark, viewfs, tmp_path):
    """The PGN source (binaryFile-backed) parses from a non-file:
    scheme — the ingest edge is object-store-clean end to end."""
    import os
    import shutil

    from lichess_db_spark.sources.pgn import parse_pgn_text

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "games.pgn")
    shutil.copy(fixture, tmp_path / "chunk_00000.pgn")
    games = parse_pgn_text(spark, f"{viewfs}/chunk_00000.pgn")
    assert games.count() == 6
    assert games.where(F.col("Site") == "https://lichess.org/j1dkb5dw").count() == 1
