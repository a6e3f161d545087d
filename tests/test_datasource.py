"""Spark 4 Python DataSource for PGN (format('pgn'))."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lichess_db_spark.plans.games import games_pipeline
from lichess_db_spark.sources.pgn_datasource import register_pgn_source

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "games.pgn")


def test_pgn_format_reads_games(spark):
    register_pgn_source(spark)
    df = spark.read.format("pgn").load(FIXTURE)
    assert df.count() == 6
    row = df.where(F.col("Site").endswith("j1dkb5dw")).first()
    assert row.White == "BFG9k" and row.BlackTitle is None
    # flows into the same domain pipeline as every other source
    assert games_pipeline(df).count() == 12


def test_pgn_format_matches_relational_parser(spark):
    from lichess_db_spark.sources.pgn import parse_pgn_text

    register_pgn_source(spark)
    a = spark.read.format("pgn").load(FIXTURE).select("Site", "White", "Result")
    b = parse_pgn_text(spark, FIXTURE).select("Site", "White", "Result")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_pgn_stream_reads_arriving_files(spark, tmp_path):
    import shutil
    import time

    register_pgn_source(spark)
    d = tmp_path / "stream"
    d.mkdir()
    shutil.copy(FIXTURE, d / "chunk_00000.pgn")
    q = (
        spark.readStream.format("pgn")
        .load(str(d / "*.pgn"))
        .writeStream.format("memory")
        .queryName("pgn_stream")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("pgn_stream").count() < 6:
            time.sleep(1)
        assert spark.table("pgn_stream").count() == 6
        # a new staged chunk arrives -> next micro-batch picks it up
        shutil.copy(FIXTURE, d / "chunk_00001.pgn")
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("pgn_stream").count() < 12:
            time.sleep(1)
        assert spark.table("pgn_stream").count() == 12
    finally:
        q.stop()
