"""User-facing facade: everything a user of the reference does today,
one object.

    from lichess_db_spark.api import LichessDB
    db = LichessDB(spark, "lichess_parquet/")   # S6 glob scan
    db.total_games().show()                      # eda cells 4-12
    db.top_players(20).show()
    db.dedup_exact().count()                     # north-star extensions

Construction is lazy: nothing is read until an action runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators import dedup as _dd
from .plans import eda as _eda


class LichessDB:
    def __init__(self, spark: SparkSession, path: str | None = None, games: DataFrame | None = None):
        assert (path is None) != (games is None), "pass exactly one of path/games"
        self.spark = spark
        self.games = games if games is not None else spark.read.parquet(path)

    # ---- reference EDA surface (eda.ipynb cells 4-12) ----
    def total_games(self) -> DataFrame:
        return _eda.total_games(self.games)

    def approx_distinct_players(self) -> DataFrame:
        return _eda.approx_distinct_players(self.games)

    def result_proportions(self) -> DataFrame:
        return _eda.result_proportions(self.games)

    def termination_proportions(self) -> DataFrame:
        return _eda.termination_proportions(self.games)

    def top_players(self, k: int = 20) -> DataFrame:
        return _eda.top_players(self.games, k)

    def games_per_day(self) -> DataFrame:
        return _eda.games_per_day(self.games)

    def high_elo_openings(self, min_elo: int = 2000) -> DataFrame:
        return _eda.high_elo_openings(self.games, min_elo)

    def top_openings(self, k: int = 20) -> DataFrame:
        return _eda.top_openings(self.games, k)

    # ---- north-star extensions over an arbitrary text column ----
    def dedup_exact(self, text_col: str = "Opening") -> DataFrame:
        return _dd.exact_dedup(self.games, text_col)

    def sql(self, query: str, view_name: str = "games") -> DataFrame:
        """SQL front door over the games table."""
        self.games.createOrReplaceTempView(view_name)
        return self.spark.sql(query)
