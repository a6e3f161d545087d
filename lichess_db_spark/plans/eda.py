"""The reference's analytical query surface (eda.ipynb cells 4-12)
as functions over the canonical player-game-role table.

A user of the reference runs exactly these analyses; each function is
the Spark twin, documented with its notebook cell. The games table
stores TWO rows per game (Role_player White/Black, ingester.py:
402-404); game-level analyses therefore restrict to the White-role
row or count distinct IDs — the reference's own notebook predates the
unpivot and counted one row per game (cell4 output 318,834,657 ==
its games count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import WINNER_MAP, recode
from ..operators.aggregates import group_count, with_proportion
from ..operators.topk import top_k


def _white_rows(games: DataFrame) -> DataFrame:
    """One row per game: the White-perspective row."""
    return games.where(F.col("Role_player") == "White")


def total_games(games: DataFrame) -> DataFrame:
    """cell4: SELECT count(*) AS `Num games` (game-level)."""
    return _white_rows(games).agg(F.count("*").alias("Num games"))


def approx_distinct_players(games: DataFrame) -> DataFrame:
    """cell5: approx_n_unique(White), approx_n_unique(Black)."""
    w = _white_rows(games)
    return w.agg(
        F.approx_count_distinct("Player").alias("White"),
        F.approx_count_distinct("Opponent").alias("Black"),
    )


def result_proportions(games: DataFrame) -> DataFrame:
    """cell6: Result -> winner recode, filter to decided, proportions."""
    w = _white_rows(games).withColumn("winner", recode("Result", WINNER_MAP))
    g = group_count(
        w.where(F.col("winner").isin(*WINNER_MAP.values())), "winner", alias="count"
    )
    return with_proportion(g, "count").orderBy(F.desc("proportion"))


def termination_proportions(games: DataFrame) -> DataFrame:
    """cell7: group by Termination, proportions, sorted desc."""
    g = group_count(_white_rows(games), "Termination", alias="count")
    return with_proportion(g, "count").orderBy(F.desc("proportion"))


def top_players(games: DataFrame, k: int = 20) -> DataFrame:
    """cell8: games-as-white join games-as-black per player, summed,
    top-k. Inner join drops single-color players (reference
    semantics, SURVEY §2.3 J1)."""
    w = (
        games.where(F.col("Role_player") == "White")
        .groupBy(F.col("Player").alias("player"))
        .agg(F.count("*").alias("count_white"))
    )
    b = (
        games.where(F.col("Role_player") == "Black")
        .groupBy(F.col("Player").alias("player"))
        .agg(F.count("*").alias("count_black"))
    )
    joined = w.join(b, "player", "inner").withColumn(
        "n_games", F.col("count_white") + F.col("count_black")
    )
    return top_k(joined, k, F.desc("n_games"), F.asc("player"))


def games_per_day(games: DataFrame) -> DataFrame:
    """cell10: daily game counts over DateTime."""
    return group_count(
        _white_rows(games).withColumn("day", F.to_date("DateTime")), "day", alias="count"
    ).orderBy("day")


def high_elo_openings(games: DataFrame, min_elo: int = 2000) -> DataFrame:
    """cell11: both players above min_elo -> opening counts."""
    w = _white_rows(games).where(
        (F.col("PlayerElo") > min_elo) & (F.col("OpponentElo") > min_elo)
    )
    return group_count(w, "Opening", alias="count").orderBy(
        F.desc("count"), F.asc("Opening")
    )


def top_openings(games: DataFrame, k: int = 20) -> DataFrame:
    """cell12: top-k openings by count (reference used sort+tail; we
    use orderBy desc + limit, SURVEY §2.6 O4)."""
    g = group_count(_white_rows(games), "Opening", alias="count")
    return top_k(g, k, F.desc("count"), F.asc("Opening"))
