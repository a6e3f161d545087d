"""The lichess domain pipeline (SURVEY.md §7 phase 3).

raw parsed games (White/Black wide, all strings)
  -> clean      (P6 '?'-null, F2-F5 casts/derives, P9 flags, F14 backfill)
  -> unpivot    (P2+P3+U1 as a single-scan explode of two role structs —
                 the reference scans its NDJSON twice and merge-sorts,
                 ingester.py:345-404; explode halves the IO)
  -> features   (W1-W6 running windows over (Event/Player, DateTime, ID))
  -> bin        (F11 PlayerElo_bin)

Output is the canonical player-game-role table (SURVEY.md §1.3,
reference ingester.py:284,345-369). Scale: the only shuffles are the
two window partitionings (Event,Player) and (Player); everything else
is narrow. At 100 TB, write bucketed by Player so downstream
per-player analytics (cell-8 self-join shape) co-locate for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import (
    concat_datetime,
    elo_bin,
    elo_smallint,
    invert_result,
    question_to_null,
    site_to_id,
    stable_unit_hash_str,
    strip_tournament_suffix,
    truncate_moves,
)

# string header columns that get '?'-null treatment (ingester.py:325-334
# applies it to everything except the int-typed columns)
_Q_NULL_COLS = (
    "Event",
    "Site",
    "White",
    "Black",
    "Result",
    "WhiteTitle",
    "BlackTitle",
    "ECO",
    "Opening",
    "TimeControl",
    "Termination",
)


def clean_games(raw: DataFrame, include_moves: bool = False) -> DataFrame:
    """Header strings -> typed game-level columns (one row per game)."""
    df = raw
    for c in _Q_NULL_COLS:
        if c in df.columns:
            df = df.withColumn(c, question_to_null(c))
    df = (
        df.withColumn("Tournament", F.coalesce(F.col("Event").contains("tournament"), F.lit(False)))
        .withColumn("Event", strip_tournament_suffix("Event"))
        .withColumn("ID", site_to_id("Site"))
        .withColumn("DateTime", concat_datetime("UTCDate", "UTCTime"))
        .withColumn("WhiteElo", elo_smallint("WhiteElo"))
        .withColumn("BlackElo", elo_smallint("BlackElo"))
        .withColumn("WhiteRatingDiff", elo_smallint("WhiteRatingDiff"))
        .withColumn("BlackRatingDiff", elo_smallint("BlackRatingDiff"))
        .withColumn("WhiteTitle_flag", F.col("WhiteTitle").isNotNull())
        .withColumn("BlackTitle_flag", F.col("BlackTitle").isNotNull())
        # W6: per-game random — deterministic replacement for the
        # reference's unseeded random() (drawn twice, second wins,
        # ingester.py:195); keyed on the game ID.
        .withColumn("ID_random", stable_unit_hash_str("ID"))
        # W5: per-player stable tags
        .withColumn("White_random", stable_unit_hash_str("White"))
        .withColumn("Black_random", stable_unit_hash_str("Black"))
    )
    if include_moves and "Moves" in df.columns:
        df = df.withColumn(
            "Evaluation_flag", F.coalesce(F.col("Moves").contains("eval"), F.lit(False))
        ).withColumn("Moves", truncate_moves("Moves"))
    elif "Moves" in df.columns:
        df = df.drop("Moves")
    return df


def _role_struct(role: str, include_moves: bool) -> Column:
    me, opp = ("White", "Black") if role == "White" else ("Black", "White")
    result = F.col("Result") if role == "White" else invert_result("Result")
    fields = [
        F.lit(role).alias("Role_player"),
        F.col(me).alias("Player"),
        F.col(opp).alias("Opponent"),
        F.col(f"{me}Elo").alias("PlayerElo"),
        F.col(f"{opp}Elo").alias("OpponentElo"),
        F.col(f"{me}Title").alias("PlayerTitle"),
        F.col(f"{opp}Title").alias("OpponentTitle"),
        F.col(f"{me}Title_flag").alias("PlayerTitle_flag"),
        F.col(f"{opp}Title_flag").alias("OpponentTitle_flag"),
        F.col(f"{me}RatingDiff").alias("PlayerRatingDiff"),
        F.col(f"{opp}RatingDiff").alias("OpponentRatingDiff"),
        F.col(f"{me}_random").alias("Player_random"),
        F.col(f"{opp}_random").alias("Opponent_random"),
        result.alias("Result"),
    ]
    return F.struct(*fields)


def unpivot_roles(games: DataFrame, include_moves: bool = False) -> DataFrame:
    """P2+P3+U1 as one explode: each game emits a White-perspective and
    a Black-perspective struct; Result is inverted on the Black row via
    a when-chain (F9 de-UDF'd, reference used a Python lambda at
    ingester.py:377). Single scan — the reference reads its NDJSON
    twice and merge-sorts (ingester.py:329-403)."""
    shared = ["ID", "ID_random", "Event", "Tournament", "ECO", "Opening", "TimeControl",
              "Termination", "DateTime"]
    if include_moves:
        shared += ["Moves", "Evaluation_flag"]
    roles = F.explode(
        F.array(_role_struct("White", include_moves), _role_struct("Black", include_moves))
    ).alias("r")
    return games.select(*shared, roles).select(*shared, "r.*")


def add_features(unpivoted: DataFrame) -> DataFrame:
    """W1-W4 running features + F11 bin, then the reference's global
    sort (O1, ingester.py:404) is left to the caller — sorting is a
    query-time concern in Spark (writers can bucket instead).

    Opponent-side features (reference emits both sides per row,
    ingester.py:345-369) are NOT re-windowed: a game's Opponent_* are
    exactly the mirror row's Player_* (test-pinned invariant), so a
    self-join on (ID, opposite role) fetches them — one ID shuffle
    instead of two more window partitionings (4 sort rounds -> 2
    sorts + 1 hash join).
    """
    from ..operators.windows import add_running_features

    df = add_running_features(unpivoted)
    mirror = df.select(
        "ID",
        F.when(F.col("Role_player") == "White", "Black")
        .otherwise("White")
        .alias("Role_player"),
        F.col("Player_cum_games_type").alias("Opponent_cum_games_type"),
        F.col("Player_cum_games_total").alias("Opponent_cum_games_total"),
        F.col("PlayerElo_max").alias("OpponentElo_max"),
        F.col("PlayerElo_max_faced").alias("OpponentElo_max_faced"),
    )
    df = df.join(mirror, ["ID", "Role_player"])
    return df.withColumn("PlayerElo_bin", elo_bin("PlayerElo"))


def games_pipeline(raw: DataFrame, include_moves: bool = False) -> DataFrame:
    """Full phase-3 pipeline: raw parsed games -> canonical table."""
    return add_features(unpivot_roles(clean_games(raw, include_moves), include_moves))
