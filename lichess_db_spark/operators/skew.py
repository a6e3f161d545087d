"""Skew-mitigation join helper (SURVEY.md brief: salting for skewed
keys).

AQE's skew-join split handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); explicit
salting remains the tool when one side's hot keys are known and the
other side is small enough to replicate — e.g. joining the games
fact on Player where a few bot accounts hold millions of rows
(reference corpus: german11 with 221k games, eda.ipynb:cell8).

``salted_join`` replicates the small side ``salt`` times and sprays
the big side's rows uniformly across the replicas, so a hot key's
rows land on ``salt`` tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small on key`` with a salted key.

    Result is identical to ``big.join(small, on, how)`` for inner and
    left joins (each big row matches exactly its salt replica).
    """
    assert how in ("inner", "left"), "salting replicates the small side"
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")
