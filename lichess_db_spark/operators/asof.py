"""As-of join: match each left row to the latest right row at-or-before
its timestamp, per key. Spark has no native ASOF JOIN (DuckDB does:
reference EDA joins monthly rating snapshots this way); this is the
custom-operator composition SURVEY.md §2 calls for.

Two physical strategies, both pure DataFrame ops:

- ``union_window`` (default, the 100 TB path): tag both sides, union
  them into one stream, and run a single running ``last(ignorenulls)``
  window per key ordered by time. ONE shuffle (hash on key), no join at
  all, and — unlike the equi-join + residual-range form — no
  intermediate blow-up of |left| x (matching right rows per key).
  Right-side rows sort before left rows at equal timestamps so the
  at-or-before match is inclusive.

- ``broadcast_pick``: equi-join on key with the right side broadcast +
  residual range + max_by pick. Only correct to choose when the right
  side is genuinely dimension-sized; exposed for that case, never the
  default, because a right side that grows with the fact table makes
  the broadcast a driver OOM at scale.

The right side must be unique per (key, time) — pre-aggregate to that
grid first (the catalog entry aggregates orders to (custkey, day)), or
ties make the match ambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RESERVED = ("__asof_t", "__asof_side", "__asof_carry")


def _validate_names(
    left: DataFrame, right: DataFrame, *, right_key: str, right_time: str
) -> None:
    """Fail fast with an actionable message instead of letting Spark
    produce duplicate output columns or an opaque ambiguous-reference
    AnalysisException deep in the plan."""
    payload = _payload_cols(right, right_key, right_time)
    clash = sorted({right_time, *payload} & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join: right-side output column(s) {clash} collide with "
            "left columns; rename them (withColumnRenamed) before joining"
        )
    reserved = sorted(
        set(_RESERVED) & (set(left.columns) | set(right.columns))
    )
    if reserved:
        raise ValueError(
            f"asof_join: column name(s) {reserved} are reserved for "
            "internal use; rename them before joining"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    strategy: str = "union_window",
) -> DataFrame:
    """Inner as-of join (backward: latest right at-or-before left time).

    Returns all ``left`` columns plus all non-key ``right`` payload
    columns; left rows with no right row at-or-before their time are
    dropped (inner semantics, matching DuckDB ``ASOF JOIN``). NULL join
    keys never match (equi-join semantics) under either strategy, and
    all carried right columns — including genuine NULL payload values —
    come from the single matched right row.
    """
    _validate_names(left, right, right_key=right_key, right_time=right_time)
    if strategy == "union_window":
        return _asof_union_window(
            left, right, left_key=left_key, right_key=right_key,
            left_time=left_time, right_time=right_time,
        )
    if strategy == "broadcast_pick":
        return _asof_broadcast_pick(
            left, right, left_key=left_key, right_key=right_key,
            left_time=left_time, right_time=right_time,
        )
    raise ValueError(f"unknown asof strategy {strategy!r}")


def _payload_cols(right: DataFrame, right_key: str, right_time: str) -> list[str]:
    return [c for c in right.columns if c not in (right_key, right_time)]


def _asof_union_window(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
) -> DataFrame:
    payload = _payload_cols(right, right_key, right_time)
    t = "__asof_t"
    side = "__asof_side"  # 0 = right, 1 = left: right first at equal times
    carry = "__asof_carry"

    # The whole right row travels as ONE struct and one last(ignorenulls)
    # window carries it: every output column — including a payload value
    # that is genuinely NULL in the matched row — comes from the same
    # right row. Per-column windows would resurrect stale non-null
    # values and could mix columns from different right rows.
    carry_type = T.StructType(
        [right.schema[right_time]] + [right.schema[c] for c in payload]
    )
    # NULL keys never match under equi-join (broadcast_pick, DuckDB
    # ASOF); drop them up front so the window can't pair the two sides'
    # null-key rows with each other.
    lhs = left.where(F.col(left_key).isNotNull()).select(
        F.col(left_key).alias(left_key),
        F.col(left_time).cast("timestamp").alias(t),
        F.lit(1).alias(side),
        *[F.col(c) for c in left.columns if c != left_key],
        F.lit(None).cast(carry_type).alias(carry),
    )
    rhs = right.where(F.col(right_key).isNotNull()).select(
        F.col(right_key).alias(left_key),
        F.col(right_time).cast("timestamp").alias(t),
        F.lit(0).alias(side),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != left_key],
        F.struct(F.col(right_time), *[F.col(c) for c in payload]).alias(carry),
    )
    w = (
        Window.partitionBy(left_key)
        .orderBy(F.col(t).asc(), F.col(side).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lhs.unionByName(rhs)
    filled = unioned.select(
        left_key,
        side,
        *[c for c in left.columns if c != left_key],
        F.last(carry, ignorenulls=True).over(w).alias(carry),
    )
    # original left column order (matches broadcast_pick's output shape)
    return filled.where(
        (F.col(side) == 1) & F.col(carry).isNotNull()
    ).select(
        *left.columns,
        F.col(f"{carry}.{right_time}").alias(right_time),
        *[F.col(f"{carry}.{c}").alias(c) for c in payload],
    )


def _asof_broadcast_pick(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
) -> DataFrame:
    if right_key in left.columns:
        raise ValueError(
            f"asof_join(strategy='broadcast_pick'): right key "
            f"{right_key!r} collides with a left column, making the "
            "join condition ambiguous; rename one side (union_window "
            "handles identical key names)"
        )
    payload = _payload_cols(right, right_key, right_time)
    joined = left.join(
        F.broadcast(right),
        (F.col(left_key) == F.col(right_key))
        & (F.col(left_time).cast("timestamp") >= F.col(right_time).cast("timestamp")),
        "inner",
    )
    # max_by keeps partial aggregation (map-side combine); right side is
    # unique per (key, time) so the struct max is unambiguous.
    pick = F.max_by(
        F.struct(F.col(right_time), *[F.col(c) for c in payload]), F.col(right_time)
    ).alias("__asof_pick")
    grouped = joined.groupBy(*[F.col(c) for c in left.columns]).agg(pick)
    return grouped.select(
        *left.columns,
        F.col(f"__asof_pick.{right_time}").alias(right_time),
        *[F.col(f"__asof_pick.{c}").alias(c) for c in payload],
    )
