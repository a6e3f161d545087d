"""Distributed global rank (SURVEY.md §2.6 O1 at scale).

``ROW_NUMBER() OVER (ORDER BY ...)`` with no partition funnels the
whole table through ONE task (Spark warns "Moving all data to a single
partition") — the reference's global sort (ingester.py:404) is fine on
one box, fatal at 100 TB. ``global_rank`` computes the same ranks
distributed:

1. ``repartitionByRange(n, keys).sortWithinPartitions(keys)`` — the one
   full shuffle; partition i holds a contiguous, sorted key range.
2. JVM-side local positions from ``monotonically_increasing_id()``:
   the expression assigns ``(partition_id << 33) + row_offset`` in
   iteration order, and iteration order here IS the sorted order
   because the id is computed *above* the local sort (nondeterministic
   expressions are never reordered across a sort by Catalyst). This is
   the safe use of the primitive — position within an explicitly
   sorted partition — unlike using it to reconstruct input file order.
3. Per-partition row counts (tiny: one row per partition) get a
   running-sum offset via a window over #partitions rows, broadcast
   back, and ``rank = offset + local_position + 1``.

No data moves through Python, everything stays in whole-stage codegen,
and the only single-partition window runs over #partitions rows.
Determinism requires the key set to be a total order (pass explicit
tiebreakers), same as the single-partition form. The positioned
relation is eagerly localCheckpoint-ed before the offsets branch (r9):
without it the two branches re-execute the sampled range exchange
independently, and disagreeing boundary samples yield ranks with gaps
and duplicates — see the inline comment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

_LOCAL_BITS = 33  # monotonically_increasing_id: partition id << 33 | row offset


def global_rank(
    df: DataFrame,
    *keys: Column | str,
    rank_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global dense row number ordered by ``keys``.

    Equivalent to ``ROW_NUMBER() OVER (ORDER BY keys)`` but distributed
    across ``num_partitions`` (default: session parallelism) tasks.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    out_cols = list(df.columns)

    sorted_df = df.repartitionByRange(n, *keys).sortWithinPartitions(*keys)
    base = sorted_df.withColumn("__gr_mid", F.monotonically_increasing_id())
    base = base.withColumn(
        "__gr_pid", F.shiftright("__gr_mid", _LOCAL_BITS)
    ).withColumn(
        "__gr_local", F.col("__gr_mid") - F.expr(f"shiftleft(__gr_pid, {_LOCAL_BITS})")
    )
    # MATERIALIZE the positioned relation before branching (r9): the
    # offsets branch and the main branch below otherwise each
    # re-execute the range exchange, and Spark never ReusedExchanges
    # across nondeterministic projections — so the per-partition
    # counts can come from DIFFERENT sampled range boundaries than
    # the local positions they offset, yielding ranks with gaps and
    # duplicates. The failure is a race (identical inputs usually
    # re-sample identical boundaries, which is why small fixtures
    # always passed), observed once at sf0.1 under host load as
    # scrambled 162-231-row shards in the WebDataset export. The
    # eager localCheckpoint guarantees ONE execution feeds both
    # branches — the same persist-the-shared-relation rule
    # sample_token_budget's prefix sum follows (ROADMAP r6 lesson);
    # rank is a prefix sum, it was never exempt.
    base = base.localCheckpoint(eager=True)

    counts = base.groupBy("__gr_pid").agg(F.count("*").alias("__gr_n"))
    w = (
        Window.orderBy("__gr_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__gr_pid",
        F.coalesce(F.sum("__gr_n").over(w), F.lit(0)).alias("__gr_offset"),
    )

    ranked = base.join(F.broadcast(offsets), "__gr_pid").withColumn(
        rank_col, (F.col("__gr_offset") + F.col("__gr_local") + 1)
    )
    return ranked.select(*out_cols, rank_col)
