"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a frame up to the session's default parallelism.

    Compute-bound per-row stages (minhash signatures, simhash votes,
    kNN scoring) inherit the scan's partitioning; a small single-file
    input means one task doing all the work. The round-robin exchange
    both spreads the compute across cores and acts as a projection
    barrier: expressions materialized *before* it are not re-inlined
    into the per-row lambdas downstream (Catalyst's CollapseProject
    would otherwise duplicate, e.g., the shingle build into all 128
    minhash permutation lambdas).

    The exchange is unconditional: deciding from
    ``df.rdd.getNumPartitions()`` would force a throwaway physical
    planning + RDD DAG build per call (a real driver-side cost — PQ's
    plan build measured 21.6 s with it), and would silently drop the
    projection barrier exactly when the input is large enough to make
    the CollapseProject recompute expensive. A round-robin exchange of
    the pre-explode input is cheap relative to the compute-bound stage
    it feeds, on one box or a thousand.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    return df.repartition(target)
