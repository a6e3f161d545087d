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

    On a real cluster with many input splits this is a no-op
    (partitions already >= parallelism).
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
