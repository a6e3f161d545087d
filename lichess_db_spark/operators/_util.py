"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(
    df: DataFrame,
    min_partitions: int | None = None,
    barrier_only: bool = False,
) -> DataFrame:
    """Repartition a frame up to the session's default parallelism.

    Compute-bound per-row stages (minhash signatures, simhash votes,
    kNN scoring) inherit the scan's partitioning; a small single-file
    input means one task doing all the work. The round-robin exchange
    both spreads the compute across cores and acts as a projection
    barrier: expressions materialized *before* it are not re-inlined
    into the per-row lambdas downstream (Catalyst's CollapseProject
    would otherwise duplicate, e.g., the shingle build into all 128
    minhash permutation lambdas), and predicates are not pushed below
    it (a filter on a derived column would otherwise re-evaluate the
    whole derivation pre-exchange).

    The exchange is unconditional: deciding from
    ``df.rdd.getNumPartitions()`` would force a throwaway physical
    planning + RDD DAG build per call (a real driver-side cost — PQ's
    plan build measured 21.6 s with it), and would silently drop the
    projection barrier exactly when the input is large enough to make
    the CollapseProject recompute expensive. A round-robin exchange of
    the pre-explode input is cheap relative to the compute-bound stage
    it feeds, on one box or a thousand.

    ``barrier_only=True`` — for SCAN-DOMINATED inputs, where the scan
    already yields good parallelism and a cluster-wide round-robin
    exchange (serialize + network + shuffle files for every input row)
    would be the dominant cost: keep only the barrier, skip the
    exchange. Implemented as an Arrow-batched identity pass — an
    optimizer-opaque Python eval node that no rule crosses: filters
    don't push below it, projections don't collapse through it, and it
    pipelines with the scan (no stage break, no shuffle IO, in-process
    Arrow round-trip only). Chosen over ``localCheckpoint``, which
    would materialize every partition to executor storage and truncate
    lineage. Trade-off: an opaque node also blocks ReuseExchange, so
    multi-consumer pipelines (minhash's signature + verification
    branches share one shingle exchange) must keep the default.
    """
    if barrier_only:
        return df.mapInArrow(lambda it: it, schema=df.schema)
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    return df.repartition(target)
