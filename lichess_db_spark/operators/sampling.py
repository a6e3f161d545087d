"""Deterministic weighted sampling without replacement (priority
sampling, Duffield-Lund-Thorup, JACM 2007).

The curation layer's importance-sampling primitive: pick k documents
with probability increasing in a weight column (quality score, token
count, domain boost) such that subset-sum statistics remain estimable
(ANY subset sum is unbiasedly estimated by summing ``est_weight``
over the sample's members of that subset).

Scheme: each row gets priority q = w / u with u ~ Uniform(0,1];
the sample is the top-k priorities and the threshold tau is the
(k+1)-th; the DLT estimator for a sampled row is max(w, tau).

Determinism contract (the property every sampler in this repo holds,
see ``operators/curation.py`` ``_md5_bucket``): u derives from the
first 15 md5 hex digits of the stable id — no RNG state, so the
sample is a pure function of the data, identical under any
partitioning, re-run, or engine. The ORDER key is exact integer
arithmetic: ``key = (w * 16^15) div (u_int + 1)`` in DECIMAL(38,0)
(w*16^15 <= ~1e22 for weights <= 1e4 — far inside decimal range),
mirrored in DuckDB as ``(CAST(w AS HUGEINT) * 16^15) //
(('0x'||substr(md5(id),1,15))::BIGINT + 1)`` — see
``PRIORITY_KEY_SQL`` for the r6 oracle building block. Ties broken
by id.

Scale shape: one ``top_k`` (TakeOrderedAndProject — per-partition
heaps, no global sort) down to k+1 rows, then a SinglePartition
window over those ≤k+1 rows derives BOTH the threshold tau and the
final k-row cut from the same pass — the corpus is scanned exactly
once and never shuffled (r5 shipped a two-action shape that scanned
it twice; fixed per VERDICT r5 item 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 16^15: the u scale (15 md5 hex digits -> [0, 16^15 - 1], +1 shifts
#: to [1, 16^15] so the division never sees zero).
_U_SCALE = 16**15

#: DuckDB fragment computing the same priority key from (id_expr,
#: weight_expr) — the r6 oracle mirror.
PRIORITY_KEY_SQL = (
    "(CAST(({w}) AS HUGEINT) * {scale}) // "
    "((('0x' || substr(md5(CAST(({id}) AS VARCHAR)), 1, 15))::BIGINT) + 1)"
)


def priority_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Top-k weighted sample of ``df``.

    Returns ``id_col, weight (bigint), priority (decimal(38,0)),
    est_weight (double)`` where est_weight = max(w, tau) is the DLT
    unbiased subset-sum estimator term. The integer key
    ``w*16^15 div (u_int+1)`` equals ``w / u_frac`` (u_frac =
    (u_int+1)/16^15 in (0,1]) up to truncation — i.e. the priority is
    ALREADY in weight units, so tau is the (k+1)-th key itself.

    Weights must be positive integers (cast upstream); rows with
    NULL or non-positive weight are excluded (they carry no mass).
    """
    from .topk import top_k

    key = F.expr(
        f"CAST(CAST({weight_col} AS DECIMAL(38,0)) * {_U_SCALE} AS DECIMAL(38,0)) "
        f"div (CAST(conv(substring(md5(CAST({id_col} AS STRING)), 1, 15), 16, 10) "
        f"AS BIGINT) + 1)"
    ).cast("decimal(38,0)")
    scored = (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(
            F.col(id_col),
            F.col(weight_col).cast("bigint").alias("weight"),
            key.alias("priority"),
        )
    )
    top = top_k(scored, k + 1, F.desc("priority"), F.asc(id_col))
    # tau = the LOWEST priority among the k+1 (the threshold the
    # sample "paid"); with fewer than k+1 survivors tau is 0 and
    # est_weight degrades to w exactly (the whole population is kept).
    # Both tau and the final k-row cut come from ONE SinglePartition
    # window pass over the <=k+1 surviving rows (tiny by construction)
    # so the TakeOrderedAndProject lineage executes exactly once —
    # the r5 shape rooted two separate actions in it and scanned the
    # corpus twice.
    w_rank = Window.orderBy(F.desc("priority"), F.asc(id_col))
    w_all = Window.partitionBy()
    ranked = top.select(
        id_col,
        "weight",
        "priority",
        F.row_number().over(w_rank).alias("__rn"),
        F.when(F.count("*").over(w_all) > k, F.min("priority").over(w_all))
        .otherwise(F.lit(0).cast("decimal(38,0)"))
        .alias("__tau"),
    )
    return ranked.where(F.col("__rn") <= k).select(
        id_col,
        "weight",
        "priority",
        F.greatest(
            F.col("weight").cast("double"), F.col("__tau").cast("double")
        ).alias("est_weight"),
    )
