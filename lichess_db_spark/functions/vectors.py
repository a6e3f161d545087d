"""Vector (array<float>) column helpers for similarity search.

Dot products / norms are expressed with ``zip_with`` + ``aggregate``
— whole-stage-codegen array ops, no UDF, no shuffle. Two accumulation
modes:

- ``dot(a, b)``: plain double accumulation (fast path).
- ``dot_exact(a, b)``: each per-element product is rounded to a
  fixed 1e-12 grid and summed as *bigint*. Integer addition is
  associative, so the result is bit-identical across engines,
  partitionings, and summation orders — floating sums are not, and
  the DuckDB oracle would otherwise disagree in the last ulps. The
  quantization error (<= 32e-12 for 64 dims) vanishes under the
  3-decimal score rounding used for ranking.

At 100 TB these run inside codegen on the executors; the only data
movement is whatever join delivers the (query, candidate) pairs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

EXACT_SCALE = 1e12  # 1e-12 resolution; 64 * |x*y| * 1e12 stays far below 2^63


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = _c(a), _c(b)
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def dot_exact(a: Column | str, b: Column | str) -> Column:
    a, b = _c(a), _c(b)
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.round(x.cast("double") * y.cast("double") * F.lit(EXACT_SCALE)).cast(
            "bigint"
        ),
    )
    total = F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, v: acc + v)
    return total.cast("double") / F.lit(EXACT_SCALE)


def norm_exact(a: Column | str) -> Column:
    return F.sqrt(dot_exact(a, a))


def cosine_exact(a: Column | str, b: Column | str) -> Column:
    """Deterministic cosine similarity: exact integer sums + IEEE
    sqrt/divide (both correctly rounded) -> engine-portable."""
    return dot_exact(a, b) / (norm_exact(a) * norm_exact(b))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def dot_exact_arrow(a: Column | str, b: Column | str) -> Column:
    """Arrow-kernel twin of :func:`dot_exact` — BIT-IDENTICAL,
    ~vectorized-numpy fast.

    The interpreted ``zip_with``/``aggregate`` fold costs ~1.5us per
    element-eval; on a pair relation (e.g. semdedup's within-cluster
    join: 250k pairs x 64 dims at sf0.1) that interpreter tax
    dominates the whole operator. This kernel does each Arrow batch
    as one numpy broadcast. Exactness argument: the per-dim term is
    ROUND(x*y * 1e12) where x*y may be NEGATIVE, and Spark's HALF_UP
    round is away-from-zero — computed here as
    ``copysign(floor(abs(v) + 0.5), v)`` on the SAME IEEE double
    product, so every scaled term matches the expression path
    bit-for-bit (the non-negative-only variant of this argument is
    assign_clusters_arrow's, pinned there over every fixture vector;
    the signed variant is pinned by
    tests/test_north_star.py::test_semdedup_arrow_bit_identical over
    every within-cluster pair). The dim-sum accumulates int64
    (order-free); the final division by 1e12 is the same single IEEE
    op as the expression path.

    NULL handling matches the expression twin (ADVICE r8): a NULL
    vector, a length-mismatched pair (``zip_with`` pads the short
    side with NULL) or an inner NULL element (Arrow delivers it as
    NaN) all yield a NULL output row instead of crashing the batch —
    so ``use_arrow=True`` filters exactly the rows ``dot_exact``
    would.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(xs: pd.Series, ys: pd.Series) -> pd.Series:
        xv, yv = list(xs), list(ys)
        n = len(xv)
        # bucket valid pairs by dimension so each group is ONE numpy
        # broadcast (the corpus is fixed-dim in practice: one group,
        # one matmul-shaped kernel — the bucketing loop is O(n)
        # pointer checks, no per-element Python work)
        groups: dict[int, list[int]] = {}
        for i in range(n):
            x, y = xv[i], yv[i]
            if x is None or y is None or len(x) != len(y):
                continue
            groups.setdefault(len(x), []).append(i)
        out = np.full(n, np.nan, dtype=np.float64)  # NaN -> Arrow NULL
        for _d, idxs in groups.items():
            ii = np.asarray(idxs, dtype=np.int64)
            X = np.asarray([xv[i] for i in idxs], dtype=np.float64)
            Y = np.asarray([yv[i] for i in idxs], dtype=np.float64)
            v = X * Y * EXACT_SCALE
            # inner NULL elements arrive as NaN: those rows stay NULL,
            # matching acc + NULL = NULL in the expression fold
            good = ~np.isnan(v).any(axis=1)
            if good.any():
                scaled = np.copysign(
                    np.floor(np.abs(v[good]) + 0.5), v[good]
                ).astype(np.int64)
                out[ii[good]] = scaled.sum(axis=1) / EXACT_SCALE
        return pd.Series(out)

    return _dot(_c(a), _c(b))
