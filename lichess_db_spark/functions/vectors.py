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
        # FAST PATH — the hot case (every row valid, fixed dim): one
        # vectorized broadcast over the whole batch, zero per-row
        # Python. This must stay the default shape: the first masked
        # implementation bucketed rows in a Python loop and the emb
        # scaling suite measured the whole SemDeDup family 2-3x slower
        # at 16x for it (r9) — NULL handling may not tax the 99.99%.
        try:
            X = np.asarray(xv, dtype=np.float64)
            Y = np.asarray(yv, dtype=np.float64)
            fast = X.ndim == 2 and Y.ndim == 2 and X.shape == Y.shape
        except (ValueError, TypeError):  # ragged rows / row-level NULLs
            fast = False
        if fast:
            v = X * Y * EXACT_SCALE
            nan_rows = np.isnan(v).any(axis=1)
            has_nan = bool(nan_rows.any())
            if has_nan:
                v = np.nan_to_num(v)
            scaled = np.copysign(np.floor(np.abs(v) + 0.5), v).astype(np.int64)
            out = scaled.sum(axis=1) / EXACT_SCALE
            if has_nan:
                # inner NULLs arrived as NaN: those rows emit NULL,
                # matching acc + NULL = NULL in the expression fold
                out = np.where(nan_rows, np.nan, out)
            return pd.Series(out)
        # SLOW PATH — some row is NULL or ragged: bucket the valid
        # pairs by dimension so each group is still one numpy
        # broadcast; invalid rows emit NULL (NaN -> Arrow NULL)
        n = len(xv)
        groups: dict[int, list[int]] = {}
        for i in range(n):
            x, y = xv[i], yv[i]
            if x is None or y is None or len(x) != len(y):
                continue
            groups.setdefault(len(x), []).append(i)
        out = np.full(n, np.nan, dtype=np.float64)
        for _d, idxs in groups.items():
            ii = np.asarray(idxs, dtype=np.int64)
            X = np.asarray([xv[i] for i in idxs], dtype=np.float64)
            Y = np.asarray([yv[i] for i in idxs], dtype=np.float64)
            v = X * Y * EXACT_SCALE
            good = ~np.isnan(v).any(axis=1)
            if good.any():
                scaled = np.copysign(
                    np.floor(np.abs(v[good]) + 0.5), v[good]
                ).astype(np.int64)
                out[ii[good]] = scaled.sum(axis=1) / EXACT_SCALE
        return pd.Series(out)

    return _dot(_c(a), _c(b))
