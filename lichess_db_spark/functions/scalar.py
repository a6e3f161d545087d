"""Scalar column helpers (SURVEY.md §2.8 F1-F14).

All JVM-side ``pyspark.sql.functions`` compositions — no Python UDFs.
The reference's lone Python callable (``map_elements(d_rev_result.get)``,
ingester.py:377) is deliberately re-expressed as a ``when`` chain (F9)
so the whole plan stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F8: result -> winner recode (eda.ipynb:cell6). Unmatched -> NULL.
WINNER_MAP = {"0-1": "black", "1-0": "white", "1/2-1/2": "draw"}

# F9: result inversion for the Black-perspective row (ingester.py:373-377).
RESULT_INVERSION = {"1-0": "0-1", "0-1": "1-0"}


def question_to_null(col: Column | str) -> Column:
    """P6: ``"?"`` -> NULL normalization (ingester.py:334)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c != "?", c)


def recode(col: Column | str, mapping: dict[str, str], default: Column | None = None) -> Column:
    """F8/F9: dict recode as a native ``when`` chain (no Python UDF).

    ``default=None`` -> unmatched becomes NULL (polars map_dict
    semantics); pass ``default=F.col(c)`` for identity-otherwise
    (polars ``map_elements(d.get)`` with dict.get fallback used at
    ingester.py:377 keeps the original when missing).
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for k, v in mapping.items():
        cond = c == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    assert expr is not None, "empty mapping"
    return expr.otherwise(default) if default is not None else expr


def invert_result(col: Column | str) -> Column:
    """F9: swap 1-0 <-> 0-1, identity otherwise (ingester.py:373)."""
    c = F.col(col) if isinstance(col, str) else col
    return recode(c, RESULT_INVERSION, default=c)


def strip_plus(col: Column | str) -> Column:
    """F2: remove '+' from rating-diff strings pre-cast (ingester.py:337)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"\+", "")


def elo_smallint(col: Column | str) -> Column:
    """F2+F10+P6: '?'->NULL, '+'-strip, cast to smallint (ingester.py:334-337)."""
    return strip_plus(question_to_null(col)).cast("smallint")


def site_to_id(col: Column | str) -> Column:
    """F3: derive game ID from the Site URL (ingester.py:339).

    ``substring_index(c, '/', -1)`` keeps everything after the last
    slash — equivalent to stripping the literal lichess prefix but
    robust to any host.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, "/", -1)


def concat_datetime(date_col: Column | str, time_col: Column | str) -> Column:
    """F5+F4: ``UTCDate + " " + UTCTime`` -> timestamp (ingester.py:227,338)."""
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    t = F.col(time_col) if isinstance(time_col, str) else time_col
    return F.to_timestamp(F.concat_ws(" ", d, t), "yyyy.MM.dd HH:mm:ss")


def strip_tournament_suffix(col: Column | str) -> Column:
    """F7: event name ``split("tournament")[0].strip()`` (ingester.py:149)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.element_at(F.split(c, "tournament"), 1))


def truncate_moves(col: Column | str, at_move: int = 4) -> Column:
    """F7: keep only the first ``at_move - 1`` moves by splitting at
    the literal move number (ingester.py:156-158 splits at "4.")."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, rf"{at_move}\."), 1)


def elo_bin(col: Column | str, lo: int = 0, hi: int = 4000, width: int = 200) -> Column:
    """F11: polars ``.cut(range(0,4001,200))`` interval labels
    (ingester.py:406): ``"(1800, 2000]"`` with open outer bins.

    Implemented as pure column arithmetic (codegen-friendly); the
    bin index is ``ceil(x/width)-1`` on the closed-open-right
    convention polars uses (right-closed)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    # right-closed bins: value v in (lo + k*width, lo + (k+1)*width]
    k = F.ceil((c - F.lit(lo)) / F.lit(width)) - 1
    left = (F.lit(lo) + k * width).cast("int")
    right = (left + width).cast("int")
    label = F.concat(F.lit("("), left.cast("string"), F.lit(", "), right.cast("string"), F.lit("]"))
    below = F.concat(F.lit("(-inf, "), F.lit(lo).cast("string"), F.lit("]"))
    above = F.concat(F.lit("("), F.lit(hi).cast("string"), F.lit(", inf]"))
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(c <= lo, below)
        .when(c > hi, above)
        .otherwise(label)
    )


def stable_unit_hash(col: Column | str, modulus: int = 2**32, mult: int = 2654435761) -> Column:
    """W5 replacement: deterministic per-key U[0,1) tag.

    The reference draws an unseeded ``random()`` on a player's first
    appearance and reuses it forever (ingester.py:180-196) — not
    reproducible. A Knuth multiplicative hash of the key is stable,
    uniform enough for sampling, and needs no window/state at all.
    For string keys use ``xxhash64`` upstream to get an int first.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("bigint") * F.lit(mult) % F.lit(modulus)) / F.lit(float(modulus))


def stable_unit_hash_str(col: Column | str) -> Column:
    """W5 for string keys: xxhash64 -> [0,1). Spark-side only (the
    DuckDB oracle can't reproduce xxhash64), used by the domain
    pipeline; the oracle-checked variant uses integer keys."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.pmod(F.xxhash64(c), F.lit(2**32)) / F.lit(float(2**32)))
