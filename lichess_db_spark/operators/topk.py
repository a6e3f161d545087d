"""Sort / limit / top-k operators (SURVEY.md §2.6 O1-O4).

``orderBy(...).limit(k)`` is the whole story: Spark plans it as
TakeOrderedAndProject — each partition keeps a k-row heap and only k
rows per partition cross the wire, so top-k never global-sorts the
input. Always pass a full tiebreaker so the selected *set* is
deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """O3 (head after sort-desc) and O4 (tail after sort-asc) both
    normalize to this; avoid df.tail (a driver-side collect)."""
    return df.orderBy(*order).limit(k)
