"""Query registry shared by the catalog modules.

Each entry pairs a Spark DataFrame builder with (optionally) an
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.
Determinism contract (driver compares row-count + schema +
order-insensitive value hash, SURVEY.md §5):

- every output column is explicitly aliased, identically in both;
- double-valued aggregates go through exact (decimal or scaled-int)
  accumulation so results are bit-identical regardless of
  accumulation order;
- every top-k / rank has a full tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    build: Builder
    oracle: str | None  # None -> driver does a rows-only check
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        assert name not in QUERIES, f"duplicate query {name}"
        QUERIES[name] = QueryDef(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
