"""Aggregated query catalog: importing the category modules populates
the shared registry (registry.QUERIES)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import catalog_core, catalog_formats, catalog_north  # noqa: F401  (registration side effects)
from .registry import QUERIES, QueryDef  # noqa: F401


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.build for name, q in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
