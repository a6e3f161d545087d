"""Aggregated query catalog: importing the category modules populates
the shared registry (registry.QUERIES)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import catalog_core, catalog_formats, catalog_north  # noqa: F401  (registration side effects)
from .registry import QUERIES, QueryDef  # noqa: F401

# The driver's correctness gate checks the first 50 entries of
# ``queries()`` in insertion order. Rounds 1-2 verified the catalog_core
# block (48 hash-green rows); the catalog_north / catalog_formats /
# cube-rollup entries never got a driver row because core's 52
# registrations filled the window first. Surface the not-yet-verified
# group ahead of the already-verified core so every query eventually
# earns a driver row; core keeps its local mirror in
# tests/test_catalog_oracle.py regardless of position.
_PRIORITY_MODULES = ("catalog_north", "catalog_formats")
_PRIORITY_NAMES = ("cube_type_day", "rollup_type_day", "o1_global_rank_scalable")


def _ordered() -> list[QueryDef]:
    def not_yet_verified(q: QueryDef) -> bool:
        mod = q.build.__module__.rsplit(".", 1)[-1]
        return mod in _PRIORITY_MODULES or q.name in _PRIORITY_NAMES

    # sorted() is stable: registration order is preserved within each group.
    return sorted(QUERIES.values(), key=lambda q: 0 if not_yet_verified(q) else 1)


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.build for q in _ordered()}


def oracle_sql_map() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}
