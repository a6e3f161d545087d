"""Catalog-wide output-schema lint: no array/map/struct FINAL columns.

The grading driver canonicalizes every oracle-paired entry's Spark
result through pandas (``sort_values`` across all output columns →
``factorize``), which throws ``TypeError: unhashable type: 'list'`` on
any cell holding a list/dict — a hard driver ERROR, not a hash
mismatch. ``embedding_matryoshka_truncate`` shipped a raw
ArrayType(Double) column in r10 and became the first red driver row in
ten rounds (VERDICT r10, item 1). The repo's portability contract
("array cells do not hash portably through pandas",
plans/catalog_scale.py incremental_topk note) existed only as prose;
this test makes it executable across every registered entry.

Rows-only entries (no oracle) are exempt from the driver's canon — the
driver records only a row count for them, proven by
``approx_quantiles_value`` carrying its ``quantiles`` array through
green driver rows in r1/r2/r6 — but each such entry must be explicitly
allowlisted below so a new array output is a conscious decision, not
an accident.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from lichess_db_spark.plans import QUERIES

from .conftest import SF_SMALL

# Rows-only entries whose final schema intentionally carries a nested
# column. Allowed ONLY because the driver never canonicalizes entries
# absent from oracle_sql() (rows-count check only). Keep this list
# short and justified.
_ROWS_ONLY_NESTED_OK = {
    # GK sketch quantiles: array<double> of the 4 requested probs; the
    # accuracy contract is pinned by the rank-error bracket test.
    "approx_quantiles_value",
}

_ALL = sorted(QUERIES)


def _nested_fields(schema: StructType) -> list[str]:
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


@pytest.mark.parametrize("name", _ALL)
def test_no_nested_final_output(spark, name):
    q = QUERIES[name]
    nested = _nested_fields(q.build(spark, SF_SMALL).schema)
    if q.oracle is not None:
        assert not nested, (
            f"{name}: oracle-paired entry returns nested column(s) {nested} — "
            "the driver's pandas canonicalization crashes on array/map cells "
            "(the r10 embedding_matryoshka_truncate failure); posexplode or "
            "array_join to scalar columns before returning"
        )
    else:
        assert not nested or name in _ROWS_ONLY_NESTED_OK, (
            f"{name}: rows-only entry returns nested column(s) {nested} — "
            "if intentional, add it to _ROWS_ONLY_NESTED_OK with a "
            "justification; the driver tolerates it today only because "
            "rows-only entries skip canonicalization"
        )


def test_driver_sim_norm_cell_raises_on_nested():
    """The sim must never be more permissive than the driver it mimics.

    tools/driver_sim._norm_cell used to stringify list cells, which is
    exactly how the r10 red row shipped 3-tier 'green'.
    """
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import importlib

    ds = importlib.import_module("driver_sim")
    for bad in ([1, 2], {"a": 1}, (1,)):
        with pytest.raises(TypeError):
            ds._norm_cell(bad)
    # scalars still normalize
    assert ds._norm_cell(None) == "NULL"
    assert ds._norm_cell(1.5) == "1.5"
    assert ds._norm_cell("x") == "x"


def test_oracle_position_caps_cover_fixture_texts():
    """The r11 oracles (cdc_chunk_dedup, repetition_topgram_docs)
    enumerate char/token positions through a constant range cap with
    the `WHERE g.i <= len(...)` pattern (DuckDB range() takes no
    lateral args). The Spark side is unbounded, so a regenerated
    fixture with longer texts would silently diverge FROM THE ORACLE
    ONLY — make the cap an executable claim at every committed SF
    tier."""
    import duckdb

    con = duckdb.connect()
    for sf in ("0.001", "0.01", "0.1"):
        mx, mxtok = con.execute(
            f"SELECT MAX(len(text)), MAX(len(string_split(text, ' '))) "
            f"FROM read_parquet('/root/testdata/sf{sf}/documents.parquet')"
        ).fetchone()
        assert mx < 2000, (sf, mx)     # cdc cap: range(8, 2001)
        assert mxtok < 2000, (sf, mxtok)  # gram cap: range(1, 2001)
    con.close()
