"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a catalog query in Spark and its oracle SQL in DuckDB over the
same parquet fixtures, then compares row-count + (name-sorted)
columns + values. Values are compared exactly for non-floats and to
1e-9 for floats — stricter in spirit than the driver's
order-insensitive value hash, so passing here predicts passing there.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from lichess_db_spark.io import TABLES, table_path


def duck_con(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("bool")
        elif isinstance(s.dtype, pd.ArrowDtype) or str(s.dtype) == "object":
            # dates / decimals / arrow-backed strings -> python objects
            df[c] = s.astype("object")
        vals = df[c]
        if str(vals.dtype) == "object":
            head = vals.dropna().head(1)
            if len(head) and isinstance(head.iloc[0], (list, np.ndarray)):
                # array cells: numpy arrays are unhashable/unsortable in
                # pandas — normalize to the driver's stringified form
                # (floats via repr, exact), matching driver_sim._norm_cell
                def _cell(v):
                    if v is None:
                        return None
                    return "[" + ",".join(
                        "NULL" if x is None or (isinstance(x, float) and np.isnan(x))
                        else (repr(float(x)) if isinstance(x, (float, np.floating))
                              else str(int(x)) if isinstance(x, (int, np.integer))
                              else str(x))
                        for x in v
                    ) + "]"

                df[c] = vals.map(_cell)
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, na_position="first").reset_index(drop=True)
    return df


def compare(spark_df, con: "duckdb.DuckDBPyConnection", sql: str, name: str = "") -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(con.sql(sql).df())
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = g.astype("float64").to_numpy()
            wa = w.astype("float64").to_numpy()
            both_nan = np.isnan(ga) & np.isnan(wa)
            close = np.isclose(ga, wa, rtol=0, atol=1e-9) | both_nan
            assert close.all(), (
                f"{name}.{c}: float mismatch at rows {np.where(~close)[0][:5]} "
                f"spark={ga[~close][:5]} oracle={wa[~close][:5]}"
            )
            exact = (ga == wa) | both_nan
            if not exact.all():
                # surface near-misses: the driver hashes values, so
                # close-but-not-equal would still fail there
                raise AssertionError(
                    f"{name}.{c}: floats within 1e-9 but not bit-equal at rows "
                    f"{np.where(~exact)[0][:5]}: spark={ga[~exact][:5]} oracle={wa[~exact][:5]}"
                )
        else:
            eq = (g == w) | (g.isna() & w.isna())
            assert eq.all(), (
                f"{name}.{c}: value mismatch at rows {np.where(~eq.to_numpy())[0][:5]}: "
                f"spark={g[~eq].head(5).tolist()} oracle={w[~eq].head(5).tolist()}"
            )
