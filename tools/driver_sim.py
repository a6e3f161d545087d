"""Simulate the grading driver against __spark_entry__.py.

Fresh-process contract check (see .claude/skills/verify/SKILL.md):

1. smoke: ``entry(spark)`` collects >0 rows with a stable schema;
2. correctness: for the first N (default 50) entries of ``queries()``,
   run Spark at the given sf dir and compare to ``oracle_sql()`` run in
   DuckDB over the same parquet tables: row count, sorted column names,
   and an order-insensitive md5 over stringified rows. Entries missing
   from ``oracle_sql()`` get a rows-only check.

Usage: python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--limit 50]
       [--only name1,name2] [--json out.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        if np.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (list, np.ndarray, dict, tuple, set)):
        # The REAL driver's canonicalization does a pandas sort_values
        # across all output columns; factorize on an object column holding
        # lists throws "TypeError: unhashable type: 'list'" — a hard
        # driver ERROR, not a hash mismatch. This simulator used to
        # stringify such cells, which let embedding_matryoshka_truncate
        # ship an ArrayType output that the r10 driver then failed
        # (VERDICT r10). The sim must never be more permissive than the
        # thing it simulates: raise loudly instead.
        raise TypeError(
            f"non-scalar cell {type(v).__name__} in final output — the real "
            "driver's pandas canonicalization cannot hash array/map cells; "
            "posexplode/array_join to scalar columns before returning"
        )
    return str(v)


def _hash_pdf(pdf: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    # timestamps -> us precision strings
    for c in cols:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    rows = sorted(
        "|".join(_norm_cell(v) for v in rec) for rec in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(pdf), cols, h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--json", default=None, help="write per-query results to this path")
    ap.add_argument("--skip-smoke", action="store_true")
    ap.add_argument(
        "--partitions",
        type=int,
        default=8,
        help="shuffle partitions / cores — vary (e.g. 3, 17) to flush "
        "out order-dependent accumulations the fixed driver conf hides",
    )
    ap.add_argument(
        "--arrow-batch",
        type=int,
        default=None,
        help="spark.sql.execution.arrow.maxRecordsPerBatch override — "
        "run Arrow-kernel entries at a tiny batch size (e.g. 16) to "
        "flush out batch-boundary bugs (the gramian chunk-fold class: "
        "a kernel that is only correct when a whole partition fits one "
        "batch hashes differently the moment batches split)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.partitions}]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", str(args.partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    if args.arrow_batch:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(args.arrow_batch)
        )

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    if not args.skip_smoke:
        df1 = E.entry(spark)
        rows = df1.collect()
        df2 = E.entry(spark)
        assert len(rows) > 0, "entry() returned 0 rows"
        assert df1.schema == df2.schema, "entry() schema not stable"
        print(f"smoke: entry() ok ({len(rows)} rows)", flush=True)

    qmap = E.queries()
    omap = E.oracle_sql()
    names = list(qmap)[: args.limit]
    if args.only:
        names = [n for n in args.only.split(",") if n in qmap]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    n_pass = n_rows_only = n_fail = 0
    for name in names:
        t0 = time.time()
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = qmap[name](spark, args.sf)
            spdf = sdf.toPandas()
            if name not in omap:
                # the real driver records only a row count for entries
                # absent from oracle_sql() — it never canonicalizes them
                # (proven: approx_quantiles_value carried its array
                # column through green rows-only driver rows in r1/r2/
                # r6). Match that exactly: counting here, hashing below.
                rec["spark_rows"] = len(spdf)
            else:
                s_rows, s_cols, s_hash = _hash_pdf(spdf)
                rec["spark_rows"] = s_rows
            if name in omap:
                opdf = con.execute(omap[name]).fetchdf()
                o_rows, o_cols, o_hash = _hash_pdf(opdf)
                rec.update(
                    rows_match=s_rows == o_rows,
                    schema_match=s_cols == o_cols,
                    hash_match=s_hash == o_hash,
                    oracle_rows=o_rows,
                )
                ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
                if ok:
                    n_pass += 1
                else:
                    n_fail += 1
                    if not rec["schema_match"]:
                        rec["err"] = f"schema: spark={s_cols} oracle={o_cols}"
                status = "PASS" if ok else "FAIL"
            else:
                rec["err"] = "no_oracle"
                n_rows_only += 1
                status = "rows-only"
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"
            n_fail += 1
            status = "ERR"
            traceback.print_exc()
        results[name] = rec
        print(f"{status:9s} {name:35s} {time.time() - t0:6.2f}s "
              f"rows={rec['spark_rows']} err={rec['err'] if status in ('ERR','FAIL') else ''}",
              flush=True)

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail of {len(names)}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
