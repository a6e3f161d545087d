"""Scaling-evidence bench for the text-dedup family.

The per-round bench (bench.py) measures wall-clock at ONE size
(sf0.1); this tool measures how that wall-clock GROWS. It builds
replica-scaled corpora — N copies of sf0.1 documents, every replica's
tokens salted with a replica prefix so cross-replica duplication is
ZERO and the corpus-wide duplication RATE stays constant while volume
grows N-fold (naive unsalted replication would instead make every
gram a duplicate, a worst-case stress, not a scaling measurement) —
and times the dedup operators at each factor.

The quantity that matters for the 100 TB claim is the fitted scaling
exponent alpha in t ~ volume^alpha between successive factors: the
designs claim (near-)linear shuffle volume, so alpha should sit near
1.0 (sub-linear at small sizes while fixed per-job overhead still
dominates). Super-linear growth would falsify the "survives 100x"
story before any cluster does.

Usage: python tools/bench_scale.py [--factors 1,8,64] [--samples 2]
Writes BENCH_SCALE.json at the repo root (one JSON document).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKDIR = "/tmp/scale_bench"
OFFSET = 10_000_000


def scaled_docs(spark, base_dir: str, factor: int, path: str):
    """N salted replicas of sf documents -> parquet at ``path``."""
    from pyspark.sql import functions as F

    from lichess_db_spark.io import load_table

    base = load_table(spark, base_dir, "documents").select("doc_id", "text")
    parts = []
    for i in range(factor):
        tag = F.lit(f"r{i}_")
        parts.append(
            base.select(
                (F.col("doc_id") + (i * OFFSET)).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split("text", " "), lambda t: F.concat(tag, t)
                    ),
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.write.mode("overwrite").parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,8,64")
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--json", default="BENCH_SCALE.json")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    # same tuned session as bench.py (1MB parquet splits keep all
    # cores busy on the single-file local fixtures; AQE on) so the
    # absolute numbers are comparable to the per-round bench artifact
    from lichess_db_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("bench-scale")
    spark.sparkContext.setLogLevel("ERROR")

    from lichess_db_spark.operators import dedup as dd

    ops = {
        "exact_dedup_groups": lambda d: dd.exact_dedup_groups(d),
        "minhash_dedup_pairs": lambda d: dd.minhash_dedup_pairs(d, threshold=0.5),
        "exact_substring_dedup": lambda d: dd.exact_substring_dedup(d, k=10),
        "exact_substring_clean": lambda d: dd.exact_substring_clean(d, k=10),
    }

    report: dict = {
        "note": (
            "replica-scaled sf0.1 documents (per-replica token salt -> "
            "constant duplication rate, zero cross-replica dups); "
            "median of kept samples per cell; alpha = fitted scaling "
            "exponent log(t_hi/t_lo)/log(f_hi/f_lo) between the two "
            "largest factors (1.0 = linear)"
        ),
        "factors": factors,
        "samples": args.samples,
        "cells": {},
        "alpha": {},
    }

    sizes = {}
    for f in factors:
        path = f"{WORKDIR}/x{f}/documents.parquet"
        scaled_docs(spark, args.sf, f, path)
        n = spark.read.parquet(path).count()
        sizes[f] = n
    report["rows"] = {str(f): sizes[f] for f in factors}

    for name, fn in ops.items():
        report["cells"][name] = {}
        # one untimed warmup at the smallest factor: first execution
        # pays whole-stage codegen compilation + Python/Arrow worker
        # startup, which would otherwise land in the x1 cell and
        # flatten the fitted exponent
        warm = spark.read.parquet(f"{WORKDIR}/x{factors[0]}/documents.parquet")
        fn(warm).write.mode("overwrite").format("noop").save()
        for f in factors:
            docs = spark.read.parquet(f"{WORKDIR}/x{f}/documents.parquet")
            ts = []
            for _ in range(args.samples):
                spark.catalog.clearCache()
                t0 = time.time()
                # noop sink (same execution mode as bench.py): full
                # materialization — count() would let Catalyst
                # ELIMINATE the final left join (aggregate right side
                # is unique on the key and contributes no columns),
                # silently benching a truncated plan
                fn(docs).write.mode("overwrite").format("noop").save()
                ts.append(round(time.time() - t0, 3))
            ts.sort()
            report["cells"][name][str(f)] = {
                "median_s": ts[len(ts) // 2],
                "samples": ts,
            }
            print(f"{name} x{f}: {ts}", flush=True)
        lo, hi = factors[-2], factors[-1]
        t_lo = report["cells"][name][str(lo)]["median_s"]
        t_hi = report["cells"][name][str(hi)]["median_s"]
        report["alpha"][name] = round(
            math.log(t_hi / t_lo) / math.log(hi / lo), 3
        )

    with open(args.json, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({k: report["alpha"][k] for k in ops}))
    shutil.rmtree(WORKDIR, ignore_errors=True)


if __name__ == "__main__":
    main()
