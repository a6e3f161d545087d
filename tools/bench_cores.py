"""Core-count scaling cell for the heavy catalog entries (VERDICT r14
item 7, standing).

BENCH_r14's 8-vs-32-core block showed that at sf0.1 essentially
nothing parallelizes — per-job scheduling + 32-way shuffle overhead
dominates 600 KB inputs, so the graded bench cannot evidence the
100 TB parallelism claims. This cell re-asks the question AT A SIZE
WHERE WORK DOMINATES: replica-scaled inputs (the bench_scale.py
builders — constant duplication rate, join-consistent fact growth),
each heavy entry timed in a FRESH process at local[8] and local[32],
reporting the t8/t32 ratio. A ratio near 4 is perfect scaling; ≥2 is
the VERDICT bar; ~1 names a serial term to fix.

Per-entry factors are sized so one sample is tens of seconds at 32
cores (knn_mutual's all-pairs verifier is quadratic in replicas, so
it gets a smaller factor by design — the point is work >> overhead,
not a fixed volume).

Usage: python tools/bench_cores.py [--samples 2] [--json BENCH_SCALE_R15.json]
Internal: --measure <cpus> runs the timing half in a fresh process
(SPARK_GRAFT_CPUS is read by session.get_spark).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKDIR = "/tmp/scale_r15"
SF = "/root/testdata/sf0.1"

# entry -> (input kind, replica factor)
ENTRIES = {
    "suffix_repeat_tiers": ("docs", 8),
    "blocking_recall_eval": ("docs", 8),
    "knn_mutual_pairs": ("emb", 4),
    "kcore_copurchase": ("tpch", 16),
    "recursive_cte_reachability": ("tpch", 16),
}


def _dirs() -> dict[str, str]:
    return {
        "docs": os.path.join(WORKDIR, "docs_x8"),
        "emb": os.path.join(WORKDIR, "emb_x4"),
        "tpch": os.path.join(WORKDIR, "tpch_x16"),
    }


def build_inputs() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_scale import scaled_docs, scaled_embeddings, scaled_tpch

    from lichess_db_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("bench-cores-build")
    spark.sparkContext.setLogLevel("ERROR")
    d = _dirs()
    os.makedirs(d["docs"], exist_ok=True)
    os.makedirs(d["emb"], exist_ok=True)
    scaled_docs(spark, SF, 8, os.path.join(d["docs"], "documents.parquet"))
    scaled_embeddings(spark, SF, 4, os.path.join(d["emb"], "embeddings.parquet"))
    scaled_tpch(spark, SF, 16, d["tpch"])
    spark.stop()


def measure(cpus: int, samples: int) -> None:
    os.environ["SPARK_GRAFT_CACHE_SCANS"] = "1"
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from lichess_db_spark.plans import QUERIES
    from lichess_db_spark.session import get_spark

    spark = get_spark("bench-cores-measure")
    spark.sparkContext.setLogLevel("ERROR")
    d = _dirs()
    out: dict[str, dict] = {}
    for name, (kind, factor) in ENTRIES.items():
        q = QUERIES[name]
        sf_dir = d[kind]

        def run() -> float:
            t0 = time.perf_counter()
            q.build(spark, sf_dir).write.mode("overwrite").format("noop").save()
            return round(time.perf_counter() - t0, 2)

        run()  # warm-up (codegen, Arrow workers, footers)
        runs = sorted(run() for _ in range(samples))
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        out[name] = {
            "factor": factor,
            "median_s": runs[len(runs) // 2],
            "samples": runs,
        }
        print(f"# local[{cpus}] {name} x{factor}: {runs}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--json", default="BENCH_SCALE_R15.json")
    ap.add_argument("--measure", type=int, default=None)
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    if args.measure is not None:
        measure(args.measure, args.samples)
        return

    if not args.skip_build:
        build_inputs()

    results: dict[str, dict] = {}
    for cpus in (32, 8):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure", str(cpus),
             "--samples", str(args.samples)],
            env=env, capture_output=True, text=True, check=True,
        )
        sys.stderr.write(proc.stderr)
        results[str(cpus)] = json.loads(proc.stdout.strip().splitlines()[-1])

    cells = {}
    for name in ENTRIES:
        t32 = results["32"][name]["median_s"]
        t8 = results["8"][name]["median_s"]
        cells[name] = {
            "factor": ENTRIES[name][1],
            "t32_s": t32,
            "t8_s": t8,
            "ratio_8_over_32": round(t8 / t32, 2),
            "samples_32": results["32"][name]["samples"],
            "samples_8": results["8"][name]["samples"],
        }
    doc = {
        "note": (
            "r15 (VERDICT r14 item 7): 8-vs-32-core ratios for the top-5 "
            "heavy entries at replica-scaled volumes where work dominates "
            "the local job-overhead floor (the sf0.1 bench itself is "
            "overhead-bound and cannot show parallel scaling). Fresh "
            "process per core count, warm-up + median of samples, noop "
            "sink. Perfect scaling would be 4.0; the VERDICT bar is >= 2; "
            "~1 names a serial term."
        ),
        "sf_base": SF,
        "cells": cells,
    }
    with open(args.json, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({n: c["ratio_8_over_32"] for n, c in cells.items()}))


if __name__ == "__main__":
    main()
