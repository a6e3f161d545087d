"""Drifter protocol: isolated re-measurement of suspected bench risers.

The driver host intermittently stalls whole tens of seconds, and those
stalls land on random entries mid-suite (see bench.py's quarantine
notes). Before treating a BENCH_r{N} riser as a regression, re-measure
the entry ALONE: fresh process, one warm-up, median of 5 with the same
noop-sink discipline as bench.py. Run the tool twice (two processes)
so a whole-process stall cannot own the verdict.

Usage: python tools/drifter.py entry1 [entry2 ...] [--sf DIR] [--iters 5]
                                [--partitions N] [--aqe on|off]
Prints one JSON line: {entry: {"median": s, "samples": [...]}, ...,
"_conf": {...}}

--partitions / --aqe (r13, VERDICT r12 item 5): when an entry drifts
in the DRIVER's bench but is flat in isolation twice, the next step is
not another local rerun — it is reproducing at driver-shaped CONFIG
variations (shuffle-partition count, AQE on/off) to either name the
config factor or pin host band with the config space excluded.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--aqe", choices=("on", "off"), default="on")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CACHE_SCANS"] = "1"
    from lichess_db_spark.plans import QUERIES
    from lichess_db_spark.session import get_spark
    from lichess_db_spark.io import TABLES, load_table

    spark = get_spark(
        "lichess-db-spark-drifter", shuffle_partitions=args.partitions
    )
    if args.aqe == "off":
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, args.sf, t).limit(1).collect()
    warm = load_table(spark, args.sf, "region")
    warm.mapInPandas(lambda it: it, schema=warm.schema).collect()

    out: dict[str, dict] = {}
    gc.collect()
    gc.disable()
    try:
        for name in args.entries:
            q = QUERIES[name]

            def run() -> float:
                t0 = time.perf_counter()
                q.build(spark, args.sf).write.mode("overwrite").format("noop").save()
                return time.perf_counter() - t0

            run()  # warm-up, un-timed
            runs = sorted(round(run(), 3) for _ in range(args.iters))
            out[name] = {"median": runs[len(runs) // 2], "samples": runs}
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
    finally:
        gc.enable()
    out["_conf"] = {
        "partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
        "sf": args.sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
