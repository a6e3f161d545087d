"""Dump ``explain("formatted")`` for catalog entries to text files.

Optimization-round deliverable (guide §1 / §7.2): the judge checks
plan-shape claims (Exchange counts, join strategies, PushedFilters,
BatchEvalPython nodes) against committed ``plans/r14/<entry>_<tag>.txt``
files, because the judge cannot run Spark.  Plan generation does not
execute jobs — this tool is safe to run alongside other work.

Usage:
    python tools/plan_dump.py --out plans/r14 --tag before entry1 ...
    python tools/plan_dump.py --out plans/r14 --tag before --headline
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument(
        "--headline", action="store_true", help="dump every bench.py HEADLINE entry"
    )
    args = ap.parse_args()

    names = list(args.entries)
    if args.headline:
        import bench

        names = [n for n in bench.HEADLINE if n not in names] + names

    from lichess_db_spark.plans import QUERIES
    from lichess_db_spark.session import get_spark

    spark = get_spark("lichess-db-spark-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        q = QUERIES[name]
        df = q.build(spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"  # noqa: SLF001
        )
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} plan lines)")
    spark.stop()


if __name__ == "__main__":
    main()
