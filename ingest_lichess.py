#!/usr/bin/env python
"""CLI twin of the reference's ingest entry point
(/root/reference/ingest_lichess.py:29-51): same flag surface, Spark
execution underneath.

  python ingest_lichess.py --start 2013 --end 2014 --months 1 2 3 \\
      --parquet-dir ./lichess_parquet --include-moves

Differences from the reference, by design (SURVEY.md §7 phase 4):
- months are staged concurrently (the reference loops serially and
  threads only the NDJSON->parquet conversion);
- `--ndjson-size` maps to parquet ``maxRecordsPerFile`` (the NDJSON
  buffer layer does not exist: parse output flows straight into the
  DataFrame pipeline); ``--dir-ndjson`` is accepted and used as the
  staging directory for decompressed PGN chunks;
- the idempotent skip actually works (reference's check tested a
  filename it never writes, SURVEY §2.1 S9).
"""

from __future__ import annotations

import argparse
import datetime
import logging


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--start", type=int, default=2013)
    parser.add_argument("--end", type=int, default=datetime.date.today().year)
    parser.add_argument("--months", nargs="+", type=int)
    parser.add_argument("--include-moves", action="store_true", default=False)
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--parquet-dir", type=str, default="./lichess_parquet")
    parser.add_argument("--dir-ndjson", type=str, default=None,
                        help="staging dir for decompressed PGN chunks")
    parser.add_argument("--ndjson-size", type=int, default=1_000_000,
                        help="max rows per output parquet file")
    args = parser.parse_args()
    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO)

    from lichess_db_spark.io import write_parquet
    from lichess_db_spark.plans.ingest import build_games_table, stage_months
    from lichess_db_spark.session import get_spark

    from pyspark.sql import functions as F

    months = args.months or list(range(1, 13))
    pairs = [(y, m) for y in range(args.start, args.end + 1) for m in months]
    staging = args.dir_ndjson or f"{args.parquet_dir}_staging"

    stage_months(pairs, staging)
    spark = get_spark("lichess-ingest")
    df = build_games_table(spark, f"{staging}/*/*/*.pgn", args.include_moves)
    write_parquet(
        df.withColumn("year", F.year("DateTime")).withColumn("month", F.month("DateTime")),
        args.parquet_dir,
        max_records_per_file=args.ndjson_size,
        partition_by=["year", "month"],
    )
    spark.stop()


if __name__ == "__main__":
    main()
