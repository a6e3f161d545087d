#!/usr/bin/env python
"""Ingest throughput benchmark: synthesize N games of PGN, stage to
chunk files, run parse -> clean -> unpivot -> window features ->
partitioned parquet, report games/sec.

Not driver-run (bench.py is the per-round metric); this measures the
E1 pipeline against the reference's single-node ingest, which is a
serial Python loop (~10^3-10^4 games/s class).

    python bench_ingest.py --games 100000 --chunks 16
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

ECOS = ["C00", "D04", "B12", "A00", "C20", "B00"]
OPENINGS = [
    "French Defense: Normal Variation",
    "Queen's Pawn Game: Colle System",
    "Caro-Kann Defense",
    "Hungarian Opening",
    "King's Pawn Game",
    "Owen Defense",
]
TERMS = ["Normal", "Time forfeit", "Abandoned"]
RESULTS = ["1-0", "0-1", "1/2-1/2"]


def synth_pgn(n_games: int, out_dir: str, chunks: int) -> None:
    """Deterministic synthetic PGN in the reference's header shape."""
    os.makedirs(out_dir, exist_ok=True)
    per = n_games // chunks + 1
    gid = 0
    for c in range(chunks):
        with open(os.path.join(out_dir, f"chunk_{c:05d}.pgn"), "w") as fh:
            for _ in range(min(per, n_games - gid)):
                w = f"player{(gid * 2654435761) % 5000:04d}"
                b = f"player{(gid * 40503 + 7) % 5000:04d}"
                res = RESULTS[gid % 3]
                day = 1 + (gid // 86400) % 27
                sec = gid % 86400
                fh.write(
                    f'[Event "Rated Blitz game"]\n'
                    f'[Site "https://lichess.org/g{gid:08d}"]\n'
                    f'[White "{w}"]\n[Black "{b}"]\n'
                    f'[Result "{res}"]\n'
                    f'[UTCDate "2024.01.{day:02d}"]\n'
                    f'[UTCTime "{sec // 3600:02d}:{(sec // 60) % 60:02d}:{sec % 60:02d}"]\n'
                    f'[WhiteElo "{600 + (gid * 97) % 2400}"]\n'
                    f'[BlackElo "{"?" if gid % 100 == 0 else 600 + (gid * 89) % 2400}"]\n'
                    f'[WhiteRatingDiff "+{gid % 30}"]\n'
                    f'[BlackRatingDiff "-{gid % 30}"]\n'
                    f'[ECO "{ECOS[gid % len(ECOS)]}"]\n'
                    f'[Opening "{OPENINGS[gid % len(OPENINGS)]}"]\n'
                    f'[TimeControl "600+8"]\n'
                    f'[Termination "{TERMS[gid % len(TERMS)]}"]\n'
                    f"\n1. e4 e6 2. d4 d5 3. Nc3 Nf6 {res}\n\n"
                )
                gid += 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=100_000)
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument(
        "--compression",
        default="gzip",
        choices=["gzip", "zstd", "snappy", "none"],
        help="parquet codec; gzip = reference parity, zstd = fast path",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lichess_db_spark.io import write_parquet
    from lichess_db_spark.plans.games import games_pipeline
    from lichess_db_spark.session import get_spark
    from lichess_db_spark.sources.pgn import parse_pgn_text

    staging = tempfile.mkdtemp(prefix="pgn_bench_")
    out = tempfile.mkdtemp(prefix="games_bench_")
    try:
        t0 = time.perf_counter()
        synth_pgn(args.games, staging, args.chunks)
        t_synth = time.perf_counter() - t0

        spark = get_spark("ingest-bench")
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.perf_counter()
        raw = parse_pgn_text(spark, f"{staging}/*.pgn").drop("game_id")
        df = games_pipeline(raw)
        write_parquet(
            df.withColumn("year", F.year("DateTime")).withColumn("month", F.month("DateTime")),
            out,
            partition_by=["year", "month"],
            compression=args.compression,
        )
        t_ingest = time.perf_counter() - t0
        n_rows = spark.read.parquet(out).count()
        print(
            json.dumps(
                {
                    "metric": "ingest games/sec (parse+features+write)",
                    "value": round(args.games / t_ingest, 1),
                    "unit": "games/sec",
                    "games": args.games,
                    "rows_out": n_rows,
                    "ingest_sec": round(t_ingest, 2),
                    "synth_sec": round(t_synth, 2),
                    "compression": args.compression,
                }
            )
        )
        spark.stop()
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
