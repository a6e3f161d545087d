"""Recall-delta diagnosis for the mutual-LSH bucket pre-cap (r13,
VERDICT r12 item 6 — the companion to BENCH_SCALE_R13_MUTUAL_LSH's
timing cells).

Question the cell answers: when a corpus concentrates (a viral vector
owning 20% of rows, so its buckets blow past max_bucket_size in EVERY
table), what does the count-first pre-cap trade? Expected answer,
verified here: the cap drops exactly the flood's candidates (pairs the
exact-dedup tier upstream should have removed anyway) and retains the
organic pairs — recall over NON-viral mutual pairs stays ~1.0.

Usage: python tools/mutual_lsh_recall.py [--factor 8] [--cap 256]
Prints one JSON line with pair counts split by viral membership.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--cap", type=int, default=256)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lichess_db_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("mutual-lsh-recall")
    spark.sparkContext.setLogLevel("ERROR")

    from bench_scale import (  # noqa: E402
        WORKDIR,
        scaled_embeddings,
        viral_embeddings,
    )

    path = f"{WORKDIR}/recall_x{args.factor}/embeddings.parquet"
    scaled_embeddings(spark, args.sf, args.factor, path)
    # the SAME viral construction as the timing cells — shared helper
    # so the recall diagnosis and the skew cells measure one corpus
    viral = viral_embeddings(spark.read.parquet(path))

    from lichess_db_spark.operators.similarity import (
        lsh_self_topk_portable,
        mutual_filter,
    )

    def mutual_pairs(cap):
        edges = lsh_self_topk_portable(
            viral, k=4, max_bucket_size=cap
        ).localCheckpoint(eager=True)
        return {
            (r.query_id, r.neighbor_id)
            for r in mutual_filter(edges)
            .where(F.col("query_id") < F.col("neighbor_id"))
            .collect()
            # bounded collect: mutual pairs <= n*k/2 (~256k at 64x);
            # the diagnosis needs the SET to split by viral membership
        }

    unc = mutual_pairs(None)
    cap = mutual_pairs(args.cap)

    def is_viral(i):
        return i % 5 == 0

    def split(pairs):
        v = sum(1 for a, b in pairs if is_viral(a) and is_viral(b))
        m = sum(1 for a, b in pairs if is_viral(a) != is_viral(b))
        o = len(pairs) - v - m
        return {"viral_viral": v, "mixed": m, "organic": o, "total": len(pairs)}

    su, sc = split(unc), split(cap)
    org_u = {p for p in unc if not (is_viral(p[0]) or is_viral(p[1]))}
    org_c = {p for p in cap if not (is_viral(p[0]) or is_viral(p[1]))}
    out = {
        "factor": args.factor,
        "cap": args.cap,
        "uncapped": su,
        "capped": sc,
        "organic_recall_capped_vs_uncapped": (
            round(len(org_u & org_c) / len(org_u), 4) if org_u else None
        ),
        "organic_pairs_lost": sorted(org_u - org_c)[:20],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
