#!/usr/bin/env python
"""Posting-archive lifecycle benchmark (VERDICT r5 item 7): measure
what `compact_postings` buys as the incremental near-dup archive
accumulates batches.

Not driver-run (bench.py is the per-round metric). Feeds the
`documents` table through `incremental_near_dup` in N equal batches,
twice:

- **append-only**: postings accumulate one `batch=<i>` directory per
  batch, retired docs are never reclaimed;
- **compacted**: every ``--compact-every`` batches the archive is
  rewritten by `compact_postings` (retired docs dropped via
  ``live_ids``, small files merged, write-then-swap).

Per batch it records wall-clock of the candidate join and the
archive's file count / byte size / row count, so the artifact carries
the two lifecycle claims as numbers: (a) per-batch cost grows with an
uncompacted archive's file count (each per-batch file set is a scan
task at read time, the small-file problem), and (b) compaction holds
file count and archive rows ~flat under retirement at equal recall
(the candidate sets are identical by construction for surviving docs
— compaction is layout-only, transparency pinned by
tests/test_curation.py's compaction tests).

    python bench_archive.py --batches 20 --compact-every 5 \
        --out BENCH_ARCHIVE.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: interpretation of the r7 120-batch partitioned-digest trickle run,
#: kept with the generator so regenerated artifacts carry it.
_R7_PARTITIONED_NOTE = (
    "r7 partitioned-digest finding (120-batch trickle run): compaction "
    "bounds the DETERMINISTIC costs - full-tree file count 6859 -> 311 "
    "and full-listing time 1.83s -> 0.70s at batch 119 - but per-probe "
    "wall time at local-disk fixture scale is dominated by Spark's "
    "FileStatusCache interplay: append-only never invalidates cached "
    "dir listings (probes stay ~1.1-1.3s flat), while each compaction "
    "rewrite invalidates the cache and the following probes relist the "
    "growing post-compaction tail (isolated fresh-process rerun: probe "
    "resets to ~0.8s right after a compaction, then grows ~0.12s/batch "
    "to ~3.2s). On an object store the cached-listing subsidy does not "
    "exist (listing is per-request RPC) and the file/dir-count bound is "
    "what holds probe cost down; on local disk, compact on the reader "
    "cadence (before unpruned reads / compaction-dependent consumers), "
    "not per-20-batches."
)


def _archive_stats(spark, path: str) -> dict:
    """file count + bytes via the Hadoop FS (what a scan would list)."""
    jvm = spark._jvm  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    if not fs.exists(hpath(path)):
        return {"files": 0, "bytes": 0}
    it = fs.listFiles(hpath(path), True)
    files = 0
    nbytes = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            files += 1
            nbytes += st.getLen()
    return {"files": files, "bytes": int(nbytes)}


def run_config(spark, docs, n_batches: int, compact_every: int | None) -> list[dict]:
    from pyspark.sql import functions as F

    from lichess_db_spark.operators.dedup import (
        compact_postings,
        incremental_near_dup,
    )

    root = tempfile.mkdtemp(prefix="bench_archive_")
    postings = os.path.join(root, "postings")
    # retirement model: docs with doc_id % 5 == 0 are dropped by
    # downstream curation right after their batch arrives
    live = docs.where(F.col("doc_id") % 5 != 0).select("doc_id")
    rows: list[dict] = []
    try:
        for b in range(n_batches):
            batch = docs.where(F.col("doc_id") % n_batches == b)
            t0 = time.perf_counter()
            pairs = incremental_near_dup(batch, postings, batch_id=b)
            n_pairs = pairs.count()
            pairs.unpersist()
            dt = round(time.perf_counter() - t0, 3)
            did_compact = False
            if compact_every and (b + 1) % compact_every == 0:
                compact_postings(spark, postings, live_ids=live)
                did_compact = True
            st = _archive_stats(spark, postings)
            st_rows = spark.read.parquet(postings).count()
            rows.append(
                {
                    "batch": b,
                    "sec": dt,
                    "pairs": n_pairs,
                    "archive_files": st["files"],
                    "archive_bytes": st["bytes"],
                    "archive_rows": st_rows,
                    "compacted": did_compact,
                }
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return rows


def run_digest_state(spark, n_batches: int, compact_every: int | None) -> list[dict]:
    """The digest-state twin of run_config: simulate N micro-batch
    state writes (one ``batch=<i>`` dir of md5 digests each, as
    ``stream_documents_curation`` lays them down), and measure the
    per-batch ANTI-JOIN PROBE a trickle batch pays — read the state,
    anti-join a 200-digest batch — plus the state's file count. The
    claimed cost driver at trickle cadence is file listing (N file
    sets), not digest volume; compaction should hold probe time and
    file count ~flat."""
    import time as _t

    from pyspark.sql import functions as F

    from lichess_db_spark.streaming.ingest import compact_digest_state

    root = tempfile.mkdtemp(prefix="bench_digest_")
    state = os.path.join(root, "_digest_state")
    rows: list[dict] = []
    try:
        for b in range(n_batches):
            batch = spark.range(b * 2000, (b + 1) * 2000).select(
                F.md5(F.col("id").cast("string")).alias("__digest")
            )
            batch.coalesce(8).write.mode("overwrite").parquet(
                os.path.join(state, f"batch={b}")
            )
            probe = spark.range(b * 2000 + 1900, b * 2000 + 2100).select(
                F.md5(F.col("id").cast("string")).alias("__digest")
            )
            t0 = _t.perf_counter()
            n_new = probe.join(
                spark.read.parquet(state).select("__digest"),
                "__digest",
                "left_anti",
            ).count()
            dt = round(_t.perf_counter() - t0, 3)
            did = False
            if compact_every and (b + 1) % compact_every == 0:
                compact_digest_state(spark, state)
                did = True
            st = _archive_stats(spark, state)
            rows.append(
                {
                    "batch": b,
                    "probe_sec": dt,
                    "new_digests": n_new,
                    "state_files": st["files"],
                    "compacted": did,
                }
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return rows


def run_digest_state_partitioned(
    spark, n_batches: int, compact_every: int | None
) -> list[dict]:
    """VERDICT r6 #4: the trickle-cadence scaling run for the
    PREFIX-PARTITIONED digest state (``batch=<i>/p=<xx>/`` hive
    layout, as ``stream_documents_curation(partition_state=True)``
    writes it), pushed past 100 batches.

    Models a trickle stream: 64 digests/batch (so each batch touches
    ~50 of the 256 prefixes), probe = 32 digests pruned to their own
    prefix set before the anti-join — the exact probe shape of
    ``_process``. Two costs are recorded separately:

    - ``probe_sec``: the pruned anti-join (listing only the probe's
      prefixes inside each batch= dir);
    - ``list_sec``: a full recursive listing of the state tree (what
      an UNPRUNED reader — or the compactor — pays), sampled every 10
      batches so the stats collection doesn't dominate the bench.

    With ``compact_every`` on, state older than the in-flight batch
    folds into ``batch=-1/p=<xx>/`` (one file per prefix), so both the
    full-tree file count and the per-prefix file count a probe lists
    stay bounded; append-only they grow linearly with batch count.
    """
    import time as _t

    from pyspark.sql import functions as F

    from lichess_db_spark.streaming.ingest import compact_digest_state

    root = tempfile.mkdtemp(prefix="bench_digest_part_")
    state = os.path.join(root, "_digest_state")
    rows: list[dict] = []
    try:
        for b in range(n_batches):
            batch = spark.range(b * 64, (b + 1) * 64).select(
                F.md5(F.col("id").cast("string")).alias("__digest")
            ).select("__digest", F.substring("__digest", 1, 2).alias("p"))
            batch.coalesce(1).write.partitionBy("p").mode("overwrite").parquet(
                os.path.join(state, f"batch={b}")
            )
            probe = spark.range(b * 64 + 48, b * 64 + 80).select(
                F.md5(F.col("id").cast("string")).alias("__digest")
            )
            prefixes = [
                r[0]
                for r in probe.select(
                    F.substring("__digest", 1, 2).alias("p")
                ).distinct().collect()
            ]
            t0 = _t.perf_counter()
            seen = spark.read.parquet(state).where(F.col("p").isin(prefixes))
            n_new = probe.join(
                seen.select("__digest"), "__digest", "left_anti"
            ).count()
            probe_sec = round(_t.perf_counter() - t0, 3)
            did = False
            if compact_every and (b + 1) % compact_every == 0:
                compact_digest_state(spark, state, exclude_batch=b)
                did = True
            row = {
                "batch": b,
                "probe_sec": probe_sec,
                "new_digests": n_new,
                "compacted": did,
            }
            if (b + 1) % 10 == 0 or b == n_batches - 1:
                # listing cost as Spark pays it: InMemoryFileIndex
                # construction (JVM-side, parallel) + the data-file
                # list in ONE py4j call — not a per-file driver loop.
                t0 = _t.perf_counter()
                row["state_files"] = len(spark.read.parquet(state).inputFiles())
                row["list_sec"] = round(_t.perf_counter() - t0, 3)
            rows.append(row)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--compact-every", type=int, default=5)
    ap.add_argument("--digest-batches", type=int, default=40)
    ap.add_argument("--digest-scale-batches", type=int, default=120)
    ap.add_argument("--digest-scale-compact-every", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from lichess_db_spark.io import load_table
    from lichess_db_spark.session import get_spark

    spark = get_spark("bench-archive")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    docs.limit(1).collect()

    import gc

    gc.collect()
    gc.disable()
    try:
        append_only = run_config(spark, docs, args.batches, None)
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        compacted = run_config(spark, docs, args.batches, args.compact_every)
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        dg_append = run_digest_state(spark, args.digest_batches, None)
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        dg_compact = run_digest_state(
            spark, args.digest_batches, args.compact_every
        )
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        dgp_append = run_digest_state_partitioned(
            spark, args.digest_scale_batches, None
        )
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        dgp_compact = run_digest_state_partitioned(
            spark, args.digest_scale_batches, args.digest_scale_compact_every
        )
    finally:
        gc.enable()

    out = {
        "metric": "incremental near-dup archive lifecycle",
        "note": (
            "file/row counts are deterministic evidence; the *_sec "
            "fields are driver-overhead-dominated at fixture scale "
            "(~2s/batch floor) and flip between runs — the cost the "
            "file counts proxy (one scan task + footer read per file, "
            "listing RPCs at object-store scale) is what compaction "
            "bounds at 100 TB. " + _R7_PARTITIONED_NOTE
        ),
        "sf_dir": SF_DIR,
        "batches": args.batches,
        "compact_every": args.compact_every,
        "append_only": append_only,
        "compacted": compacted,
        "digest_state_append": dg_append,
        "digest_state_compacted": dg_compact,
        "digest_scale_batches": args.digest_scale_batches,
        "digest_scale_compact_every": args.digest_scale_compact_every,
        "digest_partitioned_append": dgp_append,
        "digest_partitioned_compacted": dgp_compact,
        "summary": {
            "final_files_append": append_only[-1]["archive_files"],
            "final_files_compacted": compacted[-1]["archive_files"],
            "final_rows_append": append_only[-1]["archive_rows"],
            "final_rows_compacted": compacted[-1]["archive_rows"],
            "last5_sec_append": round(
                sum(r["sec"] for r in append_only[-5:]), 3
            ),
            "last5_sec_compacted": round(
                sum(r["sec"] for r in compacted[-5:]), 3
            ),
            "digest_final_files_append": dg_append[-1]["state_files"],
            "digest_final_files_compacted": dg_compact[-1]["state_files"],
            "digest_last10_probe_append": round(
                sum(r["probe_sec"] for r in dg_append[-10:]), 3
            ),
            "digest_last10_probe_compacted": round(
                sum(r["probe_sec"] for r in dg_compact[-10:]), 3
            ),
            "dgp_final_files_append": dgp_append[-1].get("state_files"),
            "dgp_final_files_compacted": dgp_compact[-1].get("state_files"),
            "dgp_final_list_sec_append": dgp_append[-1].get("list_sec"),
            "dgp_final_list_sec_compacted": dgp_compact[-1].get("list_sec"),
            "dgp_last10_probe_append": round(
                sum(r["probe_sec"] for r in dgp_append[-10:]), 3
            ),
            "dgp_last10_probe_compacted": round(
                sum(r["probe_sec"] for r in dgp_compact[-10:]), 3
            ),
        },
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    import sys

    sys.exit(main())
