"""Batch MERGE / upsert onto a parquet snapshot directory.

The engine's tables are immutable parquet directories (reference
parity: the lichess corpus is append-only month files,
``/root/reference/ingester.py:237-254``), but a pipeline that
maintains a dimension, a feature store, or a curated-corpus snapshot
needs row-level UPSERT/DELETE semantics. Without a transactional
table format (Delta/Iceberg jars are absent from this container —
ROADMAP #6), the Spark-idiomatic shape is snapshot rewrite:

    merged = updates UNION (target LEFT ANTI updates ON key)
             [MINUS delete keys]

written to a fresh directory and atomically swapped into place with
the same checked-rename discipline as the posting-archive compaction
(``operators/dedup.compact_postings``): write ``__new``, rename live
aside to ``__old``, rename ``__new`` live, drop ``__old``. A crash
between the two renames leaves ``__old`` intact and
``restore_interrupted_merge`` (called by every merge and by
``read_snapshot``) renames it back on the next touch.

Scale notes (100 TB target):
- The rewrite cost is O(target) per merge — the honest price of
  upsert without a log-structured format; amortize with partitioned
  targets (merge only the partitions the updates touch) or adopt
  Delta/Iceberg when available. The JOIN cost is one shuffle on the
  key, or map-side only when the updates side broadcasts
  (``broadcast_updates=True`` pins it; AQE picks it automatically for
  measured-small updates).
- Stats are computed from the SAME anti/semi joins the merge plan
  uses (no extra full-table scans beyond the two key joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import path_exists


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    return fs, hpath


def restore_interrupted_merge(spark: SparkSession, target_dir: str) -> None:
    """Self-heal the one crash window of the snapshot swap: live dir
    missing but its ``__old`` rename-aside present -> rename it back."""
    old = target_dir.rstrip("/") + "__old"
    if path_exists(spark, target_dir) or not path_exists(spark, old):
        return
    fs, hpath = _fs(spark, target_dir)
    if not fs.rename(hpath(old), hpath(target_dir)):
        raise IOError(f"could not restore interrupted merge: {old} -> {target_dir}")


def read_snapshot(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read the current snapshot, healing an interrupted swap first."""
    restore_interrupted_merge(spark, target_dir)
    return spark.read.parquet(target_dir)


def merge_upsert(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    keys: list[str] | str,
    deletes: DataFrame | None = None,
    broadcast_updates: bool = False,
    compute_stats: bool = True,
) -> dict:
    """MERGE ``updates`` (and optional ``deletes`` key rows) into the
    parquet snapshot at ``target_dir``.

    Semantics (one MERGE statement's worth):
    - matched on ``keys``      -> row replaced by the updates row
    - not matched              -> updates row inserted
    - key present in ``deletes`` -> row removed (applies to target
      rows; a key in both updates and deletes is an error)

    Returns ``{"inserted": n, "updated": n, "deleted": n,
    "total": n}`` (counts -1 when ``compute_stats=False``).
    First merge (no target yet) inserts everything.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    for k in keys:
        if k not in updates.columns:
            raise ValueError(f"key column {k!r} missing from updates")
    restore_interrupted_merge(spark, target_dir)

    # MERGE semantics: at most one updates row per key (multiple
    # matches for one target row is an error, as in ANSI MERGE)
    dup = (
        updates.groupBy(*keys).agg(F.count("*").alias("c")).where(F.col("c") > 1)
    )
    if dup.limit(1).count() > 0:
        raise ValueError("updates contain duplicate keys")

    if deletes is not None:
        clash = updates.join(deletes.select(*keys), keys, "left_semi")
        if clash.limit(1).count() > 0:
            raise ValueError("a key appears in both updates and deletes")

    stats = {"inserted": -1, "updated": -1, "deleted": -1, "total": -1}
    if not path_exists(spark, target_dir):
        merged = updates
        if compute_stats:
            stats["inserted"] = updates.count()
            stats["updated"] = 0
            stats["deleted"] = 0
    else:
        target = spark.read.parquet(target_dir)
        if set(target.columns) != set(updates.columns):
            raise ValueError(
                f"schema mismatch: target {sorted(target.columns)} vs "
                f"updates {sorted(updates.columns)}"
            )
        upd_keys = updates.select(*keys)
        if broadcast_updates:
            upd_keys = F.broadcast(upd_keys)
        survivors = target.join(upd_keys, keys, "left_anti")
        if deletes is not None:
            del_keys = deletes.select(*keys)
            if broadcast_updates:
                del_keys = F.broadcast(del_keys)
            survivors = survivors.join(del_keys, keys, "left_anti")
        merged = updates.unionByName(survivors.select(*updates.columns))
        if compute_stats:
            n_upd = updates.count()
            n_matched = (
                updates.select(*keys).join(target.select(*keys), keys, "left_semi").count()
            )
            n_del = (
                0
                if deletes is None
                else target.join(deletes.select(*keys), keys, "left_semi").count()
            )
            stats["updated"] = n_matched
            stats["inserted"] = n_upd - n_matched
            stats["deleted"] = n_del

    new_dir = target_dir.rstrip("/") + "__new"
    old_dir = target_dir.rstrip("/") + "__old"
    merged.write.mode("overwrite").parquet(new_dir)

    fs, hpath = _fs(spark, target_dir)
    if path_exists(spark, target_dir):
        if not fs.rename(hpath(target_dir), hpath(old_dir)):
            raise IOError(f"merge_upsert: rename {target_dir} -> {old_dir} failed")
    if not fs.rename(hpath(new_dir), hpath(target_dir)):
        # put the live snapshot back before failing
        fs.rename(hpath(old_dir), hpath(target_dir))
        raise IOError(f"merge_upsert: rename {new_dir} -> {target_dir} failed")
    fs.delete(hpath(old_dir), True)

    if compute_stats:
        stats["total"] = spark.read.parquet(target_dir).count()
    return stats


def _restore_partition_swaps(spark: SparkSession, target_dir: str) -> None:
    """Per-partition self-heal: any ``p=v__old`` rename-aside whose
    live ``p=v`` sibling is missing is renamed back."""
    if not path_exists(spark, target_dir):
        return
    fs, hpath = _fs(spark, target_dir)
    for st in fs.listStatus(hpath(target_dir)):
        name = st.getPath().getName()
        if name.endswith("__old"):
            live = name[: -len("__old")]
            live_path = target_dir.rstrip("/") + "/" + live
            if not path_exists(spark, live_path):
                if not fs.rename(st.getPath(), hpath(live_path)):
                    raise IOError(
                        f"could not restore interrupted partition swap: {name}"
                    )
            else:
                # both live and __old exist: the swap completed but the
                # cleanup delete didn't — finish it
                fs.delete(st.getPath(), True)


def merge_upsert_partitioned(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    keys: list[str] | str,
    partition_col: str,
    deletes: DataFrame | None = None,
    broadcast_updates: bool = False,
) -> dict:
    """MERGE that rewrites ONLY the hive partitions the updates touch —
    the 100 TB shape: a daily delta against a 10k-partition corpus
    rereads and rewrites O(touched partitions), not O(target). The
    target must be laid out as ``partition_col=value`` directories
    (this function writes it that way on first merge).

    Contract: ``partition_col`` must be stable per key (a key never
    moves between partitions) — the same rule every partitioned upsert
    store imposes; a moved key would leave its old row in an untouched
    partition. Deletes must carry the partition column for the same
    reason.

    The swap is atomic PER PARTITION (checked rename-aside, same
    self-heal discipline as ``merge_upsert``); across partitions it is
    eventually consistent — a crash mid-sequence leaves some
    partitions new and some old, and the next merge's
    ``_restore_partition_swaps`` completes the healing.

    Returns ``{"touched_partitions": n, "total_touched_rows": n}``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    for k in (*keys, partition_col):
        if k not in updates.columns:
            raise ValueError(f"column {k!r} missing from updates")
    if deletes is not None and partition_col not in deletes.columns:
        raise ValueError(f"deletes must carry {partition_col!r} for pruning")
    _restore_partition_swaps(spark, target_dir)

    touched_df = updates.select(partition_col)
    if deletes is not None:
        touched_df = touched_df.unionByName(deletes.select(partition_col))
    # bounded by the number of touched partitions (a delta touches few
    # by construction) — the same size-capped collect as the streaming
    # prefix pruning
    touched = [r[0] for r in touched_df.distinct().collect()]

    if not path_exists(spark, target_dir):
        updates.write.partitionBy(partition_col).mode("overwrite").parquet(
            target_dir
        )
        return {
            "touched_partitions": len(touched),
            "total_touched_rows": updates.count(),
        }

    target = spark.read.parquet(target_dir)
    tgt_touched = target.where(F.col(partition_col).isin(touched))
    upd_keys = updates.select(*keys)
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
    survivors = tgt_touched.join(upd_keys, keys, "left_anti")
    if deletes is not None:
        del_keys = deletes.select(*keys)
        if broadcast_updates:
            del_keys = F.broadcast(del_keys)
        survivors = survivors.join(del_keys, keys, "left_anti")
    merged = updates.unionByName(survivors.select(*updates.columns))

    delta_dir = target_dir.rstrip("/") + "__delta"
    merged.write.partitionBy(partition_col).mode("overwrite").parquet(delta_dir)

    fs, hpath = _fs(spark, target_dir)
    n_rows = spark.read.parquet(delta_dir).count()
    for st in fs.listStatus(hpath(delta_dir)):
        name = st.getPath().getName()
        if not name.startswith(f"{partition_col}="):
            continue  # _SUCCESS etc.
        live = target_dir.rstrip("/") + "/" + name
        old = live + "__old"
        if path_exists(spark, live):
            if not fs.rename(hpath(live), hpath(old)):
                raise IOError(f"partition swap: rename {live} -> {old} failed")
        if not fs.rename(st.getPath(), hpath(live)):
            fs.rename(hpath(old), hpath(live))
            raise IOError(f"partition swap: rename {name} into {live} failed")
        if path_exists(spark, old):
            fs.delete(hpath(old), True)
    fs.delete(hpath(delta_dir), True)
    return {"touched_partitions": len(touched), "total_touched_rows": n_rows}
