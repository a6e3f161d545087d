"""merge_upsert: row-level MERGE onto immutable parquet snapshots
(update/insert/delete, crash-safe swap, broadcastable key joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lichess_db_spark.io import load_table
from lichess_db_spark.operators.merge import (
    merge_upsert,
    read_snapshot,
    restore_interrupted_merge,
)

from .conftest import SF_SMALL


@pytest.fixture()
def target(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents").where(F.col("doc_id") < 100)
    d = str(tmp_path / "snap")
    stats = merge_upsert(spark, d, docs, "doc_id")
    assert stats == {
        "inserted": 100,
        "updated": 0,
        "deleted": 0,
        "total": 100,
    }
    return d


def test_merge_update_insert_delete(spark, target, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    updates = (
        docs.where(F.col("doc_id").isin(3, 7, 250))
        .withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
    )
    deletes = spark.range(1).select(F.lit(11).alias("doc_id"))
    stats = merge_upsert(spark, target, updates, "doc_id", deletes=deletes)
    assert stats == {"inserted": 1, "updated": 2, "deleted": 1, "total": 100}

    snap = read_snapshot(spark, target)
    assert snap.count() == 100
    assert snap.where(F.col("doc_id") == 11).count() == 0
    assert (
        snap.where(F.col("doc_id").isin(3, 7, 250))
        .where(F.col("text").endswith(" v2"))
        .count()
        == 3
    )
    # untouched rows identical to the original
    orig = docs.where(F.col("doc_id") == 42).select("text").first()[0]
    assert snap.where(F.col("doc_id") == 42).select("text").first()[0] == orig

    # re-merging the same updates is idempotent on content
    stats2 = merge_upsert(spark, target, updates, "doc_id", deletes=deletes)
    assert stats2["total"] == 100
    assert stats2["inserted"] == 0 and stats2["updated"] == 3


def test_merge_guards(spark, target):
    docs = load_table(spark, SF_SMALL, "documents")
    dup = docs.where(F.col("doc_id") == 5).unionByName(
        docs.where(F.col("doc_id") == 5)
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(spark, target, dup, "doc_id")
    upd = docs.where(F.col("doc_id") == 5)
    with pytest.raises(ValueError, match="both updates and deletes"):
        merge_upsert(
            spark, target, upd, "doc_id", deletes=upd.select("doc_id")
        )
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(spark, target, upd.drop("lang"), "doc_id")
    with pytest.raises(ValueError, match="missing from updates"):
        merge_upsert(spark, target, upd, "nope")


def test_merge_interrupted_swap_self_heals(spark, target):
    """Simulate the crash window: live dir renamed aside to __old but
    the __new rename never happened. The next reader restores it."""
    from lichess_db_spark.operators.merge import _fs

    fs, hpath = _fs(spark, target)
    assert fs.rename(hpath(target), hpath(target + "__old"))
    # reader self-heals
    snap = read_snapshot(spark, target)
    assert snap.count() == 100
    # and a merge over the healed snapshot works
    docs = load_table(spark, SF_SMALL, "documents")
    stats = merge_upsert(
        spark, target, docs.where(F.col("doc_id") == 499), "doc_id"
    )
    assert stats["inserted"] == 1 and stats["total"] == 101


def test_merge_broadcast_updates_plan(spark, target):
    """broadcast_updates pins the anti-join build side to the (small)
    updates key set: the survivors plan must contain a broadcast
    LeftAnti join and no sort-merge join."""
    docs = load_table(spark, SF_SMALL, "documents")
    tgt = spark.read.parquet(target)
    upd_keys = F.broadcast(docs.where(F.col("doc_id") < 5).select("doc_id"))
    survivors = tgt.join(upd_keys, "doc_id", "left_anti")
    plan = survivors._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_merge_matches_dict_model(spark, tmp_path, seed):
    """Model-based check: a random sequence of merges (updates +
    deletes over a small key space) applied via merge_upsert must
    leave the snapshot equal to a plain Python dict model applying
    the same ops."""
    import random

    rng = random.Random(seed)
    d = str(tmp_path / f"snap{seed}")
    model: dict[int, str] = {}

    def df_of(rows):
        return spark.createDataFrame(rows, "k int, v string")

    for step in range(4):
        upd_keys = rng.sample(range(30), rng.randint(1, 8))
        upd = [(k, f"v{step}-{k}") for k in upd_keys]
        del_keys = [
            k for k in rng.sample(range(30), rng.randint(0, 4))
            if k not in upd_keys
        ]
        deletes = df_of([(k, "") for k in del_keys]).select("k") if del_keys else None
        merge_upsert(
            spark, d, df_of(upd), "k", deletes=deletes, compute_stats=False
        )
        for k, v in upd:
            model[k] = v
        for k in del_keys:
            model.pop(k, None)

    got = {r["k"]: r["v"] for r in spark.read.parquet(d).collect()}
    assert got == model


def test_snapshot_schema_evolution_merge_schema(spark, tmp_path):
    """Schema evolution on an immutable-snapshot table: a v2 append
    that adds a column reads back under mergeSchema with NULL backfill
    for v1 files — the parquet-native evolution path our snapshot
    tables rely on (no table format required)."""
    d = str(tmp_path / "evo")
    docs = load_table(spark, SF_SMALL, "documents")
    docs.where(F.col("doc_id") < 50).write.mode("append").parquet(d)
    (
        docs.where((F.col("doc_id") >= 50) & (F.col("doc_id") < 80))
        .withColumn("quality", F.lit(0.5))
        .write.mode("append")
        .parquet(d)
    )
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert "quality" in merged.columns
    assert merged.count() == 80
    assert merged.where(F.col("quality").isNull()).count() == 50
    assert merged.where(F.col("quality") == 0.5).count() == 30
    # without mergeSchema the footer-sampled schema may miss the new
    # column — the option is the contract, not a default behavior


def test_merge_partitioned_touches_only_updated_partitions(spark, tmp_path):
    """merge_upsert_partitioned rewrites only the hive partitions the
    delta touches: result equals a full merge, untouched partition
    files are bit-identical (same paths, same sizes, same mtimes),
    and the touched-partition read is partition-pruned."""
    from lichess_db_spark.operators.merge import merge_upsert_partitioned

    docs = load_table(spark, SF_SMALL, "documents")
    d = str(tmp_path / "psnap")
    stats = merge_upsert_partitioned(spark, d, docs, "doc_id", "source")
    n_parts = docs.select("source").distinct().count()
    assert stats["touched_partitions"] == n_parts

    import glob as g
    import os

    def file_state(part):
        files = sorted(g.glob(f"{d}/source={part}/*.parquet"))
        return [(f, os.path.getsize(f), os.path.getmtime(f)) for f in files]

    # pick one partition to touch and one to leave alone
    touched_src = docs.select("source").first()[0]
    others = [
        r[0]
        for r in docs.select("source").distinct().collect()
        if r[0] != touched_src
    ]
    before_untouched = {p: file_state(p) for p in others}

    upd = (
        docs.where(F.col("source") == touched_src)
        .limit(3)
        .withColumn("text", F.lit("rewritten"))
    )
    new_row = (
        docs.limit(1)
        .select(
            F.lit(900000).alias("doc_id"),
            F.lit("brand new").alias("text"),
            F.col("lang"),
            F.lit(touched_src).alias("source"),
            F.lit(9).alias("n_chars"),
        )
    )
    upd = upd.unionByName(new_row.select(*upd.columns))
    stats2 = merge_upsert_partitioned(spark, d, upd, "doc_id", "source")
    assert stats2["touched_partitions"] == 1

    snap = spark.read.parquet(d)
    assert snap.count() == docs.count() + 1
    assert snap.where(F.col("text") == "rewritten").count() == 3
    assert snap.where(F.col("doc_id") == 900000).count() == 1
    # untouched partitions: identical files, never rewritten
    assert {p: file_state(p) for p in others} == before_untouched

    # the target-side read for the merge is partition-pruned
    pruned = spark.read.parquet(d).where(F.col("source").isin([touched_src]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # deletes must carry the partition column
    with pytest.raises(ValueError, match="must carry"):
        merge_upsert_partitioned(
            spark, d, upd, "doc_id", "source",
            deletes=upd.select("doc_id"),
        )


def test_merge_partitioned_interrupted_swap_heals(spark, tmp_path):
    """A crash between a partition's rename-aside and its rename-in is
    healed by the next merge; a completed swap whose __old cleanup was
    lost is also reclaimed."""
    from lichess_db_spark.operators.merge import (
        _fs,
        _restore_partition_swaps,
        merge_upsert_partitioned,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    d = str(tmp_path / "psnap2")
    merge_upsert_partitioned(spark, d, docs, "doc_id", "source")
    src = docs.select("source").first()[0]
    fs, hpath = _fs(spark, d)
    live = f"{d}/source={src}"
    # case 1: live renamed aside, new never arrived
    assert fs.rename(hpath(live), hpath(live + "__old"))
    _restore_partition_swaps(spark, d)
    assert spark.read.parquet(d).count() == docs.count()
    # case 2: stale __old next to a live dir -> cleanup
    fs.mkdirs(hpath(live + "__old"))
    _restore_partition_swaps(spark, d)
    import os

    assert not os.path.exists(live + "__old")
