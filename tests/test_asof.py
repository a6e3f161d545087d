"""asof_join operator: strategy equivalence + scale-design plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from lichess_db_spark.io import load_table
from lichess_db_spark.operators.asof import asof_join

from .conftest import SF_SMALL


def _inputs(spark):
    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, SF_SMALL, "orders")
    daily = o.groupBy("o_custkey", "o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double").alias("day_total")
    )
    return ev, daily


def _collect(df):
    return sorted(
        (r["event_id"], r["user_id"], str(r["o_orderdate"]), r["day_total"])
        for r in df.collect()
    )


def test_union_window_matches_broadcast_pick(spark):
    ev, daily = _inputs(spark)
    kw = dict(
        left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_orderdate",
    )
    a = asof_join(ev, daily, strategy="union_window", **kw)
    b = asof_join(ev, daily, strategy="broadcast_pick", **kw)
    ra, rb = _collect(a), _collect(b)
    assert len(ra) > 0
    assert ra == rb


def test_union_window_inclusive_at_equal_time(spark):
    """An event exactly at the order's timestamp matches that order
    (at-or-before is inclusive: right rows sort before left ties)."""
    left = spark.createDataFrame(
        [(1, 10, "2024-01-05 00:00:00")], "event_id long, user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-05", 99.0), (10, "2024-01-01", 1.0)],
        "o_custkey long, o_orderdate string, day_total double",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    out = asof_join(
        left, right,
        left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_orderdate",
    ).collect()
    assert len(out) == 1
    assert str(out[0]["o_orderdate"]) == "2024-01-05"
    assert out[0]["day_total"] == 99.0


def test_union_window_drops_unmatched_left(spark):
    """Inner semantics: a left row earlier than every right row drops."""
    left = spark.createDataFrame(
        [(1, 10, "2023-01-01 00:00:00"), (2, 10, "2024-06-01 00:00:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-01", 5.0)], "o_custkey long, o_orderdate string, day_total double"
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    out = asof_join(
        left, right,
        left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_orderdate",
    ).collect()
    assert [r["event_id"] for r in out] == [2]


def test_null_payload_not_resurrected(spark):
    """A matched right row whose payload is NULL must carry that NULL —
    not a stale non-null value from an earlier right row (the whole
    right row travels as one struct)."""
    left = spark.createDataFrame(
        [(1, 10, "2024-03-01 00:00:00")], "event_id long, user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-01", 1.0), (10, "2024-02-01", None)],
        "o_custkey long, o_orderdate string, day_total double",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    out = asof_join(
        left, right,
        left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_orderdate",
    ).collect()
    assert len(out) == 1
    assert str(out[0]["o_orderdate"]) == "2024-02-01"
    assert out[0]["day_total"] is None


def test_null_keys_never_match(spark):
    """NULL join keys never match (equi-join semantics) — both
    strategies must agree with DuckDB ASOF, which drops them."""
    left = spark.createDataFrame(
        [(1, None, "2024-03-01 00:00:00"), (2, 10, "2024-03-01 00:00:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(None, "2024-01-01", 7.0), (10, "2024-01-01", 5.0)],
        "o_custkey long, o_orderdate string, day_total double",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    kw = dict(
        left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_orderdate",
    )
    for strategy in ("union_window", "broadcast_pick"):
        out = asof_join(left, right, strategy=strategy, **kw).collect()
        assert [r["event_id"] for r in out] == [2], strategy
        assert out[0]["day_total"] == 5.0, strategy


def test_name_collision_raises(spark):
    """Colliding right-side output names fail fast with a clear error,
    not duplicate columns or an ambiguous-reference AnalysisException."""
    import pytest

    left = spark.createDataFrame(
        [(1, 10, "2024-03-01 00:00:00", 0.0)],
        "event_id long, user_id long, ts string, day_total double",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-01", 5.0)],
        "o_custkey long, o_orderdate string, day_total double",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    with pytest.raises(ValueError, match="day_total"):
        asof_join(
            left, right,
            left_key="user_id", right_key="o_custkey",
            left_time="ts", right_time="o_orderdate",
        )

    # broadcast_pick additionally needs a non-colliding right key (the
    # equi-join condition would be ambiguous); union_window aliases it
    # away and accepts identical names
    right2 = spark.createDataFrame(
        [(10, "2024-01-01", 5.0)],
        "user_id long, o_orderdate string, total double",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    left2 = left.drop("day_total")
    with pytest.raises(ValueError, match="broadcast_pick"):
        asof_join(
            left2, right2,
            left_key="user_id", right_key="user_id",
            left_time="ts", right_time="o_orderdate",
            strategy="broadcast_pick",
        )
    ok = asof_join(
        left2, right2,
        left_key="user_id", right_key="user_id",
        left_time="ts", right_time="o_orderdate",
        strategy="union_window",
    ).collect()
    assert len(ok) == 1 and ok[0]["total"] == 5.0


def test_strategies_agree_on_adversarial_random_data(spark):
    """Seeded random data with every hazard at once — NULL keys, NULL
    payload values, equal-time ties, two payload columns, lefts before
    any right. Both strategies must agree with each other AND with an
    independent imperative reference."""
    import datetime as dt
    import random

    rnd = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    lefts = [
        (
            i,
            rnd.choice([None, 1, 2, 3, 4, 5]),
            base + dt.timedelta(minutes=rnd.randint(0, 120)),
        )
        for i in range(300)
    ]
    rights, seen = [], set()
    for j in range(150):
        key = rnd.choice([None, 1, 2, 3, 5, 6])
        t = rnd.randint(0, 120)
        if (key, t) in seen:
            continue
        seen.add((key, t))
        rights.append(
            (
                key,
                base + dt.timedelta(minutes=t),
                rnd.choice([None, float(j)]),
                rnd.choice([None, f"s{j}"]),
            )
        )
    left = spark.createDataFrame(lefts, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        rights, "o_custkey long, o_time timestamp, pay_num double, pay_str string"
    )
    kw = dict(
        left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_time",
    )
    a = sorted(map(tuple, asof_join(left, right, strategy="union_window", **kw).collect()))
    b = sorted(map(tuple, asof_join(left, right, strategy="broadcast_pick", **kw).collect()))
    assert a == b and len(a) > 0

    # imperative reference (output order = left columns + right cols)
    want = []
    for eid, key, ts in lefts:
        if key is None:
            continue
        cands = [r for r in rights if r[0] == key and r[1] <= ts]
        if not cands:
            continue
        m = max(cands, key=lambda r: r[1])
        want.append((eid, key, ts, m[1], m[2], m[3]))
    assert a == sorted(want)


def test_union_window_plan_has_no_broadcast(spark):
    """The default strategy must survive a fact-sized right side: no
    BroadcastExchange anywhere, exactly one Window node (one shuffle on
    the key), no join at all."""
    ev, daily = _inputs(spark)
    df = asof_join(
        ev, daily,
        left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_orderdate",
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "simple"
    )
    assert "BroadcastExchange" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]
    assert plan.count("Window") == 1, plan
