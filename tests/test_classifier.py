"""Distributed logistic-regression training (operators/classifier.py):
bit-exactness vs the single-machine numpy reference, partitioning
invariance, and the map-only inference twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lichess_db_spark.io import load_table

from .conftest import SF_SMALL


def _training_frame(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    return emb.select(
        "vec_id",
        "embedding",
        (F.col("label") == 0).cast("int").alias("y"),
    )


def _reference_inputs(df):
    rows = df.select("embedding", "y").collect()
    X = [list(r["embedding"]) for r in rows]
    y = [r["y"] for r in rows]
    return X, y


def test_logreg_train_matches_reference_exactly(spark):
    """The distributed trainer's weights are BIT-EQUAL to the numpy
    reference that applies the same per-row scaled-int64 gradient
    rounding and fixed-order in-row dot — not approximately equal:
    int64 gradient sums are order-free, so distribution changes
    nothing."""
    from lichess_db_spark.operators.classifier import (
        logreg_reference,
        logreg_train,
    )

    df = _training_frame(spark)
    w_spark, trace_spark = logreg_train(df, n_iter=3, lr=0.5)
    X, y = _reference_inputs(df)
    w_ref, trace_ref = logreg_reference(X, y, n_iter=3, lr=0.5)
    assert w_spark == w_ref
    assert trace_spark == trace_ref
    # the trainer actually learned something: gradient magnitude fell
    assert trace_spark[-1] < trace_spark[0]


def test_logreg_train_partitioning_invariant(spark):
    """Identical weights under 1, 3, and 17 partitions: per-row
    rounding + order-free int64 sums mean batch and partition
    boundaries cannot perturb a single bit."""
    from lichess_db_spark.operators.classifier import logreg_train

    df = _training_frame(spark)
    w1, _ = logreg_train(df.coalesce(1), n_iter=2, lr=0.5)
    w3, _ = logreg_train(df.repartition(3), n_iter=2, lr=0.5)
    w17, _ = logreg_train(df.repartition(17, "vec_id"), n_iter=2, lr=0.5)
    assert w1 == w3 == w17


def test_logreg_predict_separates(spark):
    """Inference with the trained weights beats the majority-class
    baseline on the training set (sanity: 3 GD steps on a separable-ish
    embedding/label fixture must move accuracy off the floor) and is
    map-only (no exchange in the plan)."""
    from lichess_db_spark.operators.classifier import (
        logreg_predict,
        logreg_train,
    )

    df = _training_frame(spark)
    w, _ = logreg_train(df, n_iter=5, lr=1.0)
    pred = logreg_predict(df, w)
    n = df.count()
    agree = pred.where(F.col("pred") == F.col("y")).count()
    majority = max(
        r["c"] for r in df.groupBy("y").agg(F.count("*").alias("c")).collect()
    )
    assert agree >= majority  # at least as good as predict-all-majority
    plan = pred._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        pred._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan


def test_logreg_l2_and_minibatch_match_reference_exactly(spark):
    """The ridge term (driver-side, bias excluded) and the md5
    mini-batch path are ALSO bit-equal to the reference — and l2
    actually shrinks the weight norm."""
    from lichess_db_spark.operators.classifier import (
        logreg_reference,
        logreg_train,
    )

    df = _training_frame(spark)
    rows = df.select("vec_id", "embedding", "y").collect()
    ids = [r["vec_id"] for r in rows]
    X = [list(r["embedding"]) for r in rows]
    y = [r["y"] for r in rows]

    w_s, t_s = logreg_train(df, n_iter=3, lr=0.5, l2=0.1)
    w_r, t_r = logreg_reference(X, y, n_iter=3, lr=0.5, l2=0.1)
    assert w_s == w_r and t_s == t_r
    w_plain, _ = logreg_train(df, n_iter=3, lr=0.5)
    norm2 = lambda w: sum(x * x for x in w[:-1])  # noqa: E731
    assert norm2(w_s) < norm2(w_plain)

    w_mb, t_mb = logreg_train(df, n_iter=3, lr=0.5, batch_frac=0.6)
    w_mbr, t_mbr = logreg_reference(
        X, y, n_iter=3, lr=0.5, batch_frac=0.6, ids=ids
    )
    assert w_mb == w_mbr and t_mb == t_mbr
    assert w_mb != w_plain  # the subsets actually differ from full-batch
    # mini-batch selection is partitioning-invariant too
    w_mb3, _ = logreg_train(
        df.repartition(3), n_iter=3, lr=0.5, batch_frac=0.6
    )
    assert w_mb3 == w_mb


def test_logreg_validation(spark):
    from lichess_db_spark.operators.classifier import logreg_train

    df = _training_frame(spark)
    with pytest.raises(ValueError, match="positive"):
        logreg_train(df, n_iter=0)
    with pytest.raises(ValueError, match="positive"):
        logreg_train(df, lr=-1.0)
    with pytest.raises(ValueError, match="empty"):
        logreg_train(df.where(F.lit(False)), n_iter=1)


def test_text_quality_gate_separates_and_deterministic(spark):
    """The CCNet-style text-feature gate beats the majority baseline
    (stopword/length features genuinely separate en from the rest on
    the fixture) and two builds produce identical margins."""
    from lichess_db_spark.plans import QUERIES

    out = QUERIES["logreg_text_quality_gate"].build(spark, SF_SMALL)
    rows = out.collect()
    n = len(rows)
    agree = sum(1 for r in rows if r["pred"] == r["y"])
    n_pos = sum(1 for r in rows if r["y"] == 1)
    assert agree >= max(n_pos, n - n_pos)  # never below predict-majority
    # the ONE closed-form GD step (r15: n_iter=1 so the DuckDB oracle
    # replays training exactly) already moves the MARGINS in the right
    # direction even where the 0-threshold decision still ties the
    # majority baseline: mean en margin must exceed mean rest margin
    m_pos = sum(r["margin"] for r in rows if r["y"] == 1) / n_pos
    m_neg = sum(r["margin"] for r in rows if r["y"] == 0) / (n - n_pos)
    assert m_pos > m_neg
    again = {
        r["doc_id"]: r["margin"]
        for r in QUERIES["logreg_text_quality_gate"].build(spark, SF_SMALL).collect()
    }
    assert {r["doc_id"]: r["margin"] for r in rows} == again


def test_logreg_null_label_fails_loud(spark):
    """A NULL label must raise, not train: None becomes NaN in the
    Arrow kernel and NaN.astype(int64) is INT64_MIN — without the
    guard the weights silently absorb ~1e19-magnitude garbage."""
    from pyspark.errors.exceptions.captured import PythonException

    from lichess_db_spark.operators.classifier import logreg_train

    df = _training_frame(spark).withColumn(
        "y", F.when(F.col("vec_id") == 7, F.lit(None)).otherwise(F.col("y"))
    )
    with pytest.raises(PythonException, match="NULL/NaN"):
        logreg_train(df, n_iter=1)
