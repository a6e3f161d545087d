"""Structured Streaming variants of the reference's stateful ingest
(SURVEY.md §2.9).

The reference hand-rolls a micro-batched stream: line-by-line PGN
consumption (T1), keyed running state in ``d_cum_games`` (T2), state
persisted across runs as .json.zst (T3), 1M-game flush (T4). The
idiomatic Spark translations:

- T1 -> ``readStream`` file source over staged text/parquet; each
  arriving file is a micro-batch (Trigger.AvailableNow for backfill).
- T2 -> ``transformWithStateInPandas``/``applyInPandasWithState``
  keyed by (Event, Player) — ``running_features_stateful`` below; the
  batch twin (operators.windows) recomputes the same features with
  window functions and is the preferred path for the static dataset.
- T3 -> the checkpoint/state store (``checkpointLocation``); no
  hand-rolled snapshot files.
- T4 -> ``maxRecordsPerFile`` on the sink + trigger policy.
- T7 (parity-plus, absent in reference) -> ``withWatermark`` +
  tumbling/session windows; demonstrated on the events fixture.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:
    import pandas as pd


def read_events_stream(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """T1: file-source stream; one staged file per micro-batch."""
    return spark.readStream.schema(schema).parquet(path)


def hourly_tumbling(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T7: watermarked tumbling-window aggregation — the streaming twin
    of catalog query events_hourly_tumbling (same expressions after
    readStream; late rows beyond the watermark are dropped)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "n", "value_sum")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """T7: session windows with watermark (streaming twin of
    events_session_windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("cum_events", IntegerType()),
        StructField("value_max", StringType()),
    ]
)


def running_features_stateful(events: DataFrame, gap_timeout: str = "30 minutes") -> DataFrame:
    """T2: keyed running count via applyInPandasWithState — the
    incremental twin of the W1/W2 window features (d_cum_games,
    ingester.py:172-218). State per user: (count so far, max so far).

    Batch recompute (operators.windows) is preferred for the static
    corpus; this exists for the continuous-ingest mode where new
    months arrive and reprocessing history is undesirable.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("cum_events", IntegerType()),
        ]
    )
    state_schema = StructType([StructField("n", IntegerType())])

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (n,) = state.get() if state.exists else (0,)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            idx = range(n + 1, n + len(pdf) + 1)
            n += len(pdf)
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "event_id": pdf["event_id"],
                    "cum_events": list(idx),
                }
            )
        state.update((n,))

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
