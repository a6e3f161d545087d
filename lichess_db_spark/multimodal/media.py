"""Multimodal (image/audio/video) column plumbing.

Media content is modeled as an opaque ``binary`` column plus typed
metadata — the Spark-native shape for multimodal training data. The
transforms are Arrow-batched ``mapInPandas`` pipelines: the batch
shape, schema handling, and partitioning are real and tested; only
the codec itself is stubbed (image/audio libraries are not available
in this container). Swap ``_decode_stub`` for PIL/ffmpeg in a real
deployment — the Spark-side contract is unchanged.

Scale notes: mapInPandas streams Arrow batches, so peak executor
memory is one batch of binaries, not a partition; repartition by a
size-aware key upstream if media blobs are skewed (e.g. bucket by
octet_length ranges) so no single task gets all the 4K videos.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)

HAVE_REAL_CODECS = False  # PIL / soundfile / av are not installed here


def _decode_stub(doc_id: "pd.Series", data: "pd.Series") -> "pd.DataFrame":
    """Deterministic fake decoder.

    A real implementation would be::

        from PIL import Image
        img = Image.open(io.BytesIO(blob)); w, h = img.size

    which is exactly as vectorizable under mapInPandas. The stub
    derives metadata arithmetically from doc_id so results are
    reproducible and oracle-checkable.
    """
    import numpy as np
    import pandas as pd

    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "n_bytes": data.str.len().astype("int64"),
            "width": (64 * (1 + doc_id % 16)).astype("int32"),
            "height": (64 * (1 + (doc_id // 16) % 16)).astype("int32"),
            "format": np.where(doc_id % 2 == 0, "png", "jpeg"),
        }
    )


def decode_images(df: DataFrame, id_col: str = "doc_id", data_col: str = "data") -> DataFrame:
    """binary column -> decoded metadata via Arrow-batched mapInPandas."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = _decode_stub(pdf[id_col], pdf[data_col])
            yield out

    return df.mapInPandas(run, schema=DECODE_SCHEMA)


def frame_sample_stub(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling plumbing: explode a (stubbed) frame index
    array per blob; a real decoder would emit one binary per frame."""
    return df.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    )


def resize_stub(*_args, **_kwargs):
    raise NotImplementedError(
        "image resize requires PIL/opencv (absent in this container); "
        "the mapInPandas contract matches decode_images"
    )


def read_media_dir(
    spark, path: str, glob: str = "*", recursive: bool = False
) -> DataFrame:
    """Directory of media blobs -> (doc_id, data, path, length) via the
    built-in ``binaryFile`` source — the ingestion edge for image/audio
    dirs. Filename stem digits become doc_id (typical dataset layout:
    ``000042.jpg``); non-numeric stems fall back to a stable hash.

    binaryFile gives partition pruning on ``pathGlobFilter`` and a
    per-file row with modificationTime/length — at 100 TB prefer many
    medium files over few huge ones (a file is one task's row).
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
    )
    stem = F.regexp_extract(F.element_at(F.split("path", "/"), -1), r"(\d+)", 1)
    return raw.select(
        F.when(stem != "", stem.cast("long"))
        .otherwise(F.pmod(F.xxhash64("path"), F.lit(2**62)))
        .alias("doc_id"),
        F.col("content").alias("data"),
        "path",
        "length",
    )


def spread_by_size(df: DataFrame, data_col: str = "data", target_partition_bytes: int = 128 << 20) -> DataFrame:
    """Size-aware repartition for skewed blob columns: range-partition
    on cumulative-ish size buckets so one task doesn't get all the 4K
    videos. Approximation: hash-partition with a partition count sized
    by total bytes / target (a real cluster would use a custom
    partitioner over a prefix-sum; for DataFrames, count x mean size
    is the available statistic without an extra pass)."""
    stats = df.select(
        F.count("*").alias("n"), F.avg(F.octet_length(F.col(data_col))).alias("mean_b")
    ).first()
    if not stats.n:
        return df
    total = int(stats.n * (stats.mean_b or 0))
    parts = max(1, min(10000, total // target_partition_bytes + 1))
    return df.repartition(int(parts))
