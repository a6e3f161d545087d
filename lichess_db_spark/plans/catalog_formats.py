"""Source/sink format coverage beyond parquet (SURVEY.md §2.1).

The reference's only persistent formats are NDJSON (S3/S4, its row
buffer) and Parquet (S5/S6). These entries exercise the same
write->read->query lifecycle through Spark's CSV and JSON
sources/sinks: a round trip into a scratch dir, read back with an
explicit schema (the reference's S4 pattern, ingester.py:331), then an
aggregate whose oracle runs on the ORIGINAL parquet — so the check
proves the format round trip is value-faithful, not just runnable.

Scale notes: the round-trip writes land in a per-sf scratch dir with
a deterministic name; at real scale these would be
partitioned-directory datasets (year=/month= layout, S5's
maxRecordsPerFile sizing) — the options used here (header, explicit
schema, timestampFormat) are the ones that matter at 100 TB, where
schema inference over text formats means a full extra scan.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.aggregates import decimal_sum
from .registry import register


def _scratch(sf_dir: str, tag: str) -> str:
    key = sf_dir.rstrip("/").split("/")[-1]
    return os.path.join(tempfile.gettempdir(), f"lichess_db_spark_{tag}_{key}")


@register(
    "format_roundtrip_csv",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
    "S3/S4-analogue over CSV: orders -> csv (header, explicit "
    "timestampFormat) -> read back with the parquet schema -> grouped "
    "decimal-exact aggregate. Oracle runs on the original parquet, so a "
    "hash match proves the text round trip preserved every value.",
)
def format_roundtrip_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "csv_orders")
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    (
        orders.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", fmt)
        .csv(path)
    )
    back = (
        spark.read.schema(orders.schema)
        .option("header", "true")
        .option("timestampFormat", fmt)
        .csv(path)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), decimal_sum("o_totalprice", 2, "total")
    )


@register(
    "format_roundtrip_json",
    """
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs
    FROM documents
    """,
    "S3/S4 NDJSON round trip (the reference's actual row-buffer format, "
    "ingester.py:230/331): documents -> json lines -> read back with "
    "explicit schema -> totals. Text columns contain quotes/newlines; a "
    "hash match vs the parquet oracle proves JSON escaping round-trips.",
)
def format_roundtrip_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    path = _scratch(sf_dir, "json_documents")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(docs.schema).json(path)
    return back.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


@register(
    "format_roundtrip_orc",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
               AS total_price
    FROM lineitem GROUP BY l_returnflag
    """,
    "Columnar-format portability: lineitem -> ORC (zlib) -> read back "
    "-> grouped decimal-exact aggregate, oracle on the ORIGINAL "
    "parquet. ORC is the other columnar interchange format a warehouse "
    "migration meets; predicate pushdown and column pruning work the "
    "same as parquet (built-in vectorized reader). spark-avro is not "
    "on this classpath, so the row-format twin stays parquet/CSV/JSON.",
)
def format_roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    path = _scratch(sf_dir, "orc_lineitem")
    li.write.mode("overwrite").option("compression", "zlib").orc(path)
    back = spark.read.schema(li.schema).orc(path)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        decimal_sum("l_extendedprice", 2, "total_price"),
    )


@register(
    "format_roundtrip_xml",
    """
    SELECT n_regionkey,
           COUNT(*) AS n,
           CAST(SUM(LENGTH(n_name)) AS BIGINT) AS name_len_sum
    FROM nation GROUP BY n_regionkey
    """,
    "Hierarchical-format portability via Spark 4's BUILT-IN XML "
    "datasource (spark-xml folded into core in 4.0): nation -> XML "
    "(rowTag records) -> schema'd read-back -> grouped aggregate, "
    "oracle on the ORIGINAL parquet. XML is the interchange format "
    "B2B/legacy feeds still arrive in; the schema'd read avoids "
    "sampling inference drift. Values are value-faithful for the "
    "long/string columns exercised (floats would round-trip through "
    "decimal text — kept out of this entry on purpose).",
)
def format_roundtrip_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    na = load_table(spark, sf_dir, "nation")
    path = _scratch(sf_dir, "xml_nation")
    (
        na.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .save(path)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema(na.schema)
        .load(path)
    )
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n"),
        F.sum(F.length("n_name")).alias("name_len_sum"),
    )
