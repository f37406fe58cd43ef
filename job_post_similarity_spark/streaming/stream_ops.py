"""Structured Streaming operators (SURVEY.md §2.11 / §7 stretch).

The reference is strictly batch with file-existence memoization
(app/main.py:110,130,177); these expose the same dedup/aggregation
semantics over an unbounded events source: readStream → transform →
writeStream, watermarks bounding state.

Local smoke path: parquet file-stream + memory sink +
processAllAvailable() drives a bounded run synchronously; the same
plans bind to kafka sources in production. State stores are
per-partition RocksDB at scale — watermark picks the retention.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events stream schema: ts arrives as long nanos (driver parquet is
# TIMESTAMP(NANOS), read via nanosAsLong).
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("path", sf_dir)
        .option("pathGlobFilter", "events.parquet")
        .load()
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_memory(df: DataFrame, name: str, output_mode: str) -> DataFrame:
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.sql(f"SELECT * FROM {name}")


def stream_event_counts(
    spark: SparkSession, sf_dir: str, name: str = "stream_counts"
) -> DataFrame:
    """Streaming group-count per event_type; complete-mode memory sink.
    Bounded input ⇒ result equals the batch groupBy (oracle-able)."""
    counts = (
        _events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return _run_to_memory(counts, name, "complete")


def stream_dedup(
    spark: SparkSession,
    sf_dir: str,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
    name: str = "stream_dedup",
) -> DataFrame:
    """Streaming dedup-within-watermark on (user_id, event_type) —
    the streaming twin of the batch keep-first dedup (D1).

    dropDuplicatesWithinWatermark keeps the FIRST arrival per key and
    expires state past the watermark — bounded memory on an unbounded
    stream. On the bounded test file every duplicate arrives inside
    one watermark, so the kept-key set equals batch DISTINCT keys.
    """
    keys = keys or ["user_id", "event_type"]
    deduped = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )
    return _run_to_memory(deduped, name, "append")


def stream_windowed_agg(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    name: str = "stream_windowed",
) -> DataFrame:
    """Watermarked tumbling-window aggregate over the event stream —
    the late-data-tolerant rollup shape. Complete-mode memory sink for
    the bounded smoke path (append mode would emit a window only after
    the watermark passes it, i.e. nothing on a single bounded batch);
    production kafka sinks run append + finalized windows."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
    return _run_to_memory(agg, name, "complete")
