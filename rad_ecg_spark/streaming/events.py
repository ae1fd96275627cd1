"""Structured Streaming analogs of the reference's streaming-shaped
semantics (SURVEY.md §2.9): ordered micro-batch processing, watermarked
windowed aggregation for late data, bounded-lookback dedup.

The reference processes sections from a queue in arrival order with a
bounded history (/root/reference/src/rad_ecg/scripts/peak_detect_v4.py:
1664-1669, 1712-1728). Here the same semantics run as Structured
Streaming over the events table; tests drive them synchronously with a
parquet source + memory sink (processAllAvailable), exactly how a Kafka
source would behave in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(
    stream: DataFrame,
    window: str = "6 hours",
    watermark: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked windowed count+sum per event_type — tumbling by
    default, OVERLAPPING (sliding) when ``slide`` is given; the
    streaming twins of q_time_windows (tumbling + sliding) (same
    numbers when the batch table is replayed through the stream)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("wstart_s"),
            "event_type",
            "n",
            "sum_value_c",
        )
    )


def dedup_within_watermark(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Bounded-lookback duplicate drop — the streaming analog of the
    reference's overlap dedup against the last-20-peaks history
    (peak_detect_v4.py:1710-1731)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drive a streaming query to completion on a bounded source and
    return the materialized result (test/verification harness)."""
    q = (
        stream_df.writeStream.outputMode("complete" if _has_agg(stream_df) else "append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()
