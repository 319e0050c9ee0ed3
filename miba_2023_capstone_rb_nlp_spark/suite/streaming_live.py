"""Structured Streaming suite entry: the tumbling-window aggregation
executed as an actual stream (file source → watermark → windowed agg
→ memory sink, Trigger.AvailableNow) rather than as batch.

Complete output mode + AvailableNow drains the whole source before
returning, so the result equals the batch plan and shares the SAME
DuckDB oracle as ``events_tumbling_hourly`` — the point is proving
the window/watermark plan runs under the streaming engine unchanged
(streaming/windows.py). On a live cluster the source becomes a
file-drop/Kafka stream and the trigger a processing-time interval;
nothing else changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.streaming.windows import tumbling_counts
from miba_2023_capstone_rb_nlp_spark.suite import register
from miba_2023_capstone_rb_nlp_spark.suite.events import _TUMBLING_ORACLE

_TABLE = "events_tumbling_stream_result"


@register("events_tumbling_streaming", oracle=_TUMBLING_ORACLE)
def q_events_tumbling_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(sf_dir, "events.parquet")
    # schema from a batch probe (ts arrives as long nanos under
    # spark.sql.legacy.parquet.nanosAsLong, converted like catalog.py)
    raw_schema = spark.read.parquet(path).schema
    # FileStreamSource rejects a bare file path ("basePath must be a
    # directory") but accepts a glob that matches it
    stream = (
        spark.readStream.schema(raw_schema)
        .parquet(os.path.join(sf_dir, "events.*"))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    out = tumbling_counts(stream, window="1 hour", watermark="2 hours")
    query = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(_TABLE)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(_TABLE)
