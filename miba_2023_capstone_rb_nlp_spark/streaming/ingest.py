"""Streaming link ingest (SURVEY §7 phase 6 north star).

Pattern: scrapers (or any producer) drop link batches as JSON files
into a directory; Spark tails the directory as an unbounded table,
deduplicates by ``se_link`` under a watermark (bounded state), and
``foreachBatch`` runs the *batch* enrichment pipeline per micro-batch
— one code path for batch and streaming.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from miba_2023_capstone_rb_nlp_spark.sources.schemas import LINKS_SCHEMA

# links schema + event-time column for watermarking
LINK_STREAM_SCHEMA = LINKS_SCHEMA.add("discovered_at", "timestamp")


def read_link_stream(spark: SparkSession, directory: str) -> DataFrame:
    """File-drop source: each JSON file = one batch of scraped links."""
    return spark.readStream.schema(LINK_STREAM_SCHEMA).json(directory)


def dedup_links(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop duplicate links across micro-batches; the watermark bounds
    dedup state (links older than the watermark are forgotten — at
    100 TB/day unbounded dedup state would OOM every executor)."""
    return stream.withWatermark("discovered_at", watermark).dropDuplicates(
        ["se_link"]
    )


def enrich_foreach_batch(
    deduped: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch bridge: run arbitrary batch logic (content fetch →
    clean → write) per micro-batch, with exactly-once bookkeeping via
    the checkpoint."""
    writer = deduped.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def filtered_link_stream(
    stream: DataFrame, min_title_len: int = 20
) -> DataFrame:
    """Streaming projection/filter — identical expressions as batch P1/F3."""
    return stream.filter(F.col("se_link").isNotNull()).filter(
        F.length("se_title") >= min_title_len
    )
