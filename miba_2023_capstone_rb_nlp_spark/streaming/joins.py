"""Watermarked stream-stream interval join — the remaining §2.10
Structured Streaming operator class (windows.py covers windowed aggs,
ingest.py dedup, stateful.py custom state).

Semantics: left row l matches right row r when the equi-key matches
and r.ts ∈ [l.ts, l.ts + max_lag]. Spark compiles this to a
StreamingSymmetricHashJoin: both sides shuffle on the key, each
side's rows are buffered in keyed state, and the time-interval
condition plus the watermark give the engine an eviction bound —
left state older than watermark+max_lag and right state older than
watermark can never match again and is dropped. That bound is what
makes the join viable on an unbounded feed: state is O(keys ×
rows-per-lag-window), not O(stream length).

Scale notes (100 TB/day): state store partitions must be sized to
the key cardinality (see suite/streaming_live._state_partitions);
max_lag is the knob that trades match completeness against state
size. A skewed key (one user generating millions of events per lag
window) concentrates state in one partition — pre-filter or salt
upstream, the join itself cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    max_lag: str = "2 hours",
    watermark: str = "4 hours",
) -> DataFrame:
    """Inner join of two (possibly streaming) frames on ``key`` with
    ``right.ts`` within [left.ts, left.ts + max_lag]. Both sides are
    watermarked so streaming state is bounded; on batch frames the
    watermark is a no-op and the plan is a plain range-conditioned
    equi-join."""
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}"))
        & (
            F.col(f"r.{ts_col}")
            <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL '{max_lag}'")
        )
    )
    return l.join(r, cond, "inner")
