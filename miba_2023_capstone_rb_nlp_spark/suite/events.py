"""Event-stream suite (batch semantics of SURVEY §2.10's engine
additions): tumbling / sliding / session windows + JSON extraction
(A5 value_counts shape). The same plans run under Structured
Streaming (see streaming/) — these entries pin the batch semantics
against the oracle.

Oracle note: events.ts is TIMESTAMP(NANOS) in parquet; both engines
truncate to microseconds (catalog.py ↔ CAST(ts AS TIMESTAMP)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark import catalog
from miba_2023_capstone_rb_nlp_spark.functions.numeric import dsum, fixed, sql_dsum
from miba_2023_capstone_rb_nlp_spark.suite import register


def _events(spark, sf_dir):
    return catalog.table(spark, sf_dir, "events")


_TUMBLING_ORACLE = f"""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start, event_type,
       count(*) AS n, {sql_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("events_tumbling_hourly", oracle=_TUMBLING_ORACLE)
def q_events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window — F.window so the identical plan runs under
    Structured Streaming with a watermark."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
    )


_SLIDING_ORACLE = f"""
WITH cand AS (
  SELECT value,
         unnest([time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
                 time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                   - INTERVAL '30 minutes']) AS w_start
  FROM events
)
SELECT w_start, count(*) AS n, {sql_dsum('value')} AS sum_value
FROM cand GROUP BY w_start
"""


@register("events_sliding_hourly", oracle=_SLIDING_ORACLE)
def q_events_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m window: every event lands in exactly two
    windows; oracle enumerates both candidate starts."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "n", "sum_value")
    )


_SESSION_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         lag(CAST(ts AS TIMESTAMP)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts >= INTERVAL '30 minutes'
                 THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sessions AS (
  SELECT *, sum(new_session) OVER
            (PARTITION BY user_id ORDER BY ts, new_session
             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n, {sql_dsum('value')} AS sum_value
FROM sessions GROUP BY user_id, session_no
"""


@register("events_session_windows", oracle=_SESSION_ORACLE)
def q_events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(gap=30m) per user; [start, start+gap) end-
    exclusive merge semantics mirrored by the lag/cumsum oracle."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n",
            "sum_value",
        )
    )


_JSON_ORACLE = f"""
SELECT event_type,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       {sql_dsum('value')} AS sum_value,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type
"""


@register("events_json_value_counts", oracle=_JSON_ORACLE)
def q_events_json_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 value_counts + JSON path extraction + distinct-agg in one
    aggregate (distinct-count shuffles once on (event_type,user_id))."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
        dsum("value").alias("sum_value"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# --- pivot: event_type → columns ------------------------------------
_TYPES = ("click", "view", "purchase", "signup", "error")
# sum_value mirrors the engine's pivot shape: per-type exact decimal
# sums surfaced as doubles, then added LEFT-TO-RIGHT in declared type
# order (the one IEEE addition chain both engines share) — NOT one
# global decimal sum, which could differ by final-rounding ULPs.
_PIVOT_SUM = " + ".join(
    "COALESCE(CAST(sum(CAST(value AS DECIMAL(18,2)))"
    f" FILTER (WHERE event_type = '{t}') AS DOUBLE), 0.0)"
    for t in _TYPES
)
_PIVOT_ORACLE = f"""
SELECT user_id,
       {', '.join(f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
                  for t in _TYPES)},
       {_PIVOT_SUM} AS sum_value
FROM events GROUP BY user_id
"""


@register("events_type_pivot", oracle=_PIVOT_ORACLE)
def q_events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): per-user event counts, one column per event
    type, plus the exact value total. The pivot values are DECLARED
    (not discovered), which matters at scale twice over: Spark skips
    the extra distinct-scan JOB it otherwise runs to enumerate pivot
    keys, and the output width is fixed at plan time instead of
    data-dependent. Plan: ONE scan, a (user_id, event_type) pre-agg
    exchange, then the pivotfirst agg on user_id — both phases
    map-side partial, so the shuffles carry one row per (user, type)
    and per user respectively, never per event."""
    ev = _events(spark, sf_dir)
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_TYPES))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("v"),
        )
    )
    total = None
    for t in _TYPES:
        col = F.coalesce(F.col(f"{t}_v"), F.lit(0.0))
        total = col if total is None else total + col
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"n_{t}")
            for t in _TYPES
        ],
        total.alias("sum_value"),
    )
