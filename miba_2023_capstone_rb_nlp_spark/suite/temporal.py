"""Temporal-join suite: as-of join (latest prior event attribution)
and bounded range join (events within a following interval), both on
the `events` table. Engine additions — SURVEY §2.3 lists these as
"not present" in the reference; oracles use DuckDB's native ASOF JOIN
and a plain inequality join respectively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark import catalog
from miba_2023_capstone_rb_nlp_spark.functions.numeric import dsum, sql_dsum
from miba_2023_capstone_rb_nlp_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)
from miba_2023_capstone_rb_nlp_spark.suite import register


def _events(spark, sf_dir):
    return catalog.table(spark, sf_dir, "events")


_ASOF_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id AS purchase_id, p.user_id AS user_id,
       p.ts AS purchase_ts, c.event_id AS click_id, c.ts AS click_ts,
       CAST(date_diff('microsecond', c.ts, p.ts) AS BIGINT) AS gap_us
FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("events_asof_last_click", oracle=_ASOF_ORACLE)
def q_events_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the user's latest click at-or-before it.

    union + one shuffle on user_id + last(ignorenulls) window — no
    theta join, O(n log n) per user partition at any time span.
    """
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        how="inner",
        strict=False,
        prefix="",
    )
    gap = F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        gap.alias("gap_us"),
    )


_RANGE_ORACLE = f"""
WITH e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'error'
), c AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'click'
)
SELECT e.event_id AS error_id, e.user_id AS user_id, e.ts AS error_ts,
       count(c.ts) AS n_clicks,
       CAST(coalesce({sql_dsum('c.value')}, 0) AS DOUBLE) AS sum_click_value
FROM e LEFT JOIN c
  ON e.user_id = c.user_id AND c.ts > e.ts
 AND c.ts <= e.ts + INTERVAL '2 hours'
GROUP BY 1, 2, 3
"""


@register("events_range_click_counts", oracle=_RANGE_ORACLE)
def q_events_range_click_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: count/sum of same-user clicks in the following
    2 hours (exclusive-start, inclusive-end interval).

    Bucketed rewrite: equi-join on (user_id, 2h-bucket) with a ≤2-way
    candidate fan-out — never a BroadcastNestedLoopJoin; zero-click
    errors restored by a left join against the aggregate.
    """
    ev = _events(spark, sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("error_ts")
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = range_join_bucketed(
        errors,
        clicks,
        on="user_id",
        left_ts="error_ts",
        right_ts="ts",
        lower_s=0.0,
        upper_s=7200.0,
        prefix="c_",
    )
    agg = joined.groupBy("error_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        dsum("c_value").alias("sum_click_value"),
    )
    return errors.join(agg, "error_id", "left").select(
        "error_id",
        "user_id",
        "error_ts",
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.coalesce("sum_click_value", F.lit(0.0)).alias("sum_click_value"),
    )


_ASOF_COGROUP_SCHEMA = (
    "purchase_id bigint, user_id bigint, purchase_ts timestamp, "
    "click_id bigint, click_ts timestamp, gap_us bigint"
)


def _merge_asof_groups(left, right):
    """Bucket-level pandas merge_asof (backward, by=user_id): the
    Arrow-batched twin of the relational as-of compile. Cogrouping on
    a HASH BUCKET rather than the raw user keeps the number of
    Python calls constant (n_buckets) while merge_asof's ``by=``
    still matches within each user — the pattern that makes pandas
    cogroup survive high-cardinality keys."""
    import pandas as pd

    if len(left) == 0:
        return pd.DataFrame(
            columns=[
                "purchase_id",
                "user_id",
                "purchase_ts",
                "click_id",
                "click_ts",
                "gap_us",
            ]
        )
    left = left.sort_values(["purchase_ts", "purchase_id"])
    if len(right) == 0:
        out = left.assign(click_id=pd.NA, click_ts=pd.NaT)
    else:
        right = right.sort_values(["click_ts", "click_id"])
        out = pd.merge_asof(
            left,
            right,
            left_on="purchase_ts",
            right_on="click_ts",
            by="user_id",
            direction="backward",
        )
    out = out.dropna(subset=["click_id"])  # inner semantics
    gap = out["purchase_ts"].astype("int64") - out["click_ts"].astype("int64")
    out = out.assign(gap_us=gap // 1000)  # ns → µs, exact int math
    return out[
        ["purchase_id", "user_id", "purchase_ts", "click_id", "click_ts", "gap_us"]
    ]


@register("events_asof_cogroup", oracle=_ASOF_ORACLE)
def q_events_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join via ``cogroup().applyInPandas`` — the SAME
    query (and oracle) as events_asof_last_click, solved with the
    other physical strategy Spark offers: co-partition both event
    streams on a 64-way user-hash bucket and run pandas merge_asof
    (``by=user_id``) per bucket in one Arrow-batched stage. The
    bucket indirection is the load-bearing scale choice: cogrouping
    on the raw user would make one Python call per user (measured
    10× slower at 6k users); bucketing keeps the call count constant
    while ``by=`` preserves exact per-user matching. r16 measured the
    bucket count (64/128/256 → 1.04/1.58/2.75 s at sf0.1, outputs
    identical): per-call pandas overhead dominates locally, so 64
    stays; on a real cluster the SAME constant caps the stage at 64
    tasks — size it to ~2-4× the executor-core count there (the
    output carries no bucket column, so the knob is result-free).

    When to pick which: the relational compile (union + window) is
    one shuffle and stays whole-stage-codegen'd — the default. The
    cogroup form pays Arrow transfer but generalizes to per-key
    logic SQL can't express (tolerance windows with custom
    tie-breaks, per-key model scoring); this entry pins the API
    surface (§2.11) and proves both strategies return identical
    frames against one oracle.
    """
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    bucket = F.pmod(F.col("user_id"), F.lit(64)).alias("b")
    return (
        purchases.withColumn("b", bucket)
        .groupBy("b")
        .cogroup(clicks.withColumn("b", bucket).groupBy("b"))
        .applyInPandas(_merge_asof_groups, schema=_ASOF_COGROUP_SCHEMA)
    )
