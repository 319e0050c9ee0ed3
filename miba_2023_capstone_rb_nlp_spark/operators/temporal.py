"""Temporal joins Spark lacks as built-ins: as-of join and bounded
range (interval) join.

Reference parity: the reference has no temporal joins (SURVEY §2.3
"not present" row); these are engine additions for time-series /
training-data workloads (event attribution, windowed feature joins),
per the north-star scope.

Scale design (the part that matters at 100 TB):
  - ``asof_join``: the classic distributed as-of strategy — tag both
    sides, union, ONE shuffle on the join keys, per-partition sort,
    ``last(right_payload, ignorenulls=True)`` over an
    unbounded-preceding row frame, then keep only left-side rows.
    No range explosion and no theta join: cost is O(n log n) per key
    partition regardless of the time span between a left row and its
    match. This is the plan a 1000-executor cluster wants — a single
    hash exchange + sort, both spillable.
  - ``range_join_bucketed``: a bounded-interval theta join rewritten
    as an equi-join on (keys..., time_bucket). Right rows land in
    exactly one bucket of width = interval span; each left row probes
    its ≤2 candidate buckets via a tiny ``explode(sequence(...))``
    fan-out, and the exact interval predicate filters after the
    equi-join. Catalyst would otherwise fall back to
    BroadcastNestedLoopJoin (O(n·m) per key); this stays a shuffled
    equi-join, skew-free as long as (keys, bucket) is well spread.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _keys(on: str | Sequence[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
    strict: bool = False,
    prefix: str = "r_",
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row (same keys) with
    ``right.ts <= left.ts`` (``< `` when ``strict``).

    Equal-timestamp ordering is encoded in the sort side tag, so
    strict/non-strict semantics are exact, not tie-lucky. Ties among
    multiple *right* rows on (keys, ts) are broken arbitrarily —
    pre-dedup the right side if that matters.

    Returns left's full schema plus ``prefix + c`` for each of
    ``right_cols`` (default: all non-key right columns). ``how`` is
    "inner" (drop unmatched left rows) or "left" (keep, nulls).
    """
    keys = _keys(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    # Strict: a right row at the exact left ts must NOT be visible →
    # sort it after the left row. Non-strict: before.
    left_side = 0 if strict else 1
    right_side = 1 - left_side

    r_payload = F.struct(*[F.col(c).alias(c) for c in right_cols])
    r_type = right.select(r_payload.alias("p")).schema[0].dataType
    l_payload = F.struct(*[F.col(c).alias(c) for c in left.columns])
    l_type = left.select(l_payload.alias("p")).schema[0].dataType

    lu = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
        l_payload.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    ru = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        F.lit(None).cast(l_type).alias("__l"),
        r_payload.alias("__r"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lu.unionByName(ru)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == left_side)
    )
    if how == "inner":
        matched = matched.where(F.col("__m").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(prefix + c) for c in right_cols],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: float = 0.0,
    upper_s: float = 3600.0,
    lower_inclusive: bool = False,
    upper_inclusive: bool = True,
    prefix: str = "r_",
) -> DataFrame:
    """Inner-join right rows whose ``right.ts - left.ts`` lies in the
    interval (lower_s, upper_s] seconds (inclusivity configurable).

    Each matched pair is produced exactly once: a right row lives in
    one bucket; a left row probes each candidate bucket once (the
    ``sequence`` values are distinct).
    """
    keys = _keys(on)
    span_us = int(round((upper_s - lower_s) * 1_000_000))
    if span_us <= 0:
        raise ValueError("upper_s must exceed lower_s")
    lo_us = int(round(lower_s * 1_000_000))
    up_us = int(round(upper_s * 1_000_000))

    r = right.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(prefix + c) for c in right.columns if c not in keys],
    )
    r_us = F.unix_micros(F.col(prefix + right_ts))
    r = r.withColumn("__bucket", F.floor(r_us / F.lit(span_us)))

    l_us = F.unix_micros(F.col(left_ts))
    lo_b = F.floor((l_us + F.lit(lo_us)) / F.lit(span_us))
    hi_b = F.floor((l_us + F.lit(up_us)) / F.lit(span_us))
    l = left.withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b)))

    delta = F.unix_micros(F.col(prefix + right_ts)) - F.unix_micros(F.col(left_ts))
    lower_ok: Column = delta >= F.lit(lo_us) if lower_inclusive else delta > F.lit(lo_us)
    upper_ok: Column = delta <= F.lit(up_us) if upper_inclusive else delta < F.lit(up_us)
    return (
        l.join(r, [*keys, "__bucket"], "inner")
        .where(lower_ok & upper_ok)
        .drop("__bucket")
    )
