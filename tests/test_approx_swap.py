"""Executed evidence for the documented 100 TB swaps: two entries
(CCNet buckets, price quantiles) name percentile_approx as the scale
path for their exact-quantile forms. The swap is only honest if the
sketch's contract actually holds on this data — so pin it: Spark's
percentile_approx (Greenwald-Khanna style) guarantees a RANK error of
at most n/accuracy; verify the returned values' true ranks against
that bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark import catalog
from tests.conftest import SF_TEST_DIR

PERCENTAGES = [0.5, 0.9, 0.99]
ACCURACY = 1000


def test_percentile_approx_rank_error_within_contract(spark):
    li = catalog.table(spark, SF_TEST_DIR, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    n = li.count()
    approx = li.agg(
        F.percentile_approx("x", PERCENTAGES, ACCURACY).alias("q")
    ).collect()[0]["q"]
    tol = n / ACCURACY + 1  # the sketch's rank-error bound (+1 for ties)
    for p, v in zip(PERCENTAGES, approx):
        # true rank of the returned value: how many rows sort ≤ it
        rank = li.filter(F.col("x") <= v).count()
        assert abs(rank - p * n) <= tol, (
            f"p={p}: returned {v} has rank {rank}, expected "
            f"{p * n:.0f} ± {tol:.0f}"
        )


def test_percentile_approx_exact_at_max_accuracy_on_small_groups(spark):
    """At bounded group sizes the sketch degenerates to exact — the
    property that makes the swap safe for per-LANGUAGE cut-points
    (each language's score set is far below the sketch's compression
    threshold, so the cut-points are identical and only the global
    memory bound changes)."""
    docs = catalog.table(spark, SF_TEST_DIR, "documents").select(
        "lang", F.length("text").cast("double").alias("x")
    )
    both = docs.groupBy("lang").agg(
        F.percentile_approx("x", 0.5, 10000).alias("approx"),
        F.expr("percentile(x, 0.5)").alias("exact"),
    )
    for r in both.collect():
        # percentile() interpolates; the sketch returns a data point —
        # they may differ by at most the gap between adjacent points,
        # so compare the sketch value's rank window instead of values
        lang_rows = sorted(
            v["x"] for v in docs.filter(F.col("lang") == r["lang"]).collect()
        )
        n = len(lang_rows)
        rank = sum(1 for v in lang_rows if v <= r["approx"])
        assert abs(rank - 0.5 * n) <= 1.5, (r["lang"], rank, n)
