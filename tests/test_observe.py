"""The Observation API: named aggregate metrics collected as a
side-effect of the SAME job that produces the result — the mechanism
for data-quality counters at 100 TB, where a separate metrics query
would double the scan cost. Pinned here because no oracle can see a
driver-side observation."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

from miba_2023_capstone_rb_nlp_spark import catalog
from tests.conftest import SF_TEST_DIR


def test_observe_metrics_piggyback_on_one_job(spark):
    """observe() must deliver metrics from the result's own pass:
    the observed counts equal a directly computed aggregate, and the
    CollectMetrics node does not change the query's rows."""
    ev = catalog.table(spark, SF_TEST_DIR, "events")
    obs = Observation("dq")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("user_id").isNull().cast("int")).alias("null_users"),
        F.min("value").alias("min_value"),
    )
    result = observed.groupBy("event_type").count()
    got = {r["event_type"]: r["count"] for r in result.collect()}

    # metrics became available with the job above — no second scan
    metrics = obs.get
    direct = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("user_id").isNull().cast("int")).alias("null_users"),
        F.min("value").alias("min_value"),
    ).collect()[0]
    assert metrics["n_rows"] == direct["n_rows"] == sum(got.values())
    assert metrics["null_users"] == direct["null_users"]
    assert metrics["min_value"] == direct["min_value"]

    # and the observation is transparent to the result itself
    plain = {
        r["event_type"]: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    assert got == plain
