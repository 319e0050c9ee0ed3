"""Bucketed co-located join: pre-bucketing both fact tables on the
join key eliminates BOTH shuffle exchanges from the join — the
standard layout for repeated large-fact⋈large-fact joins at 100 TB
(pay one write-side shuffle, amortize over every subsequent join).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark import catalog
from tests.conftest import SF_TEST_DIR

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    o = catalog.table(spark, SF_TEST_DIR, "orders")
    li = catalog.table(spark, SF_TEST_DIR, "lineitem")
    (
        o.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(base / "orders"))
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(base / "lineitem"))
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        # the join inputs scan bucketed files directly — no shuffle
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed):
    o = catalog.table(spark, SF_TEST_DIR, "orders")
    li = catalog.table(spark, SF_TEST_DIR, "lineitem")
    plain = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bucketed_q = (
        spark.table("b_orders")
        .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bucketed_q.collect())
    )
