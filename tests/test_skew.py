"""Skew-mitigation operators under ACTUAL skew: 90% of rows share one
key. Salting must spread the hot key across sub-keys without changing
any result (the suite's oracle entries prove parity on real tables;
this pins behavior on an adversarial distribution + the plan shape).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.operators.skew import salted_agg, salted_join


def _skewed(spark, n=10_000):
    # key 0 holds ~90% of rows; keys 1..9 share the rest
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise((F.col("id") % 9 + 1).cast("int"))
        .alias("k"),
        (F.col("id") * 2).alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    right = spark.range(10).select(
        F.col("id").cast("int").alias("k"), F.concat(F.lit("dim_"), "id").alias("name")
    )
    plain = (
        left.join(right, "k")
        .groupBy("k", "name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    salted = (
        salted_join(left, right, key="k", n_salts=4)
        .groupBy("k", "name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_spreads_hot_key(spark):
    left = _skewed(spark)
    right = spark.range(10).select(F.col("id").cast("int").alias("k"))
    joined = salted_join(left, right, key="k", n_salts=4)
    # the hot key's rows must occupy >1 distinct salt before the drop
    salted_l = left.withColumn(
        "_salt", F.pmod(F.hash(F.col("k"), F.spark_partition_id()), F.lit(4))
    )
    n_salts_hot = (
        salted_l.filter(F.col("k") == 0).select("_salt").distinct().count()
    )
    assert n_salts_hot > 1
    assert joined.count() == left.count()


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    salted = salted_agg(
        df,
        "k",
        [("v", "count", "n"), ("v", "sum", "s"), ("v", "min", "lo"), ("v", "max", "hi")],
        n_salts=4,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.select("k", "n", "s", "lo", "hi").collect())
    )


def test_salted_agg_is_two_stage(spark):
    df = _skewed(spark)
    out = salted_agg(df, "k", [("v", "sum", "s")], n_salts=4)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two distinct aggregate groupings: (k, _salt) then (k)
    assert plan.count("HashAggregate") >= 4  # partial+final × two stages

def test_salted_join_rejects_non_invariant_how(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "k")
    for how in ("right", "full", "left_anti"):
        with pytest.raises(ValueError, match="not result-invariant"):
            salted_join(df, small, "k", how=how)


def test_centroids_skip_null_vectors(spark):
    """A NULL vector must not deflate its cluster's centroid."""
    from miba_2023_capstone_rb_nlp_spark.operators.analytics import centroids

    rows = [(1, [2.0, 4.0]), (1, [4.0, 8.0]), (1, None)]
    df = spark.createDataFrame(rows, "label int, v array<double>")
    [out] = centroids(df, "v", "label", dim=2).collect()
    assert out["centroid"] == [3.0, 6.0]


def test_aqe_skew_join_splits_hot_partition(spark):
    """The OTHER skew lever SURVEY §9 names besides salting: AQE's
    runtime re-plan. Under an adversarial distribution and test-sized
    thresholds, the executed SortMergeJoin must carry skew=true —
    proof the engine SPLITS the hot partition at runtime instead of
    serializing it onto one task (the 100 TB failure mode)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = _skewed(spark, n=2_000_000)
        # a PLAIN dim side: if the probe side were an aggregate on the
        # join key, the join would consume the agg's exchange directly
        # (no AQEShuffleRead to re-split) and the rule bails — the
        # salting operators remain the lever for that shape
        right = spark.range(10).select(
            F.col("id").cast("int").alias("k"), (F.col("id") * 3).alias("rv")
        )
        joined = left.join(right, "k").agg(
            F.sum(F.col("v") + F.col("rv")).alias("s")
        )
        rows = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan
        assert len(rows) == 1
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)


def test_join_entries_correct_without_broadcast(spark):
    """Correctness must not depend on the broadcast planner choice:
    the join-heavy entries produce identical results with broadcast
    disabled entirely (every join forced to shuffle) — the situation
    a 100 TB dim-side growth produces."""
    from miba_2023_capstone_rb_nlp_spark.suite import load_suite

    suite = load_suite()
    sf = "/root/testdata/sf0.001"
    names = [
        "local_supplier_volume_q5",
        "returned_items_q10",
        "orders_upsert_merge",
        "part_affinity_topk",
    ]
    baseline = {
        n: sorted(map(tuple, suite[n].fn(spark, sf).collect())) for n in names
    }
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for n in names:
            got = sorted(map(tuple, suite[n].fn(spark, sf).collect()))
            assert got == baseline[n], n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
