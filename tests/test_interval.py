"""Bucketized range join (operators/interval.py) vs brute force."""

import pytest
from pyspark.sql import functions as F

from fluent_bit_clp_spark.operators.interval import range_join


def test_range_join_matches_brute_force(spark):
    points = spark.range(300).select(
        (F.col("id") % 5).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10_000)).alias("ts"),
        F.col("id").alias("pid"),
    )
    intervals = spark.range(60).select(
        (F.col("id") % 5).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(9_000)).alias("s"),
        F.col("id").alias("iid"),
    ).withColumn("e", F.col("s") + 500 + F.pmod(F.xxhash64("iid"), F.lit(700)))
    got = {
        (r.pid, r.iid)
        for r in range_join(
            points, intervals, ["k"], "ts", "s", "e", bucket_width=512
        ).collect()
    }
    want = {
        (p.pid, i.iid)
        for p in points.collect()
        for i in intervals.collect()
        if p.k == i.k and i.s <= p.ts <= i.e
    }
    assert got == want and len(want) > 50


def test_range_join_inclusive_bounds_and_width_invariance(spark):
    points = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (1, 150, "c"), (2, 150, "d")],
        "k int, ts bigint, pid string",
    )
    iv = spark.createDataFrame(
        [(1, 100, 200, "i1"), (2, 0, 10, "i2")],
        "k int, s bigint, e bigint, iid string",
    )
    for width in (7, 64, 100_000):  # result must not depend on bucketing
        got = sorted(
            (r.pid, r.iid)
            for r in range_join(
                points, iv, ["k"], "ts", "s", "e", bucket_width=width
            ).collect()
        )
        assert got == [("a", "i1"), ("b", "i1"), ("c", "i1")], width


def test_range_join_guards(spark):
    p = spark.createDataFrame([(1, 5, "x")], "k int, ts bigint, name string")
    i = spark.createDataFrame(
        [(1, 0, 9, "y")], "k int, s bigint, e bigint, name string"
    )
    with pytest.raises(ValueError, match="duplicate"):
        range_join(p, i, ["k"], "ts", "s", "e", 10)
    ok = i.withColumnRenamed("name", "iname")
    with pytest.raises(ValueError, match="inner"):
        range_join(p, ok, ["k"], "ts", "s", "e", 10, how="left")
    with pytest.raises(ValueError, match="positive"):
        range_join(p, ok, ["k"], "ts", "s", "e", 0)


def test_range_join_plan_is_equi_join(spark):
    """The whole point: the physical join must be a hash/sort-merge
    EQUI-join on (key, bucket) — not BroadcastNestedLoop/Cartesian."""
    points = spark.range(1000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts"),
        F.col("id").alias("pid"),
    )
    iv = spark.range(1000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("s"),
        (F.col("id") + 50).alias("e"), F.col("id").alias("iid"),
    )
    plan = (
        range_join(points, iv, ["k"], "ts", "s", "e", 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
