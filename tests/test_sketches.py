"""Sketch operators: exact-heavy-hitter equivalence with the naive plan
(including on skewed data where pruning matters), pruning-bound sanity, and
the HLL shard-merge estimate's pinned relative error."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import sketches


def _skewed_df(spark):
    # one hot key (1000 rows), some warm keys (150 each), a long uniform tail
    rows = (
        [("hot",)] * 1000
        + [(f"warm{i}",) for i in range(5) for _ in range(150)]
        + [(f"tail{i}",) for i in range(500) for _ in range(3)]
    )
    return spark.createDataFrame(rows, "k string").repartition(8)


def test_heavy_hitters_matches_naive_groupby(spark):
    df = _skewed_df(spark)
    thr = 100
    naive = {
        (r["k"], r["cnt"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > thr)
        .collect()
    }
    pruned = {
        (r["k"], r["cnt"])
        for r in sketches.exact_heavy_hitters(df, ["k"], thr).collect()
    }
    assert pruned == naive
    assert ("hot", 1000) in pruned
    assert len(pruned) == 6  # hot + 5 warm, no tail keys


def test_heavy_hitters_threshold_edge_is_strict(spark):
    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 6, "k string")
    got = {r["k"] for r in sketches.exact_heavy_hitters(df, ["k"], 5).collect()}
    assert got == {"b"}  # strictly greater than threshold


def test_heavy_hitters_multi_column_key(spark):
    df = spark.createDataFrame(
        [("x", 1)] * 4 + [("x", 2)] * 2 + [("y", 1)] * 4, "a string, b long"
    )
    got = {
        (r["a"], r["b"], r["cnt"])
        for r in sketches.exact_heavy_hitters(df, ["a", "b"], 3).collect()
    }
    assert got == {("x", 1, 4), ("y", 1, 4)}


def test_heavy_hitters_validates_args(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="threshold"):
        sketches.exact_heavy_hitters(df, ["k"], 0)
    with pytest.raises(ValueError, match="key column"):
        sketches.exact_heavy_hitters(df, [], 1)


def test_hll_shard_merge_relative_error(spark):
    # 20k distinct values across 4 shards with heavy cross-shard overlap
    df = spark.range(0, 80000).select(
        (F.col("id") % 4).cast("string").alias("shard"),
        (F.col("id") % 20000).alias("v"),
    )
    sk = sketches.hll_partitioned_sketches(df, "shard", "v", lg_k=12)
    assert sk.count() == 4
    est = sketches.hll_merge_estimate(sk).collect()[0]["estimate"]
    exact = 20000
    # lg_k=12 -> RSE ~1.6%; pin at 5% (~3 sigma)
    assert abs(est - exact) / exact < 0.05


def test_f2_moment_known_values(spark):
    df = spark.createDataFrame([("a",)] * 3 + [("b",)] * 2 + [("c",)], "k string")
    row = sketches.f2_moment(df, ["k"]).collect()[0]
    assert row["f2"] == 9 + 4 + 1
    assert row["n"] == 6
    assert row["n_distinct"] == 3
    assert row["max_freq"] == 3
