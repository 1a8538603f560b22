"""Mergeable-sketch and candidate-pruned exact operators: the primitives a
100 TB aggregation layer uses when full-cardinality shuffles stop being an
option.

- exact_heavy_hitters: two-pass exact frequent-item mining. Pass 1
  aggregates per PARTITION and keeps only keys that could possibly be
  global heavy hitters (pigeonhole: a key with global count > t must have
  count > t/P in at least one of P partitions); pass 2 exactly counts just
  the surviving candidates. The final answer is EXACT — the pruning can
  only admit false candidates, never drop a true one — so it gets a plain
  SQL oracle, while the shuffle carries |candidates| keys instead of the
  full key cardinality. That gap is the point: counting heavy hitters over
  billions of distinct URLs shuffles millions of rows, not billions.

- hll_partitioned_sketches / hll_merge_estimate: Apache DataSketches HLL
  via Spark's built-in hll_sketch_agg / hll_union_agg — the mergeable
  distinct-count pattern (per-shard/per-day sketches stored small, unioned
  at query time). The estimate is approximate; correctness is pinned by a
  relative-error test against the exact count, not a value oracle.

- f2_moment: the second frequency moment (self-join size) and derived
  collision statistics, exact in the integer domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_heavy_hitters(
    df: DataFrame, key_cols: list[str], threshold: int
) -> DataFrame:
    """Keys whose exact row count exceeds ``threshold``, as
    [*key_cols, cnt] — computed with partition-local candidate pruning.

    Pass 1 groups by (partition id, key): this materializes the map-side
    partial counts that a plain groupBy would also compute, but lets us
    FILTER them before the global exchange. With P input partitions, a key
    whose global count exceeds t must, by pigeonhole, exceed t/P in some
    partition, so keeping local counts >= t/P (and always > 0) preserves
    every true heavy hitter. Pass 2 semi-joins the input down to candidate
    keys and counts exactly.

    Skew-safe by construction: the per-partition pre-agg bounds any single
    key's pass-1 contribution to P rows, and pass 2's shuffle carries only
    candidate keys. Worst case (uniform data, threshold near n/P) the
    candidate set degrades toward full cardinality — same cost as the
    naive groupBy, never worse asymptotically.

    ``threshold`` must be >= 1; the P used for the bound is the runtime
    partition count of ``df``'s scan, read AFTER Spark plans the input."""
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    if not key_cols:
        raise ValueError("exact_heavy_hitters requires at least one key column")
    num_parts = max(1, df.rdd.getNumPartitions())
    local_bound = threshold / num_parts
    local = (
        df.groupBy(F.spark_partition_id().alias("__pid"), *key_cols)
        .agg(F.count(F.lit(1)).alias("__local_cnt"))
        .filter(F.col("__local_cnt") >= local_bound)
        .select(*key_cols)
        .distinct()
    )
    candidates = df.join(local, key_cols, "left_semi")
    return (
        candidates.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > threshold)
    )


def hll_partitioned_sketches(
    df: DataFrame, shard_col: str, value_col: str, lg_k: int = 12
) -> DataFrame:
    """One DataSketches HLL sketch per shard: [shard_col, sketch binary].
    The stored form of the mergeable-rollup pattern — a day/shard writes
    its (tiny) sketch once; any later union over any shard subset costs
    |shards| sketch merges instead of a re-scan of the raw data."""
    return df.groupBy(shard_col).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    )


def hll_merge_estimate(sketches: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Union pre-built HLL sketches and estimate the global distinct count:
    1-row [estimate: long]. Merging never rescans the base data — the
    whole point of sketch-typed rollups."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias("estimate")
    )


def f2_moment(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Second frequency moment F2 = sum over keys of count^2 (the
    self-join size), plus n, distinct count, and the max frequency — the
    exact integer statistics that size a self-join / skew decision before
    running it. One hash agg + one 1-row re-agg."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("c"))
    return counts.agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("f2"),
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").cast("long").alias("max_freq"),
    )
