"""Session utilities: shuffle-partition auto-sizing (the spill-aware
knob the 200x scale harness measured — SCALE.md round-8)."""

from __future__ import annotations

from advanced_elb_logs_etl_spark.session import autosize_shuffle_partitions


def test_autosize_scales_with_input(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        cores = spark.sparkContext.defaultParallelism
        # small input: clamps to core count, never below
        n_small = autosize_shuffle_partitions(spark, 1024)
        assert n_small == cores
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(cores)
        # 100 GB at 128 MB target -> ceil(100GiB/128MiB) = 800 partitions
        n_big = autosize_shuffle_partitions(spark, 100 * 1024**3)
        assert n_big == max(cores, 800)
        # coarser target halves the count
        n_coarse = autosize_shuffle_partitions(
            spark, 100 * 1024**3, target_partition_bytes=256 * 1024**2
        )
        assert n_coarse == max(cores, 400)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
