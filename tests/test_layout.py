"""Z-order layout tests: Morton interleave vs a pure-Python reference,
and the locality property the layout exists for (small per-partition
extents in BOTH dimensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import layout


def _py_z(a: int, b: int, bits: int) -> int:
    cap = (1 << bits) - 1
    a, b = max(0, min(a, cap)), max(0, min(b, cap))
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_reference(spark):
    cases = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (300, -5),
             (65535, 1), (12345, 54321)]
    df = spark.createDataFrame(cases, "a long, b long")
    for bits in (8, 16):
        got = {
            (r.a, r.b): r.z
            for r in df.select(
                "a", "b", layout.zvalue(F.col("a"), F.col("b"), bits).alias("z")
            ).collect()
        }
        for a, b in cases:
            assert got[(a, b)] == _py_z(a, b, bits), (a, b, bits)


def test_zorder_by_partitions_have_small_extents(spark):
    # full 64x64 grid; 16 range partitions on z must each span far less
    # than the full range in BOTH dims (a single-column sort spans 63 in
    # the other dim)
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    parts = (
        layout.zorder_by(grid, F.col("a"), F.col("b"), num_partitions=16, bits=6)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(p.n for p in parts) == 64 * 64
    for p in parts:
        if p.n < 32:  # tiny boundary partitions can't prove anything
            continue
        assert p.sa <= 32 and p.sb <= 32, (p.pid, p.sa, p.sb, p.n)


def test_compaction_plan_invariants(spark):
    """Next-fit packing: bins cover all files, every bin except possibly
    the last (in start-offset order) reaches the target once its first
    file starts before a boundary, and big files sit alone."""
    sizes = [300, 300, 150, 100, 90, 60, 50, 50, 900]  # target 400: 900 alone
    df = spark.createDataFrame(
        [(f"f{i:02d}", s) for i, s in enumerate(sizes)], "file_name string, bytes long"
    )
    plan = {r.file_name: (r.bin, r.bytes)
            for r in layout.compaction_plan(df, target_bytes=400).collect()}
    assert len(plan) == len(sizes)
    # size-desc order: 900,300,300,150,100,90,60,50,50 ; offsets 0,900,1200,
    # 1500,1650,1750,1840,1900,1950 ; bins (//400): 0,2,3,3,4,4,4,4,4
    by_bin: dict = {}
    for name, (b, sz) in plan.items():
        by_bin.setdefault(b, []).append(sz)
    assert sorted(by_bin[0]) == [900]          # oversized file alone
    assert sorted(by_bin[2]) == [300]
    assert sorted(by_bin[3]) == [150, 300]
    assert sorted(by_bin[4]) == [50, 50, 60, 90, 100]
