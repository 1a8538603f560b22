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


def test_write_training_shards_zorder_within_file(spark, tmp_path):
    """zorder=(a,b) opt-in: shard membership is unchanged vs the default
    order, and every shard file's rows are physically in Morton order
    (verified by reading each part file directly with pyarrow)."""
    import os

    import pyarrow.parquet as pq

    from advanced_elb_logs_etl_spark.operators.sampling import (
        write_training_shards,
    )

    rows = [(i, (i * 37) % 64, (i * 59) % 64) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, a long, b long")
    zp, hp = str(tmp_path / "zshards"), str(tmp_path / "hshards")
    write_training_shards(df, zp, 4, zorder=(F.col("a"), F.col("b")), zorder_bits=6)
    write_training_shards(df, hp, 4)

    def members(path):
        out = {}
        for shard in os.listdir(path):
            if not shard.startswith("shard="):
                continue
            s = int(shard.split("=")[1])
            for f in os.listdir(os.path.join(path, shard)):
                if f.endswith(".parquet"):
                    t = pq.read_table(os.path.join(path, shard, f))
                    out.setdefault(s, []).append(t.to_pydict())
        return out

    zm, hm = members(zp), members(hp)
    assert set(zm) == set(hm) == {0, 1, 2, 3}
    for s in zm:
        z_ids = sorted(i for d in zm[s] for i in d["doc_id"])
        h_ids = sorted(i for d in hm[s] for i in d["doc_id"])
        assert z_ids == h_ids  # membership identical, only order moved
        for d in zm[s]:
            zs = [_py_z(a, b, 6) for a, b in zip(d["a"], d["b"])]
            assert zs == sorted(zs), f"shard {s} not in Morton order"


def test_compact_parquet_bin_packed(spark, tmp_path):
    """bin_packed compaction drives layout.compaction_plan over the real
    manifest: row counts survive, output file count equals the plan's bin
    count, and rows of one input file land in ONE output file (whole-file
    movement — the property round-robin compaction destroys)."""
    import os

    from advanced_elb_logs_etl_spark.operators.reports import compact_parquet

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    # skewed small files: one big-ish, several tiny, each tagged by origin
    sizes = [4000, 300, 250, 200, 150, 100]
    for i, n in enumerate(sizes):
        (
            spark.range(n)
            .select(
                (F.col("id") + i * 100000).alias("id"),
                F.lit(i).alias("origin"),
                F.concat(F.lit("pad-" * 20), F.col("id").cast("string")).alias("pad"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    total_bytes = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    target = max(1, total_bytes // 3)  # force ~3-4 bins
    n_bins = compact_parquet(spark, src, dst, target_file_bytes=target, bin_packed=True)
    out = spark.read.parquet(dst)
    assert out.count() == sum(sizes)
    out_files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(out_files) == n_bins >= 2
    # whole-file movement: each origin appears in exactly one output file
    per_origin = (
        out.select("origin", F.col("_metadata.file_path").alias("f"))
        .distinct()
        .groupBy("origin")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in per_origin)


def test_canon_file_uri_schemes(spark):
    """The manifest⨝scan canonicalizer must collapse every rendering of
    the same file — Hadoop Path.toString() (file:/x), _metadata.file_path
    (file:///x), bare paths — to one key, and must KEEP the bucket of an
    object-store URI (java.net.URI.getPath() drops it: the ADVICE r6
    empty-join bug; 's3a' also has a digit, which the old scheme regex
    did not even match)."""
    from advanced_elb_logs_etl_spark.operators.reports import _canon_file_uri

    rows = [
        ("file:/tmp/a/part-0.parquet",),
        ("file:///tmp/a/part-0.parquet",),
        ("/tmp/a/part-0.parquet",),
        ("s3a://bucket/key/part-0.parquet",),
        ("s3://bucket/key/part-0.parquet",),
        ("s3a://other-bucket/key/part-0.parquet",),
    ]
    got = [
        r.c
        for r in spark.createDataFrame(rows, "u string")
        .select(_canon_file_uri(F.col("u")).alias("c"))
        .collect()
    ]
    assert got[0] == got[1] == got[2] == "tmp/a/part-0.parquet"
    assert got[3] == got[4] == "bucket/key/part-0.parquet"
    assert got[5] == "other-bucket/key/part-0.parquet"
    assert len({got[2], got[3], got[5]}) == 3, "distinct files stay distinct"


def test_compact_parquet_guards_manifest_scan_mismatch(spark, tmp_path):
    """If the bin-packed join would not cover the manifest (path-scheme
    divergence, foreign files), compact_parquet must refuse loudly
    instead of writing a partial/empty dataset."""
    import os

    import pytest as _pytest

    from advanced_elb_logs_etl_spark.operators import reports as _reports

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(100).coalesce(1).write.parquet(src)
    # sabotage the canonicalizer on the manifest side only, simulating a
    # scheme rendering the scan side can't produce
    orig = _reports._canon_file_uri
    calls = {"n": 0}

    def skewed(col):
        calls["n"] += 1
        return F.concat(F.lit("XX/"), orig(col)) if calls["n"] == 1 else orig(col)

    _reports._canon_file_uri = skewed
    try:
        with _pytest.raises(RuntimeError, match="manifest/scan path mismatch"):
            _reports.compact_parquet(spark, src, dst, bin_packed=True)
    finally:
        _reports._canon_file_uri = orig
    assert not os.path.isdir(dst), "no partial output on refusal"


def test_bucketed_join_is_shuffle_free_measured(spark):
    """The co-located-join contract, MEASURED: two tables bucketed the
    same way on the join key join with ZERO shuffle records written
    (executed-plan SQLMetrics), while the identical unbucketed join
    shuffles both sides.  Broadcast is disabled so the comparison is
    SMJ-vs-SMJ, not hidden by a small-table fast path."""
    import pytest
    from test_plan_quality import _executed_metric_sum

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(5_000).select(
            F.col("id").alias("k"), (F.col("id") + 1).alias("vb")
        )
        layout.write_bucketed(a, "bkt_t_a", ["k"], 8, sort_cols=["k"])
        layout.write_bucketed(b, "bkt_t_b", ["k"], 8, sort_cols=["k"])
        j = spark.table("bkt_t_a").join(spark.table("bkt_t_b"), "k")
        assert j.count() == 5_000  # correctness before plan claims
        j.collect()
        assert (
            _executed_metric_sum(j, "Exchange", "shuffleRecordsWritten") == 0
        )
        # identical join without the layout: both sides shuffle
        ju = a.join(b, "k")
        ju.collect()
        assert (
            _executed_metric_sum(ju, "Exchange", "shuffleRecordsWritten")
            >= 15_000
        )
        # a groupBy on the bucket column also reuses the layout
        g = spark.table("bkt_t_a").groupBy("k").agg(F.sum("va").alias("s"))
        g.collect()
        assert (
            _executed_metric_sum(g, "Exchange", "shuffleRecordsWritten") == 0
        )
        with pytest.raises(ValueError):
            layout.write_bucketed(a, "bkt_t_bad", ["k"], 0)
        with pytest.raises(ValueError):
            layout.write_bucketed(a, "bkt_t_bad", [], 8)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_t_a")
        spark.sql("DROP TABLE IF EXISTS bkt_t_b")
