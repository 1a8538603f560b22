"""Shared snapshot-store reader (streaming/store.py): the ADVICE-r10
prune-race fix is structural — the batch is selected from the directory
listing and ONLY that partition is scanned — so the pin here is on the
scan footprint (inputFiles), not on winning a timing race."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import types as T

from advanced_elb_logs_etl_spark.streaming import store

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("batch", T.IntegerType()),
    ]
)


def _write(spark, root, batch, rows):
    spark.createDataFrame(rows, "k string, v long").write.mode(
        "overwrite"
    ).parquet(os.path.join(root, f"batch={batch}"))


def test_missing_store_and_no_prior_read_as_none(spark):
    with tempfile.TemporaryDirectory(prefix="sparkgraft_store_") as tmp:
        missing = os.path.join(tmp, "nope")
        assert store.list_batches(spark, missing) is None
        assert store.read_latest_snapshot(spark, missing, SCHEMA, 5) is None
        root = os.path.join(tmp, "s")
        _write(spark, root, 3, [("a", 1)])
        # no batch strictly before 3 -> no prior state (retry of batch 3
        # after a crash before any earlier batch existed)
        assert store.read_latest_snapshot(spark, root, SCHEMA, 3) is None
        assert sorted(store.list_batches(spark, root)) == [3]


def test_reads_only_the_selected_partition(spark):
    """The race-fix contract: whatever other snapshot directories exist
    (including ones a concurrent prune is about to delete), the read's
    file footprint is exactly the chosen batch directory."""
    with tempfile.TemporaryDirectory(prefix="sparkgraft_store_") as tmp:
        root = os.path.join(tmp, "s")
        _write(spark, root, 0, [("old", 1)])
        _write(spark, root, 1, [("mid", 2)])
        _write(spark, root, 2, [("new", 3)])
        df = store.read_latest_snapshot(spark, root, SCHEMA, 2)
        assert [tuple(r) for r in df.collect()] == [("mid", 2)]
        assert df.columns == ["k", "v"]  # partition col dropped
        files = df.inputFiles()
        assert files and all("batch=1" in f for f in files), files
        # the current_* cut (before_batch = +inf) picks the newest
        latest = store.read_latest_snapshot(spark, root, SCHEMA, 2**31 - 1)
        assert [tuple(r) for r in latest.collect()] == [("new", 3)]
        # explicit at_batch pins a consistent two-store cut
        pinned = store.read_latest_snapshot(
            spark, root, SCHEMA, 2**31 - 1, at_batch=0
        )
        assert [tuple(r) for r in pinned.collect()] == [("old", 1)]


def test_survives_pruned_superseded_snapshots(spark):
    """After a prune removed every superseded snapshot, the read still
    returns the latest state (the directory it reads is the one the
    prune contract never deletes)."""
    import shutil

    with tempfile.TemporaryDirectory(prefix="sparkgraft_store_") as tmp:
        root = os.path.join(tmp, "s")
        for b in range(4):
            _write(spark, root, b, [(f"b{b}", b)])
        for b in range(3):  # prune everything but the newest
            shutil.rmtree(os.path.join(root, f"batch={b}"))
        df = store.read_latest_snapshot(spark, root, SCHEMA, 2**31 - 1)
        assert [tuple(r) for r in df.collect()] == [("b3", 3)]
