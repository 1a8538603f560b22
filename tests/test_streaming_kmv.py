"""Streaming KMV sketch (streaming/kmvstream.py): slicing invariance
(streamed cumulative minima == single-pass batch build), retry
idempotence, snapshot pruning, a real micro-batch replay, and the
DuckDB twin rehearsal for the queued r11 gate (`stream_kmv_distinct`)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import kmv
from advanced_elb_logs_etl_spark.streaming import kmvstream as kms

K = 8


def _rows(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


BATCHES = [
    [f"u{i}" for i in range(10)],
    [f"u{i}" for i in range(5, 25)],
    [f"u{i}" for i in range(20, 40)] + ["u1", "u2"],
]
ALL = [k for b in BATCHES for k in b]


def test_batch_fold_equals_single_build(spark):
    state = None
    for keys in BATCHES:
        out = kms.kmv_batch_step(_rows(spark, keys), state, k=K)
        state = spark.createDataFrame(out.collect(), "h long")
    whole = kmv.kmv_build(_rows(spark, ALL), k=K)
    assert sorted(r.h for r in state.collect()) == sorted(
        r.h for r in whole.collect()
    )


def test_process_batch_retry_idempotent(spark):
    with tempfile.TemporaryDirectory(prefix="sparkgraft_kmv_") as store:
        kms._process_batch(_rows(spark, BATCHES[0]), 0, store, "key", K)
        kms._process_batch(_rows(spark, BATCHES[1]), 1, store, "key", K)
        first = sorted(r.h for r in kms.current_kmv(spark, store).collect())
        # a retried batch must read only batch-0 state and overwrite
        kms._process_batch(_rows(spark, BATCHES[1]), 1, store, "key", K)
        assert (
            sorted(r.h for r in kms.current_kmv(spark, store).collect())
            == first
        )


def test_store_prunes_superseded_snapshots(spark):
    with tempfile.TemporaryDirectory(prefix="sparkgraft_kmv_") as store:
        for i, keys in enumerate(BATCHES):
            kms._process_batch(_rows(spark, keys), i, store, "key", K)
        hashes_dir = os.path.join(store, "hashes")
        kept = sorted(
            d for d in os.listdir(hashes_dir) if d.startswith("batch=")
        )
        assert kept == ["batch=1", "batch=2"]
        whole = kmv.kmv_build(_rows(spark, ALL), k=K)
        assert sorted(
            r.h for r in kms.current_kmv(spark, store).collect()
        ) == sorted(r.h for r in whole.collect())


def test_replay_equals_batch_build_and_estimates(spark):
    rows = [(i, k) for i, k in enumerate(ALL)]
    df = spark.createDataFrame(rows, "rid bigint, key string")
    got = kms.replay_kmv(
        spark, df.select("rid", "key"), "key", k=K,
        num_batches=3, order_col="rid",
    )
    whole = kmv.kmv_build(_rows(spark, ALL), k=K)
    assert sorted(r.h for r in got.collect()) == sorted(
        r.h for r in whole.collect()
    )
    # the streamed sketch estimates exactly like the batch one
    est = kmv.kmv_estimate(got, k=K).collect()[0]
    want = kmv.kmv_estimate(whole, k=K).collect()[0]
    assert tuple(est) == tuple(want)


def test_empty_store_and_k_guard(spark):
    with tempfile.TemporaryDirectory(prefix="sparkgraft_kmv_") as store:
        assert kms.current_kmv(spark, store).collect() == []
    with pytest.raises(ValueError):
        kms.kmv_stream(None, "/tmp/x", k=1)


# --- the r11 streaming gate (REGISTERED in plans/catalog_r11.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry — the catalog_r10/cmstream pattern) --------------

from advanced_elb_logs_etl_spark.plans.catalog_r11 import (  # noqa: E402
    STREAM_KMV_ORACLE as STREAM_KMV_ORACLE_QUEUED_R11,
    q_stream_kmv_distinct,
)


def test_queued_stream_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the queued r11 streaming entry
    at sf0.01 (real micro-batch engine on the Spark side)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_stream_kmv_distinct(spark, sf)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(x) for x in r) for r in sdf.select(*scols).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    d = con.execute(STREAM_KMV_ORACLE_QUEUED_R11)
    cols = [c[0] for c in d.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    drows = sorted(tuple(str(r[i]) for i in idx) for r in d.fetchall())
    assert sorted(cols) == scols
    assert srows == drows
    assert len(srows) == 1
