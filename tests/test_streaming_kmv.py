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


# --- the queued r11 streaming gate, rehearsed against DuckDB --------------
# Replay the events user_id stream through the sketch at k=64 in 3 REAL
# micro-batches, then emit the estimate beside the exact distinct count.
# Slicing-invariant, so the oracle is the plain batch twin.  All-BIGINT
# surface (the r10 float policy).

GATE_K = 64
_KM = float((GATE_K - 1) << 60)

STREAM_KMV_ORACLE_QUEUED_R11 = f"""
WITH keys AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
), sk AS (SELECT h FROM keys ORDER BY h LIMIT {GATE_K}
), est AS (
  SELECT count(*)::BIGINT AS n_hashes, max(h) AS kth_hash,
         CASE WHEN count(*) < {GATE_K} THEN count(*)
              ELSE CAST(floor({_KM!r} / CAST(max(h) AS DOUBLE)) AS BIGINT)
         END AS est_distinct
  FROM sk
), exact AS (
  SELECT count(DISTINCT user_id)::BIGINT AS exact_distinct
  FROM events WHERE user_id IS NOT NULL
)
SELECT n_hashes, kth_hash, est_distinct, exact_distinct FROM est, exact
"""


def q_stream_kmv_distinct(spark, sf_dir):
    """The queued r11 registration body: real 3-batch replay of the
    events user_id stream through the KMV store, then the distinct
    estimate beside the exact count (gate instrumentation)."""
    from advanced_elb_logs_etl_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    keys = ev.filter(F.col("user_id").isNotNull()).select(
        "event_id", F.col("user_id").alias("key")
    )
    sk = kms.replay_kmv(
        spark, keys, "key", k=GATE_K, num_batches=3, order_col="event_id"
    )
    est = kmv.kmv_estimate(sk, k=GATE_K)
    exact = keys.agg(F.countDistinct("key").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(exact)).select(
        "n_hashes", "kth_hash", "est_distinct", "exact_distinct"
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
