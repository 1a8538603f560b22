"""Streaming Count-Min sketch (streaming/cmstream.py): slicing
invariance (streamed cumulative cells == single-pass batch build),
retry idempotence, a real micro-batch replay, and the DuckDB twin
rehearsal for the queued r10 gate (`stream_cm_point_frequency`)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import cmsketch as cm
from advanced_elb_logs_etl_spark.streaming import cmstream as cms

W, D = 64, 4


def _rows(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


BATCHES = [list("aaabbc"), list("aabbbbddddde"), list("cccccfffa")]
ALL = [k for b in BATCHES for k in b]


def test_batch_fold_equals_single_build(spark):
    state = None
    for keys in BATCHES:
        out = cms.cm_batch_step(_rows(spark, keys), state, width=W, depth=D)
        state = spark.createDataFrame(
            out.collect(), "row int, bucket int, cnt bigint"
        )
    whole = cm.cm_build(_rows(spark, ALL), width=W, depth=D)
    assert sorted(map(tuple, state.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_process_batch_retry_idempotent(spark):
    with tempfile.TemporaryDirectory(prefix="sparkgraft_cms_") as store:
        cms._process_batch(_rows(spark, BATCHES[0]), 0, store, "key", W, D)
        cms._process_batch(_rows(spark, BATCHES[1]), 1, store, "key", W, D)
        first = sorted(
            map(tuple, cms.current_sketch(spark, store).collect())
        )
        # a retried batch must read only batch-0 state and overwrite
        cms._process_batch(_rows(spark, BATCHES[1]), 1, store, "key", W, D)
        assert (
            sorted(map(tuple, cms.current_sketch(spark, store).collect()))
            == first
        )


def test_replay_equals_batch_build_and_estimates(spark):
    rows = [(i, k) for i, k in enumerate(ALL)]
    df = spark.createDataFrame(rows, "rid bigint, key string")
    got = cms.replay_cm(
        spark, df.select("rid", "key"), "key", width=W, depth=D,
        num_batches=3, order_col="rid",
    )
    whole = cm.cm_build(_rows(spark, ALL), width=W, depth=D)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # the streamed sketch answers point queries exactly like the batch one
    probes = _rows(spark, sorted(set(ALL)) + ["absent"])
    est = {
        r.key: r.est
        for r in cm.cm_estimate(got, probes, width=W, depth=D).collect()
    }
    exact = {k: ALL.count(k) for k in set(ALL)}
    for k, n in exact.items():
        assert est[k] >= n, k


def test_empty_store_and_geometry_guard(spark):
    with tempfile.TemporaryDirectory(prefix="sparkgraft_cms_") as store:
        assert cms.current_sketch(spark, store).collect() == []
    with pytest.raises(ValueError):
        cms.cm_stream(None, "/tmp/x", width=0)


# --- the queued r10 streaming gate, rehearsed against DuckDB -------------
# Registration body: replay the events event_type stream through the
# sketch at the DEFAULT geometry, estimate the 5 event types + one
# absent key, emit (key, est, exact, overestimate_ok).  Because counts
# are exact sums and the slicing is deterministic, the oracle can
# replicate the whole thing in SQL (the cmsketch twin over event_type).

STREAM_CM_ORACLE_QUEUED_R10 = f"""
WITH keys AS (
  SELECT event_type AS key FROM events WHERE event_type IS NOT NULL
), cells AS (
  SELECT r.i AS row,
         ('0x' || substr(md5(r.i || ':' || key), 1, 15))::BIGINT % {cm.WIDTH}
           AS bucket,
         count(*)::BIGINT AS cnt
  FROM keys, (SELECT UNNEST(generate_series(0, {cm.DEPTH - 1})) AS i) r
  GROUP BY 1, 2
), probe AS (
  SELECT DISTINCT event_type AS key FROM events WHERE event_type IS NOT NULL
  UNION SELECT 'absent_key'
), probe_cells AS (
  SELECT p.key, r.i AS row,
         ('0x' || substr(md5(r.i || ':' || p.key), 1, 15))::BIGINT % {cm.WIDTH}
           AS bucket
  FROM probe p, (SELECT UNNEST(generate_series(0, {cm.DEPTH - 1})) AS i) r
), est AS (
  SELECT pc.key, min(coalesce(c.cnt, 0)) AS est
  FROM probe_cells pc
  LEFT JOIN cells c ON c.row = pc.row AND c.bucket = pc.bucket
  GROUP BY pc.key
), exact AS (
  SELECT key, count(*)::BIGINT AS exact FROM keys GROUP BY key
)
SELECT e.key, e.est, coalesce(x.exact, 0) AS exact,
       e.est >= coalesce(x.exact, 0) AS overestimate_ok
FROM est e LEFT JOIN exact x USING (key)
"""


def q_stream_cm_point_frequency(spark, sf_dir):
    """The queued r10 registration body: real 3-batch replay of the
    events event_type stream through the sketch store, then point
    estimates for every observed type + one absent control."""
    from advanced_elb_logs_etl_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    keys = ev.filter(F.col("event_type").isNotNull()).select(
        "event_id", F.col("event_type").alias("key")
    )
    sk = cms.replay_cm(
        spark, keys, "key", num_batches=3, order_col="event_id"
    )
    probes = (
        keys.select("key")
        .distinct()
        .unionByName(spark.createDataFrame([("absent_key",)], "key string"))
    )
    est = cm.cm_estimate(sk, probes)
    exact = keys.groupBy("key").agg(F.count(F.lit(1)).alias("exact"))
    return est.join(exact, "key", "left").select(
        "key",
        "est",
        F.coalesce(F.col("exact"), F.lit(0)).alias("exact"),
        (F.col("est") >= F.coalesce(F.col("exact"), F.lit(0))).alias(
            "overestimate_ok"
        ),
    )


def test_queued_stream_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the queued r10 streaming entry
    at sf0.01 (real micro-batch engine on the Spark side)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_stream_cm_point_frequency(spark, sf)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(x) for x in r) for r in sdf.select(*scols).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    d = con.execute(STREAM_CM_ORACLE_QUEUED_R10)
    cols = [c[0] for c in d.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    drows = sorted(tuple(str(r[i]) for i in idx) for r in d.fetchall())
    assert sorted(cols) == scols
    assert srows == drows
    assert len(srows) >= 2
