"""Round-3 operator differentials: pure-Python references for the new
event-stream primitives (independent of the DuckDB oracle SQL — a bug in
the shared formula would fool the oracle but not these), plus a
stream-vs-batch consistency check for session_window.
"""

from __future__ import annotations

import json
from collections import defaultdict

import duckdb
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _events_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_type, epoch_us(ts), event_id, value "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_sequential_runs_match_python_reference(spark):
    """Run-length encoding vs a direct per-user Python walk over the same
    parquet — catches formula bugs the shared-SQL oracle can't."""
    per_user = defaultdict(list)
    for uid, et, ts_us, eid, _ in _events_rows():
        per_user[uid].append((ts_us, eid, et))
    want = {}
    for uid, evs in per_user.items():
        evs.sort()
        runs = []
        for _, _, et in evs:
            if not runs or runs[-1][0] != et:
                runs.append([et, 0])
            runs[-1][1] += 1
        lens = [n for _, n in runs]
        want[uid] = (sum(lens), len(lens), max(lens))

    got = {
        r["user_id"]: (r["n_events"], r["n_runs"], r["max_run_len"])
        for r in CATALOG["sequential_dedup_runs"][0](spark, SF).collect()
    }
    assert got == want


def test_time_weighted_avg_matches_python_reference(spark):
    """TWA vs the step-integral computed directly in Python (round-6 snap
    applied to both)."""
    per_user = defaultdict(list)
    for uid, _, ts_us, eid, val in _events_rows():
        per_user[uid].append((ts_us, eid, val))
    want = {}
    for uid, evs in per_user.items():
        evs.sort()
        num = den = 0.0
        for (t0, _, v), (t1, _, _) in zip(evs, evs[1:]):
            gap = t1 - t0
            num += v * gap
            den += gap
        if den:
            want[uid] = round(num / den, 6)

    got = {
        r["user_id"]: r["twa_value"]
        for r in CATALOG["time_weighted_avg"][0](spark, SF).collect()
    }
    assert set(got) == set(want)
    for uid in want:
        assert abs(got[uid] - want[uid]) < 1e-9, (uid, got[uid], want[uid])


def test_session_window_stream_matches_batch(spark, tmp_path):
    """The SAME session_window expression must produce identical closed
    sessions in batch and in Structured Streaming (append mode, watermark
    advanced past every session by a horizon event)."""
    from advanced_elb_logs_etl_spark.streaming.sessions import sessionize_stream

    rows = [
        {"client_ip": "a", "time": "2025-05-26 12:00:00"},
        {"client_ip": "a", "time": "2025-05-26 12:10:00"},
        {"client_ip": "a", "time": "2025-05-26 13:30:00"},  # new session (>30m gap)
        {"client_ip": "b", "time": "2025-05-26 12:29:00"},
        {"client_ip": "b", "time": "2025-05-26 12:58:59"},  # merges (gap < 30m)
        {"client_ip": "z", "time": "2025-05-27 09:00:00"},  # watermark horizon
    ]
    d = tmp_path / "in"
    d.mkdir()
    (d / "b0.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = "client_ip string, time timestamp"

    stream = spark.readStream.schema(schema).json(str(d))
    out = sessionize_stream(stream, key="client_ip", ts="time", gap="30 minutes",
                            watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("sess_consistency")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["client_ip"], str(r["session_start"]), str(r["session_end"]), r["event_count"])
        for r in spark.sql("SELECT * FROM sess_consistency").collect()
    }

    static = spark.read.schema(schema).json(str(d))
    batch = (
        static.groupBy(F.session_window("time", "30 minutes").alias("sw"), "client_ip")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            "client_ip",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "event_count",
        )
    )
    want = {
        (r["client_ip"], str(r["session_start"]), str(r["session_end"]), r["event_count"])
        for r in batch.collect()
    }
    # The stream emits only sessions the watermark closed; every closed
    # session must agree with the batch computation, and all non-horizon
    # sessions must have closed.
    assert got <= want
    unclosed = want - got
    assert all(k[0] == "z" for k in unclosed), unclosed
    assert {k[0] for k in got} == {"a", "b"}
    a_sessions = [k for k in got if k[0] == "a"]
    assert len(a_sessions) == 2  # the >30m gap split
