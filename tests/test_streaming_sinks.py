"""Streaming sinks: stream-static enrichment and the foreachBatch keyed
upsert — driven with file-source micro-batches, checked against the merge
semantics a lakehouse MERGE INTO would give."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.streaming.sinks import enrich_stream, merge_upsert_sink


def _write_batch(d, name, rows):
    (d / name).write_text("\n".join(json.dumps(r) for r in rows))


def test_enrich_stream_joins_static_dim(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_batch(
        d,
        "b0.json",
        [
            {"client_ip": "1.1.1.1", "time": "2025-05-26 12:00:00"},
            {"client_ip": "3.3.3.3", "time": "2025-05-26 12:01:00"},
        ],
    )
    stream = spark.readStream.schema("client_ip string, time timestamp").json(str(d))
    dim = spark.createDataFrame(
        [("1.1.1.1", "US"), ("2.2.2.2", "DE")], "client_ip string, country string"
    )
    out = enrich_stream(stream, dim, "client_ip")
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        r["client_ip"]: r["country"] for r in spark.sql("SELECT * FROM enriched").collect()
    }
    # left join: matched ip enriched, unmatched ip kept with null
    assert rows == {"1.1.1.1": "US", "3.3.3.3": None}


def test_merge_upsert_sink_latest_per_key(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    schema = "device string, seen timestamp, status string"

    def run_once():
        stream = spark.readStream.schema(schema).json(str(d))
        q = merge_upsert_sink(
            stream, target, keys=["device"], order_col="seen",
            checkpoint_dir=ckpt, trigger_once=True,
        )
        q.awaitTermination(120)

    _write_batch(
        d,
        "b0.json",
        [
            {"device": "a", "seen": "2025-05-26 12:00:00", "status": "up"},
            {"device": "b", "seen": "2025-05-26 12:00:00", "status": "up"},
        ],
    )
    run_once()
    got = {
        r["device"]: r["status"] for r in spark.read.parquet(target).collect()
    }
    assert got == {"a": "up", "b": "up"}

    # second run: newer record updates, older record is ignored, new key inserts
    _write_batch(
        d,
        "b1.json",
        [
            {"device": "a", "seen": "2025-05-26 13:00:00", "status": "down"},
            {"device": "b", "seen": "2025-05-26 11:00:00", "status": "stale"},
            {"device": "c", "seen": "2025-05-26 12:30:00", "status": "up"},
        ],
    )
    run_once()
    out = spark.read.parquet(target)
    got = {r["device"]: (r["status"], str(r["seen"])) for r in out.collect()}
    assert got == {
        "a": ("down", "2025-05-26 13:00:00"),
        "b": ("up", "2025-05-26 12:00:00"),
        "c": ("up", "2025-05-26 12:30:00"),
    }
    assert out.count() == 3  # exactly one row per key


def test_merge_upsert_tie_prefers_incoming(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    target = str(tmp_path / "target")
    schema = "device string, seen timestamp, status string"

    ckpt = str(tmp_path / "ckpt")

    def run(batch_name, rows):
        _write_batch(d, batch_name, rows)
        stream = spark.readStream.schema(schema).json(str(d))
        q = merge_upsert_sink(
            stream, target, keys=["device"], order_col="seen",
            checkpoint_dir=ckpt, trigger_once=True,
        )
        q.awaitTermination(120)

    run("b0.json", [{"device": "a", "seen": "2025-05-26 12:00:00", "status": "v1"}])
    # same key, same timestamp, different payload arriving in a LATER batch
    # (shared checkpoint, so only the new file is incoming): incoming wins
    run("b1.json", [{"device": "a", "seen": "2025-05-26 12:00:00", "status": "v2"}])
    got = {r["device"]: r["status"] for r in spark.read.parquet(target).collect()}
    assert got == {"a": "v2"}


def test_merge_upsert_rejects_bad_args(spark, tmp_path):
    stream = spark.readStream.schema("k string, seen timestamp").json(str(tmp_path))
    import pytest

    with pytest.raises(ValueError, match="key list"):
        merge_upsert_sink(stream, "/tmp/x", [], "seen", "/tmp/c")
    with pytest.raises(ValueError, match="cannot be a merge key"):
        merge_upsert_sink(stream, "/tmp/x", ["seen"], "seen", "/tmp/c")
