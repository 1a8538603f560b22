"""Tests for the albgen Python DataSource: determinism, partitioning,
and end-to-end compatibility with the real ALB parser."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators.parse import parse_alb_lines
from advanced_elb_logs_etl_spark.sources.albgen import AlbGenDataSource


def _gen(spark, **opts):
    spark.dataSource.register(AlbGenDataSource)
    r = spark.read.format("albgen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_albgen_row_count_and_schema(spark):
    df = _gen(spark, rows=1000, partitions=7, seed=1)
    assert df.columns == ["value"]
    assert df.count() == 1000  # uneven split across 7 partitions still exact


def test_albgen_is_deterministic_per_seed(spark):
    a = sorted(r["value"] for r in _gen(spark, rows=300, partitions=4, seed=9).collect())
    b = sorted(r["value"] for r in _gen(spark, rows=300, partitions=4, seed=9).collect())
    c = sorted(r["value"] for r in _gen(spark, rows=300, partitions=4, seed=10).collect())
    assert a == b
    assert a != c


def test_albgen_parallelism(spark):
    df = _gen(spark, rows=100, partitions=5, seed=3)
    assert df.rdd.getNumPartitions() == 5


def test_albgen_lines_survive_the_real_parser(spark):
    """Generated lines must flow through parse_alb_lines: well-formed lines
    parse with non-null key fields; malformed ones are dropped (F1)."""
    df = _gen(spark, rows=2000, partitions=8, seed=5, malformed_rate=0.05)
    parsed = parse_alb_lines(df)
    n_parsed = parsed.count()
    assert 0 < n_parsed < 2000  # malformed lines dropped, rest kept
    assert parsed.filter(F.col("client_ip").isNull()).count() == 0
    assert parsed.filter(F.col("time").isNull()).count() == 0
    methods = {r["http_method"] for r in parsed.select("http_method").distinct().collect()}
    assert methods <= {"GET", "POST", "PUT"}
    # the -1 timeout sentinel parses as a valid -1.0 (P4 semantics)
    assert parsed.filter(F.col("request_processing_time") == -1.0).count() > 0


def test_albgen_stream_reader_replay_is_deterministic():
    """Offset-range replay (the exactly-once recovery path) must regenerate
    identical rows — no Spark needed, the reader is plain Python."""
    from advanced_elb_logs_etl_spark.sources.albgen import _AlbGenStreamReader

    r = _AlbGenStreamReader({"rows_per_batch": "20", "seed": "7"})
    first, off1 = r.read({"batch": 0})
    first = list(first)
    assert off1 == {"batch": 1} and len(first) == 20
    replay = list(r.readBetweenOffsets({"batch": 0}, {"batch": 1}))
    assert first == replay
    # distinct batches differ
    second = list(r.readBetweenOffsets({"batch": 1}, {"batch": 2}))
    assert second != first and len(second) == 20


def test_albgen_stream_end_to_end_through_parser(spark):
    """One availableNow micro-batch through the real parser: event times
    fall inside the batch's interval window."""
    spark.dataSource.register(AlbGenDataSource)
    stream = (spark.readStream.format("albgen")
              .option("rows_per_batch", 50).option("seed", 11)
              .option("batch_interval_s", 60).load())
    parsed = parse_alb_lines(stream)
    q = (parsed.writeStream.format("memory").queryName("albgen_stream")
         .outputMode("append").trigger(availableNow=True).start())
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT count(*) AS n, min(time) AS lo, max(time) AS hi FROM albgen_stream"
    ).collect()[0]
    assert rows["n"] == 50
    assert (rows["hi"] - rows["lo"]).total_seconds() < 61


def test_albgen_rejects_bad_options(spark):
    """Bad options surface as clear ValueErrors at load time, not as
    ZeroDivisionError/empty output inside executor planning."""
    import pytest

    for opts in ({"partitions": "0"}, {"rows": "-5"}, {"malformed_rate": "1.5"}):
        with pytest.raises(Exception) as exc:
            spark.read.format("albgen").options(**opts).load().count()
        assert "albgen option" in str(exc.value)
