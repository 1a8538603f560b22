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
