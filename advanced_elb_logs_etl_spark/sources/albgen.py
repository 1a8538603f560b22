"""Synthetic-ALB-line DataSource: a Spark 4 Python Data Source that
generates deterministic AWS ALB access-log lines directly inside executor
tasks — load-testing input for the parse path at any scale without staging
files.

    spark.dataSource.register(AlbGenDataSource)
    raw = (spark.read.format("albgen")
           .option("rows", 1_000_000).option("partitions", 64)
           .option("seed", 42).load())          # DataFrame[value: string]
    parsed = parse_alb_lines(raw)

Scale design: `rows` are split evenly across `partitions` InputPartitions;
each task seeds its own stdlib RNG with (seed, partition_index), so output
is deterministic per (rows, partitions, seed) triple, no partition talks to
another, and no driver-side materialization ever happens — this is the
Python-DataSource analog of `spark.read.text` over pre-staged gz files
(sources/elb.py reads the real thing; reference advanced_elb_logs_etl.py
:65-75,159-166 lists and downloads from S3).

The line layout mirrors the 30-field modern ALB format pinned by the
reference's own sample line (tests/test_advanced_elb_logs_etl.py:35-44),
including the trailing TID_ field the reference truncates, quoted
multi-token user agents, '-1' timeout sentinels, and occasional malformed
lines (arity < 29) so downstream drop-semantics (F1) get exercised.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_UAS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/137.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.4 Safari/605.1.15",
    "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
    "curl/8.5.0",
    "python-urllib/3.12",
]
_METHODS = ["GET", "GET", "GET", "POST", "PUT"]
_PATHS = ["/", "/api/items", "/api/users/42", "/static/app.js", "/health"]
_STATUSES = [200, 200, 200, 200, 301, 404, 500, 503]
_BASE_TS = datetime(2025, 5, 26, 0, 0, 0)


def _make_line(
    rng: random.Random,
    ts_base: datetime = _BASE_TS,
    ts_span_s: int = 86_400,
) -> str:
    ts = ts_base + timedelta(seconds=rng.randrange(ts_span_s), microseconds=rng.randrange(1_000_000))
    t = ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
    ip = f"10.{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(250)}"
    status = rng.choice(_STATUSES)
    ua = rng.choice(_UAS)
    method = rng.choice(_METHODS)
    path = rng.choice(_PATHS)
    timeout = rng.random() < 0.01
    rpt, tpt, resppt = (
        ("-1", "-1", "-1")
        if timeout
        else (
            f"{rng.random() * 0.005:.3f}",
            f"{rng.random() * 0.8:.3f}",
            f"{rng.random() * 0.002:.3f}",
        )
    )
    rb, sb = rng.randrange(40, 2000), rng.randrange(100, 50_000)
    url = f"https://app.example.com:443{path}"
    if rng.random() < 0.3:
        url += f"?page={rng.randrange(50)}"
    return (
        f"h2 {t} app/gen-lb/abc123 {ip}:{rng.randrange(1024, 65_536)} "
        f"172.31.0.1:80 {rpt} {tpt} {resppt} {status} {status} {rb} {sb} "
        f'"{method} {url} HTTP/2.0" "{ua}" '
        f"TLS_AES_128_GCM_SHA256 TLSv1.3 arn:aws:elb:tg/gen "
        f'"Root=1-{rng.randrange(1 << 32):08x}" "app.example.com" "session-reused" '
        f'{rng.randrange(3)} {t} "waf,forward" "-" "-" "172.31.0.1:80" '
        f'"{status}" "-" "-" TID_{rng.randrange(1 << 60):016x}'
    )


class _AlbGenPartition(InputPartition):
    def __init__(self, index: int, rows: int, seed: int, malformed_rate: float):
        self.index = index
        self.rows = rows
        self.seed = seed
        self.malformed_rate = malformed_rate


class _AlbGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.malformed_rate = float(options.get("malformed_rate", 0.002))
        # Validate here, not in partitions(): a bad option should surface as
        # a clear ValueError at load time, not a ZeroDivisionError (or
        # silently empty output) inside executor planning.
        if self.rows < 0:
            raise ValueError(f"albgen option rows must be >= 0, got {self.rows}")
        if self.num_partitions < 1:
            raise ValueError(
                f"albgen option partitions must be >= 1, got {self.num_partitions}"
            )
        if not (0.0 <= self.malformed_rate <= 1.0):
            raise ValueError(
                "albgen option malformed_rate must be in [0, 1], "
                f"got {self.malformed_rate}"
            )

    def partitions(self):
        base, extra = divmod(self.rows, self.num_partitions)
        return [
            _AlbGenPartition(i, base + (1 if i < extra else 0), self.seed, self.malformed_rate)
            for i in range(self.num_partitions)
        ]

    def read(self, partition: _AlbGenPartition):
        # Executor-side: a per-partition RNG keyed on (seed, index) makes the
        # whole dataset reproducible while partitions stay independent.
        rng = random.Random(f"{partition.seed}:{partition.index}")
        for _ in range(partition.rows):
            if rng.random() < partition.malformed_rate:
                yield ("h2 too short line",)
            else:
                yield (_make_line(rng),)


class _AlbGenStreamReader(SimpleDataSourceStreamReader):
    """Rate-source-style streaming variant: each micro-batch emits
    `rows_per_batch` lines whose event times advance by `batch_interval_s`
    per batch (so downstream watermarks progress). Offsets are plain batch
    counters; any offset range regenerates identically from (seed, batch),
    which is exactly the replayability contract exactly-once recovery needs
    (readBetweenOffsets after a restart re-yields the same rows)."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))
        self.batch_interval_s = int(options.get("batch_interval_s", 60))
        self.malformed_rate = float(options.get("malformed_rate", 0.0))

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def _batch_rows(self, batch: int):
        rng = random.Random(f"{self.seed}:stream:{batch}")
        base = _BASE_TS + timedelta(seconds=batch * self.batch_interval_s)
        for _ in range(self.rows_per_batch):
            if rng.random() < self.malformed_rate:
                yield ("h2 too short line",)
            else:
                yield (_make_line(rng, ts_base=base, ts_span_s=self.batch_interval_s),)

    def read(self, start: dict):
        b = start["batch"]
        # list-backed iterator: Spark's prefetch cache copy.copy()s the
        # iterator, which a generator cannot survive
        return iter(list(self._batch_rows(b))), {"batch": b + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple] = []
        for b in range(start["batch"], end["batch"]):
            rows.extend(self._batch_rows(b))
        return iter(rows)


class AlbGenDataSource(DataSource):
    """`format("albgen")` — deterministic synthetic ALB access-log lines.

    Batch options: rows (total), partitions, seed, malformed_rate.
    Streaming options: rows_per_batch, batch_interval_s, seed,
    malformed_rate (event time advances batch_interval_s per micro-batch).
    Schema: value string (same shape as `spark.read.text`)."""

    @classmethod
    def name(cls) -> str:
        return "albgen"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> DataSourceReader:
        return _AlbGenReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _AlbGenStreamReader(self.options)
