"""Readers for the driver's synthetic parquet tables (TESTDATA.md).

The tables are TPC-H-ish (region nation customer supplier part orders
lineitem) plus ``events`` (keyed event stream), ``documents`` (text corpus)
and ``embeddings`` (vector table).

Timestamp normalization: the files store TIMESTAMP(NANOS) (events.ts) and
TIMESTAMP(MICROS, ntz) (lineitem/orders dates). Spark has no nanosecond
timestamp type, so we read nanos as long (spark.sql.legacy.parquet.nanosAsLong)
and convert to a microsecond TimestampType instant explicitly. All timestamps
are instants under a UTC session — identical wall-clock to what DuckDB reads
from the same files, which is what the correctness oracle compares against.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table, normalizing timestamp physical encodings.

    Column pruning and predicate pushdown stay intact: the normalization is a
    per-column projection on top of the parquet scan, so Catalyst still
    pushes filters on non-timestamp columns into the scan.
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    exprs = []
    for field in df.schema.fields:
        col = F.col(field.name)
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            # nanos since epoch (nanosAsLong) -> micros instant. Integer DIV:
            # float division would lose sub-millisecond precision at 1e18 ns.
            exprs.append(
                F.timestamp_micros(F.expr(f"CAST(`{field.name}` DIV 1000 AS BIGINT)")).alias(
                    field.name
                )
            )
        elif isinstance(field.dataType, T.TimestampNTZType):
            # naive micros: reinterpret as UTC instant (session tz is UTC)
            exprs.append(col.cast("timestamp").alias(field.name))
        else:
            exprs.append(col)
    return df.select(*exprs)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
