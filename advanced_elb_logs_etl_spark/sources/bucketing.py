"""Bucketed-table support: pre-shuffle fact tables once at write time so
every later equi-join/aggregation on the bucket key is exchange-free.

At 100 TB the dominant recurring cost of the log pipeline is re-shuffling
the fact table by `client_ip` (windows) or join keys. Writing the cleaned
logs BUCKETED by that key moves the shuffle to ingest time: two tables
bucketed the same way sort-merge-join with ZERO Exchange, and a groupBy on
the bucket key skips its shuffle too (asserted in
tests/test_plan_quality.py::test_bucketed_join_no_shuffle).

Bucketing uses the session catalog (saveAsTable) — on a cluster that's the
metastore; locally it's spark.sql.warehouse.dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    num_buckets: int = 32,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table.

    num_buckets sizing: target ~128-256 MB per bucket file at the expected
    table size; too few buckets caps join parallelism, too many makes small
    files. Sorting within buckets makes the downstream sort-merge join skip
    its sort as well.
    """
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).bucketBy(num_buckets, *cols)
    if sort_by is not None:
        sort_cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
