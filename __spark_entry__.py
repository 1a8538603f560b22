"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``advanced_elb_logs_etl_spark`` package;
this module just exposes the catalog.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from advanced_elb_logs_etl_spark.plans import catalog as _catalog
from advanced_elb_logs_etl_spark.session import apply_runtime_confs

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-style pricing summary over lineitem — one partial+final hash
    aggregation, the canonical 'does the whole stack work' query.
    """
    apply_runtime_confs(spark)
    return _catalog.q_pricing_summary(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (and the
    LLM-data-pipeline extensions). Each callable takes (spark, sf_dir) and
    returns a DataFrame with columns aliased to match ``oracle_sql``."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query. Keys absent here (but
    present in queries()) are genuinely non-SQL-expressible operators that
    get the driver's weaker rows-only check."""
    return _catalog.oracle_sql()
