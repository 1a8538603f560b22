"""Differential check of every catalog query against its DuckDB oracle —
a local replica of the driver's t2 correctness gate (row count + column
names + order-insensitive value comparison).

Runs at sf0.001 by default; set SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.01
to rehearse the exact driver configuration.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from conftest import SF_ORACLE

from advanced_elb_logs_etl_spark.plans.catalog import CATALOG
from advanced_elb_logs_etl_spark.sources.testdata import TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(spark, name):
    fn, sql = CATALOG[name]
    if sql is None:
        # rows-only check, mirroring the driver's weaker gate
        n = fn(spark, SF_ORACLE).count()
        assert n >= 0
        return

    sdf = fn(spark, SF_ORACLE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(SF_ORACLE)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )

    order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    order_d = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    norm_s = sorted(tuple(_norm_cell(r[i]) for i in order_s) for r in spark_rows)
    norm_d = sorted(tuple(_norm_cell(r[i]) for i in order_d) for r in duck_rows)
    mismatches = [
        (a, b) for a, b in zip(norm_s, norm_d) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"
