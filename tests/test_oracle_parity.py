"""Differential check of every catalog query against its DuckDB oracle —
a local replica of the driver's t2 correctness gate (row count + column
names + order-insensitive value comparison).

DRIVER-EQUIVALENT FETCH (r11, shared with tools/oracle_sim.py): both
sides compare through the pandas/Arrow fetch path the driver uses —
Spark via toPandas(), DuckDB via .df() — with the full-precision repr
normalization.  The r10 postmortem: a fetchall()-based compare is
structurally blind to type-coercion divergence (DuckDB HUGEINT renders
int via fetchall but float64 via pandas), so two oracles rehearsed
green here and shipped driver-red twice.  The DESCRIBE type gate that
closes that class at authoring time runs as its own test below.

Runs at sf0.001 by default; set SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.01
to rehearse the exact driver configuration.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

from conftest import SF_ORACLE, REPO_ROOT

sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
from oracle_sim import _norm, _pdf_rows, type_gate  # noqa: E402

from advanced_elb_logs_etl_spark.plans.catalog import CATALOG  # noqa: E402
from advanced_elb_logs_etl_spark.sources.testdata import TABLES  # noqa: E402


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(spark, name):
    fn, sql = CATALOG[name]
    if sql is None:
        # rows-only check, mirroring the driver's weaker gate
        n = fn(spark, SF_ORACLE).count()
        assert n >= 0
        return

    spdf = fn(spark, SF_ORACLE).toPandas()
    spark_cols = list(spdf.columns)
    spark_rows = _pdf_rows(spdf)

    con = _duck(SF_ORACLE)
    dpdf = con.execute(sql).df()
    con.close()
    duck_cols = list(dpdf.columns)
    duck_rows = _pdf_rows(dpdf)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )

    order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    order_d = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    norm_s = sorted(tuple(_norm(r[i]) for i in order_s) for r in spark_rows)
    norm_d = sorted(tuple(_norm(r[i]) for i in order_d) for r in duck_rows)
    mismatches = [
        (a, b) for a, b in zip(norm_s, norm_d) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


def test_every_oracle_passes_the_type_gate():
    """Standing DESCRIBE type gate (VERDICT r10 item 2): no registered
    oracle may declare an output type outside the verified allowlist —
    HUGEINT/DECIMAL/LIST/... fail HERE, at authoring time, before the
    driver's pandas fetch can coerce them differently than Spark."""
    con = _duck(SF_ORACLE)
    oracles = {n: sql for n, (fn, sql) in CATALOG.items() if sql is not None}
    bad = type_gate(con, oracles)
    con.close()
    assert not bad, bad
