"""The rehearsal harness's own comparison primitives (tools/oracle_sim):
_norm and type_gate are gate infrastructure — a bug here could pass a
red query or fail a green one — so their contracts are pinned directly,
no Spark session needed."""

from __future__ import annotations

import datetime
import math
import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from oracle_sim import _ALLOWED_ORACLE_TYPES, _norm, _pdf_rows, type_gate  # noqa: E402


def test_norm_unboxes_numpy_and_keeps_full_float_precision():
    assert _norm(np.int64(3)) == "3"
    assert _norm(3) == "3"
    assert _norm(np.float64(3.0)) == "3.0"  # the r10 HUGEINT signature
    # full precision (r9 policy): shortest round-trip repr, not %.10g
    v = 0.1 + 0.2
    assert _norm(v) == "0.30000000000000004"
    assert _norm(np.float64(v)) == "0.30000000000000004"
    assert _norm(True) == "True"
    assert _norm(np.bool_(True)) == "True"
    assert _norm("x") == "x"


def test_norm_null_tokens_are_engine_symmetric():
    """In the pandas path a SQL NULL in a numeric column IS NaN on both
    engines — None, float nan, and NaT must collapse to one token."""
    assert _norm(None) == "NULL"
    assert _norm(float("nan")) == "NULL"
    assert _norm(np.float64("nan")) == "NULL"
    assert _norm(pd.NaT) == "NULL"
    assert not math.isnan(0.0) and _norm(0.0) == "0.0"  # zero is not null


def test_norm_collapses_midnight_timestamps_to_dates():
    """DuckDB's pandas fetch renders DATE as a midnight Timestamp while
    Spark's Arrow fetch keeps datetime.date — they must normalize
    identically; a real midnight-bearing TIMESTAMP column collapses the
    same way on BOTH engines, so the compare stays symmetric."""
    assert _norm(datetime.date(2024, 1, 15)) == "2024-01-15"
    assert _norm(pd.Timestamp("2024-01-15 00:00:00")) == "2024-01-15"
    assert (
        _norm(pd.Timestamp("2024-01-15 10:30:00"))
        == "2024-01-15T10:30:00"
    )
    assert (
        _norm(datetime.datetime(2024, 1, 15, 10, 30)) == "2024-01-15T10:30:00"
    )


def test_pdf_rows_keeps_pandas_boxing():
    pdf = pd.DataFrame(
        {"a": [1, None], "b": ["x", None], "d": [pd.Timestamp("2024-01-01"), pd.NaT]}
    )
    rows = _pdf_rows(pdf)
    assert len(rows) == 2 and len(rows[0]) == 3
    # int column with NULL became float64 — exactly what the driver sees
    assert _norm(rows[0][0]) == "1.0"
    assert _norm(rows[1][0]) == "NULL"
    assert _norm(rows[1][1]) == "NULL"
    assert _norm(rows[0][2]) == "2024-01-01"
    assert _norm(rows[1][2]) == "NULL"


def test_type_gate_flags_hugeint_and_passes_allowlist():
    """The r10 root-cause class, pinned: an un-cast sum(BIGINT) oracle
    fails the gate; the cast form passes."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW t AS SELECT * FROM (VALUES (1), (2)) v(x)")
    bad = type_gate(
        con,
        {
            "uncast": "SELECT sum(x) AS s FROM t",
            "cast_ok": "SELECT sum(x)::BIGINT AS s FROM t",
            "decimal_bad": "SELECT 1.5::DECIMAL(10,2) AS d",
            "list_bad": "SELECT [1, 2] AS l",
            "broken_sql": "SELECT FROM nowhere",
        },
    )
    assert set(bad) == {"uncast", "decimal_bad", "list_bad", "broken_sql"}
    assert "HUGEINT" in bad["uncast"]
    assert "DESCRIBE failed" in bad["broken_sql"]
    # the allowlist itself stays tight — additions need a verified
    # round-trip through BOTH pandas fetch paths (module docstring)
    assert _ALLOWED_ORACLE_TYPES == {
        "BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "INTEGER", "DATE",
        "TIMESTAMP",
    }
