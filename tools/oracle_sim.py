#!/usr/bin/env python
"""Full-catalog driver-gate rehearsal: run EVERY catalog query on a
vanilla SparkSession against its DuckDB oracle at a given sf (default
sf0.01 — the driver's correctness configuration) and record per-query
rows/schema/value-hash matches.

This is the repo-reproducible form of the per-round "front-50
simulation": the driver's own CORRECTNESS_r{N}.json covers only the
50-query window, so freshness of the other ~150 signals rests on this
tool's output (tools/oracle_sim_latest.json, committed per round).

DRIVER-EQUIVALENCE POSTMORTEM (r9 + r10 → fixed r11). Two rounds in a
row this rehearsal passed queries the driver failed, each time because
the rehearsal was weaker than the gate in a dimension value-level
strictness cannot see:

  r9  — float PRECISION: the old %.10g normalization hid last-ulp
        divergence in derived DOUBLE columns.  Fix: repr() (shortest
        round-trip, full precision).
  r10 — fetch-path TYPE COERCION: the old `fetchall()` DuckDB fetch
        rendered HUGEINT (DuckDB's silent widening of sum(BIGINT)) as a
        Python int ("3"), while the driver's pandas/Arrow fetch renders
        it float64 ("3.0") — so two oracles with un-cast sums rehearsed
        green and shipped driver-red, twice, with values that were
        numerically identical.

Fixes, both structural:
  1. BOTH sides now fetch through the pandas/Arrow path the driver
     uses: Spark via `toPandas()` (Arrow enabled), DuckDB via `.df()`.
     Whatever dtype coercion the driver's comparison sees (NULL int →
     float64 NaN, HUGEINT → float64, DATE → midnight Timestamp), this
     tool now sees identically.
  2. A standing DESCRIBE type gate: every oracle's declared output
     types must be in _ALLOWED_ORACLE_TYPES (BIGINT, DOUBLE, VARCHAR,
     BOOLEAN, INTEGER, DATE, TIMESTAMP).  Anything else — HUGEINT,
     DECIMAL, LIST, ... — fails the query HERE, at authoring time,
     before the driver ever sees it.

Usage: python tools/oracle_sim.py [--limit N] [--sf-dir DIR]
       python tools/oracle_sim.py --type-gate-only   (fast, no Spark)
"""

from __future__ import annotations

import argparse
import datetime
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Declared DuckDB output types every registered oracle may emit.  The
# r11 sweep of all 207 oracles found exactly these (and two HUGEINTs —
# the r9/r10 driver-reds — since cast away).  Keep this list tight: a
# new type only gets added together with a verified round-trip through
# BOTH pandas fetch paths.
_ALLOWED_ORACLE_TYPES = {
    "BIGINT",
    "DOUBLE",
    "VARCHAR",
    "BOOLEAN",
    "INTEGER",
    "DATE",
    "TIMESTAMP",
}


def _norm(v):
    """Value normalization for the cross-engine hash, applied AFTER the
    pandas fetch on both sides (so both sides have already been through
    the same dtype coercions the driver's comparison sees).

    - numpy scalars are unboxed first (.item()) so repr() is the plain
      Python repr, not numpy's.
    - NULL/NaN/NaT collapse to one token: in the pandas path a SQL NULL
      in a numeric column IS NaN, on both engines, so distinguishing
      them here would be stricter than any comparison the pandas path
      can express.
    - floats use repr (shortest round-trip string — full precision; the
      r9 postmortem fix, kept).
    - midnight tz-naive timestamps collapse to their date: DuckDB's
      pandas fetch renders DATE as a midnight Timestamp while Spark's
      Arrow fetch keeps datetime.date objects.
    """
    import numpy as np

    if isinstance(v, np.generic):
        v = v.item()
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NULL" if math.isnan(v) else repr(v)
    import pandas as pd

    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None and (v.hour, v.minute, v.second, v.microsecond) == (
            0,
            0,
            0,
            0,
        ):
            return v.strftime("%Y-%m-%d")
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def _pdf_rows(pdf):
    """Row tuples from a pandas frame, numpy scalars unboxed lazily by
    _norm.  dtype=object keeps pandas' Timestamp/None boxing."""
    return [tuple(r) for r in pdf.to_numpy(dtype=object)]


def type_gate(con, oracles) -> dict[str, str]:
    """DESCRIBE every oracle; return {name: offending 'col: TYPE'} for
    any declared output type outside _ALLOWED_ORACLE_TYPES."""
    bad: dict[str, str] = {}
    for name, sql in oracles.items():
        try:
            rows = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:  # pragma: no cover - diagnostic path
            bad[name] = f"DESCRIBE failed: {str(e)[:120]}"
            continue
        offending = [
            f"{col}: {typ}"
            for col, typ, *_ in rows
            if typ not in _ALLOWED_ORACLE_TYPES
        ]
        if offending:
            bad[name] = "; ".join(offending)
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=0, help="first N queries (0 = all)")
    ap.add_argument(
        "--names",
        default="",
        help="comma-separated query names to rehearse (focused re-check "
        "of specific entries; unknown names error loudly)",
    )
    ap.add_argument(
        "--out", default=os.path.join(REPO, "tools", "oracle_sim_latest.json")
    )
    ap.add_argument(
        "--type-gate-only",
        action="store_true",
        help="run only the DESCRIBE type gate (no Spark; seconds, not minutes)",
    )
    ap.add_argument(
        "--driver-memory",
        default="8g",
        help="JVM driver heap (the tool collects FULL results in one "
        "process beside DuckDB; the 1g Spark default OOMs on the "
        "O(input)-row queries at sf0.1 — found by the r10 sf-robustness "
        "sweep, 163/207 green then cascading Py4J failures)",
    )
    args = ap.parse_args()

    import duckdb

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry
    from advanced_elb_logs_etl_spark.sources.testdata import TABLES

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    gate_bad = type_gate(con, oracles)
    for name, why in sorted(gate_bad.items()):
        print(f"TYPE-GATE FAIL {name}: {why}", flush=True)
    print(
        f"type gate: {len(oracles) - len(gate_bad)}/{len(oracles)} oracles "
        f"within {sorted(_ALLOWED_ORACLE_TYPES)}",
        flush=True,
    )
    if args.type_gate_only:
        return 1 if gate_bad else 0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", args.driver_memory)
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    qs = entry.queries()

    default_out = os.path.join(REPO, "tools", "oracle_sim_latest.json")
    if (args.names or args.limit) and args.out == default_out:
        # a partial run must never overwrite the committed full-catalog
        # record the judge reads
        args.out = os.path.join(REPO, "tools", "oracle_sim_focused.json")
    names = list(qs)
    if args.names:
        wanted = [n.strip() for n in args.names.split(",") if n.strip()]
        unknown = [n for n in wanted if n not in qs]
        if unknown:
            print(f"unknown query names: {unknown}", file=sys.stderr)
            return 2
        names = wanted
    if args.limit:
        names = names[: args.limit]
    results: dict[str, dict] = {}
    n_bad = 0
    for i, name in enumerate(names):
        try:
            sdf = qs[name](spark, args.sf_dir)
            spdf = sdf.toPandas()
            scols = list(spdf.columns)
            srows = _pdf_rows(spdf)
            dpdf = con.execute(oracles[name]).df()
            dcols = list(dpdf.columns)
            drows = _pdf_rows(dpdf)
            ok_schema = sorted(scols) == sorted(dcols)
            ok_rows = len(srows) == len(drows)
            osd = sorted(range(len(scols)), key=lambda j: scols[j])
            odd = sorted(range(len(dcols)), key=lambda j: dcols[j])
            ns = sorted(tuple(_norm(r[j]) for j in osd) for r in srows)
            nd = sorted(tuple(_norm(r[j]) for j in odd) for r in drows)
            ok_hash = ns == nd
            ok_type = name not in gate_bad
            ok = ok_rows and ok_schema and ok_hash and ok_type
            results[name] = {
                "rows_match": ok_rows,
                "schema_match": ok_schema,
                "hash_match": ok_hash,
                "type_gate": ok_type,
                "spark_rows": len(srows),
                "err": None,
            }
        except Exception as e:  # pragma: no cover - diagnostic path
            ok = False
            results[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "type_gate": name not in gate_bad,
                "spark_rows": 0,
                "err": str(e)[:200],
            }
        if not ok:
            n_bad += 1
        print(
            f"{i + 1:3d}/{len(names)} {name}: "
            f"{'OK' if ok else 'FAIL'}",
            flush=True,
        )
    with open(args.out, "w") as fh:
        json.dump({"sf_dir": args.sf_dir, "results": results}, fh, indent=1)
    print(f"green: {len(names) - n_bad}/{len(names)} -> {args.out}")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
