#!/usr/bin/env python
"""Full-catalog driver-gate rehearsal: run EVERY catalog query on a
vanilla SparkSession against its DuckDB oracle at a given sf (default
sf0.01 — the driver's correctness configuration) and record per-query
rows/schema/value-hash matches.

This is the repo-reproducible form of the per-round "front-50
simulation": the driver's own CORRECTNESS_r{N}.json covers only the
50-query window, so freshness of the other ~150 signals rests on this
tool's output (tools/oracle_sim_latest.json, committed per round).

Usage: python tools/oracle_sim.py [--limit N] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _norm(v):
    """Value normalization for the cross-engine hash.

    Floats use FULL precision (repr = shortest round-trip string, 17
    significant digits when needed) so this rehearsal is at least as
    strict as the driver's gate on every type: a query only passes here
    if its doubles are IEEE-bit-identical across engines.  (Round-9
    postmortem: the old %.10g normalization was WEAKER than the driver
    and let two derived-DOUBLE columns ship rehearsal-green but
    driver-red.  Policy since: registered outputs are integer/decimal
    exact or explicitly fixed-scale-rounded on both sides; any float
    column must survive full-precision hashing here.)
    """
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=0, help="first N queries (0 = all)")
    ap.add_argument(
        "--out", default=os.path.join(REPO, "tools", "oracle_sim_latest.json")
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
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", args.driver_memory)
        .config("spark.driver.maxResultSize", "4g")
        .getOrCreate()
    )
    import __spark_entry__ as entry
    from advanced_elb_logs_etl_spark.sources.testdata import TABLES

    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    names = list(qs)
    if args.limit:
        names = names[: args.limit]
    results: dict[str, dict] = {}
    n_bad = 0
    for i, name in enumerate(names):
        try:
            sdf = qs[name](spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok_schema = sorted(scols) == sorted(dcols)
            ok_rows = len(srows) == len(drows)
            osd = sorted(range(len(scols)), key=lambda j: scols[j])
            odd = sorted(range(len(dcols)), key=lambda j: dcols[j])
            ns = sorted(tuple(_norm(r[j]) for j in osd) for r in srows)
            nd = sorted(tuple(_norm(r[j]) for j in odd) for r in drows)
            ok_hash = ns == nd
            ok = ok_rows and ok_schema and ok_hash
            results[name] = {
                "rows_match": ok_rows,
                "schema_match": ok_schema,
                "hash_match": ok_hash,
                "spark_rows": len(srows),
                "err": None,
            }
        except Exception as e:  # pragma: no cover - diagnostic path
            ok = False
            results[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
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
