#!/usr/bin/env python
"""Per-query shuffle/spill byte audit (round 9 — "measure, don't guess").

EXPLAIN.md pins plan SHAPES; this tool measures the bytes those shapes
actually move.  Each selected catalog query runs under its own Spark
job group in a session with the event log enabled; the log is then
parsed and stage metrics are attributed to queries through the
job-group property, yielding per-query totals for input read, shuffle
write, shuffle read, and spill — the quantities that decide whether a
plan survives a 100x scale-up (a query whose shuffle write ~= its input
read is moving the corpus; one whose shuffle is orders of magnitude
smaller is moving aggregates).

Usage: python tools/query_metrics.py [--sf-dir DIR] [--queries a,b,...]
Defaults to the standing bench heavies.

METRIC RELIABILITY (validated before the SCALE.md table shipped):
shuffle write/read and spill come from the shuffle writers and are
exact.  "input read" is exact for TEXT scans but UNDER-REPORTED by the
vectorized parquet reader in this Spark build — probe: a 2-column scan
of sf0.1 lineitem (l_quantity+l_returnflag, parquet chunks ~600 KB,
600k rows) reports Bytes Read = 17,841.  Treat parquet-lane input
cells as lower bounds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "pricing_summary",
    "hourly_agg",
    "alb_parse_roundtrip",
    "sessionize",
    "triangle_census",
    "khop_reachability",
    "curate_corpus",
    "neardup_components",
    "alternating_components",
    "semantic_dedup_corpus",
    "lm_perplexity_filter",
    "bm25_topk",
]


def _fmt(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024 or unit == "GB":
            return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
        n /= 1024.0
    return f"{n:.1f}GB"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    log_dir = tempfile.mkdtemp(prefix="sparkgraft_eventlog_")

    from pyspark.sql import SparkSession

    from advanced_elb_logs_etl_spark.session import RUNTIME_CONFS, apply_runtime_confs

    builder = (
        SparkSession.builder.appName("query-metrics")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{log_dir}")
        # plain-text logs: the parser below reads them directly, and this
        # container has no zstd binding outside the JVM
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = apply_runtime_confs(builder.getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from advanced_elb_logs_etl_spark.plans.catalog import CATALOG

    sc = spark.sparkContext
    ran = []
    for name in names:
        if name not in CATALOG:
            print(f"skip unknown query {name}", file=sys.stderr)
            continue
        sc.setJobGroup(name, name)
        try:
            CATALOG[name][0](spark, args.sf_dir).collect()
            ran.append(name)
        finally:
            sc.setJobGroup("", "")
    app_id = sc.applicationId
    spark.stop()  # flush the event log

    # --- parse the event log: job-group -> stages -> metric sums ---------
    # Spark 4 default: a rolling-log DIRECTORY eventlog_v2_<appId> holding
    # events_N_<appId> files; older layouts write a single <appId> file.
    log_files: list[str] = []
    single = os.path.join(log_dir, app_id)
    v2_dir = os.path.join(log_dir, f"eventlog_v2_{app_id}")
    if os.path.isfile(single):
        log_files = [single]
    elif os.path.isdir(v2_dir):
        log_files = sorted(
            os.path.join(v2_dir, f)
            for f in os.listdir(v2_dir)
            if f.startswith("events_")
        )
    if not log_files:
        raise FileNotFoundError(f"no event log for {app_id} under {log_dir}")
    stage_group: dict[int, str] = {}
    totals: dict[str, dict[str, int]] = {
        n: dict(inp=0, sw=0, sr=0, spill_mem=0, spill_disk=0, tasks=0)
        for n in ran
    }
    def _lines():
        for p in log_files:
            with open(p) as fh:
                yield from fh

    if log_files:
        for line in _lines():
            ev = json.loads(line)
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                group = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                if group in totals:
                    for sid in ev.get("Stage IDs", []):
                        stage_group[sid] = group
            elif kind == "SparkListenerTaskEnd":
                g = stage_group.get(ev.get("Stage ID"))
                if g is None:
                    continue
                m = ev.get("Task Metrics") or {}
                t = totals[g]
                t["tasks"] += 1
                t["inp"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
                t["sw"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                srm = m.get("Shuffle Read Metrics") or {}
                t["sr"] += srm.get("Local Bytes Read", 0) + srm.get(
                    "Remote Bytes Read", 0
                )
                t["spill_mem"] += m.get("Memory Bytes Spilled", 0)
                t["spill_disk"] += m.get("Disk Bytes Spilled", 0)

    print(f"sf_dir={args.sf_dir}  (bytes summed over all tasks per query's job group)\n")
    print("| query | input read | shuffle write | shuffle read | spill mem | spill disk | tasks |")
    print("|---|---|---|---|---|---|---|")
    for n in ran:
        t = totals[n]
        print(
            f"| {n} | {_fmt(t['inp'])} | {_fmt(t['sw'])} | {_fmt(t['sr'])} "
            f"| {_fmt(t['spill_mem'])} | {_fmt(t['spill_disk'])} | {t['tasks']} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
