#!/usr/bin/env python
"""KMV scale wave (round 10 — "measure, don't guess"): the sketch's two
scale claims, measured at growing row AND distinct-domain scales.

Claims under test (operators/kmv.py module docstring):
1. kmv_build's shuffle carries the per-partition DISTINCT hash set (the
   map-side partial distinct), NOT the corpus — so shuffle records track
   min(distinct, rows) while the result stays k rows.
2. The ``prefilter`` knob (a prior epoch's theta) cuts that shuffle to
   ~k rows per partition — the production theta-sketch trick — while
   producing the IDENTICAL sketch.

Also measured: the Count-Min cm_estimate geometry-guard overhead
(ADVICE r10 guard: one extra bounded agg pass over the sketch lineage),
reported as guarded-vs-unguarded wall on a corpus-sized build, so the
check_geometry=False escape hatch has a number behind it.

Usage: python tools/scale_kmv_wave.py   (prints one JSON line per wave)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _executed_metric_sum(df, node_name: str, metric_key: str) -> int:
    """Sum a SQLMetric over executed-plan nodes (the
    tests/test_plan_quality.py helper, standalone copy for tool use)."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.nodeName() == "AdaptiveSparkPlan":
        plan = plan.executedPlan()
    total = 0

    def walk(node):
        nonlocal total
        if node.nodeName().startswith(node_name):
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == metric_key:
                    total += kv._2().value()
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))
        if "QueryStage" in node.nodeName():
            try:
                walk(node.plan())
            except Exception:
                pass

    walk(plan)
    return total


def main() -> int:
    from pyspark.sql import functions as F

    from advanced_elb_logs_etl_spark.operators import kmv
    from advanced_elb_logs_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_kmv_wave")
    spark.sparkContext.setLogLevel("ERROR")
    k = 256

    # warm JVM
    spark.range(1000).select(F.md5(F.col("id").cast("string"))).count()

    waves = [
        (1_000_000, 100_000),
        (10_000_000, 1_000_000),
        (50_000_000, 5_000_000),
    ]
    for rows, domain in waves:
        keys = spark.range(rows).select(
            (F.col("id") % domain).cast("string").alias("key")
        )
        t0 = time.perf_counter()
        sk = kmv.kmv_build(keys, k=k)
        got = sk.collect()
        wall = round(time.perf_counter() - t0, 3)
        shuffled = _executed_metric_sum(sk, "Exchange", "shuffleRecordsWritten")
        kth = max(r.h for r in got)
        est = kmv.kmv_estimate(
            spark.createDataFrame(got, "h long"), k=k
        ).collect()[0]
        # epoch-2 build: same data, prefilter = epoch-1 theta
        t0 = time.perf_counter()
        sk2 = kmv.kmv_build(keys, k=k, prefilter=kth + 1)
        got2 = sk2.collect()
        wall_pre = round(time.perf_counter() - t0, 3)
        shuffled_pre = _executed_metric_sum(
            sk2, "Exchange", "shuffleRecordsWritten"
        )
        print(
            json.dumps(
                {
                    "wave": "kmv_build",
                    "rows": rows,
                    "distinct": domain,
                    "wall_s": wall,
                    "sketch_rows": len(got),
                    "shuffle_records": shuffled,
                    "est_distinct": est.est_distinct,
                    "rel_err_pct": round(
                        100.0 * abs(est.est_distinct - domain) / domain, 2
                    ),
                    "prefilter_wall_s": wall_pre,
                    "prefilter_shuffle_records": shuffled_pre,
                    "prefilter_identical": sorted(r.h for r in got)
                    == sorted(r.h for r in got2),
                }
            ),
            flush=True,
        )

    # Count-Min geometry-guard overhead on a corpus-sized build
    from advanced_elb_logs_etl_spark.operators import cmsketch as cm

    keys = spark.range(10_000_000).select(
        (F.col("id") % 1_000_000).cast("string").alias("key")
    )
    sk = cm.cm_build(keys)
    probes = spark.createDataFrame(
        [(str(i),) for i in range(64)], "key string"
    )
    for guard in (True, False):
        t0 = time.perf_counter()
        cm.cm_estimate(sk, probes, check_geometry=guard).collect()
        print(
            json.dumps(
                {
                    "wave": "cm_guard_overhead",
                    "rows": 10_000_000,
                    "check_geometry": guard,
                    "wall_s": round(time.perf_counter() - t0, 3),
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
