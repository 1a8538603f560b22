#!/usr/bin/env python
"""Quantile-sketch scale wave ("measure, don't guess"): the module's
scale claims, measured at growing row scales.

Claims under test (operators/qsketch.py module docstring):
1. q_build is one TakeOrdered pass — NO Exchange, no global sort; wall
   grows ~linearly with rows while the sketch stays k rows.
2. Quantile reads from the k-row sketch are flat (driver-light) while
   the exact percentile's cost grows with the corpus — the reason the
   sketch exists.
3. q_range_boundaries splits a corpus into near-equal ranges within the
   documented rank band, with shuffle-free assignment.

Usage: python tools/scale_qsketch.py   (prints one JSON line per wave)
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

    from advanced_elb_logs_etl_spark.operators import qsketch
    from advanced_elb_logs_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_qsketch")
    spark.sparkContext.setLogLevel("ERROR")
    k = 1024

    # warm JVM
    spark.range(1000).select(F.md5(F.col("id").cast("string"))).count()

    for rows in (1_000_000, 10_000_000, 50_000_000):
        df = spark.range(rows).select(
            F.col("id"),
            ((F.col("id") * 7919) % rows).cast("double").alias("v"),
        )
        t0 = time.perf_counter()
        sk = qsketch.q_build(df, "v", "id", k=k)
        got = sk.collect()
        wall_build = round(time.perf_counter() - t0, 3)
        shuffled = _executed_metric_sum(sk, "Exchange", "shuffleRecordsWritten")
        sample = spark.createDataFrame(got, "h long, v double")
        t0 = time.perf_counter()
        est = {
            r.p_micro: r.est_value
            for r in qsketch.q_quantiles(sample, [0.5, 0.99], k=k).collect()
        }
        wall_read = round(time.perf_counter() - t0, 3)
        # the exact lane exists to price what the sketch avoids; at 50M
        # it costs minutes (the point is made at 1M/10M) — skip it there
        if rows <= 10_000_000:
            t0 = time.perf_counter()
            exact = df.agg(
                F.expr("percentile(v, array(0.5, 0.99))").alias("p")
            ).collect()[0].p
            wall_exact = round(time.perf_counter() - t0, 3)
        else:
            exact, wall_exact = [None, None], None
        # v is a permutation of 0..rows-1: true rank of x is (x+1)/rows
        print(
            json.dumps(
                {
                    "wave": "q_build",
                    "rows": rows,
                    "k": k,
                    "wall_build_s": wall_build,
                    "sketch_rows": len(got),
                    "shuffle_records": shuffled,
                    "wall_sketch_read_s": wall_read,
                    "wall_exact_percentile_s": wall_exact,
                    "median_rank_err_pct": round(
                        100.0 * abs((est[500_000] + 1) / rows - 0.5), 3
                    ),
                    "p99_rank_err_pct": round(
                        100.0 * abs((est[990_000] + 1) / rows - 0.99), 3
                    ),
                    "exact_median": exact[0],
                }
            ),
            flush=True,
        )

    # range-boundary balance at 10M rows, 32 ranges: the rank band is
    # ABSOLUTE (3*sqrt(1/4k) points), so balancing n ranges to a
    # relative tolerance needs k ~ (3*n/(2*tol))^2 — measured at two k
    # to show the lever (k = 65536 is still ~0.7% of this corpus and a
    # vanishing fraction of 100 TB)
    import math as _math

    rows, n_ranges = 10_000_000, 32
    df = spark.range(rows).select(
        F.col("id"), ((F.col("id") * 7919) % rows).cast("double").alias("v")
    )
    for kr in (1024, 65536):
        sk = qsketch.q_build(df, "v", "id", k=kr)
        bounds = [
            r.value
            for r in sorted(
                qsketch.q_range_boundaries(sk, n_ranges, k=kr).collect(),
                key=lambda r: r.boundary_no,
            )
        ]
        t0 = time.perf_counter()
        assigned = qsketch.assign_range_ids(df, "v", bounds)
        sizes = {
            r.range_id: r.cnt
            for r in assigned.groupBy("range_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        wall_assign = round(time.perf_counter() - t0, 3)
        devs_pts = [
            abs(c / rows - 1.0 / n_ranges) for c in sizes.values()
        ]
        band_pts = 3 * _math.sqrt(0.25 / kr)
        print(
            json.dumps(
                {
                    "wave": "range_boundaries",
                    "rows": rows,
                    "n_ranges": n_ranges,
                    "k": kr,
                    "wall_assign_and_count_s": wall_assign,
                    "max_range_dev_rank_pts_pct": round(
                        100.0 * max(devs_pts), 3
                    ),
                    "rank_band_3sigma_pct": round(100.0 * band_pts, 3),
                    "max_dev_within_band": max(devs_pts) <= band_pts,
                    "max_over_ideal_ratio": round(
                        max(sizes.values()) / (rows / n_ranges), 3
                    ),
                    "n_nonempty_ranges": len(sizes),
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
