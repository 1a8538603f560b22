#!/usr/bin/env python
"""Pairwise-intersection scale wave ("measure, don't guess"): the
kmv_pairwise_intersect claim — a year-long daily retention matrix from
per-day sketches costs k-row joins per pair, while the exact answer is
a corpus self-join that re-pays on every ask.

Geometry: 365 "days", 20k users active per day with 75% day-over-day
carryover (true consecutive overlap 15k), ~7.3M rows total.

Usage: python tools/scale_pairwise.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    from advanced_elb_logs_etl_spark.operators import kmv
    from advanced_elb_logs_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_pairwise")
    spark.sparkContext.setLogLevel("ERROR")
    days, per_day, roll, k = 365, 20_000, 5_000, 256

    # day d's users: ids d*roll .. d*roll + per_day (75% overlap with d+1)
    base = spark.range(days * per_day).select(
        (F.col("id") / per_day).cast("long").alias("day_no"),
        (
            (F.col("id") / per_day).cast("long") * roll
            + F.col("id") % per_day
        ).cast("string").alias("key"),
    )
    t0 = time.perf_counter()
    sk = kmv.kmv_build_grouped(base, ["day_no"], "key", k=k).localCheckpoint(
        eager=True
    )
    wall_build = round(time.perf_counter() - t0, 3)
    n_state = sk.count()

    pairs = spark.range(days - 1).select(
        F.col("id").alias("g1"), (F.col("id") + 1).alias("g2")
    )
    t0 = time.perf_counter()
    est = {
        (r.g1, r.g2): r.est_intersect
        for r in kmv.kmv_pairwise_intersect(sk, "day_no", pairs, k=k).collect()
    }
    wall_pairwise = round(time.perf_counter() - t0, 3)

    # the exact lane this replaces: corpus self-join on key across
    # consecutive days
    a = base.select(F.col("day_no").alias("g1"), "key")
    b = base.select((F.col("day_no") - 1).alias("g1"), "key")
    t0 = time.perf_counter()
    exact = {
        (r.g1, r.g1 + 1): r.cnt
        for r in a.join(b, ["g1", "key"])
        .groupBy("g1")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    wall_exact = round(time.perf_counter() - t0, 3)

    errs = [
        abs(est[p] - exact[p]) / exact[p] for p in est if p in exact
    ]

    # the ALL-PAIRS lane (the full 365x365 overlap matrix, 66,430
    # ordered pairs): sketch cost stays pairs x k-row joins; the exact
    # lane's cost is sum over keys of days_per_key^2 — structurally
    # quadratic in co-occurrence, catastrophic when populations overlap
    # heavily (not run here; the consecutive lane above already prices
    # one exact ask)
    all_pairs = (
        spark.range(days)
        .select(F.col("id").alias("g1"))
        .crossJoin(spark.range(days).select(F.col("id").alias("g2")))
        .filter(F.col("g1") < F.col("g2"))
    )
    t0 = time.perf_counter()
    n_all = kmv.kmv_pairwise_intersect(sk, "day_no", all_pairs, k=k).count()
    wall_all_pairs = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "wave": "pairwise_retention",
                "days": days,
                "rows": days * per_day,
                "k": k,
                "n_pairs": len(est),
                "sketch_state_rows": n_state,
                "wall_grouped_build_s": wall_build,
                "wall_pairwise_364_estimates_s": wall_pairwise,
                "wall_exact_self_join_s": wall_exact,
                "true_overlap_per_pair": per_day - roll,
                "mean_rel_err_pct": round(100.0 * sum(errs) / len(errs), 2),
                "max_rel_err_pct": round(100.0 * max(errs), 2),
                "all_pairs_n": n_all,
                "wall_all_pairs_estimates_s": wall_all_pairs,
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
