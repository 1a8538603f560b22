#!/usr/bin/env python
"""Streaming-state scale wave: heavy hitters + histogram replays at
10x/50x events (round 9).

The r7/r8 10x streaming rows were FLAT — fixed per-batch orchestration
(staging, checkpoints, store writes) dominated, so the data-linear term
was invisible and the bounded-state claim untested past 1M rows.  This
wave pushes the two mergeable-summary operators to 50x (50M events) and
records, per multiplier: replay wall, the data-linear slope between
decades, and the STATE SIZE actually persisted (the bounded-state
contract, measured — C+sentinel rows for Misra-Gries, O(octaves*S)
bucket rows for the histogram, independent of stream length).

Usage: python tools/scale_stream_wave.py [--sf-dir DIR] [--mults 10,50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mults", default="10,50")
    ap.add_argument("--capacity", type=int, default=64)
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    from pyspark.sql import functions as F

    from advanced_elb_logs_etl_spark.session import get_spark
    from advanced_elb_logs_etl_spark.sources.testdata import load_table
    from advanced_elb_logs_etl_spark.streaming import heavyhitters, histogram

    spark = get_spark(app_name="stream-wave")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, args.sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    n_base = base.count()
    print(f"base: {n_base} events ({args.sf_dir}); capacity={args.capacity}, "
          "3 micro-batches per replay, warm JVM\n")
    print("| mult | rows | MG wall | MG state rows | MG exact parity | hist wall | hist state rows |")
    print("|---|---|---|---|---|---|---|")

    for mult in mults:
        ev = (
            base.crossJoin(
                F.broadcast(spark.range(mult).select(F.col("id").alias("_r")))
            )
            .select(
                (F.col("event_id") + F.col("_r") * n_base).alias("event_id"),
                "event_type",
                "value",
            )
            .persist()
        )
        n = ev.count()

        mg_in = ev.filter(F.col("event_type").isNotNull()).select(
            "event_id", "event_type"
        )
        t0 = time.perf_counter()
        got = heavyhitters.replay_heavy_hitters(
            spark, mg_in, "event_type", capacity=args.capacity,
            num_batches=3, order_col="event_id",
        )
        got_rows = {r.key: (r.cnt_lower, r.cnt_upper) for r in got.collect()}
        t_mg = time.perf_counter() - t0
        exact = {
            r.event_type: r.cnt
            for r in mg_in.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        parity = got_rows == {k: (c, c) for k, c in exact.items()}
        # state rows actually persisted = final summary incl. sentinel
        mg_state = len(got_rows) + 1

        hist_in = ev.select(
            "event_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        )
        t0 = time.perf_counter()
        hist = histogram.replay_histogram(
            spark, hist_in, "v", num_batches=3, order_col="event_id"
        )
        hist_rows = hist.collect()
        t_hist = time.perf_counter() - t0
        total_bucketed = sum(r.cnt for r in hist_rows)

        print(
            f"| {mult}x | {n} | {t_mg:.1f}s | {mg_state} | {parity} "
            f"| {t_hist:.1f}s | {len(hist_rows)} (sum={total_bucketed}) |"
        )
        ev.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
