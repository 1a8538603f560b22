#!/usr/bin/env python
"""Scale waves for the r12 stash pair (round 10 — measure before
registering):

1. butterfly_stats — wedge-pair fan-out is the hazard: cost is
   sum(d^2) on the wedged-through side.  Waves grow EDGES at constant
   degree (healthy: linear) and then grow DEGREE at constant vertex
   count (the quadratic lane side selection is for) — both measured.
2. attribution_by_channel — per-user (conversions x touches) fan-out is
   the hazard.  Waves grow USERS at constant per-user activity
   (healthy: linear) and then grow PER-USER activity at constant users
   (quadratic — the documented bucketized-range-join escalation lane).

Usage: python tools/scale_r12_wave.py  (one JSON line per wave)
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

    from advanced_elb_logs_etl_spark.operators import events as ev
    from advanced_elb_logs_etl_spark.operators import graph
    from advanced_elb_logs_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_r12_wave")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.md5(F.col("id").cast("string"))).count()

    # --- butterfly: edges x4 at constant degree, then degree x4 -------
    def bip_edges(n_left, deg):
        # left vertex i connects to deg pseudo-random right vertices
        return (
            spark.range(n_left * deg)
            .select(
                (F.col("id") % n_left).alias("l"),
                ((F.col("id") * 2654435761) % (n_left * deg // 4 + 97)).alias(
                    "r"
                ),
            )
            .distinct()
        )

    for n_left, deg, tag in [
        (100_000, 10, "edges 1x"),
        (400_000, 10, "edges 4x (constant degree)"),
        (100_000, 40, "degree 4x (constant vertices)"),
    ]:
        e = bip_edges(n_left, deg)
        t0 = time.perf_counter()
        row = graph.butterfly_stats(e, through="left").collect()[0]
        print(
            json.dumps(
                {
                    "wave": "butterfly",
                    "shape": tag,
                    "n_edges": row.n_edges,
                    "n_wedges": row.n_wedges,
                    "n_butterflies": row.n_butterflies,
                    "wall_s": round(time.perf_counter() - t0, 3),
                }
            ),
            flush=True,
        )

    # --- attribution: users x4, then per-user activity x4 -------------
    def ev_frame(users, per_user):
        n = users * per_user
        return spark.range(n).select(
            F.col("id").alias("event_id"),
            (F.col("id") % users).alias("user_id"),
            F.when((F.col("id") % 7) == 0, F.lit("purchase"))
            .when((F.col("id") % 3) == 0, F.lit("click"))
            .otherwise(F.lit("view"))
            .alias("event_type"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + (F.col("id") / F.lit(users)).cast("long")
                * F.lit(60_000_000)
            ).alias("ts"),
        )

    for users, per_user, tag in [
        (50_000, 20, "users 1x"),
        (200_000, 20, "users 4x (constant activity)"),
        (50_000, 80, "activity 4x (constant users)"),
    ]:
        df = ev_frame(users, per_user)
        t0 = time.perf_counter()
        rows = ev.attribution_by_channel(df, lookback_days=36500).collect()
        total_linear = sum(r.linear_micro for r in rows)
        print(
            json.dumps(
                {
                    "wave": "attribution",
                    "shape": tag,
                    "events": users * per_user,
                    "channels": len(rows),
                    "touch_pairs": sum(r.n_touches for r in rows),
                    "linear_total_micro": total_linear,
                    "wall_s": round(time.perf_counter() - t0, 3),
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
