#!/usr/bin/env python
"""Count-Min join-size estimate scale wave (round 11 — "measure,
don't guess"): the operator's two scale claims, measured.

Claims under test (operators/cmsketch.cm_join_size docstring):
1. The estimate's cost is the two SKETCH BUILDS (one map-side-
   combinable agg each); every later frame is <= d*w rows, so
   estimating the join size of 10x the data costs ~10x the build scan
   and nothing more — while the exact answer re-pays a full shuffle
   join every time it is asked.
2. Accuracy tracks the CM bound: err <= e/width * N_a * N_b with the
   min over depth rows pulling far inside it on real (skewed) data.

Usage: python tools/scale_joinsize.py   (prints one JSON line per wave)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from advanced_elb_logs_etl_spark.operators import cmsketch as cm
    from advanced_elb_logs_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_joinsize")
    spark.sparkContext.setLogLevel("ERROR")

    for rows in (1_000_000, 4_000_000, 16_000_000):
        # Zipf-ish skewed key streams with a shared hot domain: side A
        # keys 0..rows/100 (quadratic-ish collisions), side B a
        # shifted/overlapping domain — a realistic fact-dim join shape.
        a = spark.range(rows).select(
            (F.col("id") % (rows // 100)).cast("string").alias("key")
        )
        b = spark.range(rows // 4).select(
            (F.col("id") % (rows // 200)).cast("string").alias("key")
        )
        t0 = time.perf_counter()
        sa = cm.cm_build(a).localCheckpoint(eager=True)
        sb = cm.cm_build(b).localCheckpoint(eager=True)
        build_s = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        est = cm.cm_join_size(sa, sb).collect()[0].est_join_size
        est_s = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        exact = a.join(b, "key").count()
        exact_s = round(time.perf_counter() - t0, 3)
        print(
            json.dumps(
                {
                    "wave": "cm_join_size",
                    "rows_a": rows,
                    "rows_b": rows // 4,
                    "build_sketches_s": build_s,
                    "estimate_s": est_s,
                    "exact_join_s": exact_s,
                    "est": int(est),
                    "exact": int(exact),
                    "ratio": round(est / exact, 4) if exact else None,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
