#!/usr/bin/env python
"""Grouped streaming sketch scale wave (round 11 — "measure, don't
guess"): the grouped stores' claim that state and per-batch cost track
GROUP CARDINALITY (k rows or <= d*w cells per group), not stream
length — constant rows replayed at growing group counts.

Usage: python tools/scale_grouped_stream.py   (one JSON line per wave)
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

    from advanced_elb_logs_etl_spark.session import get_spark
    from advanced_elb_logs_etl_spark.streaming import kmvstream as kms

    spark = get_spark(app_name="scale_grouped_stream")
    spark.sparkContext.setLogLevel("ERROR")

    rows = 200_000
    k = 64
    for n_groups in (10, 100, 1000):
        df = spark.range(rows).select(
            F.col("id").alias("rid"),
            (F.col("id") % n_groups).cast("string").alias("g"),
            (F.col("id") % 50_000).cast("string").alias("key"),
        )
        t0 = time.perf_counter()
        sk = kms.replay_kmv_grouped(
            spark, df, ["g"], "g string", "key", k=k,
            num_batches=3, order_col="rid",
        )
        wall = round(time.perf_counter() - t0, 3)
        state_rows = sk.count()
        print(
            json.dumps(
                {
                    "wave": "grouped_stream_kmv",
                    "rows": rows,
                    "groups": n_groups,
                    "k": k,
                    "replay_3batch_s": wall,
                    "state_rows": state_rows,
                    "state_bound": n_groups * k,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
