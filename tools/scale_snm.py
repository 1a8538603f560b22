#!/usr/bin/env python
"""Scale measurement: operators/linkage.sorted_neighborhood_pairs at
10x spread — evidence for the SCALE.md row behind the queued r14
`sorted_neighborhood_linkage` registration.

Records get a synthetic near-uniform sort key with heavy ties (1000
distinct values per million rows), so the rank tiebreak and the
partition-boundary pair logic both do real work.  Generated entirely
with spark.range + column math.

Usage: python tools/scale_snm.py [n_rows ...]   (default 1M, 10M)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from advanced_elb_logs_etl_spark.operators import linkage  # noqa: E402
from advanced_elb_logs_etl_spark.session import get_spark  # noqa: E402

WINDOW = 5


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark(app_name="scale-snm")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        df = spark.range(n).select(
            F.col("id"),
            (F.xxhash64("id") % 1000).alias("key"),
        )
        t0 = time.perf_counter()
        pairs = linkage.sorted_neighborhood_pairs(
            df, "id", ["key"], window=WINDOW
        )
        n_pairs = pairs.count()
        wall = time.perf_counter() - t0
        expect = sum(n - d for d in range(1, WINDOW))
        assert n_pairs == expect, (n_pairs, expect)
        print(
            f"rows={n} window={WINDOW} pairs={n_pairs} wall={wall:.1f}s "
            f"throughput={n / wall:,.0f} rows/s (pair count exact: "
            f"sum(n-d) — linear, never quadratic)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
