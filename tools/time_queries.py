#!/usr/bin/env python
"""Ad-hoc warm timing of specific catalog queries at a given SF.

Usage: python tools/time_queries.py q1 q2 ... [--sf /root/testdata/sf0.1]
       [--repeat 2]

Mirrors bench.py's method (warm tables + Arrow pool first, noop-write for
wide outputs, per-query perf_counter) so numbers are comparable to the
full bench record; prints one line per query with each repeat's seconds.
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    repeat = 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--repeat":
            repeat = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from advanced_elb_logs_etl_spark.plans.catalog import CATALOG
    from advanced_elb_logs_etl_spark.session import get_spark
    from advanced_elb_logs_etl_spark.sources.testdata import TABLES, load_table
    from bench import _WIDE_OUTPUT
    from pyspark.sql import functions as F

    spark = get_spark(app_name="time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass
    spark.range(32).repartition(32).select(
        F.pandas_udf(lambda s: s * 2, "long")(F.col("id"))
    ).collect()

    for name in names:
        fn = CATALOG[name][0]
        times = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if name in _WIDE_OUTPUT:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: {times}", flush=True)


if __name__ == "__main__":
    main()
