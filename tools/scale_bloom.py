#!/usr/bin/env python
"""Bloom first-seen dedup scale wave ("measure, don't guess"): the
bounded-state design claims at growing corpus sizes —

  * the first-set state never exceeds m_bits rows however large the
    corpus (the thing that lets 100 TB streams dedup in fixed memory);
  * wall time grows ~linearly in the corpus (one explode + bounded agg
    + broadcast + one item-keyed agg);
  * the false-positive rate tracks the (1 - e^{-kn/m})^k load curve,
    so m_bits sizing from expected distincts is predictable.

Usage: python tools/scale_bloom.py   (prints one JSON line per wave)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from advanced_elb_logs_etl_spark.operators import bloom  # noqa: E402
from advanced_elb_logs_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="scale_bloom")
    spark.sparkContext.setLogLevel("ERROR")
    m_bits, k = 1 << 20, 4  # 1M bits — the production-ish geometry
    for n_rows, n_keys in ((1_000_000, 100_000), (10_000_000, 1_000_000)):
        # synthetic ordered stream: ~10x duplication, deterministic keys
        df = (
            spark.range(n_rows)
            .select(
                F.col("id").alias("o"),
                F.concat(
                    F.lit("k"), (F.col("id") * 2654435761 % n_keys)
                ).alias("key"),
            )
        )
        t0 = time.perf_counter()
        flags = bloom.bloom_first_seen_flags(
            df, "key", "o", k=k, m_bits=m_bits
        )
        n_dup = flags.filter("bloom_dup").count()
        wall = round(time.perf_counter() - t0, 2)
        # state bound: the first-set frame the operator broadcasts
        state_rows = (
            df.select(
                F.explode(
                    bloom.bloom_positions_md5(F.col("key"), k, m_bits)
                ).alias("bit")
            )
            .groupBy("bit")
            .count()
            .count()
        )
        print(
            json.dumps(
                {
                    "n_rows": n_rows,
                    "n_keys": n_keys,
                    "m_bits": m_bits,
                    "k": k,
                    "wall_sec": wall,
                    "rows_per_sec": int(n_rows / wall),
                    "n_bloom_dup": n_dup,
                    "n_exact_dup": n_rows - n_keys,
                    "n_false_pos": n_dup - (n_rows - n_keys),
                    "state_rows": state_rows,
                    "state_bound_ok": state_rows <= m_bits,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
