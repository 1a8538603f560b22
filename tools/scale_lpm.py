#!/usr/bin/env python
"""Longest-prefix-match scale wave ("measure, don't guess"): the
broadcast-chain design claim at routing-feed realism — a 20k-block
nested feed across 8 prefix lengths against growing corpora, with the
corpus-shuffle SQLMetric asserted zero and throughput reported.

Usage: python tools/scale_lpm.py   (prints one JSON line per wave)
"""

from __future__ import annotations

import json
import os
import random
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


def _feed_rows(n_blocks: int, seed: int = 0x1B4D):
    """A nested synthetic feed: blocks at /8 /10 /12 /16 /20 /24 /28
    /32, bases spread over 10.0.0.0/8 so nesting actually occurs."""
    rng = random.Random(seed)
    lens = [8, 10, 12, 16, 20, 24, 28, 32]
    rows, seen = [], set()
    while len(rows) < n_blocks:
        n = rng.choice(lens)
        base = (10 << 24) | (rng.getrandbits(24) & ((0xFFFFFFFF >> 8)))
        base &= (0xFFFFFFFF << (32 - n)) & 0xFFFFFFFF
        if (n, base) in seen:
            continue
        seen.add((n, base))
        quad = ".".join(str((base >> s) & 255) for s in (24, 16, 8, 0))
        rows.append((f"{quad}/{n}", f"org{len(rows)}"))
    return rows


def main() -> int:
    from pyspark.sql import functions as F

    from advanced_elb_logs_etl_spark.operators import ipnet
    from advanced_elb_logs_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_lpm")
    spark.sparkContext.setLogLevel("ERROR")

    feed = ipnet.parse_cidr(
        spark.createDataFrame(_feed_rows(20_000), "cidr string, org string")
    ).localCheckpoint(eager=True)

    for rows in (1_000_000, 10_000_000):
        # IPs concentrated in 10/8 so matches occur at many depths
        ip = F.concat_ws(
            ".",
            F.lit(10),
            (F.col("id") * 7919) % 256,
            (F.col("id") * 104729) % 256,
            F.col("id") % 256,
        )
        corpus = spark.range(rows).select(ip.alias("client_ip"))
        t0 = time.perf_counter()
        out = ipnet.longest_prefix_match(corpus, feed, "client_ip", ["org"])
        matched = (
            out.agg(
                F.count(F.lit(1)).alias("n"),
                F.count("matched_prefix_len").alias("m"),
                F.count_distinct("matched_prefix_len").alias("depths"),
            ).collect()[0]
        )
        wall = round(time.perf_counter() - t0, 3)
        shuffled = _executed_metric_sum(
            out.agg(F.count(F.lit(1))), "Exchange", "shuffleRecordsWritten"
        )
        print(
            json.dumps(
                {
                    "wave": "lpm_broadcast_chain",
                    "rows": rows,
                    "feed_blocks": 20_000,
                    "wall_s": wall,
                    "rows_per_s": int(rows / wall),
                    "matched_rows": matched.m,
                    "match_rate_pct": round(100.0 * matched.m / matched.n, 1),
                    "distinct_depths_hit": matched.depths,
                    "corpus_shuffle_records": shuffled,
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
