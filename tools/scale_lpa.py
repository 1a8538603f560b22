#!/usr/bin/env python
"""Scale measurement: operators/graph.lpa_communities on a planted-
partition graph at 10x spread — evidence for the SCALE.md row behind
the r13 `lpa_copurchase_communities` registration.

Graph: communities of 32 nodes, each wired as a degree-4 circulant
(i -> i+1, i+2 within the block, mirrored), plus one bridge edge per
block to the next block — the communities-not-components structure
(every block pair is ONE component; LPA must keep the blocks apart).
Generated entirely with spark.range + column math (no driver loops).

Usage: python tools/scale_lpa.py [n_nodes ...]   (default 100k, 1M)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from advanced_elb_logs_etl_spark.operators import graph  # noqa: E402
from advanced_elb_logs_etl_spark.session import get_spark  # noqa: E402

BLOCK = 32
ROUNDS = 3


def planted_edges(spark, n_nodes: int):
    base = spark.range(n_nodes).select(F.col("id").alias("u"))
    blk = (F.col("u") / BLOCK).cast("long")
    off = F.col("u") % BLOCK
    ring1 = base.select("u", (blk * BLOCK + (off + 1) % BLOCK).alias("v"))
    ring2 = base.select("u", (blk * BLOCK + (off + 2) % BLOCK).alias("v"))
    bridges = (
        base.filter((off == 0) & (blk * BLOCK + BLOCK < n_nodes))
        .select("u", (F.col("u") + BLOCK).alias("v"))
    )
    return (
        ring1.unionByName(ring2).unionByName(bridges)
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark(app_name="scale-lpa")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        edges = planted_edges(spark, n).localCheckpoint(eager=True)
        n_edges = edges.count()
        t0 = time.perf_counter()
        labels = graph.lpa_communities(edges, rounds=ROUNDS)
        n_nodes = labels.count()
        wall = time.perf_counter() - t0
        n_comms = labels.select("label").distinct().count()
        # community quality: the planted blocks must NOT collapse into
        # one label per component (which min-label CC would produce)
        print(
            f"nodes={n_nodes} edges={n_edges} rounds={ROUNDS} "
            f"wall={wall:.1f}s throughput={n_edges * ROUNDS / wall:,.0f} "
            f"edge-msgs/s communities={n_comms} "
            f"(blocks={n // BLOCK})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
