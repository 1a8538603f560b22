#!/usr/bin/env python
"""Scale measurement: operators/graph.k_core at 10x spread — evidence
for the SCALE.md row behind the queued r14 `kcore_copurchase_report`
registration.

Graph: a "core + fringe" planted structure that forces a real peel
cascade — a dense circulant core (degree 8) over the first 20% of the
nodes, plus pendant CHAINS of length 3 hanging off core nodes (each
chain peels one layer per round at k=2, so the peel depth is the chain
length, not 1).  Generated with spark.range + column math.

Usage: python tools/scale_kcore.py [n_nodes ...]   (default 100k, 1M)
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

K = 3


def planted_edges(spark, n_nodes: int):
    n_core = n_nodes // 5
    core = spark.range(n_core).select(F.col("id").alias("u"))
    rings = None
    for d in (1, 2, 3, 4):
        r = core.select("u", ((F.col("u") + d) % n_core).alias("v"))
        rings = r if rings is None else rings.unionByName(r)
    # chains: fringe nodes n_core + 3*i + {0,1,2} hang off core node i
    n_chains = (n_nodes - n_core) // 3
    anchors = spark.range(n_chains).select(
        (F.col("id") % n_core).alias("u"),
        (F.lit(n_core) + F.col("id") * 3).alias("v"),
    )
    links1 = spark.range(n_chains).select(
        (F.lit(n_core) + F.col("id") * 3).alias("u"),
        (F.lit(n_core) + F.col("id") * 3 + 1).alias("v"),
    )
    links2 = spark.range(n_chains).select(
        (F.lit(n_core) + F.col("id") * 3 + 1).alias("u"),
        (F.lit(n_core) + F.col("id") * 3 + 2).alias("v"),
    )
    return (
        rings.unionByName(anchors).unionByName(links1).unionByName(links2)
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark(app_name="scale-kcore")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        edges = planted_edges(spark, n).localCheckpoint(eager=True)
        n_edges = edges.count()
        t0 = time.perf_counter()
        core = graph.k_core(edges, K)
        n_core_edges = core.count()
        wall = time.perf_counter() - t0
        # the chains (degree <= 2 throughout) must peel away entirely;
        # the circulant core (degree 8) survives k=3 intact
        n_core_nodes = n // 5
        print(
            f"nodes={n} edges={n_edges} k={K} wall={wall:.1f}s "
            f"core_edges={n_core_edges} (expect ~{n_core_nodes * 4}) "
            f"throughput={n_edges / wall:,.0f} edges/s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
