"""Graph analytics over DataFrames: synchronous PageRank with a fixed
iteration count.

Complements the label-propagation connected components in operators/dedup.py
(neardup_components): CC answers "which docs are the same", PageRank answers
"which nodes matter" — e.g. ranking domains in a crawl graph before deciding
crawl budget, a standard pretraining-corpus curation step.

Determinism contract: every iteration ends by snapping ranks through
DECIMAL(28,8) (functions.scalars.dround), so the next iteration's INPUT is
an exact decimal identical across engines and partition orders. That makes
a fixed-K run reproducible bit-for-bit against an unrolled SQL oracle, while
costing precision far below the 1e-8 snap (per-iteration float noise is
~1e-13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import dround

DAMPING = 0.85
_SNAP = 8  # per-iteration decimal snap scale (see module docstring)


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = DAMPING,
) -> DataFrame:
    """Fixed-iteration synchronous PageRank over an edge list.

    edges: DataFrame[src: string, dst: string]; duplicate edges are
    collapsed first (a crawl graph lists a link once). Every node is assumed
    to have at least one out-edge (undirected/bidirectional graphs satisfy
    this by construction; see pagerank_supplier_part) — with no dangling
    nodes the rank update is the plain
        r'(v) = (1-d)/N + d * sum_{u->v} r(u)/outdeg(u).

    Scale: per iteration ONE shuffle — ranks join edges on src (rank frame
    is O(N) and aggregated, so AQE broadcasts it when small; at web scale
    both sides hash-partition on src and the partitioning is reused), then
    hash-agg on dst. K is fixed and small; lineage stays K joins deep, no
    driver loop state beyond the loop counter.
    """
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    n = nodes.count()  # scalar graph size; one tiny job, part of setup
    base = float(1.0) / n
    ranks = nodes.select("node", dround(F.lit(base), _SNAP).alias("rank"))
    for _ in range(iterations):
        contrib = (
            ranks.join(e, ranks.node == e.src)
            .join(deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            dround(
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0)),
                _SNAP,
            ).alias("rank"),
        )
    return ranks


def supplier_part_edges(lineitem: DataFrame) -> DataFrame:
    """Bipartite supplier<->part graph from lineitem co-occurrence, both
    directions (so no node dangles). Node ids are type-prefixed strings."""
    fwd = lineitem.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )
    rev = lineitem.select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    return fwd.union(rev)
