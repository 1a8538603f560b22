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
    tol: float | None = None,
    max_iterations: int = 50,
    dangling: str = "auto",
    assume_distinct: bool = False,
) -> DataFrame:
    """Synchronous PageRank over an edge list — fixed-K by default, or
    iterate-to-convergence when ``tol`` is set.

    edges: DataFrame[src: string, dst: string]; duplicate edges are
    collapsed first (a crawl graph lists a link once) unless the caller
    passes ``assume_distinct=True`` to certify the input is already
    duplicate-free and skip that shuffle. Dangling nodes
    (nodes with no out-edges) are handled the standard way: their rank mass
    is redistributed uniformly each iteration, so the update is
        r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + D/N)
    where D is the summed rank of dangling nodes. When the graph has no
    dangling nodes (checked ONCE at setup) the D term — and its
    one-scalar-per-iteration job — is skipped entirely, so the fixed-K
    path runs exactly one shuffle-join round per iteration over the
    checkpointed static frames.

    ``tol``: when set, iterate until max |r' - r| <= tol (checked per
    round on the materialized rank frame; each round localCheckpoints so
    lineage stays flat), up to ``max_iterations``; ``iterations`` is
    ignored in this mode.

    ``dangling``: "auto" (default) probes the graph once for out-edge-less
    nodes — correct for arbitrary input, at the cost of one extra setup
    job. Pass "none" when the caller guarantees every node has an
    out-edge (e.g. bidirectional graphs built by construction, like
    supplier_part_edges) to skip the probe and the per-iteration D-mass
    scalar job.

    Scale: per iteration ONE shuffle — ranks join edges on src (rank frame
    is O(N) and aggregated, so AQE broadcasts it when small; at web scale
    both sides hash-partition on src and the partitioning is reused), then
    hash-agg on dst. The dangling-mass fold and the convergence delta are
    O(N) scalar aggregations, not row collects.
    """
    if dangling not in ("auto", "none"):
        raise ValueError(
            f"dangling must be 'auto' or 'none', got {dangling!r} — a typo "
            "here would silently re-enable the setup probe"
        )
    # The static frames are referenced by EVERY iteration's join tree.
    # Checkpoint them once at setup — in ALL modes — so iteration K reads
    # materialized blocks instead of re-running the distinct-over-union edge
    # pipeline K times (at sf0.1 that recomputation doubled the catalog
    # query's latency; at crawl scale it would be a non-starter). The edge
    # frame is O(E) but so is one iteration's shuffle, so the one-time
    # materialization cost is amortized from the first round. outdeg is
    # folded into the edge frame here so each iteration runs ONE join
    # (ranks ⋈ ew) plus the dst aggregation instead of a second per-round
    # deg join; `rank / outdeg` stays the same double expression the SQL
    # twin computes, so determinism is unaffected.
    e = edges.select("src", "dst")
    if not assume_distinct:
        e = e.distinct()
    e = e.localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = e.join(deg, "src").localCheckpoint(eager=True)  # src, dst, outdeg
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # scalar graph size; one tiny job against the blocks
    if dangling == "none":
        has_dangling = False
        dangling_nodes = None
    else:
        dangling_nodes = nodes.join(deg, nodes.node == deg.src, "left_anti")
        has_dangling = not dangling_nodes.isEmpty()
        if has_dangling:
            dangling_nodes = dangling_nodes.localCheckpoint(eager=True)
    base = float(1.0) / n
    ranks = nodes.select("node", dround(F.lit(base), _SNAP).alias("rank"))
    rounds = max_iterations if tol is not None else iterations
    for _ in range(rounds):
        if has_dangling:
            # D = summed rank of out-edge-less nodes, snapped so the scalar
            # re-entering the plan is a stable decimal, not an ulp lottery.
            dmass = (
                ranks.join(dangling_nodes, "node")
                .agg(F.sum("rank").alias("d"))
                .first()["d"]
            ) or 0.0
            dmass = round(dmass, _SNAP)
        else:
            dmass = 0.0
        contrib = (
            ranks.join(ew, ranks.node == ew.src)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        new_ranks = nodes.join(contrib, "node", "left").select(
            "node",
            dround(
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + F.lit(dmass / n)),
                _SNAP,
            ).alias("rank"),
        )
        if tol is not None or has_dangling:
            # dangling/convergence modes run a scalar job against `ranks`
            # every round — checkpoint so round N+1 reads materialized
            # blocks instead of replaying rounds 1..N.
            new_ranks = new_ranks.localCheckpoint(eager=True)
        if tol is not None:
            delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "node")
                .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d"))
                .first()["d"]
            )
            ranks = new_ranks
            if delta is not None and delta <= tol:
                break
        else:
            ranks = new_ranks
    return ranks


def supplier_part_edges(lineitem: DataFrame) -> DataFrame:
    """Bipartite supplier<->part graph from lineitem co-occurrence, both
    directions (so no node dangles). Node ids are type-prefixed strings.

    The (suppkey, partkey) pairs are deduplicated BEFORE string-building and
    mirroring: the distinct shuffles half the rows on narrow int keys
    instead of the full 2x string edge list, and the mirrored union of a
    distinct pair set is distinct by construction (the 's'/'p' prefixes
    keep the two directions disjoint) — callers may pass
    ``assume_distinct=True`` to :func:`pagerank`."""
    pairs = lineitem.select("l_suppkey", "l_partkey").distinct()
    fwd = pairs.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )
    rev = pairs.select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    return fwd.union(rev)
