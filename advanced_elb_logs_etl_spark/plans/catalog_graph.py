"""Graph-analytics catalog wave over the part co-purchase graph: parts are
nodes, linked when they appear in the same order (the retail/crawl-graph
shape — market-basket affinity, link prediction, community structure all
start from this projection).

Three queries: a degree-ordered triangle census, bounded-depth BFS
reachability (the DuckDB twin is a recursive CTE — bounded by a depth
counter, so both engines terminate deterministically), and seed-restricted
neighbor-Jaccard link prediction. Operators live in operators/graph.py;
every ratio output is a single double division of exact integers snapped
through DECIMAL(28,8), so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import graph
from .catalog import _t, register

# Shared SQL prologue: canonical co-purchase edge list + mirrored adjacency
# + degrees — the exact twin of operators/graph.py co_occurrence_edges
# (64-item group cap included) and _mirror.
_GRAPH_CTE = """
pairs AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
ok AS (SELECT g FROM pairs GROUP BY g HAVING count(*) <= 64),
ed AS (
  SELECT DISTINCT a.i AS u, b.i AS v
  FROM pairs a JOIN pairs b ON a.g = b.g AND a.i < b.i
  WHERE a.g IN (SELECT g FROM ok)
),
und AS (SELECT u, v FROM ed UNION ALL SELECT v, u AS v FROM ed),
deg AS (SELECT u AS node, count(*) AS d FROM und GROUP BY u)
"""


# The canonical co-purchase edge list is the shared input of all three
# graph queries, and each query's plan references it from several branches
# (seeds, adjacency probes, degree frames). Persist it once per (context,
# sf_dir) — the same warehouse "materialized view" pattern as
# catalog_llm._hashed_docs; bounded FIFO so stale contexts release.
_EDGE_CACHE: dict = {}
_EDGE_CACHE_MAX = 4


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (id(spark.sparkContext), sf_dir)
    if key not in _EDGE_CACHE:
        while len(_EDGE_CACHE) >= _EDGE_CACHE_MAX:
            oldest = next(iter(_EDGE_CACHE))
            old = _EDGE_CACHE.pop(oldest)
            try:
                old.unpersist()
            except Exception:
                pass  # stopped context; nothing to release
        li = _t(spark, sf_dir, "lineitem")
        _EDGE_CACHE[key] = graph.co_occurrence_edges(
            li, "l_orderkey", "l_partkey", max_group_items=64
        ).persist()
    return _EDGE_CACHE[key]


def clear_edge_cache() -> None:
    """Unpersist and drop the shared co-purchase edge frames — benchmark
    hook for isolated per-query attribution, mirroring
    catalog_llm.clear_hashed_cache."""
    while _EDGE_CACHE:
        _, frame = _EDGE_CACHE.popitem()
        try:
            frame.unpersist()
        except Exception:
            pass  # stopped context; nothing to release


def _seed_nodes(edges: DataFrame) -> DataFrame:
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    return nodes.filter(F.col("node") % 97 == 1)


# ---------------------------------------------------------------------------
# triangle_census — global triangle/wedge census + clustering coefficient
# ---------------------------------------------------------------------------

_TRI_ORACLE = f"""
WITH {_GRAPH_CTE}
SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
       (SELECT count(*) FROM ed)::BIGINT AS n_edges,
       (SELECT count(*) FROM ed e1
          JOIN ed e2 ON e1.v = e2.u
          JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v)::BIGINT AS n_triangles,
       (SELECT CAST(sum(d * (d - 1)) AS BIGINT) // 2 FROM deg) AS n_wedges,
       CAST(round(CAST(
         3.0 * (SELECT count(*) FROM ed e1
                  JOIN ed e2 ON e1.v = e2.u
                  JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v)
             / CAST((SELECT CAST(sum(d * (d - 1)) AS BIGINT) // 2 FROM deg) AS DOUBLE)
       AS DECIMAL(28,8)), 8) AS DOUBLE) AS clustering_coeff
"""


@register("triangle_census", _TRI_ORACLE)
def q_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the co-purchase graph. The oracle counts
    triangles the naive way (u < v < w chain join); the Spark side uses
    the degree-ordered orientation (operators/graph.py triangle_stats) —
    same count, but wedge fan-out bounded ~sqrt(|E|) per node, which is
    the difference between m^(3/2) and m*d_max^2 on a power-law graph.

    Scale: see triangle_stats. The three 1-row aggregates compose lazily;
    identical edge subtrees fall to Catalyst's ReuseExchange."""
    return graph.triangle_stats(_copurchase_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# khop_reachability — bounded BFS from seed nodes
# ---------------------------------------------------------------------------

_KHOP_ORACLE = f"""
WITH RECURSIVE {_GRAPH_CTE},
seeds AS (SELECT node FROM deg WHERE node % 97 = 1),
reach(seed, node, depth) AS (
  SELECT node, node, 0 FROM seeds
  UNION
  SELECT r.seed, und.v, r.depth + 1
  FROM reach r JOIN und ON und.u = r.node
  WHERE r.depth < 2
)
SELECT seed, count(DISTINCT node)::BIGINT AS n_reachable
FROM reach GROUP BY seed ORDER BY seed
"""


@register("khop_reachability", _KHOP_ORACLE)
def q_khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop reachable-set size per seed node (seeds: node id % 97 == 1).
    The DuckDB twin is a recursive CTE bounded by a depth counter; the
    Spark side unrolls the same frontier BFS as k hash-join+distinct
    rounds (operators/graph.py k_hop_reachability)."""
    ed = _copurchase_edges(spark, sf_dir)
    return graph.k_hop_reachability(ed, _seed_nodes(ed), k=2)


# ---------------------------------------------------------------------------
# graph_jaccard_topk — neighbor-overlap link prediction
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = f"""
WITH {_GRAPH_CTE},
seeds AS (SELECT node FROM deg WHERE node % 97 = 1),
sa AS (SELECT u AS seed, v AS via FROM und WHERE u IN (SELECT node FROM seeds)),
common AS (
  SELECT sa.seed, b.v AS node, count(*) AS common
  FROM sa JOIN und b ON b.u = sa.via
  WHERE b.v <> sa.seed
  GROUP BY sa.seed, b.v
),
scored AS (
  SELECT c.seed, c.node, c.common,
         c.common / CAST(ds.d + dn.d - c.common AS DOUBLE) AS j
  FROM common c
  JOIN deg ds ON ds.node = c.seed
  JOIN deg dn ON dn.node = c.node
)
SELECT seed, node, common,
       CAST(round(CAST(j AS DECIMAL(28,8)), 8) AS DOUBLE) AS jaccard
FROM (SELECT *, row_number() OVER (PARTITION BY seed ORDER BY j DESC, node) AS rk
      FROM scored)
WHERE rk <= 5
ORDER BY seed, jaccard DESC, node
"""


@register("graph_jaccard_topk", _JACCARD_ORACLE)
def q_graph_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most neighbor-similar parts per seed part by Jaccard overlap
    — the link-prediction / substitute-product primitive. Seed-restricted
    (the all-pairs variant belongs behind LSH banding, operators/dedup.py).
    Rank ties resolve identically cross-engine because the score is a
    single exact-integer division."""
    ed = _copurchase_edges(spark, sf_dir)
    return graph.neighbor_jaccard_topk(ed, _seed_nodes(ed), per_seed=5)


# ---------------------------------------------------------------------------
# triangle_count_sampled — DOULION-style sparsified census (100 TB path)
# ---------------------------------------------------------------------------

_TRI_SAMPLED_ORACLE = f"""
WITH {_GRAPH_CTE},
samp AS (
  SELECT u, v FROM ed
  WHERE ('0x' || substr(md5('tri:' || u || '_' || v), 1, 15))::BIGINT % 3 = 0
),
tri AS (
  SELECT count(*)::BIGINT AS t FROM samp e1
    JOIN samp e2 ON e1.v = e2.u
    JOIN samp e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT (SELECT count(*) FROM ed)::BIGINT AS n_edges,
       (SELECT count(*) FROM samp)::BIGINT AS n_sampled_edges,
       t AS tri_sampled,
       (t * 27)::BIGINT AS tri_estimate
FROM tri
"""


@register("triangle_count_sampled", _TRI_SAMPLED_ORACLE)
def q_triangle_count_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION-style sparsified triangle count — the documented 100 TB
    mitigation for the exact census's O(m^1.5) (SCALE.md graph wave):
    keep each edge iff a deterministic md5 hash-coin lands in 1/p (p=3
    here), count triangles on the sparsified graph with the SAME
    degree-ordered orientation as the exact census, scale by p^3 = 27.
    The hash-coin (functions/hashing.h60 % p) replaces DOULION's RNG so
    the estimate is reproducible run-to-run AND value-exact against the
    SQL twin — determinism is what makes an approximate algorithm
    testable under this repo's oracle gate.

    Scale: sparsification is a narrow filter fused into the edge scan;
    the wedge join then runs on ~m/p edges, cutting its m^1.5 term by
    ~p^1.5 and keeping the whole census under the broadcast threshold far
    longer. Estimator variance is the published DOULION bound (unbiased
    under pairwise-independent sampling; the md5 coin approximates it).
    The exact census (`triangle_census`) remains the ground-truth twin."""
    ed = _copurchase_edges(spark, sf_dir)
    coin = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("tri:"),
                    F.col("u").cast("string"),
                    F.lit("_"),
                    F.col("v").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    samp = ed.where(coin % 3 == 0)
    tri = graph.triangle_stats(samp).select(
        F.col("n_edges").alias("n_sampled_edges"),
        F.col("n_triangles").alias("tri_sampled"),
    )
    n_edges = ed.groupBy().agg(F.count(F.lit(1)).alias("n_edges"))
    return n_edges.crossJoin(F.broadcast(tri)).select(
        "n_edges",
        "n_sampled_edges",
        "tri_sampled",
        (F.col("tri_sampled") * F.lit(27)).cast("long").alias("tri_estimate"),
    )
