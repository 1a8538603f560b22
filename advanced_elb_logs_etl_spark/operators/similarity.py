"""Approximate-nearest-neighbor search over an embedding column.

Two paths over `(vec_id, embedding array<float>, label)`:

- brute-force cosine top-k: exact baseline. Query set x corpus cross join
  (queries broadcast), dot/norm as deterministic left-fold Column
  expressions, per-query top-k via window rank. Cost O(|Q| * N * d) — fine
  whenever |Q| is small; this IS the scale path for ad-hoc lookups because
  the corpus scan is embarrassingly parallel and never shuffles (the only
  shuffle is the final per-query top-k, |Q| * k rows).

- IVF (inverted-file) top-k: coarse-quantize the corpus to C centroids
  (here: deterministic seed vectors; a production build would k-means),
  search only the query's nprobe nearest clusters. Recall < 1.0 by design;
  at 100 TB this turns a full-corpus scan into a ~nprobe/C fraction, and
  the cluster assignment is a one-off materialized column (partition the
  corpus table BY cluster so a probe prunes parquet partitions).

Determinism contract (shared with the DuckDB oracle): embeddings are cast
float->double elementwise, dot products and norms are LEFT folds in index
order, cosine = dot / (sqrt(n_a) * sqrt(n_b)) — bit-identical across
engines, so even rank ties order identically under (cos DESC, id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product. SQL twin:
    list_reduce(list_transform(generate_series(1, len(a)),
                i -> a[i]::DOUBLE * b[i]::DOUBLE), (x, y) -> x + y)"""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query vector (self-matches excluded).

    Output: (q_id, neighbor_id, cosine, rank). The query side is broadcast;
    the corpus side streams — no corpus shuffle until the k-row-per-query
    rank, which AQE coalesces to almost nothing.
    """
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", F.col("cosine").alias("cosine_raw"), "rank")
    )


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment by cosine (centroids broadcast).
    Deterministic tie-break on centroid id."""
    c = centroids.select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid"))
    v = vectors.select(F.col(id_col), F.col(vec_col))
    scored = v.join(F.broadcast(c)).select(
        id_col, vec_col, "centroid_id", cosine(F.col(vec_col), F.col("centroid")).alias("sim")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, F.col("centroid_id").alias("cluster"))
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: search only the nprobe clusters nearest each query.

    Same output shape as brute_force_topk; recall is approximate. The
    candidate join is cluster-equi (shuffle on tiny cluster ids) instead of
    a full cross join."""
    assigned = assign_clusters(vectors, centroids, id_col, vec_col)
    c = centroids.select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid"))
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    q_scored = q.join(F.broadcast(c)).select(
        "q_id", "q_vec", "centroid_id", cosine(F.col("q_vec"), F.col("centroid")).alias("sim")
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("centroid_id"))
    q_probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "q_vec", F.col("centroid_id").alias("cluster"))
    )
    cands = q_probes.join(
        assigned.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
                        "cluster"),
        "cluster",
    ).filter(F.col("q_id") != F.col("neighbor_id"))
    scored = cands.select(
        "q_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", F.col("cosine").alias("cosine_raw"), "rank")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all pairs with cosine >=
    threshold. Exact all-pairs form — the dedup ground truth for embedding
    space, O(n^2 d); bound the input (subset, or one IVF cluster at a time
    via assign_clusters) before calling at scale. The scalable approximate
    form is: assign_clusters -> per-cluster all-pairs -> union, which misses
    only cross-cluster pairs (same trade as any IVF probe)."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("v_a"), F.col("v_b")).alias("cosine_raw"))
        .filter(F.col("cosine_raw") >= threshold)
    )


def refine_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means refinement of the IVF coarse quantizer: assign ->
    per-cluster elementwise mean -> repeat. Deterministic (seed centroids in,
    no randomness), so results are reproducible run to run.

    Physical form: posexplode the vectors to (cluster, dim, value) rows and
    hash-aggregate per (cluster, dim) — codegen, one shuffle per iteration,
    no driver-side math. Empty clusters keep their previous centroid.
    Returns (vec_id=cluster id, embedding=array<double>) usable directly as
    the `centroids` argument of ivf_topk / assign_clusters.
    """
    current = centroids.select(
        F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col)
    )
    for _ in range(iterations):
        assigned = assign_clusters(vectors, current, id_col=id_col, vec_col=vec_col)
        dims = assigned.select(
            "cluster", F.posexplode(F.col(vec_col)).alias("dim", "v")
        )
        means = (
            dims.groupBy("cluster", "dim")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select(
                F.col("cluster").alias(id_col),
                F.transform(F.col("dm"), lambda s: s.getField("m")).alias(vec_col),
            )
        )
        # empty clusters vanish from `means`; keep their old centroid
        kept = current.join(means.select(F.col(id_col).alias("_k")), current[id_col] == F.col("_k"), "left_anti")
        current = means.unionByName(kept).localCheckpoint(eager=True)
    return current
