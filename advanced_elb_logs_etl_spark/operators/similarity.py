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
    # norms precomputed once per vector: per-pair work drops from three
    # O(d) folds to one, with bit-identical results (same sqrt/product/div)
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
                       norm2(F.col(vec_col)).alias("q_n"))
    c = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
                       norm2(F.col(vec_col)).alias("c_n"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "neighbor_id",
                (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_n") * F.col("c_n"))).alias("cosine"))
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
    per-cluster elementwise mean -> repeat. No randomness (seed centroids
    in), but see the floating-point note below before assuming bit-exact
    reproducibility.

    Physical form: posexplode the vectors to (cluster, dim, value) rows and
    hash-aggregate per (cluster, dim) — codegen, one shuffle per iteration,
    no driver-side math. Empty clusters keep their previous centroid.
    Note: avg() accumulates doubles in partition order, so centroid values
    are reproducible only up to floating ulps across different partition
    layouts — do not build bit-exact contracts on refined centroids.
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


# ---------------------------------------------------------------------------
# Random-hyperplane (SimHash-for-vectors) LSH — the bucketed ANN variant
# ---------------------------------------------------------------------------

RP_BITS = 24
# 3 bits per band: P[band match] = P[bit]^3, so even moderate-angle
# neighbors (cosine ~0.4 => P[bit] ~0.63) collide on some band with 8
# chances. Wider bands (6 bits) drop recall to ~0.2 on near-orthogonal
# corpora like the synthetic embeddings; tighten bands (raise bits/band)
# when real corpora have closer neighbors and candidate volume matters.
RP_BANDS = 8


def _rp_hyperplanes(bits: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5: component (i, d) is
    ((md5int('i:d') mod 2001) - 1000) / 1000 in [-1, 1]. Computed in Python
    and inlined as LITERALS into both the Spark plan and the SQL oracle, so
    the two engines share exact coefficients (and the fold order makes the
    dot products bit-identical)."""
    import hashlib

    planes = []
    for i in range(bits):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:15], 16)
            row.append(((h % 2001) - 1000) / 1000.0)
        planes.append(row)
    return planes


def rp_signatures(
    vectors: DataFrame,
    bits: int = RP_BITS,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector random-hyperplane signature: bit i = 1 iff dot(v, h_i) > 0.
    Cosine-similar vectors agree on most bits (P[bit match] = 1 - angle/pi).
    Pure Column expressions; left-fold dots -> deterministic.

    dim defaults to the actual embedding length (probed from the first row):
    a wrong dim would null-poison the folds, zero every signature, and
    silently degrade LSH to an all-pairs join."""
    if dim is None:
        first = vectors.select(F.size(F.col(vec_col)).alias("n")).first()
        if first is None:
            dim = 1  # empty input; any plane works
        else:
            dim = int(first.n)
    planes = _rp_hyperplanes(bits, dim)
    sig = None
    for i, row in enumerate(planes):
        h_arr = F.array(*[F.lit(x) for x in row])
        d = F.aggregate(
            F.zip_with(_as_double(F.col(vec_col)), h_arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return vectors.select(F.col(id_col), F.col(vec_col), sig.alias("rp_sig"))


def rp_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = RP_BITS,
    bands: int = RP_BANDS,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: candidates are corpus vectors sharing at least one
    signature band with the query; exact cosine ranks them. Recall < 1 by
    design (near-orthogonal misses), but the whole chain is deterministic,
    so it is oracle-reproducible unlike most ANN implementations.

    Scale: band buckets are equi-join keys — the corpus never cross-joins
    the queries; at 100 TB materialize rp_sig as a stored column and
    partition by a band prefix."""
    seg = bits // bands

    v = rp_signatures(vectors, bits, dim, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        F.col("rp_sig").alias("c_sig"),
    )
    q = rp_signatures(queries, bits, dim, id_col, vec_col).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.col("rp_sig").alias("q_sig"),
    )
    v_bands = v.select("neighbor_id", "c_vec", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright("c_sig", b * seg).bitwiseAND(F.lit((1 << seg) - 1)).alias("key"))
        for b in range(bands)
    ])).alias("bk")).select("neighbor_id", "c_vec", "bk.band", "bk.key")
    q_bands = q.select("q_id", "q_vec", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright("q_sig", b * seg).bitwiseAND(F.lit((1 << seg) - 1)).alias("key"))
        for b in range(bands)
    ])).alias("bk")).select("q_id", "q_vec", "bk.band", "bk.key")
    cands = (
        q_bands.join(v_bands, ["band", "key"])
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "q_vec", "neighbor_id", "c_vec")
        .distinct()
    )
    scored = cands.select(
        "q_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", F.col("cosine").alias("cosine_raw"), "rank")
    )
