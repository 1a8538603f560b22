"""Product quantization for embedding compression and ADC nearest-neighbor
search (Jégou, Douze, Schmid 2011, "Product Quantization for Nearest
Neighbor Search", IEEE TPAMI).

PQ splits each d-dim vector into M contiguous subvectors, learns a K-entry
codebook per subspace with k-means, and stores each vector as M small
codes (M bytes at K<=256 — a 64-dim float vector becomes 8 bytes).  Query
time uses Asymmetric Distance Computation: one M x K lookup table of
query-to-centroid distances, then every stored vector's distance is M
table lookups — no float math per candidate.

Cross-engine exactness (the repo's integer discipline): vector components
are snapped ONCE to integer micro-units (round(x * 1e6) as BIGINT), so
every squared-L2 distance — in training assignment, encoding, and the ADC
scan — is an exact BIGINT sum of squared integer differences; centroid
updates round the exact integer mean half-away-from-zero using pure
integer arithmetic ((2|s| + c) // (2c) with the sign reattached).  With
deterministic seeding (the K lowest-id vectors) and id/code tie-breaks,
training, codes, and search results are bit-reproducible on any cluster
size and SQL-twinnable (fixed-iteration unrolled CTE chain, the
bpe_train_merges precedent).  Component magnitude <= ~1e6 micro-units and
subspace width d/M keep every distance far inside BIGINT.

Scale shape (100 TB corpus):
  - training runs on a bounded deterministic sample (lowest `sample_n`
    ids — TakeOrdered, never a global sort); each iteration is one
    broadcast join (K*M codebook rows) + two hash aggs; the only driver
    traffic is the K*M*(d/M) = K*d centroid table per iteration, the
    same bounded-collect budget as the BPE trainer's one-row-per-merge.
  - encoding is one narrow M-way subvector explode, a broadcast codebook
    join, and two aggs back to (id, codes) — no corpus-side shuffle wider
    than the id.
  - ADC search touches only the codes column: the LUT is a driver-side
    pure-int table folded into literal arrays; the scan is one narrow
    projection + TakeOrdered(k).  The codes frame is ~M bytes/vector —
    the whole point: at 100 TB of raw vectors the scan state fits in a
    fraction of the original I/O.

Reference-parity note: the reference pipeline has no vector search; this
extends the similarity surface (brute_force_topk = ground truth,
ivf_topk = cluster-pruned, rp_lsh_topk = hash-bucketed) with the
compressed-domain path used by public ANN systems (FAISS's IVFPQ is the
canonical implementation).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "snap_micro",
    "subvector_rows",
    "train_codebooks",
    "codebooks_frame",
    "pq_encode",
    "adc_topk",
]

#: Micro-unit scale for component snapping.
_SCALE = 1_000_000


def snap_micro(vec):
    """array<float> -> array<long> integer micro-units.  The element is
    cast to DOUBLE before the multiply: the source column is float32, and
    a single-precision x*1e6 lands on different integers near .5
    boundaries than the double product every other engine computes.
    SQL twin: list_transform(v, x -> round(x::DOUBLE * 1e6)::BIGINT)."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * _SCALE, 0).cast("long")
    )


def _sqdist(a, b):
    """Exact integer squared L2 between two micro-int arrays (equal
    length).  SQL twin: list_sum(list_transform(generate_series(1,len(a)),
    i -> (a[i]-b[i])*(a[i]-b[i])))."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def subvector_rows(
    df: DataFrame,
    m_subspaces: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, m, sub): the M contiguous micro-snapped subvectors of every
    vector.  dim must be divisible by m_subspaces (asserted here, not at
    runtime — the slice bounds are plan constants)."""
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by M {m_subspaces}")
    w = dim // m_subspaces
    snapped = snap_micro(F.col(vec_col))

    def _subs(sv):
        return F.transform(
            F.sequence(F.lit(0), F.lit(m_subspaces - 1)),
            lambda m: F.struct(
                m.alias("m"), F.slice(sv, m * w + 1, w).alias("sub")
            ),
        )

    parts = F.transform(F.array(snapped), _subs).getItem(0)
    return df.select(F.col(id_col), F.explode(parts).alias("p")).select(
        id_col, F.col("p.m").alias("m"), F.col("p.sub").alias("sub")
    )


def _round_half_away(s: int, c: int) -> int:
    """round(s / c) with ties away from zero, in pure integer arithmetic
    (matches Spark F.round/HALF_UP and DuckDB round on the same mean)."""
    if s >= 0:
        return (2 * s + c) // (2 * c)
    return -((2 * (-s) + c) // (2 * c))


def train_codebooks(
    df: DataFrame,
    m_subspaces: int,
    k: int,
    dim: int,
    iters: int = 2,
    sample_n: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """Per-subspace k-means codebooks as a [M][K][d/M] list of micro-int
    centroids — a driver-side MODEL object (K*d integers total), like the
    centroid lists the IVF path ships.

    Deterministic by construction: seeds are the subvectors of the K
    lowest-id sample vectors (TakeOrdered); assignment breaks distance
    ties on the lower code; empty clusters keep their previous centroid
    (the standard k-means convention that keeps K stable).
    """
    base = df
    if sample_n is not None:
        base = df.orderBy(F.col(id_col)).limit(sample_n)
    rows = subvector_rows(base, m_subspaces, dim, id_col, vec_col)
    rows = rows.persist()
    try:
        seed_rows = (
            rows.orderBy(id_col, "m").limit(k * m_subspaces).collect()
        )
        # seeds: for each m, the k lowest-id subvectors
        cb: list[list[list[int]]] = [[] for _ in range(m_subspaces)]
        for r in sorted(seed_rows, key=lambda r: (r["m"], r[id_col])):
            if len(cb[r["m"]]) < k:
                cb[r["m"]].append([int(x) for x in r["sub"]])
        for m in range(m_subspaces):
            if len(cb[m]) < k:
                raise ValueError(
                    f"subspace {m}: only {len(cb[m])} seed vectors for k={k}"
                )
        spark = df.sparkSession
        w = dim // m_subspaces
        for _ in range(iters):
            cbf = codebooks_frame(spark, cb)
            assigned = (
                rows.join(F.broadcast(cbf), "m")
                .select(
                    id_col,
                    "m",
                    "sub",
                    "code",
                    _sqdist(F.col("sub"), F.col("centroid")).alias("d2"),
                )
                .groupBy(id_col, "m")
                .agg(
                    F.min(F.struct("d2", "code", "sub")).alias("best")
                )
                .select("m", F.col("best.code").alias("code"),
                        F.col("best.sub").alias("sub"))
            )
            sums = (
                assigned.select(
                    "m", "code", F.posexplode("sub").alias("pos", "val")
                )
                .groupBy("m", "code", "pos")
                .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
                .collect()
            )
            acc: dict[tuple[int, int], list] = {}
            for r in sums:
                acc.setdefault((r["m"], r["code"]), [None] * w)[r["pos"]] = (
                    int(r["s"]),
                    int(r["c"]),
                )
            new_cb = [
                [list(cb[m][code]) for code in range(k)]
                for m in range(m_subspaces)
            ]
            for (m, code), dims in acc.items():
                new_cb[m][code] = [
                    _round_half_away(s, c) for (s, c) in dims
                ]
            cb = new_cb
    finally:
        rows.unpersist()
    return cb


def codebooks_frame(spark, cb: list[list[list[int]]]) -> DataFrame:
    """The codebook model as a (m, code, centroid array<long>) frame —
    K*M rows, always broadcast at the join sites."""
    data = [
        (m, code, cb[m][code])
        for m in range(len(cb))
        for code in range(len(cb[m]))
    ]
    return spark.createDataFrame(
        data, "m int, code int, centroid array<bigint>"
    )


def pq_encode(
    df: DataFrame,
    cb: list[list[list[int]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each vector's M nearest-centroid codes in
    subspace order.  One subvector explode, one broadcast codebook join,
    one argmin agg per (id, m), one reassembly agg per id — the encode
    pass any 100 TB corpus pays exactly once."""
    m_subspaces = len(cb)
    rows = subvector_rows(df, m_subspaces, dim, id_col, vec_col)
    cbf = codebooks_frame(df.sparkSession, cb)
    best = (
        rows.join(F.broadcast(cbf), "m")
        .select(
            id_col, "m", "code",
            _sqdist(F.col("sub"), F.col("centroid")).alias("d2"),
        )
        .groupBy(id_col, "m")
        .agg(F.min(F.struct("d2", "code")).alias("best"))
        .select(id_col, "m", F.col("best.code").alias("code"))
    )
    return (
        best.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
    )


def snap_micro_py(x: float) -> int:
    """Driver-side micro-unit snap for QUERY vectors: half-up on the exact
    decimal expansion of the IEEE double (python round() is banker's and
    would disagree with the engines at .5 boundaries)."""
    return int(
        (Decimal(x) * _SCALE).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def adc_topk(
    codes_df: DataFrame,
    cb: list[list[list[int]]],
    query: list[float] | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    query_micro: list[int] | None = None,
) -> DataFrame:
    """(id, adc_dist, rank): the k nearest stored vectors to the query by
    asymmetric PQ distance — exact integer sum over M of the precomputed
    query-to-centroid table, ties by id.  Pass `query_micro` (integer
    micro-units, the unambiguous form) or `query` (floats, snapped via
    snap_micro_py).

    The LUT is computed here in pure Python integers (M*K entries) and
    folded into the plan as array literals: the executor-side work per
    row is M element_at lookups + an integer sum, then TakeOrdered(k).
    The rank window runs AFTER the limit — a k-row bounded frame, never a
    global single-partition pass over the corpus.
    SQL twin: the same literal arrays via list_value, adc =
    lut1[codes[1]+1] + ... + lutM[codes[M]+1]."""
    m_subspaces = len(cb)
    dim = sum(len(cb[m][0]) for m in range(m_subspaces))
    w = dim // m_subspaces
    if query_micro is None:
        if query is None:
            raise ValueError("pass query or query_micro")
        query_micro = [snap_micro_py(x) for x in query]
    luts = []
    for m in range(m_subspaces):
        qs = query_micro[m * w : (m + 1) * w]
        luts.append(
            [
                sum((a - b) * (a - b) for a, b in zip(qs, cent))
                for cent in cb[m]
            ]
        )
    dist = None
    for m in range(m_subspaces):
        lut = F.array(*[F.lit(v) for v in luts[m]])
        term = F.element_at(lut, F.element_at("codes", m + 1) + 1)
        dist = term if dist is None else dist + term
    scored = codes_df.select(id_col, dist.alias("adc_dist"))
    top = scored.orderBy(F.col("adc_dist").asc(), F.col(id_col)).limit(k)
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("adc_dist").asc(), F.col(id_col))
        ),
    )
