"""Scalar (int8-style) embedding quantization + ADC search — the
uniform per-dimension quantizer (Gray & Neuhoff 1998's uniform scalar
quantization; the SQ8 index lane of the common ANN toolboxes, e.g.
faiss's ScalarQuantizer — public method): each dimension is linearly
mapped onto ``levels`` integer codes between its corpus min and max,
compressing a float32 vector 4x with no codebook training at all, and
search runs against the DEQUANTIZED codes (asymmetric distance: exact
query vs quantized corpus).

This completes the embedding-compression lane next to PQ
(operators/pq.py): PQ buys ~32x at codebook-training cost and
coarser distances; SQ buys 4x with a training step that is ONE min/max
aggregate and distances within half a quantization step per dimension.
At 100 TB the decision is storage-tier economics — both share the
snap-to-integer-micro discipline so both are value-exact twinnable.

Exactness discipline (the r10 float policy): vectors snap to integer
micro-units first (pq.snap_micro — double-cast multiply, the pinned
cross-engine form); training, encoding, dequantization and distances
are then ALL integer arithmetic (operands bounded well under 2^53, so
Spark's floor(a/b) double path is exact and equals DuckDB's `//`).

Scale shape (100 TB): training is one posexplode + a dim-row hash agg
(map-side combinable); the dim-row bounds frame is a bounded protocol
collect (the model-collect discipline — same as PQ's codebooks and
qsketch's boundaries) inlined as plan literals, so encoding is a pure
whole-stage-codegen projection with ZERO joins and the corpus never
shuffles; search is per-query TakeOrdered(k) over the same projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pq import _sqdist, snap_micro

__all__ = [
    "sq_train_bounds",
    "sq_encode",
    "sq_dequantize",
    "sq_adc_topk",
]

DEFAULT_LEVELS = 256


def sq_train_bounds(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> tuple[list[int], list[int]]:
    """Per-dimension (lo, hi) micro-int bounds of the corpus — the
    entire "training" of the scalar quantizer.  Returns two dim-length
    Python lists (a bounded protocol collect: ONE row of 2*dim+2
    scalars, the model-collect discipline) ready to inline as literals.

    Plan shape: one pass of 2*dim min/max aggregates over
    try_element_at on the RAW float array — no row expansion (the
    posexplode form paid a dim-fold row blow-up: measured 6.7x slower
    at 10M x 64) and no per-element snap (round-to-micro is monotone
    non-decreasing, so snap(min(S)) == min(snap(S)) exactly and the
    2*dim extremes snap driver-side via snap_micro_py, the pinned
    cross-engine form).  try_element_at (not element_at) so a
    short vector NULLs out instead of aborting the ANSI session — the
    min/max(size) aggregates then report the dimension mismatch
    LOUDLY.

    SQL twin: group the posexploded snapped vectors by position and
    take min/max — same values by monotonicity."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    from .pq import snap_micro_py

    vec = F.col(vec_col)
    aggs = [
        F.min(F.size(vec)).alias("_dmin"),
        F.max(F.size(vec)).alias("_dmax"),
    ]
    for i in range(dim):
        e = F.try_element_at(vec, F.lit(i + 1))
        aggs.append(F.min(e).alias(f"_lo{i}"))
        aggs.append(F.max(e).alias(f"_hi{i}"))
    row = df.agg(*aggs).collect()[0]
    if row["_dmin"] != dim or row["_dmax"] != dim:
        raise ValueError(
            f"expected {dim} dimensions, corpus has sizes in "
            f"[{row['_dmin']}, {row['_dmax']}]"
        )
    lo = [snap_micro_py(float(row[f"_lo{i}"])) for i in range(dim)]
    hi = [snap_micro_py(float(row[f"_hi{i}"])) for i in range(dim)]
    return lo, hi


def _lit_arr(vals: list[int]):
    return F.array(*[F.lit(int(v)).cast("long") for v in vals])


def sq_encode(
    df: DataFrame,
    lo: list[int],
    hi: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = DEFAULT_LEVELS,
) -> DataFrame:
    """(id, code): the per-dimension integer codes in [0, levels-1].

    code_i = min(levels-1, max(0, (x_i - lo_i) * (levels-1)
                                  div max(hi_i - lo_i, 1)))
    — pure integer math over the snapped micro vector with the bounds
    riding as literal arrays; values at the corpus max land exactly on
    levels-1, constant dimensions (hi == lo) on 0.  One codegen
    projection, zero joins, zero shuffles.

    A vector whose length differs from the trained bounds raises at
    encode time (raise_error inside the projection) instead of silently
    emitting NULL codes for the out-of-bounds dimensions — the same
    loud dimension contract sq_train_bounds enforces."""
    if levels < 2:
        raise ValueError(f"levels must be >= 2, got {levels}")
    if len(lo) != len(hi):
        raise ValueError("lo/hi length mismatch")
    lo_a, hi_a = _lit_arr(lo), _lit_arr(hi)
    span = levels - 1
    dim = len(lo)

    def _code(x, i):
        l = F.element_at(lo_a, i + 1)
        h = F.element_at(hi_a, i + 1)
        raw = F.floor(
            ((x - l) * F.lit(span)) / F.greatest(h - l, F.lit(1).cast("long"))
        ).cast("long")
        return F.least(F.lit(span).cast("long"), F.greatest(F.lit(0).cast("long"), raw))

    vec = F.col(vec_col)
    checked = F.when(F.size(vec) == F.lit(dim), snap_micro(vec)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"sq_encode: vector length != trained dim {dim} (got "
                ),
                F.size(vec).cast("string"),
                F.lit(")"),
            )
        )
    )
    return df.select(
        F.col(id_col),
        F.transform(checked, _code).alias("code"),
    )


def sq_dequantize(
    codes: DataFrame,
    lo: list[int],
    hi: list[int],
    levels: int = DEFAULT_LEVELS,
    code_col: str = "code",
) -> DataFrame:
    """Adds ``deq``: the reconstructed micro-int vector
    deq_i = lo_i + code_i * (hi_i - lo_i) div (levels-1) — the exact
    integer reconstruction both engines compute identically."""
    lo_a, hi_a = _lit_arr(lo), _lit_arr(hi)
    span = levels - 1

    def _deq(c, i):
        l = F.element_at(lo_a, i + 1)
        h = F.element_at(hi_a, i + 1)
        return (l + F.floor((c * (h - l)) / F.lit(span)).cast("long")).cast(
            "long"
        )

    return codes.withColumn(
        "deq", F.transform(F.col(code_col), _deq)
    )


def sq_adc_topk(
    codes: DataFrame,
    lo: list[int],
    hi: list[int],
    searches: list[tuple[int, list[int]]],
    k: int = 10,
    levels: int = DEFAULT_LEVELS,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric top-k: exact micro-int query vectors against the
    dequantized corpus codes.  ``searches`` is a bounded driver-side
    list of (q_id, query_micro_vector) — the PQ search protocol
    (pq.snap_micro_py snaps the raw floats).  Output (q_id, rank,
    neighbor_id, adc_sqdist), rank 1-based by (distance, neighbor_id)
    — every column exact integer, so the surface is value-exact
    twinnable (unlike PQ, whose k-means codebooks force a bounded
    gate, SQ's min/max training is itself exact).

    Scale: the dequantized projection is codegen-only; each query is a
    literal array + TakeOrdered(k) — per-query cost is one corpus scan
    section with no shuffle, and the union is |searches| x k rows."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not searches:
        raise ValueError("searches must be non-empty")
    deq = sq_dequantize(codes, lo, hi, levels)
    out = None
    for q_id, qm in searches:
        q_arr = _lit_arr(qm)
        scored = (
            deq.filter(F.col(id_col) != F.lit(int(q_id)))
            .select(
                F.lit(int(q_id)).cast("long").alias("q_id"),
                F.col(id_col).alias("neighbor_id"),
                _sqdist(F.col("deq"), q_arr).alias("adc_sqdist"),
            )
            .orderBy("adc_sqdist", "neighbor_id")
            .limit(k)
        )
        out = scored if out is None else out.unionByName(scored)
    w = F.row_number().over(
        Window.partitionBy("q_id").orderBy("adc_sqdist", "neighbor_id")
    )
    return out.select(
        "q_id", w.cast("long").alias("rank"), "neighbor_id", "adc_sqdist"
    ).orderBy("q_id", "rank")
