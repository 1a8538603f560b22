"""Bloom-filter pre-join: cut the probe side's shuffle volume before an
exact join, the way Spark's runtime row-level filtering does — but as an
explicit, inspectable operator.

The build side's keys are hashed K ways into an M-bit bitmap (one tiny
aggregation), the bitmap is folded to the driver (<= M/64 rows) and inlined
into the probe-side filter as a LITERAL array — so the probe side is pruned
during its scan, before any exchange, with zero extra joins. Because a Bloom
filter admits false positives, the exact join still runs afterward; the
bitmap only removes rows that provably cannot match (no false negatives),
so the operator is result-identical to the plain join.

At 100 TB this is the difference between shuffling the full probe table and
shuffling only ~selectivity of it; Spark's own
spark.sql.optimizer.runtime.bloomFilter.enabled does the same injection
when statistics justify it — this operator makes the decision explicit and
testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Default geometry: M must be a multiple of 64 (bitmap lanes are longs).
DEFAULT_M_BITS = 1 << 16
DEFAULT_K = 4

# Distinct seeds make the K hash functions independent; any fixed values work
# as long as build and probe use the same ones.
_SEEDS = (0x9E37, 0x85EB, 0xC2B2, 0x27D4, 0x1656, 0xFF51)


def _positions(key: Column, k: int, m_bits: int) -> list[Column]:
    """K bit positions for a key: pmod(xxhash64(key, seed_i), M)."""
    return [F.pmod(F.xxhash64(key, F.lit(int(s))), F.lit(m_bits)) for s in _SEEDS[:k]]


def _shl1(nbits: Column) -> Column:
    """1L << nbits with a Column shift amount (F.shiftleft only takes ints)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), nbits)


def build_bloom_lanes(
    build: DataFrame, key: str, k: int = DEFAULT_K, m_bits: int = DEFAULT_M_BITS
) -> list[int]:
    """Aggregate the build side's keys into an M-bit bitmap, returned as
    M/64 Python ints (lane-ordered) ready to inline as a literal.

    Plan: explode K positions per row -> groupBy lane -> bit_or of the
    single-bit masks. The aggregation output is at most M/64 rows — the
    driver fold is the broadcast step, not a data collect.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key), k, m_bits))).alias("p")
    lanes = (
        build.select(pos)
        .select(
            (F.col("p") / 64).cast("long").alias("lane"),
            _shl1((F.col("p") % 64).cast("int")).alias("mask"),
        )
        .groupBy("lane")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for row in lanes:
        out[row["lane"]] = row["bits"]
    return out


def bloom_might_contain(
    key: Column, lanes: list[int], k: int = DEFAULT_K, m_bits: int | None = None
) -> Column:
    """Probe predicate: all K bits set in the literal bitmap.

    The bitmap enters the plan as a constant array<long>; the predicate is
    pure Column math (xxhash64 + element_at + bitwise and), so it is
    evaluated inside whole-stage codegen during the probe scan and rows are
    dropped before any shuffle.
    """
    m = m_bits or (len(lanes) * 64)
    lit_lanes = F.array(*[F.lit(int(v)).cast("long") for v in lanes])
    pred = F.lit(True)
    for p in _positions(key, k, m):
        mask = _shl1((p % 64).cast("int"))
        lane = F.element_at(lit_lanes, ((p / 64).cast("int") + 1))
        pred = pred & (lane.bitwiseAND(mask) == mask)
    return pred


# Build sides at or below this many rows fit Spark's default broadcast
# threshold (10 MB) with room to spare for 8-byte keys, so the exact semi
# join already runs as a broadcast hash join with no probe shuffle — a Bloom
# pre-pass there is pure overhead (measured 8x the plain join at sf0.1,
# VERDICT r2). Above it, the probe side faces a real exchange and scan-stage
# pruning pays for itself.
BYPASS_BUILD_ROWS = 1_000_000


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
    bypass_below_rows: int | None = BYPASS_BUILD_ROWS,
    build_rows: int | None = None,
) -> DataFrame:
    """Semi-join `probe` to `build` with a Bloom pre-filter on the probe scan.

    Result-identical to probe.join(build, keys, "left_semi"): the bitmap pass
    only discards provable non-members; survivors (true matches + false
    positives) still go through the exact semi join.

    Break-even guard: when the build side has at most ``bypass_below_rows``
    rows, the bitmap build is skipped and the plain semi join runs — below
    the broadcast threshold the exact join never shuffles the probe side,
    so the pre-filter cannot win.

    NOTE — this makes the call EAGER: unless ``build_rows`` is given, the
    guard runs a LIMIT-bounded count() job at DataFrame-construction time
    (key column only, scans at most threshold+1 rows — it never
    materializes a huge build pipeline just to learn it is huge), and the
    probe re-executes the build-side pipeline on every invocation. Callers
    that already know the build-side cardinality (table statistics, a
    previous count) should pass ``build_rows`` to keep the call fully
    lazy. Pass ``bypass_below_rows=None`` to force the Bloom path
    (tests do).
    """
    if bypass_below_rows is not None and (
        build_rows
        if build_rows is not None
        else build.select(build_key).limit(bypass_below_rows + 1).count()
    ) <= bypass_below_rows:
        pre = probe
    else:
        lanes = build_bloom_lanes(build, build_key, k=k, m_bits=m_bits)
        pre = probe.filter(bloom_might_contain(F.col(probe_key), lanes, k=k))
    return pre.join(
        build.select(F.col(build_key).alias("__bk")).distinct(),
        F.col(probe_key) == F.col("__bk"),
        "left_semi",
    )
