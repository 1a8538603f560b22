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

from pyspark.sql import Column, DataFrame, Window
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


# ---------------------------------------------------------------------------
# Bloom first-seen dedup: the approximate-membership analog of exact
# first-seen dedup (streaming/neardup.stream_first_seen_dedup), for the
# regime where the seen-key set itself is too large to keep — the
# standard bounded-memory URL/doc-id dedup of web-scale crawl pipelines
# (Broder & Mitzenmacher 2004, "Network applications of Bloom filters").
#
# Semantics are ITEM-LEVEL and order-exact: an item is flagged
# `bloom_dup` iff every one of its k bit positions was set by an item
# with a STRICTLY SMALLER order value.  That definition is a pure
# function of the (order, key) set — computable in one batch pass (the
# first-set time of a bit is the min order over items hashing to it),
# replayable as a micro-batch fold (streaming/bloomstream.py), and
# value-exact twinnable in SQL.  No false negatives: a true duplicate's
# bits were all set by its earlier occurrence.
#
# These positions use the md5 h60 hash (functions/hashing.py), NOT the
# xxhash64 lanes above: the pre-join filter needs speed only, the dedup
# lane needs a cross-engine twin.  SQL twin per position i:
#   ('0x' || substr(md5(i || ':' || key), 1, 15))::BIGINT % m_bits
# ---------------------------------------------------------------------------

from ..functions.hashing import h60  # noqa: E402

#: Dedup-lane defaults: sized so a ~10^3..10^4-key corpus exercises a
#: real (but bounded) false-positive regime; production callers size
#: m_bits from the expected distinct count (m ~ 10-15 bits/key for
#: <1% fp at k=4).
DEDUP_M_BITS = 8192
DEDUP_K = 4

#: Broadcast ceiling for the first-set state frame (<= m_bits rows of
#: (bit, t_first) = ~16 bytes/row -> ~128 MB at 2^23).  Production
#: sizing is m ~ 10-15 bits per expected distinct key, so a 10^9-key
#: corpus wants m_bits ~ 2^34 — far past any broadcast: above the
#: ceiling the flags join runs as a plain (shuffled) hash join on `bit`
#: instead, which is still bounded-state (the frame never exceeds
#: m_bits rows) but no longer pretends to fit every executor's memory.
BROADCAST_STATE_MAX_BITS = 1 << 23


def bloom_positions_md5(key: Column, k: int = DEDUP_K, m_bits: int = DEDUP_M_BITS) -> Column:
    """Array of the k md5-derived bit positions of a (string) key."""
    return F.array(
        *[(h60(key, seed=i) % F.lit(m_bits)).cast("long") for i in range(k)]
    )


def bloom_first_seen_flags(
    df: DataFrame,
    key_col: str,
    order_col: str,
    k: int = DEDUP_K,
    m_bits: int = DEDUP_M_BITS,
    first_set: DataFrame | None = None,
) -> DataFrame:
    """(order, key, bloom_dup): order-exact approximate first-seen flags.

    ``order_col`` must be UNIQUE per row (an event id, an offset): ties
    would make "strictly earlier" ambiguous.  NULL keys/orders are
    dropped (the cm_build convention).  ``first_set`` optionally injects
    an external (bit, t_first) frame (the streaming store's prior
    state); it is min-merged with the batch's own first-set times, which
    is what makes the micro-batch fold equal this batch semantics when
    batches are order-aligned.

    Scale shape (100 TB): one explode (k rows/item, narrow) -> one hash
    agg to <= m_bits first-set rows (map-side combinable) -> a join of
    that bounded frame back onto the exploded rows (BROADCAST while
    m_bits <= BROADCAST_STATE_MAX_BITS; above the ceiling — production
    geometries of 10-15 bits/key over billions of keys — a plain hash
    join on `bit`, so the state never has to fit executor memory) ->
    one hash agg back to one row per item (partial agg collapses the k
    rows before the only corpus-keyed shuffle).  State is never more
    than m_bits rows; the seen-KEY set is never materialized.
    """
    if k < 1 or k > 6:
        raise ValueError(f"k must be in [1, 6], got {k}")
    if m_bits < 2:
        raise ValueError(f"m_bits must be >= 2, got {m_bits}")
    base = df.filter(
        F.col(key_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(
        F.col(order_col).alias("o"),
        F.col(key_col).cast("string").alias("key"),
    )
    bits = base.select(
        "o",
        "key",
        F.explode(
            bloom_positions_md5(F.col("key"), k, m_bits)
        ).alias("bit"),
    )
    batch_first = bits.groupBy("bit").agg(F.min("o").alias("t_first"))
    if first_set is not None:
        batch_first = (
            batch_first.unionByName(
                first_set.select("bit", "t_first")
            )
            .groupBy("bit")
            .agg(F.min("t_first").alias("t_first"))
        )
    state = (
        F.broadcast(batch_first)
        if m_bits <= BROADCAST_STATE_MAX_BITS
        else batch_first
    )
    flagged = (
        bits.join(state, "bit")
        .groupBy("o", "key")
        .agg(F.max("t_first").alias("_t_max"))
        .select(
            F.col("o").alias(order_col),
            F.col("key").alias(key_col),
            (F.col("_t_max") < F.col("o")).alias("bloom_dup"),
        )
    )
    return flagged


def bloom_dedup_report(
    df: DataFrame,
    key_col: str,
    order_col: str,
    k: int = DEDUP_K,
    m_bits: int = DEDUP_M_BITS,
) -> DataFrame:
    """One-row accuracy report: the bloom flags beside the EXACT
    first-seen flags — n_items, both dup counts, the false-positive
    count (bloom says dup, exact says first) and fp_per_million over
    the true-first items.  No false negatives by construction (asserted
    by the n_false_neg column, which must read 0).

    The exact lane keys the full corpus (this is the cost the bloom
    lane exists to avoid) — gate-only instrumentation; production
    callers run bloom_first_seen_flags alone."""
    flags = bloom_first_seen_flags(df, key_col, order_col, k, m_bits)
    base = df.filter(
        F.col(key_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(
        F.col(order_col).alias(order_col),
        F.col(key_col).cast("string").alias(key_col),
    )
    exact = base.select(
        order_col,
        key_col,
        (
            F.min(order_col).over(Window.partitionBy(key_col))
            < F.col(order_col)
        ).alias("exact_dup"),
    )
    joined = flags.join(exact, [order_col, key_col])
    return joined.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.count_if("bloom_dup").alias("n_bloom_dup"),
        F.count_if("exact_dup").alias("n_exact_dup"),
        F.count_if(F.col("bloom_dup") & ~F.col("exact_dup")).alias(
            "n_false_pos"
        ),
        F.count_if(~F.col("bloom_dup") & F.col("exact_dup")).alias(
            "n_false_neg"
        ),
    ).select(
        "n_items",
        "n_bloom_dup",
        "n_exact_dup",
        "n_false_pos",
        "n_false_neg",
        # nullif guards the empty-input case: 0 true-first items would be
        # a DIVIDE_BY_ZERO error on an ANSI-on session (NULL is the honest
        # answer — the fp rate over zero trials is undefined).
        F.floor(
            F.col("n_false_pos")
            * F.lit(1_000_000)
            / F.nullif(F.col("n_items") - F.col("n_exact_dup"), F.lit(0))
        ).cast("long").alias("fp_per_million"),
    )
