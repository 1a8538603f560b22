"""Deterministic hash-based sampling and dataset splitting for corpus
construction: stable train/val/test assignment and per-stratum downsampling
that give the SAME verdict for a given record on every run, every engine,
and every cluster size — unlike rand()-based sampling, which is neither
reproducible across retries nor auditable.

The uniform variate is the shared 60-bit md5 hash (functions/hashing.h60)
scaled by 2^-60. Both the hash and the scaling are exact integer/dyadic
operations, so Spark and the DuckDB oracle produce bit-identical doubles and
therefore identical keep/split decisions — sampling is VALUE-exact, not
just statistically equivalent.

Scale: narrow projections + filters only; no shuffle, no Python. Rates
arrive as a Column expression (typically a CASE or a broadcast-join lookup),
so per-stratum policy needs no driver-side data motion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60

#: 2^60 as an exact double — dividing the 60-bit hash by it is an exact
#: dyadic scaling (no rounding), so cross-engine comparisons are stable.
_TWO_60 = float(1 << 60)

#: Distinct hash seeds so the split assignment and the sampling decision are
#: independent uniforms (same doc can be train AND dropped, etc.).
SPLIT_SEED = 101
SAMPLE_SEED = 202


def hash_uniform(key: Column, seed: int) -> Column:
    """Deterministic U[0,1) from a record key. SQL twin:
    ('0x' || substr(md5('<seed>:' || key), 1, 15))::BIGINT / 2^60."""
    return h60(key.cast("string"), seed=seed).cast("double") / F.lit(_TWO_60)


def assign_split(
    df: DataFrame,
    key_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    out_col: str = "split",
) -> DataFrame:
    """Stable train/val/test label from the key hash: u < train -> 'train',
    u < train+val -> 'val', else 'test'. Adding data never reassigns an
    existing record (the property rand()-splits lack)."""
    u = hash_uniform(F.col(key_col), SPLIT_SEED)
    return df.withColumn(
        out_col,
        F.when(u < F.lit(train), F.lit("train"))
        .when(u < F.lit(train + val), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    rate: Column,
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep each record iff its sampling uniform is below `rate` — a Column
    expression evaluated per row, so per-stratum rates are just a CASE (or a
    broadcast-joined policy column). Expected per-stratum yield is
    rate * |stratum| with zero coordination; exact membership is
    reproducible everywhere."""
    u = hash_uniform(F.col(key_col), SAMPLE_SEED)
    return df.filter(u < rate)


#: Seed for the fractional-epoch coin flip in epoch_mix.
MIX_SEED = 303


def epoch_mix(
    df: DataFrame,
    weight: Column,
    key_col: str = "doc_id",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Dataset mixing by target epoch weight: emit floor(weight) copies of
    every record, plus one more with probability frac(weight) — the standard
    way LLM corpora realize 'source A at 2.5 epochs, source B at 0.25' in a
    single pass. weight >= 1 upsamples, weight < 1 downsamples; both use the
    same deterministic hash coin, so the mixed corpus is reproducible.

    Emitted copies carry a 1-based `epoch` index so downstream shuffles
    (e.g. a training-order sort on hash(key, epoch)) can decorrelate the
    duplicates. Narrow generate+explode — no shuffle, no Python; output
    volume is sum(weight_s * |stratum_s|) by construction."""
    n_full = F.floor(weight).cast("int")
    frac = weight - F.floor(weight)
    extra = (hash_uniform(F.col(key_col), MIX_SEED) < frac).cast("int")
    n_copies = n_full + extra
    # Spark's sequence(1, 0) yields [1, 0] (descending), not [] — guard the
    # zero-copy case explicitly so dropped records emit nothing.
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn(epoch_col, F.explode(copies))


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Uniform-without-replacement k records per stratum: rank by the
    sampling hash (then key, for full determinism) within each group and
    keep rank <= k. Reservoir-sampling semantics with an auditable,
    rerun-stable choice of survivors; one hash-partition shuffle on the
    group key."""
    from pyspark.sql import Window as W

    u = hash_uniform(F.col(key_col), SAMPLE_SEED)
    w = W.partitionBy(group_col).orderBy(u, F.col(key_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    order_col: str | None = None,
    zorder: tuple | None = None,
    zorder_bits: int = 16,
) -> None:
    """Materialize a curated corpus as exactly `n_shards` shard files with
    deterministic membership: shard = pmod(xxhash64(key), n_shards) — the
    layout a training dataloader consumes (stable across reruns, unlike
    round-robin repartition, so resumed runs and distributed loaders agree
    on which shard holds which doc).

    One repartition on the shard id (the unavoidable placement shuffle);
    rows sort within each shard by the sampling hash (or `order_col`) so
    iteration order is reproducible too. Writes
    path/shard=<k>/part-*.parquet via partitionBy for pruning-friendly
    reads.

    ``zorder=(col_a, col_b)`` (two non-negative integer bucket Columns)
    opts into Morton-curve INTRA-SHARD ordering instead of the hash
    order (operators/layout.zvalue): each shard file's row groups then
    carry tight min/max ranges in BOTH dimensions, so predicate scans on
    either column skip most row groups — shard membership (and therefore
    dataloader addressing) is unchanged, only the order within each file
    moves. Mutually exclusive with ``order_col`` (z-order IS the order)."""
    if zorder is not None and order_col is not None:
        raise ValueError("pass either order_col or zorder, not both")
    shard = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
    if zorder is not None:
        from .layout import zvalue

        order = zvalue(zorder[0], zorder[1], bits=zorder_bits)
    elif order_col is not None:
        order = F.col(order_col)
    else:
        order = hash_uniform(F.col(key_col), SAMPLE_SEED)
    (
        df.withColumn("shard", shard.cast("int"))
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", order)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


#: Seed for the temperature-mix keep decision (independent of split/sample).
MIX_SEED = 303


def temperature_mix(
    df: DataFrame,
    group_col: str,
    target_rows: float,
    tau: float = 0.5,
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened multi-source sampling — the training-mix
    primitive: source s with c_s rows is kept with rate

        rate_s = min(1, target_rows * p_s / c_s),
        p_s = c_s^tau / sum_t c_t^tau

    so tau=1 preserves natural proportions, tau=0 equalizes sources, and
    tau=0.5 (the common LLM-mix setting, computed via sqrt so the power is
    correctly-rounded IEEE and cross-engine exact) upweights small
    sources. The keep decision is the deterministic md5 hash-coin
    (hash_uniform, MIX_SEED): adding data never flips an existing row's
    decision, and the whole operator is VALUE-exact — rates snap through
    DECIMAL(28,8) at 1e-8 before the comparison so accumulation-order ulps
    in sum(c^tau) cannot move a boundary.

    Scale: one tiny per-source count agg broadcast back; the keep filter
    is a narrow projection — no data shuffle at all. Returns the kept rows
    plus their (rounded) rate column.

    Only tau=0.5 is cross-engine exact (sqrt); other tau values use pow(),
    which may differ by an ulp between libm implementations — fine in
    production, but pin tau=0.5 for oracle-checked paths."""
    if tau == 0.5:
        powed = F.sqrt(F.col("_c"))
    else:
        powed = F.pow(F.col("_c"), F.lit(tau))
    c = df.groupBy(group_col).agg(F.count("*").cast("double").alias("_c"))
    z = c.groupBy().agg(F.sum(powed).alias("_z"))
    rate = F.round(
        (
            F.least(
                F.lit(1.0), F.lit(float(target_rows)) * (powed / F.col("_z")) / F.col("_c")
            )
        ).cast("decimal(28,8)"),
        8,
    ).cast("double")
    rates = c.crossJoin(F.broadcast(z)).select(group_col, rate.alias("rate"))
    u = hash_uniform(F.col(key_col), MIX_SEED)
    return (
        df.join(F.broadcast(rates), group_col)
        .where(u < F.col("rate"))
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    n: int,
) -> DataFrame:
    """Optimal (Neyman) stratified-sample allocation beside the
    proportional baseline (Neyman 1934 — public method): stratum h of
    size N_h and value stddev s_h gets n_h ~ n * N_h s_h / sum(N s),
    minimizing the variance of the stratified mean at fixed total n —
    the allocator a curation pipeline runs BEFORE stratified_sample /
    sample_k_per_group when strata differ in spread.

    Exactness discipline (the r10 float policy): s_h snaps through the
    dround DECIMAL ladder to 6 decimals, scales to an integer
    sd_micro, and every later step is integer math — weight = N_h *
    sd_micro, floor allocation div(n * w, total), and largest-remainder
    top-ups ordered by (remainder DESC, stratum) — so the output is
    value-exact cross-engine and the allocations always sum to exactly
    n.  Degenerate totals (all stddevs 0 or single-row strata) fall
    back to proportional weights (w = N_h) rather than dividing by
    zero.  Integer domain: n * N_h * sd_micro must stay under 2^63 —
    holds for n <= 1e6 with N_h <= 1e9 rows and values <= ~1e3; widen
    to DECIMAL if a deployment exceeds it.

    Scale: one partial+final hash agg over the data (moment tuples on
    the shuffle), then ALL remaining math on the |strata|-row frame —
    the row_number window there is strata-bounded by construction
    (the benford/freq-items class, never data rows)."""
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    from pyspark.sql import Window

    from ..functions.scalars import dround

    per = (
        df.filter(
            F.col(stratum_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .groupBy(F.col(stratum_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dround(F.stddev_samp(value_col), 6).alias("sd6"),
        )
        .withColumn(
            "sd_micro",
            F.round(
                (F.col("sd6") * F.lit(1e6)).cast("decimal(28,6)"), 0
            )
            .cast("long"),
        )
        .withColumn(
            "w_neyman",
            F.col("n_rows") * F.coalesce(F.col("sd_micro"), F.lit(0)),
        )
        .drop("sd6")
        # MATERIALIZE BEFORE FAN-OUT (the cm_check_geometry lesson): the
        # apportionment below references this frame through four scalar
        # combines x two passes — left lazy, each reference replays the
        # corpus agg (measured: 64 parquet scans of the input in the
        # static plan).  The frame is |strata| rows, so the pin is free.
        .localCheckpoint(eager=True)
    )

    def _largest_remainder(frame: DataFrame, w_col: str, out_col: str):
        tot = frame.agg(F.sum(w_col).alias("_tot"))
        f = frame.crossJoin(F.broadcast(tot))
        # degenerate total -> proportional fallback on row counts
        f = f.withColumn(
            "_w",
            F.when(F.col("_tot") > 0, F.col(w_col)).otherwise(
                F.col("n_rows")
            ),
        )
        tot2 = f.agg(F.sum("_w").alias("_tot2"))
        f = f.drop("_tot").crossJoin(F.broadcast(tot2))
        f = f.withColumn(
            "_base", F.expr(f"div({n} * _w, _tot2)")
        ).withColumn("_rem", F.lit(n) * F.col("_w") - F.col("_base") * F.col("_tot2"))
        leftover = f.agg(
            (F.lit(n) - F.sum("_base")).alias("_left")
        )
        f = f.crossJoin(F.broadcast(leftover))
        w = Window.orderBy(F.col("_rem").desc(), F.col("stratum"))
        return (
            f.withColumn("_rk", F.row_number().over(w))
            .withColumn(
                out_col,
                (
                    F.col("_base")
                    + F.when(F.col("_rk") <= F.col("_left"), F.lit(1)).otherwise(
                        F.lit(0)
                    )
                ).cast("long"),
            )
            .drop("_w", "_tot2", "_base", "_rem", "_left", "_rk")
        )

    out = _largest_remainder(per, "w_neyman", "alloc_neyman")
    out = _largest_remainder(out, "n_rows", "alloc_proportional")
    return out.select(
        "stratum",
        "n_rows",
        F.coalesce(F.col("sd_micro"), F.lit(0)).alias("sd_micro"),
        F.col("w_neyman").alias("weight_micro"),
        "alloc_neyman",
        "alloc_proportional",
    )
