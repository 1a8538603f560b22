"""Mergeable quantile sketch from a bottom-k-by-hash uniform sample —
the quantile lane of the sketch family (cmsketch = frequencies, kmv =
distinct counts, sketches.hll = union-only distincts; this module =
medians / percentiles / CDFs), for the places the reference computes an
exact per-group median (reference write_hourly_aggregation, :345-363,
``median(total_ms)``) but a 100 TB deployment cannot: exact order
statistics need a global sort or a full value histogram, while a
bottom-k sample is one TakeOrdered pass, k rows of state, and merges
across days/shards/streams without re-touching the corpus.

Method (all public): taking the k rows whose 60-bit md5 row-hash is
smallest is a simple random sample WITHOUT replacement of size
min(k, n) (bottom-k sketches, Cohen & Kaplan 2007; the hash plays the
role of Vitter 1985's reservoir coin, made deterministic and mergeable).
Sample order statistics estimate quantiles: the estimated q-quantile is
the ceil(q*m)-th smallest sampled value (m = sample size), with rank
error <= eps w.p. 1-delta for k >~ ln(2/delta) / (2*eps^2) (DKW bound;
k = 1024 gives ~5% rank error at 3 sigma).  Sampling-based quantile
summaries are the classical baseline of Manku, Rajagopalan & Lindsay
1998 (SIGMOD) — the compacting refinements (GK, KLL) trade this
module's exact mergeability and twin-determinism for smaller k; at
k ~ 1e3 the sample IS broadcast-sized, so the simple form wins here.

Determinism & twinnability: the row hash is the repo's shared 60-bit
md5 (functions/hashing.h60), the sketch rows are ordered by (h, v) —
a total order, so the sketch CONTENTS are value-exact twinnable:

    ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT

Estimator exactness discipline (the r10 float policy): estimated
quantile VALUES are copied input values (no arithmetic — bit-identical
in any engine reading the same parquet); ranks and CDF points are
BIGINT micro-units computed with exact integer arithmetic (the
floor-of-one-correctly-rounded-division argument is spelled out at
_rank_of, below).  No derived float column in any output surface.

Scale shape (100 TB): q_build is one projection + TakeOrdered(k) —
never a global sort, never a corpus-sized shuffle row.  Grouped builds
are one row_number window over (group, h) — per-group state is one
counter.  Sketches are <= k rows, so merges, roll-ups, quantile reads
and CDF probes are driver-light k-row frames; the corpus is touched
exactly once, by the build.

CONTRACT: ``id_col`` must be unique per row of the sampled population
(duplicate ids bias the sample toward their rows; NULL ids/values are
excluded — quantiles are over the non-null value population).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h60

#: hash range: h60 is the first 15 hex digits of md5 = [0, 2^60).
M = 1 << 60

#: default sample size (rank error ~ sqrt(ln(2/δ)/2k): ~5% at 3σ)
K = 1024

MICRO = 1_000_000


def q_hash(col: Column) -> Column:
    """The sample-selection hash of the row-id column (cast to string
    first — Spark and SQL render integers identically).  SQL twin:
    ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT"""
    return h60(col.cast("string"))


def q_build(
    df: DataFrame,
    value_col: str = "v",
    id_col: str = "id",
    k: int = K,
    prefilter: int | None = None,
) -> DataFrame:
    """The quantile sketch of a value column: a 2-column frame (h, v)
    holding the k rows with the smallest row-id hashes — a uniform
    sample without replacement of the non-null (id, value) population.

    Plan shape: filter + project-to-(hash, value), TakeOrdered(k) on
    (h, v).  No global sort, no aggregation — the cheapest of the three
    sketch builds (KMV needs a distinct, CM a groupBy).

    ``prefilter``: an upper bound on surviving hashes (e.g. the prior
    epoch's kth sample hash) — pushes a scan-side filter so the
    per-partition top-k heaps and the driver-side merge see ~k rows per
    partition instead of the corpus (the kmv_build theta trick).
    CONTRACT: the bound must be >= the true kth smallest hash of the new
    population; a filtered sketch that comes back with FEWER than k rows
    may have cut real minima — the unsaturated n_sample surfaces in
    q_quantiles' output, so gate on n_sample == k when the population is
    known to exceed k (pinned by test).

    The (h, v) tie-break makes the kept rows a TOTAL order even under
    an h60 collision between two distinct ids (~2^-60 per pair), so the
    sketch bytes are deterministic and twin-exact."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    out = (
        df.filter(F.col(id_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            q_hash(F.col(id_col)).alias("h"),
            F.col(value_col).alias("v"),
        )
    )
    if prefilter is not None:
        out = out.filter(F.col("h") < F.lit(int(prefilter)))
    return out.orderBy("h", "v").limit(k)


def q_build_grouped(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "v",
    id_col: str = "id",
    k: int = K,
) -> DataFrame:
    """Per-group quantile sketches in one frame (group_cols..., h, v) —
    the scalable form of the reference's per-hour exact median
    (reference :345-363) when the percentiles must also roll up: per-
    (hour, status) samples re-minimize into per-day / per-status samples
    (q_merge_grouped) without touching the corpus again, which an exact
    median cannot do.

    Plan shape: one row_number window partitioned by group over (h, v).
    One shuffle; per-group window state is one counter.  Output is
    <= k rows per group."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not group_cols:
        # an empty partitionBy would funnel the corpus into ONE window
        # partition — the global-window hazard plan lint polices; the
        # global form is q_build (TakeOrdered).
        raise ValueError("group_cols must be non-empty; use q_build")
    w = Window.partitionBy(*group_cols).orderBy("h", "v")
    return (
        df.filter(F.col(id_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            *group_cols,
            q_hash(F.col(id_col)).alias("h"),
            F.col(value_col).alias("v"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(int(k)))
        .drop("_rn")
    )


def q_merge(*sketches: DataFrame, k: int = K) -> DataFrame:
    """Sketch of the CONCATENATION of the underlying populations: union
    the sample rows, keep the k smallest by (h, v) — exactly q_build of
    the concatenated inputs when row ids are globally unique across
    inputs (the mergeable-summaries contract; pinned by test).  distinct
    makes the merge idempotent (overlapping stores contribute each
    sampled row once); inputs must share k and the h60 hash."""
    if not sketches:
        raise ValueError("q_merge needs at least one sketch")
    out = sketches[0].select("h", "v")
    for s in sketches[1:]:
        out = out.unionByName(s.select("h", "v"))
    return out.distinct().orderBy("h", "v").limit(k)


def q_merge_grouped(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = K,
) -> DataFrame:
    """Re-minimize per-group sample rows under a COARSER grouping — the
    roll-up: feed per-(day, hour) sketch rows with group_cols=["day"]
    and get per-day samples of the concatenated hour populations.  Also
    merges same-group rows from different stores (union the frames
    first).  Input is sketch rows (<= k per input group), so this never
    touches corpus data."""
    if not group_cols:
        # roll-up to the GLOBAL sketch: k-row inputs, use the
        # TakeOrdered form rather than a single-partition window
        return q_merge(sketches, k=k)
    w = Window.partitionBy(*group_cols).orderBy("h", "v")
    return (
        sketches.select(*group_cols, "h", "v")
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(int(k)))
        .drop("_rn")
    )


def _p_micros(probs: list[float]) -> list[int]:
    """Quantile probabilities as exact integer micro-units (driver-side,
    deterministic — the only float->int conversion in the module)."""
    out = []
    for p in probs:
        pm = int(round(float(p) * MICRO))
        if not 0 <= pm <= MICRO:
            raise ValueError(f"prob {p} outside [0, 1]")
        out.append(pm)
    if not out:
        raise ValueError("probs must be non-empty")
    return out


def _rank_of(p_micro: Column, n: Column) -> Column:
    """1-based sample rank of the p-quantile: max(1, ceil(p*n)), as
    exact integer math.  ceil(p_micro*n/1e6) = (p_micro*n + 999999)
    div 1e6: the numerator is an exact BIGINT <= ~1e6*k ~ 1e9 << 2^53,
    so its DOUBLE image is exact, the division is one correctly-rounded
    IEEE op whose true value is >= 1e-6 from the next-lower integer
    whenever it is not itself integral (rationals with denominator 1e6)
    while the rounding error is <= one ulp (~2e-13 at this magnitude) —
    therefore floor of the rounded quotient equals the exact integer
    quotient, in Spark and in any IEEE SQL engine.  SQL twin uses pure
    integer division: greatest(1, (p_micro*n + 999999) // 1000000)."""
    num = p_micro * n + F.lit(MICRO - 1)
    return F.greatest(F.lit(1).cast("long"), F.floor(num / F.lit(MICRO)))


def q_quantiles(
    sketch: DataFrame, probs: list[float], k: int = K
) -> DataFrame:
    """(p_micro, n_sample, est_value) per requested probability: the
    estimated quantiles.  est_value is the rank-of-p order statistic of
    the sampled values — a COPIED input value (bit-exact twinnable), not
    an interpolation.  When the sample is unsaturated (n_sample < k the
    population was smaller than k) the estimate is the EXACT discrete
    quantile of the population.

    Plan: one bounded aggregation (array_sort(collect_list) over <= k
    rows — the pq.py/spans.py bounded-collect discipline), then a
    per-prob projection via a literal explode.  Driver-light."""
    pms = _p_micros(probs)
    agg = sketch.agg(
        F.array_sort(F.collect_list("v")).alias("vs"),
        F.count(F.lit(1)).cast("long").alias("n_sample"),
    ).filter(
        # empty sketch -> empty result, NOT a row of NULLs: under the
        # vanilla session's ANSI mode element_at([], 1) throws, and an
        # all-NULL quantile row is a trap either way
        F.col("n_sample") > 0
    )
    probe = agg.select(
        F.explode(
            F.array(*[F.lit(pm).cast("long") for pm in pms])
        ).alias("p_micro"),
        "n_sample",
        "vs",
    )
    return probe.select(
        "p_micro",
        "n_sample",
        F.element_at(
            F.col("vs"), _rank_of(F.col("p_micro"), F.col("n_sample")).cast("int")
        ).alias("est_value"),
    )


def q_quantiles_grouped(
    sketch: DataFrame,
    group_cols: list[str],
    probs: list[float],
    k: int = K,
) -> DataFrame:
    """(group_cols..., p_micro, n_sample, est_value): per-group
    estimated quantiles — one bounded hash agg over <= k-row groups,
    same order-statistic estimator as q_quantiles."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty; use q_quantiles")
    pms = _p_micros(probs)
    agg = sketch.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("v")).alias("vs"),
        F.count(F.lit(1)).cast("long").alias("n_sample"),
    )
    probe = agg.select(
        *group_cols,
        F.explode(
            F.array(*[F.lit(pm).cast("long") for pm in pms])
        ).alias("p_micro"),
        "n_sample",
        "vs",
    )
    return probe.select(
        *group_cols,
        "p_micro",
        "n_sample",
        F.element_at(
            F.col("vs"), _rank_of(F.col("p_micro"), F.col("n_sample")).cast("int")
        ).alias("est_value"),
    )


def q_cdf_micro(sketch: DataFrame, points: list) -> DataFrame:
    """(x, n_sample, rank_micro) per probe point: the estimated CDF in
    BIGINT micro-units — rank_micro = floor(1e6 * |{v <= x}| / n).
    Exact integer surface: count*1e6 <= 1e6*k ~ 1e9 << 2^53, same
    floor-of-one-division argument as _rank_of.  SQL twin:
    (1000000 * count(*) FILTER (v <= x)) // count(*).

    The unbiased-rank property of the uniform sample makes this the
    two-sided companion of q_quantiles: quantiles go p -> value, the
    CDF goes value -> p (e.g. "what fraction of latencies exceed the
    SLA threshold"), both from the same k rows."""
    if not points:
        raise ValueError("points must be non-empty")
    agg = sketch.agg(
        F.array_sort(F.collect_list("v")).alias("vs"),
        F.count(F.lit(1)).cast("long").alias("n_sample"),
    ).filter(
        # empty sketch -> empty result (ANSI-safe: no 0/0 rank division)
        F.col("n_sample") > 0
    )
    probe = agg.select(
        F.explode(F.array(*[F.lit(x) for x in points])).alias("x"),
        "n_sample",
        "vs",
    )
    le = F.size(F.filter(F.col("vs"), lambda v: v <= F.col("x"))).cast(
        "long"
    )
    return probe.select(
        "x",
        "n_sample",
        F.floor(le * F.lit(MICRO) / F.col("n_sample")).alias("rank_micro"),
    )


def q_cdf_micro_grouped(
    sketch: DataFrame, group_cols: list[str], points: list
) -> DataFrame:
    """(group_cols..., x, n_sample, rank_micro): the per-group estimated
    CDF at each probe point — "fraction of latencies over the SLA
    threshold, per tenant" from the grouped sketch's <= k-row groups.
    Same exact integer surface as q_cdf_micro."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty; use q_cdf_micro")
    if not points:
        raise ValueError("points must be non-empty")
    agg = sketch.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("v")).alias("vs"),
        F.count(F.lit(1)).cast("long").alias("n_sample"),
    )
    probe = agg.select(
        *group_cols,
        F.explode(F.array(*[F.lit(x) for x in points])).alias("x"),
        "n_sample",
        "vs",
    )
    le = F.size(F.filter(F.col("vs"), lambda v: v <= F.col("x"))).cast(
        "long"
    )
    return probe.select(
        *group_cols,
        "x",
        "n_sample",
        F.floor(le * F.lit(MICRO) / F.col("n_sample")).alias("rank_micro"),
    )


def q_range_boundaries(
    sketch: DataFrame, n_ranges: int, k: int = K
) -> DataFrame:
    """(boundary_no, value): the n_ranges-1 split points that divide the
    sketched population into n_ranges near-equal ranges — boundary i is
    the estimated (i/n_ranges)-quantile.  This is what Spark's
    RangePartitioner computes by reservoir-sampling the input per job
    (core/Partitioner.scala's sketch pass); building it from the
    quantile sketch makes the boundaries DETERMINISTIC, reusable across
    jobs (write once, range-partition every downstream sort/layout
    against the same splits), and mergeable across days without
    re-sampling the corpus — the range-layout twin of
    layout.write_bucketed's hash side.

    Balance: each range receives a (i-1/n, i/n] rank slice, so its true
    mass is 1/n_ranges ± the sketch's rank error (~3*sqrt(1/4k) at 3σ);
    with k = 1024 that is 1/n ± ~4.7 points — at 100 TB this bounds the
    largest output file/partition without any global sort.

    Plan: one bounded aggregation over the <= k-row sketch + a literal
    explode — driver-light.  Rows where consecutive quantiles coincide
    (heavy ties) keep both boundaries; downstream assignment is still
    correct, the ranges are just empty."""
    if n_ranges < 2:
        raise ValueError(f"n_ranges must be >= 2, got {n_ranges}")
    probs = [i / n_ranges for i in range(1, n_ranges)]
    qs = q_quantiles(sketch, probs, k=k)
    # p_micro of i/n_ranges is round(1e6*i/n) — recover the ordinal
    return qs.select(
        F.floor(
            (F.col("p_micro") * F.lit(n_ranges) + F.lit(MICRO // 2))
            / F.lit(MICRO)
        ).alias("boundary_no"),
        F.col("est_value").alias("value"),
    )


def assign_range_ids(
    df: DataFrame, value_col: str, boundaries: list
) -> DataFrame:
    """Append ``range_id`` (0-based) from a driver-side boundary list
    (the collected, <= n_ranges-1-row output of q_range_boundaries):
    range_id = |{b : b <= v}| — rows below every boundary get 0, NULL
    values get NULL (they carry no rank).

    The boundary list is bounded (splits, not data), so it ships as an
    array literal inside whole-stage codegen — no join, no shuffle; cost
    is O(n_ranges) per row, the RangePartitioner contract.  Feed the
    result to ``df.repartitionByRange`` replacement patterns or a
    partitioned write (partitionBy("range_id"))."""
    if not boundaries:
        # an empty list would build an untyped array literal (analysis
        # error downstream) — and "no boundaries" is a caller bug, not
        # a one-range request
        raise ValueError("boundaries must be non-empty")
    bs = sorted(boundaries)
    arr = F.array(*[F.lit(b) for b in bs])
    rid = F.when(
        F.col(value_col).isNotNull(),
        F.size(F.filter(arr, lambda b: b <= F.col(value_col))),
    )
    return df.withColumn("range_id", rid.cast("int"))
