"""K-Minimum-Values (KMV) distinct sketch with theta-style set
operations — the distinct-count lane HLL can't serve: HLL registers
merge only by UNION, while KMV/theta sketches also estimate
INTERSECTION and DIFFERENCE cardinalities across segments (Bar-Yossef
et al. 2002; Beyer et al. 2007, "On Synopses for Distinct Value
Estimation"; the theta-sketch framing of Dasgupta et al. 2016 — all
public methods).

Where the reference's pipeline counts distinct client IPs per hour
(reference write_hourly_aggregation, :345-363, COUNT(DISTINCT)), a
100 TB deployment wants "distinct users in segment A AND segment B"
without a corpus-sized join — that is exactly this operator.

Determinism: the hash is the repo's shared 60-bit md5 (functions/
hashing.h60), so the sketch CONTENTS — and therefore every estimate —
are value-exact twinnable in SQL:

    ('0x' || substr(md5(key), 1, 15))::BIGINT

Estimator exactness discipline (the r10 float policy): estimates are
emitted as BIGINT via floor((k-1) * 2^60 / kth).  (k-1) * 2^60 is one
exactly-representable double (mantissa k-1, exponent +60), the BIGINT
-> DOUBLE cast of kth rounds half-even identically in Spark and DuckDB,
the division is one correctly-rounded IEEE op, and floor is exact — so
the integer surface matches the twin bit-for-bit, no float column in
any registered output.

Scale shape (100 TB): kmv_build is one map-side-partial distinct
aggregation over the hash column followed by TakeOrdered(k) — a k-row
result, never a global sort.  The shuffle carries per-partition
DISTINCT hashes; when a prior epoch's theta is available, pass it as
``prefilter`` and the scan-side filter cuts that to ~k rows per
partition (the production theta-sketch trick — see kmv_build's
contract).  Sketches are k rows, so unions/intersections of sketches
are driver-light k-row frames; merging across days/shards is
kmv_union.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h60

#: hash range: h60 is the first 15 hex digits of md5 = [0, 2^60).
M = 1 << 60

#: default sketch size (relative error ~ 1/sqrt(k-2) ~ 6.3%)
K = 256


def kmv_hash(col: Column) -> Column:
    """The sketch hash of a key column (cast to string first — Spark and
    SQL render integers identically).  SQL twin:
    ('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15))::BIGINT"""
    return h60(col.cast("string"))


def kmv_build(
    df: DataFrame,
    key_col: str = "key",
    k: int = K,
    prefilter: int | None = None,
) -> DataFrame:
    """The KMV sketch of a key column: a 1-column frame ``h`` holding
    the k smallest DISTINCT hash values (fewer if the key domain is
    smaller).  NULL keys are ignored (COUNT DISTINCT semantics).

    Plan shape: project-to-hash (optionally filtered), partial+final
    hash aggregation for the distinct, TakeOrdered(k).  No global sort,
    no corpus-sized shuffle rows beyond the per-partition distinct set.

    ``prefilter``: an upper bound on surviving hashes (e.g. the prior
    epoch's theta = kth hash) — pushes a scan-side filter so the
    distinct shuffle carries ~k rows per partition instead of the full
    per-partition distinct set.  CONTRACT: the bound must be >= the true
    kth smallest hash; if the filtered sketch comes back with FEWER than
    k rows the bound may have cut real minima and the sketch must not be
    trusted unless the key domain is genuinely smaller than k —
    kmv_estimate(..., expect_saturated=True) turns that into a loud
    in-plan failure."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashes = (
        df.filter(F.col(key_col).isNotNull())
        .select(kmv_hash(F.col(key_col)).alias("h"))
    )
    if prefilter is not None:
        hashes = hashes.filter(F.col("h") < F.lit(int(prefilter)))
    return hashes.distinct().orderBy("h").limit(k)


def kmv_build_grouped(
    df: DataFrame,
    group_cols: list[str],
    key_col: str = "key",
    k: int = K,
) -> DataFrame:
    """Per-group KMV sketches in one frame (group_cols..., h) — the
    production shape of the reference's COUNT(DISTINCT client_ip) per
    hour (reference :345-363) when the counts must also roll up across
    groups: per-(hour, segment) sketches union into per-day /
    per-segment sketches (kmv_merge_grouped) without touching the
    corpus again, which re-counting exact distincts cannot do.

    Plan shape: one partial+final distinct agg on (group, h), then a
    row_number window partitioned by group (top-k smallest per group).
    Two shuffles; per-group state in the window is one counter — never
    a collect_set-style unbounded buffer.  Output is <= k rows per
    group."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not group_cols:
        # an empty partitionBy would funnel the whole distinct set into
        # ONE window partition — the global-window scale hazard plan
        # lint polices; the global form is kmv_build (TakeOrdered).
        raise ValueError("group_cols must be non-empty; use kmv_build")
    hashes = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(int(k)))
        .drop("_rn")
    )


def kmv_merge_grouped(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = K,
) -> DataFrame:
    """Re-minimize per-group sketch rows under a COARSER grouping — the
    roll-up: feed per-(day, hour) sketch rows with group_cols=["day"]
    and get per-day sketches of the UNION of the hour key sets.  Also
    merges same-group rows from different stores (union the frames
    first).  Input is sketch rows (<= k per input group), so this never
    touches corpus data."""
    if not group_cols:
        # roll-up to the GLOBAL sketch: k-row inputs, use the
        # TakeOrdered form rather than a single-partition window
        return kmv_union(sketches, k=k)
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        sketches.select(*group_cols, "h")
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(int(k)))
        .drop("_rn")
    )


def kmv_estimate_grouped(
    sketch: DataFrame,
    group_cols: list[str],
    k: int = K,
) -> DataFrame:
    """(group_cols..., n_hashes, kth_hash, est_distinct): the per-group
    distinct estimates — one hash agg over <= k-row groups, same
    integer-exact estimator as kmv_estimate."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("h").alias("kth_hash"),
    )
    return agg.select(
        *group_cols,
        "n_hashes",
        "kth_hash",
        _est_floor(F.col("n_hashes"), F.col("kth_hash"), k)
        .cast("long")
        .alias("est_distinct"),
    )


def kmv_union(*sketches: DataFrame, k: int = K) -> DataFrame:
    """Sketch of the UNION of the underlying key sets: merge hash sets,
    keep the k smallest — exactly kmv_build of the concatenated inputs
    (the mergeable-summaries contract; pinned by test).  Inputs must
    share k and the h60 hash (same discipline as cmsketch.cm_merge)."""
    if not sketches:
        raise ValueError("kmv_union needs at least one sketch")
    out = sketches[0].select("h")
    for s in sketches[1:]:
        out = out.unionByName(s.select("h"))
    return out.distinct().orderBy("h").limit(k)


def _est_floor(n_col: Column, kth_col: Column, k: int) -> Column:
    """floor((k-1) * 2^60 / kth) when saturated, else the exact count.
    SQL twin:
    CASE WHEN n < k THEN n
         ELSE CAST(floor({float((k-1) << 60)!r} / CAST(kth AS DOUBLE))
                   AS BIGINT) END"""
    km = float((k - 1) << 60)  # exactly representable: (k-1) * 2^60
    return F.when(n_col < F.lit(k), n_col).otherwise(
        F.floor(F.lit(km) / kth_col.cast("double"))
    )


def kmv_estimate(
    sketch: DataFrame, k: int = K, expect_saturated: bool = False
) -> DataFrame:
    """1-row (n_hashes, kth_hash, est_distinct): the distinct-count
    estimate.  Under k distinct hashes the count is EXACT (the sketch
    holds the whole hash set); at k the estimator is (k-1) * 2^60 / kth,
    floored to BIGINT (see module docstring for the cross-engine
    exactness argument).

    ``expect_saturated=True`` asserts n_hashes == k inside the plan —
    the loud-failure half of kmv_build's prefilter contract (a prefilter
    that cut real minima surfaces here instead of skewing estimates)."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("h").alias("kth_hash"),
    )
    if expect_saturated:
        agg = agg.select(
            F.coalesce(
                F.assert_true(
                    F.col("n_hashes") == F.lit(k),
                    F.concat(
                        F.lit(
                            "KMV sketch expected saturated at k="
                            f"{k} but holds "
                        ),
                        F.col("n_hashes").cast("string"),
                        F.lit(
                            " hashes — a kmv_build prefilter may have cut"
                            " real minima"
                        ),
                    ),
                ).cast("long"),
                F.col("n_hashes"),
            ).alias("n_hashes"),
            "kth_hash",
        )
    return agg.select(
        "n_hashes",
        "kth_hash",
        _est_floor(F.col("n_hashes"), F.col("kth_hash"), k)
        .cast("long")
        .alias("est_distinct"),
    )


def kmv_intersect_estimate(
    a: DataFrame, b: DataFrame, k: int = K
) -> DataFrame:
    """1-row (n_common, theta, est_intersect): theta-style intersection
    estimate.  theta = min over sketches of (kth hash when saturated,
    else 2^60); hashes below theta are a uniform sample of each set at
    rate theta/2^60, so |A intersect B| ~= |common hashes < theta| *
    2^60 / theta — floored to BIGINT with the same exactness argument
    as kmv_estimate (n_common <= k is exact in a double).  When both
    sketches are unsaturated (theta = 2^60) the estimate IS the exact
    intersection cardinality.

    Scale: both inputs are k-row frames, so this is driver-light Column
    math — the corpus was touched only by the two builds.  Each input
    is referenced TWICE in the plan (theta agg + the common join): pass
    MATERIALIZED sketches (localCheckpoint the k-row build, as the
    catalog gate does) when the build lineage is corpus-sized, or the
    build runs twice (the cm_check_geometry lesson, priced in SCALE.md
    r10)."""
    a_th = a.agg(
        F.count(F.lit(1)).alias("n_a"), F.max("h").alias("kth_a")
    )
    b_th = b.agg(
        F.count(F.lit(1)).alias("n_b"), F.max("h").alias("kth_b")
    )
    theta = (
        a_th.crossJoin(F.broadcast(b_th))
        .select(
            F.least(
                F.when(F.col("n_a") >= F.lit(k), F.col("kth_a")).otherwise(
                    F.lit(M)
                ),
                F.when(F.col("n_b") >= F.lit(k), F.col("kth_b")).otherwise(
                    F.lit(M)
                ),
            ).alias("theta")
        )
    )
    common = (
        a.select("h")
        .join(b.select("h"), "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return common.crossJoin(F.broadcast(theta)).select(
        "n_common",
        "theta",
        F.when(F.col("theta") >= F.lit(M), F.col("n_common"))
        .otherwise(
            F.floor(
                F.col("n_common").cast("double")
                * F.lit(float(M))
                / F.col("theta").cast("double")
            )
        )
        .cast("long")
        .alias("est_intersect"),
    )


def kmv_sliding_estimate(
    sketch: DataFrame,
    group_col: str,
    window: int,
    k: int = K,
) -> DataFrame:
    """(group, n_hashes, kth_hash, est_distinct): the distinct estimate
    over a TRAILING window of ``window`` consecutive integer groups —
    "unique users in the trailing 24 hours, per hour" from per-hour
    sketches, the sliding-window form of the reference's per-hour
    COUNT(DISTINCT client_ip) (reference :345-363) that no exact
    per-hour count can provide without re-scanning 24x the data per
    row.  Each output group g covers source groups (g-window+1 .. g);
    a window's union sketch is the k smallest distinct hashes of its
    member sketches (mergeable summaries), estimated with the same
    floored-integer formula as kmv_estimate.

    ``group_col`` must be integer-typed consecutive buckets (epoch
    hours/days — the tumbling_window_agg bucket discipline).  Windows
    are emitted for every group present in the sketch; missing interior
    buckets contribute nothing (their traffic was empty).

    Scale shape: the expansion is sketch-rows x window (<= groups * k *
    window rows — sketch-bounded, never corpus-bounded), then one
    distinct agg and one per-group top-k window.  The corpus was
    touched once, by the grouped build; a day of re-windowing is k-row
    arithmetic.  SQL twin: the same explode of each sketch row to its
    ``window`` covering buckets, then the grouped-KMV estimator."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    targets = sketch.select(
        F.explode(
            F.sequence(
                F.col(group_col).cast("long"),
                F.col(group_col).cast("long") + F.lit(int(window) - 1),
            )
        ).alias("_tg"),
        "h",
    )
    present = sketch.select(
        F.col(group_col).cast("long").alias("_tg")
    ).distinct()
    windows = (
        targets.join(present, "_tg")
        .distinct()
    )
    w = Window.partitionBy("_tg").orderBy("h")
    topk = (
        windows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(int(k)))
        .drop("_rn")
    )
    agg = topk.groupBy("_tg").agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("h").alias("kth_hash"),
    )
    return agg.select(
        F.col("_tg").alias(group_col),
        "n_hashes",
        "kth_hash",
        _est_floor(F.col("n_hashes"), F.col("kth_hash"), k)
        .cast("long")
        .alias("est_distinct"),
    )


def kmv_pairwise_intersect(
    sketch: DataFrame,
    group_col: str,
    pairs: DataFrame,
    k: int = K,
) -> DataFrame:
    """(g1, g2, n_common, theta, est_intersect): theta-style intersection
    estimates for MANY group pairs at once from ONE grouped sketch frame
    (kmv_build_grouped output) — the retention/overlap-matrix lane:
    "estimated returning users for every consecutive day pair" or
    "audience overlap for every segment pair" without any corpus-sized
    self-join.  ``pairs`` carries columns (g1, g2) naming the group
    pairs to estimate; per pair the math is exactly
    kmv_intersect_estimate's (theta = min of the two per-group thetas,
    hashes below theta are uniform samples, est floored to BIGINT with
    the same exactness argument).

    Scale: per-group stats are one hash agg over <= k-row groups; the
    common-hash probe joins the <= k-rows-per-group sketch to the pairs
    frame and then to itself on (group, h) — every intermediate is
    bounded by |pairs| * k rows, never corpus-sized.  The grouped
    sketch is referenced three times (two probe sides + stats): pass a
    MATERIALIZED frame when its build lineage is corpus-sized (the
    kmv_intersect_estimate lesson).

    Pairs naming a group with no sketch rows are DROPPED, not zeroed: a
    group with zero keys leaves no rows in kmv_build_grouped, so "empty
    set" and "no such group" are indistinguishable — inner-join
    semantics are the only consistent answer (pinned by test)."""
    stats = sketch.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"), F.max("h").alias("_kth")
    )
    theta_of = F.when(
        F.col("_n") >= F.lit(k), F.col("_kth")
    ).otherwise(F.lit(M))
    s1 = stats.select(
        F.col(group_col).alias("g1"), theta_of.alias("_theta1")
    )
    s2 = stats.select(
        F.col(group_col).alias("g2"), theta_of.alias("_theta2")
    )
    keyed = (
        pairs.select("g1", "g2")
        .join(s1, "g1")
        .join(s2, "g2")
        .select(
            "g1",
            "g2",
            F.least("_theta1", "_theta2").alias("theta"),
        )
    )
    a = sketch.select(F.col(group_col).alias("g1"), "h")
    b = sketch.select(F.col(group_col).alias("g2"), "h")
    common = (
        keyed.join(a, "g1")
        .filter(F.col("h") < F.col("theta"))
        .join(b, ["g2", "h"])
        .groupBy("g1", "g2", "theta")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # pairs with zero common hashes drop out of the join — restore them
    out = (
        keyed.join(common.select("g1", "g2", "n_common"), ["g1", "g2"], "left")
        .select(
            "g1",
            "g2",
            F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common"),
            "theta",
        )
    )
    return out.select(
        "g1",
        "g2",
        "n_common",
        "theta",
        F.when(F.col("theta") >= F.lit(M), F.col("n_common"))
        .otherwise(
            F.floor(
                F.col("n_common").cast("double")
                * F.lit(float(M))
                / F.col("theta").cast("double")
            )
        )
        .cast("long")
        .alias("est_intersect"),
    )


def kmv_difference_estimate(
    a: DataFrame, b: DataFrame, k: int = K
) -> DataFrame:
    """1-row (n_only, theta, est_difference): theta-style A-NOT-B
    estimate — completes the sketch set algebra (kmv_union |
    kmv_intersect_estimate | this).  theta = min over sketches of
    (kth hash when saturated, else 2^60); below theta each sketch holds
    ALL of its set's hashes (a saturated sketch's kth hash bounds its
    contents, an unsaturated one holds everything), so the a-side hashes
    below theta ABSENT from b are a uniform sample of A \\ B at rate
    theta/2^60: |A \\ B| ~= |a-only hashes < theta| * 2^60 / theta —
    floored to BIGINT with the same exactness argument as kmv_estimate
    (n_only <= k is exact in a double).  When both sketches are
    unsaturated (theta = 2^60) the estimate IS the exact difference
    cardinality.  "Users in segment A who never touched segment B",
    without a corpus-sized anti-join.

    Scale: both inputs are k-row frames — driver-light Column math; the
    anti-probe is a k-row broadcast join.  Same double-evaluation note
    as kmv_intersect_estimate: pass MATERIALIZED sketches when the build
    lineage is corpus-sized (each input is referenced twice: theta agg +
    the anti join)."""
    a_th = a.agg(
        F.count(F.lit(1)).alias("n_a"), F.max("h").alias("kth_a")
    )
    b_th = b.agg(
        F.count(F.lit(1)).alias("n_b"), F.max("h").alias("kth_b")
    )
    theta = (
        a_th.crossJoin(F.broadcast(b_th))
        .select(
            F.least(
                F.when(F.col("n_a") >= F.lit(k), F.col("kth_a")).otherwise(
                    F.lit(M)
                ),
                F.when(F.col("n_b") >= F.lit(k), F.col("kth_b")).otherwise(
                    F.lit(M)
                ),
            ).alias("theta")
        )
    )
    only = (
        a.select("h")
        .join(F.broadcast(b.select("h")), "h", "left_anti")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_only"))
    )
    return only.crossJoin(F.broadcast(theta)).select(
        "n_only",
        "theta",
        F.when(F.col("theta") >= F.lit(M), F.col("n_only"))
        .otherwise(
            F.floor(
                F.col("n_only").cast("double")
                * F.lit(float(M))
                / F.col("theta").cast("double")
            )
        )
        .cast("long")
        .alias("est_difference"),
    )
