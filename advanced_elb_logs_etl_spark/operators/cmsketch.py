"""Count-Min sketch: point-frequency estimates over unbounded key
domains, as a mergeable d x w count table (Cormode & Muthukrishnan
2005, "An improved data stream summary: the count-min sketch and its
applications" — public method).

Where it sits in the summary family: the Misra-Gries summary
(streaming/heavyhitters.py) bounds only the top-C keys and the
log-bucketed histogram (streaming/histogram.py) only numeric values;
the CM sketch answers "how often did THIS key occur" for ANY key with
the one-sided guarantee

    true <= est <= true + eps * N     (eps = e / width,
                                       w.p. 1 - delta, delta = e^-depth)

— overestimates only, never under.  A training-data pipeline uses it to
screen n-gram/boilerplate frequencies at corpus scale without a
corpus-wide groupBy whose result is as big as the key domain.

Determinism (the DOULION move, functions/hashing.h60): row i's bucket
is the 60-bit md5 hash seeded with i, mod width — both engines compute
the identical bucket, so the sketch CONTENTS (not just the bound) are
value-exact twinnable in SQL:

    ('0x' || substr(md5(i || ':' || key), 1, 15))::BIGINT % width

Scale shape (100 TB): the build is one depth-way explode (d rows per
input row) into ONE map-side-combinable hash agg whose output is
<= d * width rows — the shuffle carries sketch cells, never the corpus.
Estimates broadcast the d*width-row sketch to the probe keys.  Sketches
merge by cell-wise sum (union + one agg), so shard/stream/day sketches
combine without touching data — the Agarwal et al. 2012 mergeable-
summaries contract, same as the MG summary and the histogram.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60

__all__ = [
    "cm_bucket",
    "cm_build",
    "cm_build_grouped",
    "cm_merge",
    "cm_merge_grouped",
    "cm_estimate",
    "cm_estimate_grouped",
    "cm_join_size",
]

#: Default geometry: eps = e/1024 ~= 0.27%, delta = e^-4 ~= 1.8%.
WIDTH = 1024
DEPTH = 4


def cm_bucket(key: Column, row: int, width: int = WIDTH) -> Column:
    """Row `row`'s bucket for a key: h60 seeded with the row index, mod
    width.  h60 is non-negative (15 hex digits), so Spark's % and SQL's
    % agree.  SQL twin:
    ('0x' || substr(md5(<row> || ':' || key), 1, 15))::BIGINT % <width>
    """
    return (h60(key, seed=row) % F.lit(width)).cast("int")


def _cells(
    df: DataFrame, key_col: str, width: int, depth: int, weighted: bool
) -> DataFrame:
    """(row, bucket, w) one cell-increment per (input row, sketch row)."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                cm_bucket(F.col(key_col).cast("string"), r, width).alias(
                    "bucket"
                ),
            )
            for r in range(depth)
        ]
    )
    out = df.select(
        F.explode(pairs).alias("c"),
        (F.col("_cm_w") if weighted else F.lit(1)).cast("long").alias("w"),
    )
    return out.select("c.row", "c.bucket", "w")


def cm_build(
    df: DataFrame,
    key_col: str = "key",
    width: int = WIDTH,
    depth: int = DEPTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (row int, bucket int, cnt long), <= depth*width
    rows.  NULL keys are dropped (the groupBy-NULL convention of the MG
    summary's caller: count them upstream if they matter).  Pass
    ``weight_col`` to add that per-row weight instead of 1 (token
    counts, byte sizes).

    One explode + ONE hash aggregation with map-side combine: the
    shuffle moves at most depth*width partial cells per map partition,
    never data rows.

    MATERIALIZE BEFORE FAN-OUT: the result is a lazy plan over the full
    input — a caller that feeds it to several consumers (estimate +
    merge, repeated probes) should localCheckpoint()/cache() it first or
    each consumer re-scans the corpus.  cm_estimate's default geometry
    guard handles its own double-use internally (lazy localCheckpoint),
    but any other fan-out is caller-owned."""
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    base = df.filter(F.col(key_col).isNotNull())
    if weight_col is not None:
        # The one-sided guarantee needs non-negative integral weights:
        # a NULL would silently contribute 0 (F.sum skips it), a
        # fractional weight would truncate through the long cast, and a
        # negative one could make est < true.  Integrality is enforced
        # driver-side from the dtype; NULL/negative per-row via
        # assert_true (one codegen branch, fails the job loudly).
        dtype = dict(df.dtypes)[weight_col]
        if dtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"weight_col {weight_col!r} must be an integral column, "
                f"got {dtype} (fractional weights would truncate and "
                "break the overestimate-only contract)"
            )
        w = F.col(weight_col)
        base = base.withColumn(
            "_cm_w",
            F.when(
                F.assert_true(
                    w.isNotNull() & (w >= 0),
                    f"cm_build: NULL or negative weight in {weight_col!r}",
                ).isNull(),
                w,
            ),
        )
    return (
        _cells(base, key_col, width, depth, weighted=weight_col is not None)
        .groupBy("row", "bucket")
        .agg(F.sum("w").alias("cnt"))
    )


def cm_build_grouped(
    df: DataFrame,
    group_cols: list[str],
    key_col: str = "key",
    width: int = WIDTH,
    depth: int = DEPTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group CM sketches in one frame (group_cols..., row, bucket,
    cnt) — the production shape of per-hour / per-source token-frequency
    screens: build once per micro-window, roll up across windows with
    cm_merge_grouped, point-estimate any group with cm_estimate_grouped,
    all without rescanning the corpus.  The grouped twin of
    kmv_build_grouped, same contract.

    Plan shape: the same depth-way explode as cm_build into ONE
    map-side-combinable hash agg keyed on (group, row, bucket) — output
    <= d*width rows per group, shuffle carries cells, never data."""
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty; use cm_build")
    base = df.filter(F.col(key_col).isNotNull())
    if weight_col is not None:
        # same integral/non-negative contract as cm_build (the
        # overestimate-only guarantee); reuse its guard by delegating
        # the weight column preparation
        dtype = dict(df.dtypes)[weight_col]
        if dtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"weight_col {weight_col!r} must be an integral column, "
                f"got {dtype} (fractional weights would truncate and "
                "break the overestimate-only contract)"
            )
        w = F.col(weight_col)
        base = base.withColumn(
            "_cm_w",
            F.when(
                F.assert_true(
                    w.isNotNull() & (w >= 0),
                    f"cm_build_grouped: NULL or negative weight in {weight_col!r}",
                ).isNull(),
                w,
            ),
        )
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                cm_bucket(F.col(key_col).cast("string"), r, width).alias(
                    "bucket"
                ),
            )
            for r in range(depth)
        ]
    )
    cells = base.select(
        *group_cols,
        F.explode(pairs).alias("c"),
        (F.col("_cm_w") if weight_col is not None else F.lit(1))
        .cast("long")
        .alias("w"),
    ).select(*group_cols, "c.row", "c.bucket", "w")
    return cells.groupBy(*group_cols, "row", "bucket").agg(
        F.sum("w").alias("cnt")
    )


def cm_merge_grouped(
    cells: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Cell-wise sum under a COARSER grouping — the roll-up: feed
    per-(day, hour) cells with group_cols=["day"] and get per-day
    sketches of the summed streams (CM cells are plain sums, so the
    roll-up equals a direct build at the coarser grouping — the
    mergeable-summaries contract).  group_cols=[] rolls up to the
    global sketch (delegates to cm_merge's agg shape).  Input is cell
    rows, so this never touches corpus data."""
    if not group_cols:
        return cells.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    return cells.groupBy(*group_cols, "row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cm_estimate_grouped(
    cells: DataFrame,
    keys: DataFrame,
    group_cols: list[str],
    key_col: str = "key",
    width: int = WIDTH,
    depth: int = DEPTH,
) -> DataFrame:
    """(group_cols..., key, est): per-group point estimates for every
    (group, probe key) combination — absent cells read 0, so a key
    unseen in a group estimates 0..collision-noise exactly like the
    global cm_estimate.

    Plan shape: the probe frame is |groups| x |probes| x depth rows
    (groups come from the cells frame itself — bounded by construction;
    probes are caller-bounded), left-joined against the broadcast cell
    frame, one (group, key) min agg.  Geometry checking is the caller's
    concern here (pin width/depth as module constants; the 1-row guard
    pattern composes via cm_check_geometry on the ungrouped projection
    if needed)."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty; use cm_estimate")
    probes = (
        keys.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias("key"))
        .distinct()
    )
    groups = cells.select(*group_cols).distinct()
    # bounded x bounded by construction: |distinct groups| x |probes|
    probe_cells = (
        groups.crossJoin(F.broadcast(probes))
        .select(
            *group_cols,
            "key",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("row"),
                            cm_bucket(F.col("key"), r, width).alias("bucket"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("c"),
        )
        .select(*group_cols, "key", "c.row", "c.bucket")
    )
    joined = probe_cells.join(
        F.broadcast(cells), [*group_cols, "row", "bucket"], "left"
    )
    return joined.groupBy(*group_cols, "key").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-geometry sketches — the mergeable-summary
    contract: sketch(A ++ B) == merge(sketch(A), sketch(B)) EXACTLY
    (addition commutes through min only at query time; the cells
    themselves are plain sums).

    GEOMETRY IS CALLER-OWNED: a cell frame does not carry width/depth
    (keeping it a plain 3-column table the SQL twin can replicate), so
    merging sketches built at different geometries is undetectable here
    and produces garbage — pin width/depth as module-level constants at
    every build site, the way the catalog gates do."""
    if not sketches:
        raise ValueError("cm_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_check_geometry(
    sketch: DataFrame, width: int = WIDTH, depth: int = DEPTH
) -> DataFrame:
    """1-row guard frame that FAILS THE JOB (assert_true) if any sketch
    cell lies outside the ``depth x width`` geometry — the cheap runtime
    check ADVICE r9 asked for: cell frames deliberately carry no
    width/depth (a plain 3-column table the SQL twin can replicate), so
    probing or merging a sketch built at a LARGER geometry would
    otherwise silently produce garbage estimates.

    One-sided by construction: a sketch built at a SMALLER geometry has
    every cell in range and is indistinguishable from an underfull
    sketch, so that direction stays caller-owned (pin width/depth as
    module constants at every build site, the way the catalog gates do).
    Cost: one bounded agg over the <= depth*width-row cell frame."""
    msg = F.concat(
        F.lit(
            f"Count-Min geometry mismatch: sketch has cells outside "
            f"depth={depth} width={width} (max_row="
        ),
        F.col("max_row").cast("string"),
        F.lit(", max_bucket="),
        F.col("max_bucket").cast("string"),
        F.lit(") — built at a different geometry?"),
    )
    # assert_true is NULL on success, raises on violation; coalesce to a
    # 0 the CALLER must fold into an output value — an expression the
    # optimizer provably can't prune or constant-fold away (a bare
    # unused guard column would be vulnerable to column pruning).
    return (
        sketch.agg(
            F.max("row").alias("max_row"), F.max("bucket").alias("max_bucket")
        )
        .select(
            F.coalesce(
                F.assert_true(
                    (
                        F.coalesce(F.col("max_row"), F.lit(-1))
                        < F.lit(int(depth))
                    )
                    & (
                        F.coalesce(F.col("max_bucket"), F.lit(-1))
                        < F.lit(int(width))
                    ),
                    msg,
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias("geometry_guard")
        )
    )


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    width: int = WIDTH,
    depth: int = DEPTH,
    check_geometry: bool = True,
) -> DataFrame:
    """(key, est): the CM point estimate — min over the depth rows of
    the key's cell counts; absent cells read 0.  The sketch frame
    (<= depth*width rows) broadcasts to the probe side, so estimating
    costs the probe keys one narrow map + one per-key min agg — no
    shuffle of anything corpus-sized.

    ``check_geometry`` (default on) rides a 1-row cm_check_geometry
    guard into the plan via a broadcast cross join, so a probe against a
    larger-geometry sketch fails loudly instead of returning garbage.
    With the guard on, the sketch is lazily localCheckpointed here so
    the guard agg and the probe join share ONE materialization of the
    <= depth*width-row cell frame instead of each re-running its build
    lineage (ADVICE r10: the un-materialized double evaluation measured
    +59% wall on a 10M-row build).  Pass False on a hot path where the
    geometry is pinned by construction — or when the caller manages
    persistence itself (localCheckpoint truncates lineage, so a lost
    executor on a real cluster re-fails the job rather than recomputes;
    acceptable for a d*w-row frame, but the caller may prefer cache())."""
    probes = (
        keys.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias("key"))
        .distinct()
    )
    guard = None
    if check_geometry:
        sketch = sketch.localCheckpoint(eager=False)
        guard = F.broadcast(cm_check_geometry(sketch, width, depth))
        probes = probes.crossJoin(guard)
    carry = ["geometry_guard"] if guard is not None else []
    cells = probes.select(
        "key",
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cm_bucket(F.col("key"), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select("key", *carry, "c.row", "c.bucket")
    joined = cells.join(F.broadcast(sketch), ["row", "bucket"], "left")
    # geometry_guard is always 0 (or the job already failed), so adding
    # it leaves est exact while making the guard un-prunable.
    est_expr = F.coalesce(F.col("cnt"), F.lit(0))
    if guard is not None:
        est_expr = est_expr + F.col("geometry_guard")
    return joined.groupBy("key").agg(F.min(est_expr).alias("est"))


def cm_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    width: int = WIDTH,
    depth: int = DEPTH,
    check_geometry: bool = True,
) -> DataFrame:
    """1-row (est_join_size,) — the Count-Min JOIN-SIZE estimate: the
    number of (row from A, row from B) pairs an equi-join on the
    sketched key would produce, WITHOUT executing the join.  This is
    the inner-product query of Cormode & Muthukrishnan 2005 §4.2
    (public method): for each sketch row i,

        Q_i = sum over buckets b of  A[i][b] * B[i][b]

    and the estimate is min_i Q_i.  Each Q_i = true + (hash-collision
    cross terms) >= true, so the estimate inherits the one-sided
    guarantee: true <= est <= true + eps * N_A * N_B  (w.p. 1 - delta,
    eps = e / width, delta = e^-depth).

    Why it matters at 100 TB: |A join B| decides broadcast vs shuffle
    vs skew-salt BEFORE the shuffle is paid, from two d*w-cell sketches
    that were built in one map-side-combinable pass each (or read back
    from a sketch store — cells merge across shards/days, so per-day
    join-size trends cost nothing extra).  The alternative — an exact
    groupBy on each side plus a join of the count frames — shuffles the
    full key domain twice.

    Determinism: pure integer arithmetic over deterministic md5 cells,
    so the estimate is value-exact twinnable in SQL (the cm_estimate
    contract).  Plan shape: the two bounded cell frames join on
    (row, bucket) — broadcast-sized by construction — then ONE d-row
    agg and ONE 1-row min.  No corpus is touched here at all.

    ``check_geometry`` rides the cm_check_geometry guard for BOTH
    sketches into the 1-row output (broadcast cross join, the
    cm_estimate pattern), failing loudly on a geometry mismatch that
    would otherwise silently misalign buckets.  Same-width/depth across
    the two sketches is the caller's contract (cm_merge's note).
    """
    if check_geometry:
        # the guard aggs and the product join each read a sketch twice —
        # lazily checkpoint ONCE so both lanes share one materialization
        # of each <= d*w-row cell frame (the cm_estimate ADVICE-r10 fix)
        sketch_a = sketch_a.localCheckpoint(eager=False)
        sketch_b = sketch_b.localCheckpoint(eager=False)
    a = sketch_a.select("row", "bucket", F.col("cnt").alias("cnt_a"))
    b = sketch_b.select("row", "bucket", F.col("cnt").alias("cnt_b"))
    # inner join: a bucket absent from either side contributes 0 to Q_i
    prod = a.join(b, ["row", "bucket"]).select(
        "row", (F.col("cnt_a") * F.col("cnt_b")).alias("p")
    )
    # rows with NO common bucket at all have Q_i = 0 (true join size has
    # to be 0 then — every key collides nowhere); densify over the depth
    # so min_i runs over ALL d rows, not just the populated ones.
    rows = F.broadcast(
        sketch_a.sparkSession.range(depth).select(
            F.col("id").cast("int").alias("row")
        )
    )
    per_row = rows.join(
        prod.groupBy("row").agg(F.sum("p").alias("q")), "row", "left"
    ).select(F.coalesce(F.col("q"), F.lit(0)).alias("q"))
    out = per_row.agg(F.min("q").alias("est_join_size"))
    if check_geometry:
        ga = F.broadcast(
            cm_check_geometry(sketch_a, width, depth).withColumnRenamed(
                "geometry_guard", "_g_a"
            )
        )
        gb = F.broadcast(
            cm_check_geometry(sketch_b, width, depth).withColumnRenamed(
                "geometry_guard", "_g_b"
            )
        )
        out = (
            out.crossJoin(ga)
            .crossJoin(gb)
            .select(
                (
                    F.col("est_join_size") + F.col("_g_a") + F.col("_g_b")
                ).alias("est_join_size")
            )
        )
    return out
