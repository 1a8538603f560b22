"""Temporal joins Spark lacks as builtins, expressed as compositions
(SURVEY §7 / prompt: 'as-of join, range join ... implement as a composition
of existing DataFrame ops if semantics allow').

As-of join (point-in-time join): attach to every left row the most recent
right-side state at-or-before its timestamp, per key. The classic need:
events x slowly-changing dimension, trades x quotes, requests x deploys.

Implementation is the scalable UNION + WINDOW pattern, not a range-join:
tag both sides, union them, ONE hash partitioning by key ordered by
(time, right-before-left on ties), then last_value(ignoreNulls) carries the
right side's attributes forward onto left rows. Cost: one shuffle of
|left| + |right| rows — versus a naive range join's per-key cross product.
Skew behaves like any keyed window (salting notes in operators/skew.py).

DuckDB's native ASOF JOIN is the oracle twin (plans/catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of LEFT join: for each left row, the latest right row with
    right_ts <= left_ts (or < when strict) and the same `on` key; left rows
    with no prior right state keep nulls.

    value_cols: right-side columns to attach (default: all except key+ts).
    Right-side duplicates at the same (key, ts) must be pre-deduped by the
    caller (dedup_keep_last) — as-of semantics need one state per instant.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]

    # the right side rides as ONE struct: last(ignorenulls) must pick all
    # attributes from the SAME right row — per-column carries would stitch a
    # null attribute of the newest state together with stale older values
    r_struct_type = F.struct(*[F.col(c) for c in value_cols])
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(r_struct_type.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tagged.schema["_l"].dataType
        ).alias("_l"),
        r_struct_type.alias("_r"),
    )
    # tie order: right rows sort BEFORE left rows at equal timestamps, so a
    # state change at exactly t is visible to a left row at t (<=). With
    # strict=True the right row sorts AFTER, making equal-ts state invisible.
    tie = F.col("_side").asc() if not strict else F.col("_side").desc()
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_side",
        "_l",
        F.last(F.col("_r"), ignorenulls=True).over(w).alias("_r"),
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    left_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    on: str | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Interval/range join: left rows matched to every interval containing
    them (start <= t < end), optionally also keyed by `on`.

    A naive theta-join (t >= start AND t < end) degenerates to a per-key
    cross product — Spark plans BroadcastNestedLoopJoin. The scalable form
    here is BUCKETIZATION: explode each interval onto the coarse time
    buckets it overlaps, join left rows to (key?, bucket) with a plain
    equi-join (hash shuffle, no nested loop), then apply the exact range
    predicate. Work is O(|left| + |intervals| * avg_buckets_per_interval +
    |candidate pairs|); pick bucket_seconds near the median interval length
    so intervals explode to O(1) buckets each.

    `how='inner'` (matched pairs) or 'left' (keep unmatched left rows with
    null interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    bucket_us = bucket_seconds * 1_000_000

    def bucket_of(col: str, offset: int = 0):
        # exact integer floor-division: (x - x mod b) / b — the numerator is
        # a multiple of b, so the double division is exact; a plain x/b
        # double division can misplace values one ulp from a boundary.
        x = F.unix_micros(F.col(col)) + F.lit(offset)
        return ((x - F.pmod(x, F.lit(bucket_us))) / F.lit(bucket_us)).cast("long")

    ivl_cols = intervals.columns
    # Degenerate intervals (end <= start, incl. null bounds) are dropped
    # BEFORE the explode. They can never satisfy start <= t < end, so the
    # result is unchanged — but without this guard one corrupt row with end
    # far before start would make F.sequence (step -1 when start > stop)
    # emit a huge DESCENDING bucket array and OOM an executor.
    exploded = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                bucket_of(start_col),
                # end is exclusive: a zero-length or bucket-aligned end must
                # not spill into the next bucket
                bucket_of(end_col, offset=-1),
            )
        ),
    )
    l_b = left.withColumn("_bucket", bucket_of(left_ts))
    cond = (F.col(f"_l._bucket") == F.col(f"_r._bucket"))
    if on is not None:
        cond = cond & (F.col(f"_l.{on}") == F.col(f"_r.{on}"))
    cand = l_b.alias("_l").join(exploded.alias("_r"), cond, "inner")
    matched = cand.filter(
        (F.col(f"_l.{left_ts}") >= F.col(f"_r.{start_col}"))
        & (F.col(f"_l.{left_ts}") < F.col(f"_r.{end_col}"))
    ).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r.{c}").alias(f"ivl_{c}") for c in ivl_cols if on is None or c != on],
    )
    if how == "inner":
        return matched
    # left join: re-attach unmatched left rows with nulls. Null-SAFE
    # equality: with plain equality a left row containing any NULL column
    # never matches itself in the anti-join and would be emitted twice.
    m = matched.select(*left.columns).distinct().alias("_m")
    cond = None
    for c in left.columns:
        term = F.col(f"_lf.{c}").eqNullSafe(F.col(f"_m.{c}"))
        cond = term if cond is None else cond & term
    unmatched = left.alias("_lf").join(m, cond, "left_anti")
    for c in ivl_cols:
        if on is not None and c == on:
            continue
        unmatched = unmatched.withColumn(f"ivl_{c}", F.lit(None).cast(intervals.schema[c].dataType))
    return matched.unionByName(unmatched)
