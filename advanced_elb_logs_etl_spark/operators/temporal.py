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

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tagged.schema["_l"].dataType
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
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
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
