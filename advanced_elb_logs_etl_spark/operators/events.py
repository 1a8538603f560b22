"""Behavioral analytics over the events stream: ordered funnel conversion
and cohort retention — the product-analytics shapes an analytics engine is
asked for beyond plain grouped aggregation.

No reference analog; these generalize the session family (operators/
sessions.py) from gap-based to semantics-based ordering. Both are
value-exact against ANSI-SQL oracles.

Scale shape: every stage/step is a conditional filter + a hash aggregation
on user_id; all shuffles hash on the SAME key, so AQE/exchange-reuse keeps
the chain to one physical partitioning, and stage frames shrink
monotonically (funnel property). No windows over unbounded partitions, no
driver-side iteration over users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default ordered conversion funnel over the events table.
DEFAULT_FUNNEL = ["view", "click", "purchase"]


def funnel_stage_times(
    events: DataFrame,
    stages: list[str] = DEFAULT_FUNNEL,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user entry time into each funnel stage: stage k's time is the
    EARLIEST event of stage-k type at-or-after that user's stage k-1 time
    (strictly ordered funnel — a purchase before the first qualifying click
    does not count). One row per stage-0 user with nullable t0..t{k}.

    Built by iterative conditional min-aggregation, not a per-user sort:
    k-1 joins + k aggregations, all keyed on user_col."""
    out = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    for i, stage in enumerate(stages[1:], start=1):
        prev = f"t{i - 1}"
        ti = (
            events.filter(F.col(type_col) == stage)
            .select(user_col, ts_col)
            .join(out.select(user_col, prev), user_col)
            .filter(F.col(ts_col) >= F.col(prev))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        out = out.join(ti, user_col, "left")
    return out


def funnel_counts(
    events: DataFrame,
    stages: list[str] = DEFAULT_FUNNEL,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel summary: (stage index, stage name, distinct users reaching it
    in order). users is non-increasing by construction."""
    times = funnel_stage_times(events, stages, user_col, ts_col, type_col)
    counts = times.agg(
        *[F.count(f"t{i}").cast("long").alias(f"c{i}") for i in range(len(stages))]
    )
    # explode an array of structs rather than a selectExpr stack(): stage
    # names are caller data and must never be spliced into SQL text
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("stage"),
                F.lit(s).alias("event_type"),
                F.col(f"c{i}").alias("users"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return counts.select(F.explode(rows).alias("_r")).select("_r.*")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily cohort retention triangle: users grouped by first-activity day,
    counted on each later activity day as (cohort_day, day_offset, users).

    distinct (user, day) first — so the heavy raw stream collapses before
    any join — then a min-aggregation for the cohort day and one grouped
    count. The cohort frame is per-user (dimension-sized next to the event
    stream) and joins back on the aggregation's own key."""
    days = events.select(
        F.col(user_col), F.to_date(F.col(ts_col)).alias("day")
    ).distinct()
    first = days.groupBy(user_col).agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, user_col)
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("users"))
    )
