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


def attribution_by_channel(
    events: DataFrame,
    conversion_type: str = "purchase",
    lookback_days: int = 7,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch conversion attribution by channel (the standard
    first-touch / last-touch / linear models of marketing analytics —
    public methodology): every ``conversion_type`` event credits the
    user's PRIOR events (the touches) inside a lookback window, and the
    credit is aggregated per touch channel (= event_type here).

    Output (channel, n_touches, n_conversions_touched,
    first_touch_micro, last_touch_micro, linear_micro) — one row per
    channel, ALL-INTEGER surface (the r10 float policy): each
    conversion distributes exactly 1e6 micro-credits per model; linear
    splits them as div(1e6, n) per touch with the remainder assigned to
    the LAST touch (deterministic: ties on timestamp break by event id),
    so per-conversion credits always sum to exactly 1,000,000 and the
    channel totals are exact integers on both engines.  Conversions
    with no in-window prior touch drop out (report them via the funnel
    operators).

    Scale shape: one per-user equi-join between conversions and touches
    with the window predicate pushed into the join filter, two keyed
    row_number windows on the (conversion, touch) frame, then ONE hash
    agg on channel.  Per-user fan-out is conversions x touches inside
    the window — at 100 TB bound it with the bucketized range-join lane
    (operators/temporal.py) or a shorter lookback; a power-user salt
    follows the skew.py pattern.  No global windows, no driver loops."""
    conv = (
        events.filter(
            (F.col(type_col) == conversion_type)
            & F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("u"),
            F.col(id_col).alias("conv_id"),
            F.unix_micros(F.col(ts_col)).alias("conv_us"),
        )
    )
    touches = events.filter(
        (F.col(type_col) != conversion_type)
        & F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("touch_id"),
        F.col(type_col).alias("channel"),
        F.unix_micros(F.col(ts_col)).alias("touch_us"),
    )
    window_us = int(lookback_days) * 86_400_000_000
    pairs = conv.join(touches, "u").filter(
        (F.col("touch_us") < F.col("conv_us"))
        & (F.col("touch_us") >= F.col("conv_us") - F.lit(window_us))
    )
    from pyspark.sql import Window

    # Windows key on (u, conv_id), not conv_id alone: the conversion id
    # is only guaranteed unique per user (the join above is per-user), so
    # two users sharing an event id must stay separate window partitions.
    # Same shuffle key prefix as the join — no extra Exchange.
    w_asc = Window.partitionBy("u", "conv_id").orderBy(
        F.col("touch_us").asc(), F.col("touch_id").asc()
    )
    w_desc = Window.partitionBy("u", "conv_id").orderBy(
        F.col("touch_us").desc(), F.col("touch_id").desc()
    )
    scored = (
        pairs.withColumn("rn_first", F.row_number().over(w_asc))
        .withColumn("rn_last", F.row_number().over(w_desc))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("u", "conv_id"))
        )
    )
    micro = F.lit(1_000_000)
    base = F.expr("div(1000000, n)")
    rem = micro - base * F.col("n")
    scored = scored.select(
        "channel",
        "u",
        "conv_id",
        F.when(F.col("rn_first") == 1, micro).otherwise(F.lit(0)).alias(
            "first_micro"
        ),
        F.when(F.col("rn_last") == 1, micro).otherwise(F.lit(0)).alias(
            "last_micro"
        ),
        (
            base + F.when(F.col("rn_last") == 1, rem).otherwise(F.lit(0))
        ).alias("lin_micro"),
    )
    return scored.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("u", "conv_id").alias("n_conversions_touched"),
        F.sum("first_micro").cast("long").alias("first_touch_micro"),
        F.sum("last_micro").cast("long").alias("last_touch_micro"),
        F.sum("lin_micro").cast("long").alias("linear_micro"),
    )
