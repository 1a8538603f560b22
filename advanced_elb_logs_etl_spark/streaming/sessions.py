"""Structured Streaming variants of the batch session/rolling operators.

The reference is pure batch (SURVEY.md §2.8); these are the natural
streaming formulations of its W3-W7 semantics, offered as an extension:

- gap sessionization (batch W3-W5)  -> ``session_window(time, '30 minutes')``
  with a watermark: Spark's native session windows implement exactly the
  reference's 30-minute-inactivity-gap rule, incrementally, with state
  eviction driven by the watermark.
- trailing counts (batch W6-W7)     -> sliding ``window()`` aggregation:
  event-time sliding windows approximate the per-event trailing frame with
  a fixed slide granularity (a per-event trailing frame is not expressible
  incrementally without per-key state; for exact per-event semantics use
  ``applyInPandasWithState`` — see ``rolling_counts_stateful``).

Scale: streaming state is partitioned by the session key exactly like the
batch shuffle; the watermark bounds state size (events older than the
horizon are finalized and evicted). Skewed keys behave like any skewed
stateful aggregation — pre-salt upstream if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    events: DataFrame,
    key: str = "client_ip",
    ts: str = "time",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key gap sessions over a streaming DataFrame.

    Emits one row per closed session: key, session start/end, event count.
    Equivalent batch semantics: operators/sessions.sessionize aggregated by
    (key, session_id)."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("session"), F.col(key))
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            key,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "event_count",
        )
    )


def rolling_counts_stream(
    events: DataFrame,
    key: str = "client_ip",
    ts: str = "time",
    window: str = "5 minutes",
    slide: str = "1 minute",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding-window per-key counts — the streaming analog of the batch
    trailing 5-minute count (W6) at `slide` granularity."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window, slide).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("req_count"))
        .select(
            key,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "req_count",
        )
    )


def rolling_counts_stateful(
    events: DataFrame,
    key: str = "client_ip",
    ts: str = "time",
    window_sec: int = 300,
    watermark: str = "1 hour",
) -> DataFrame:
    """EXACT per-event trailing count as a custom stateful operator
    (applyInPandasWithState): state = per-key list of recent event times;
    each event is emitted with the count of events in ITS OWN left-open
    frame `(t - window_sec, t]` — computed by membership test, so
    out-of-order and late events (within the watermark) get correct counts
    for their frame; state entries with later timestamps are ignored, not
    miscounted. Eviction drops entries at or below (watermark - window),
    which can no longer fall in any admissible future frame.

    Append-mode caveat (inherent to streaming): a late event cannot
    retroactively increment counts already emitted for later events.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key} string, event_time timestamp, trailing_count long"
    state_schema = "times array<timestamp>"

    def update(key_tuple, pdf_iter, state):
        import pandas as pd

        times = list(state.get[0]) if state.exists else []
        window_delta = pd.Timedelta(seconds=window_sec)
        batch = []
        for pdf in pdf_iter:
            batch.extend(pd.Timestamp(t) for t in pdf[ts])
        rows = []
        for t in sorted(batch):
            times.append(t)
            lower = t - window_delta
            rows.append((key_tuple[0], t, sum(1 for x in times if lower < x <= t)))
        try:
            wm_ms = state.getCurrentWatermarkMs()
        except Exception:
            wm_ms = 0
        if wm_ms and wm_ms > 0:
            cutoff = pd.Timestamp(wm_ms, unit="ms") - window_delta
            times = [x for x in times if x > cutoff]
        state.update((times,))
        yield pd.DataFrame(rows, columns=[key, "event_time", "trailing_count"])

    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(key))
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts: str = "time",
    watermark: str = "1 hour",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact dedup — the incremental form of the batch exact-dedup
    operator (operators/dedup.py): the first arrival of each key survives,
    replays/retransmissions within the watermark horizon drop.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes the FIRST sighting plus the delay — bounded state, the
    only form that survives an unbounded stream. ``within_watermark=False``
    falls back to plain ``dropDuplicates`` (exact across the whole stream,
    state grows forever — batch-backfill use only). Dedup state partitions
    by the key hash exactly like the batch groupBy.

    The event-time column must NOT be part of the dedup key in the
    within-watermark form: two replays of one logical record typically carry
    different arrival timestamps, which is precisely what this form
    tolerates and plain dropDuplicates([key, ts]) would not.

    `keys` is deliberately REQUIRED: there is no safe default — deduping on
    a non-identity column (say client_ip) would silently discard every
    subsequent record sharing it within the horizon."""
    if not keys:
        raise ValueError("dedup_stream requires an explicit record-identity key list")
    keyed = events.withWatermark(ts, watermark)
    if within_watermark:
        return keyed.dropDuplicatesWithinWatermark(keys)
    return keyed.dropDuplicates(keys)


def attribution_join_stream(
    views: DataFrame,
    clicks: DataFrame,
    key: str = "client_ip",
    view_ts: str = "view_time",
    click_ts: str = "click_time",
    horizon: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join — click attribution: each
    click pairs with the view(s) by the same key in the preceding
    `horizon`. The event-time range predicate is what lets Spark bound the
    join state: a buffered view can be dropped once the click-side
    watermark passes view_time + horizon, so state is O(key-rate x horizon)
    instead of unbounded. Both sides MUST carry a watermark and the join
    condition MUST constrain both event-time columns, or the state store
    grows forever (Spark enforces neither on inner joins — it just leaks).
    """
    v = views.withWatermark(view_ts, watermark)
    c = clicks.withWatermark(click_ts, watermark)
    return v.alias("v").join(
        c.alias("c"),
        F.expr(
            f"v.{key} = c.{key} AND "
            f"c.{click_ts} >= v.{view_ts} AND "
            f"c.{click_ts} <= v.{view_ts} + interval {horizon}"
        ),
    ).select(
        F.col(f"v.{key}").alias(key),
        F.col(f"v.{view_ts}").alias(view_ts),
        F.col(f"c.{click_ts}").alias(click_ts),
    )
