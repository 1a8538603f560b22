"""Sessionization and trailing-window operators (W1-W7).

Reference: add_advanced_features, /root/reference/advanced_elb_logs_etl.py
:303-319 — a global sort + three pandas groupby passes. Here the same
semantics compile to window functions sharing ONE hash partitioning on the
session key: Spark plans a single Exchange feeding every Window operator, so
the whole feature block costs one shuffle regardless of how many windowed
columns are derived.

Determinism: all event-time arithmetic is integer microseconds
(unix_micros), divided once at the end — bit-identical to a SQL oracle doing
epoch_us math.

Scale notes:
- Partitioning is by the session key only; orderBy is within-partition.
  Rows per key must fit an executor's window buffer — true for IP-keyed web
  logs (even a hot scanner IP is ~1e6 rows/day, a few hundred MB).
- For pathological hot keys, pre-split by a coarse time bucket before the
  window (sessions at bucket boundaries become approximate unless buckets
  overlap by the gap length); we keep the simple exact form as default and
  leave pre-splitting to the caller.
- pandas `rolling('5T')` frames are left-OPEN `(t-w, t]`; RANGE frames are
  closed, so bounds are `-(w*1e6 - 1)` microseconds (SURVEY.md §2.6 W6).
- KNOWN divergence (found by property testing, pinned in
  tests/test_property_parity.py): on EXACTLY-equal event times within a key,
  pandas rolling is row-bounded among the ties (the first duplicate doesn't
  see the second) while SQL RANGE frames are tie-inclusive (every duplicate
  sees all of them). We keep SQL semantics — the DuckDB oracle agrees, and
  ALB microsecond timestamps make real ties vanishingly rare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

US_PER_MIN = 60_000_000


def _key_window(key: str, ts: str, tiebreak: str | None) -> WindowSpec:
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    return Window.partitionBy(key).orderBy(*order)


def sessionize(
    df: DataFrame,
    key: str = "client_ip",
    ts: str = "time",
    order_tiebreak: str | None = None,
    gap_min: float = 30.0,
    prev_col: str = "prev_time",
    diff_col: str = "time_diff_min",
    flag_col: str = "new_session",
    id_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization (W1-W5, reference :303-308).

    Adds: previous event time (lag), minutes since previous event, a
    new-session flag (gap > gap_min or first event), and a session id
    '<per-key ordinal>-<key>' built from a running sum of the flag.
    """
    w = _key_window(key, ts, order_tiebreak)
    us = F.unix_micros(F.col(ts))
    prev_us = F.lag(us, 1).over(w)
    diff = (us - prev_us) / F.lit(float(US_PER_MIN))
    out = (
        df.withColumn(prev_col, F.lag(F.col(ts), 1).over(w))
        .withColumn(diff_col, diff)
        .withColumn(flag_col, F.col(diff_col).isNull() | (F.col(diff_col) > gap_min))
    )
    cum = F.sum(F.col(flag_col).cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.withColumn(id_col, F.concat_ws("-", cum.cast("string"), F.col(key)))


def _trailing_range_window(key: str, ts: str, window_sec: int, closed_left: bool) -> WindowSpec:
    # pandas rolling time windows are (t-w, t]; a closed RANGE frame needs
    # the lower bound nudged in by one microsecond for parity.
    lower = -(window_sec * 1_000_000 - (0 if closed_left else 1))
    return (
        Window.partitionBy(key).orderBy(F.unix_micros(F.col(ts))).rangeBetween(lower, 0)
    )


def rolling_count(
    df: DataFrame,
    key: str = "client_ip",
    ts: str = "time",
    value_col: str = "request",
    window_sec: int = 300,
    out_col: str = "rolling_5min_req_count",
    closed_left: bool = False,
) -> DataFrame:
    """Trailing time-window count (W6, reference :310-314): non-null count of
    ``value_col`` over the last ``window_sec`` seconds per key."""
    w = _trailing_range_window(key, ts, window_sec, closed_left)
    return df.withColumn(out_col, F.count(F.col(value_col)).over(w))


def rolling_avg(
    df: DataFrame,
    key: str = "client_ip",
    ts: str = "time",
    value_col: str = "total_processing_time_ms",
    window_sec: int = 3600,
    out_col: str = "rolling_1h_avg_proc_time",
    closed_left: bool = False,
    round_dp: int | None = None,
) -> DataFrame:
    """Trailing time-window mean (W7, reference :315-319); nulls skipped like
    pandas rolling mean / SQL AVG."""
    w = _trailing_range_window(key, ts, window_sec, closed_left)
    expr: Column = F.avg(F.col(value_col)).over(w)
    if round_dp is not None:
        expr = F.round(expr, round_dp)
    return df.withColumn(out_col, expr)


def add_session_features(
    df: DataFrame,
    key: str = "client_ip",
    ts: str = "time",
    proc_time_col: str = "total_processing_time_ms",
    request_col: str = "request",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """The reference's full W1-W7 block (:303-319) in one pass: sessionize +
    5-minute rolling count + 60-minute rolling mean. All windows share one
    partitioning on ``key`` — a single shuffle.

    Determinism on exact timestamp ties: the reference's pandas stable sort
    keeps input order; an unordered Spark window would make prev_time /
    session ids run-dependent. With no ``order_tiebreak`` column given, a
    row-content hash (xxhash64 over all columns) breaks ties
    deterministically — identical duplicate rows remain interchangeable,
    which is value-irrelevant (equal timestamps produce the same lag/flag
    either way). The rolling RANGE frames need no tiebreak: they are
    tie-INCLUSIVE by SQL semantics (module docstring)."""
    tmp = None
    if order_tiebreak is None:
        tmp = "_order_tiebreak"
        df = df.withColumn(tmp, F.xxhash64(*[F.col(c) for c in df.columns]))
        order_tiebreak = tmp
    out = sessionize(df, key=key, ts=ts, order_tiebreak=order_tiebreak)
    out = rolling_count(out, key=key, ts=ts, value_col=request_col, window_sec=300,
                        out_col="rolling_5min_req_count")
    out = rolling_avg(out, key=key, ts=ts, value_col=proc_time_col, window_sec=3600,
                      out_col="rolling_1h_avg_proc_time")
    return out.drop(tmp) if tmp else out
