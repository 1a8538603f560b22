"""Feature engineering (reference add_advanced_features, :279-319, minus the
window block which lives in operators/sessions.py).

All pure Column expressions — casts, CASE bucketing, date parts, string
features. The reference's dtype downcasts (int8/int16/float32, category) are
physical-layout tweaks pandas needs; Tungsten + parquet dictionary/RLE
encodings make them moot (SURVEY.md §4.2), so logical types stay
long/int/double here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import (
    path_depth,
    path_main_segment,
    status_code_type,
    time_to_eastern,
    to_int_col,
)


def add_features(df: DataFrame, time_col: str = "time", eastern: bool = True) -> DataFrame:
    """Casts (P3/P4), status bucketing (P12), date parts (P13), path features
    (P14/P15), plus the F2 critical-field filter.

    Date parts are computed in America/New_York wall-clock like the reference
    (it converts `time` to Eastern before extracting, :86-98 + :292-298);
    pass eastern=False to keep UTC.
    """
    # F2 (reference :282): drop rows with a null join/session key.
    out = df.filter(F.col("client_ip").isNotNull())

    # P3/P4 null-coding casts (reference :284-287).
    for c in ("elb_status_code", "target_status_code", "received_bytes", "sent_bytes"):
        out = out.withColumn(c, to_int_col(c))

    # P12 (reference :290) — bucket BEFORE the cast narrows, like the
    # reference (it buckets the already-cast int column; same result).
    out = out.withColumn("status_code_type", status_code_type(F.col("elb_status_code")))

    # P13 (reference :292-298) — Eastern wall-clock date parts.
    local = time_to_eastern(F.col(time_col)) if eastern else F.col(time_col)
    out = (
        out.withColumn("request_year", F.year(local).cast("int"))
        .withColumn("request_month", F.month(local).cast("int"))
        .withColumn("request_day", F.dayofmonth(local).cast("int"))
        .withColumn("request_hour", F.hour(local).cast("int"))
        .withColumn("request_day_of_week", F.date_format(local, "EEEE"))
        # Spark weekofyear == pandas isocalendar().week (both ISO-8601).
        .withColumn("request_week_of_year", F.weekofyear(local).cast("int"))
    )

    # P14/P15 (reference :300-301) incl. the 'None'-string null-path quirk.
    return out.withColumn("path_depth", path_depth(F.col("path"))).withColumn(
        "path_main_segment", path_main_segment(F.col("path"))
    )
