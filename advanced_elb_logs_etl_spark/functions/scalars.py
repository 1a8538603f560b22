"""Reusable Column-expression helpers — the scalar-function surface of the
reference engine, re-expressed as Catalyst expressions (no UDFs; everything
here stays inside whole-stage codegen).

Reference citations point into /root/reference/advanced_elb_logs_etl.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..session import EASTERN_TZ


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dround(col: Column, scale: int) -> Column:
    """Cross-engine-stable rounding for float outputs that an external SQL
    oracle re-computes.

    Floating results can differ between engines by accumulation-order ulps,
    and engines disagree on how to round a double that sits exactly on a
    decimal boundary (shortest-repr HALF_UP vs scaled-multiply). Casting
    through DECIMAL(28,8) first snaps the value to an exact decimal (ulp
    noise << 0.5e-8), after which both engines round the same number with
    the same half-up rule. SQL twin:
    CAST(round(CAST(x AS DECIMAL(28,8)), d) AS DOUBLE)."""
    return F.round(col.cast("decimal(28,8)"), scale).cast("double")


def to_int_col(col: Column | str) -> Column:
    """Null-coding int cast (reference to_int :52-56): '-'/''/null -> null,
    unparseable -> null, else integer. try_cast keeps these semantics even
    under ANSI mode."""
    c = _c(col)
    return F.nullif(F.nullif(c, F.lit("-")), F.lit("")).try_cast("long")


def to_float_col(col: Column | str) -> Column:
    """Null-coding float cast (reference to_float :58-62). Note ALB's -1
    timeout sentinel parses as a valid -1.0 and is KEPT (SURVEY.md §1.3)."""
    c = _c(col)
    return F.nullif(F.nullif(c, F.lit("-")), F.lit("")).try_cast("double")


def status_code_type(col: Column | str) -> Column:
    """HTTP status bucketing (reference status_code_type :268-277):
    100-199 -> 1xx_Informational ... 500-599 -> 5xx_ServerError,
    null / out-of-range / unparseable -> 'Unknown'."""
    code = _c(col).try_cast("long")
    return (
        F.when(code.between(100, 199), "1xx_Informational")
        .when(code.between(200, 299), "2xx_Success")
        .when(code.between(300, 399), "3xx_Redirection")
        .when(code.between(400, 499), "4xx_ClientError")
        .when(code.between(500, 599), "5xx_ServerError")
        .otherwise("Unknown")
    )


def is_bot(ua: Column | str) -> Column:
    """Bot flag (reference :128): substring test over the lowercased UA.
    'googlebot' is redundant (subsumed by 'bot') but kept for parity with
    the reference's list. Empty/'-' UA -> False (reference :129-131)."""
    c = _c(ua)
    flagged = F.lower(c).rlike("bot|spider|crawler|python-urllib")
    return F.when((c == "-") | (c == "") | c.isNull(), F.lit(False)).otherwise(flagged)


def path_depth(path: Column | str) -> Column:
    """Count of '/' in the path (reference :300). pandas quirk replicated:
    a null path goes through astype(str) -> literal 'None' -> depth 0."""
    p = F.coalesce(_c(path), F.lit("None"))
    return (F.length(p) - F.length(F.replace(p, F.lit("/"), F.lit("")))).cast("long")


def path_main_segment(path: Column | str) -> Column:
    """First path segment after the leading '/' (reference :301):
    '/api/x' -> 'api'; null path ('None' string, no '/') -> null."""
    p = F.coalesce(_c(path), F.lit("None"))
    parts = F.split(p, "/")
    return F.when(F.size(parts) > 1, parts.getItem(1))


def time_to_eastern(ts: Column | str) -> Column:
    """UTC instant -> America/New_York wall-clock (reference :86-98, tz
    constant :29). Column-level, never via session timezone."""
    return F.from_utc_timestamp(_c(ts), EASTERN_TZ)
