"""Sequential pattern mining: frequent gappy event subsequences with
per-user support counting (Agrawal & Srikant 1996, "Mining sequential
patterns" (GSP) / Pei et al. 2001 PrefixSpan — public methods; this is
the support-counting core for patterns of length 2 and 3 over a small
event-type alphabet).

Distinct from the catalog's ``sequence_top_paths`` (contiguous
trigram counting: every occurrence counts, steps must be adjacent):
a sequential PATTERN a->b is supported by a user if ANY occurrence of
a precedes ANY occurrence of b — arbitrary gap, and each user counts
ONCE regardless of how many matching occurrence pairs they have.
That is the funnel-discovery / behavioral-cohort semantics ("users
who viewed then later purchased", with anything in between).

The existence trick that keeps support counting join-shaped instead of
enumerating occurrence pairs: within one user,

  exists (t_a < t_b)          <=>  min_ord(a) < max_ord(b)
  exists (t_a < t_b < t_c)    <=>  some occurrence of b lies strictly
                                   inside (min_ord(a), max_ord(c))

so length-2 support needs only the per-(user, type) (min_ord, max_ord)
frame joined to itself, and length-3 adds one join against the raw
occurrence rows for the MIDDLE element only.  ord is the per-user
(ts, event_id) row number, so ties are deterministic.

Scale shape (100 TB): one keyed window for ord (user-keyed sort), one
hash agg to the (user, type) frame (rows <= users * |alphabet|), then
user-keyed equi-joins whose fan-out is bounded by |alphabet|^2 per
user for length 2 and |alphabet|^2 * occurrences for length 3 — event
alphabets are small by construction (the reference's event taxonomy);
the support agg output is <= |alphabet|^3 rows.  No global sort, no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["frequent_subsequences"]


def frequent_subsequences(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    min_support: int = 1,
) -> DataFrame:
    """(pattern, length, support) for every length-2 and length-3 gappy
    subsequence pattern with per-user support >= min_support, pattern
    rendered as 'a>b' / 'a>b>c' (the sequence_top_paths separator).
    Support = number of distinct users containing the pattern (each
    user once).  Repeated types are allowed (a>a needs two occurrences;
    the min<max / strict-between conditions handle that without special
    cases).  Deterministic: ord ties break on the order columns, and
    the report is fully ordered."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    occ = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.row_number().over(w).alias("ord"),
    )
    # one row per (user, type): first and last occurrence position
    span = occ.groupBy("u", "t").agg(
        F.min("ord").alias("lo"), F.max("ord").alias("hi")
    )
    a = span.select("u", F.col("t").alias("ta"), F.col("lo").alias("alo"))
    b2 = span.select("u", F.col("t").alias("tb"), F.col("hi").alias("bhi"))
    pat2 = (
        a.join(b2, "u")
        .filter(F.col("alo") < F.col("bhi"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("support"))
        .select(
            F.concat_ws(">", "ta", "tb").alias("pattern"),
            F.lit(2).cast("long").alias("length"),
            F.col("support").cast("long").alias("support"),
        )
    )
    # length 3: a strict middle occurrence of b inside (min(a), max(c));
    # distinct (u, ta, tb, tc) BEFORE the support agg — a user with many
    # qualifying middle occurrences still counts once
    c3 = span.select("u", F.col("t").alias("tc"), F.col("hi").alias("chi"))
    mid = occ.select("u", F.col("t").alias("tb"), F.col("ord").alias("bord"))
    pat3 = (
        a.join(mid, "u")
        .filter(F.col("alo") < F.col("bord"))
        .join(c3, "u")
        .filter(F.col("bord") < F.col("chi"))
        .select("u", "ta", "tb", "tc")
        .distinct()
        .groupBy("ta", "tb", "tc")
        .agg(F.count(F.lit(1)).alias("support"))
        .select(
            F.concat_ws(">", "ta", "tb", "tc").alias("pattern"),
            F.lit(3).cast("long").alias("length"),
            F.col("support").cast("long").alias("support"),
        )
    )
    return (
        pat2.unionByName(pat3)
        .filter(F.col("support") >= F.lit(int(min_support)))
        .orderBy(F.desc("support"), "pattern")
    )
