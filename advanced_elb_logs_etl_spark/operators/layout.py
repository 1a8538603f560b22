"""Data-layout operators: Z-order (Morton) clustering for multi-column
file pruning.

The 100 TB problem this addresses: parquet min/max pruning only helps on
columns correlated with file order. Sorting by column A gives perfect
pruning on A and none on B; Z-ORDERING by (A, B) — interleaving the bits
of both keys and range-partitioning on the interleaved value — gives
every file a SMALL RANGE IN BOTH dimensions simultaneously (the Morton
curve's locality guarantee), so predicates on either column skip most
files. This is the layout technique behind Delta/Iceberg OPTIMIZE
ZORDER; here it is a plain Column expression + repartitionByRange, no
table format required.

The z-value is pure integer bit arithmetic (shifts/masks), identical in
Spark and DuckDB — so the clustering PREVIEW (per-z-bucket min/max
extents of each dimension) is value-exact under the oracle gate, which
is how an inherently physical layout property gets a logical correctness
pin: fixed-width z-buckets are deterministic stand-ins for the files a
range-partitioned write would produce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "zorder_by", "compaction_plan", "write_bucketed"]


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of two non-negative integer bucket columns, each
    clamped to ``bits`` bits: bit i of `a` lands at position 2i, bit i of
    `b` at 2i+1.  2*bits shift/mask terms — whole-stage-codegen integer
    math, bit-identical in any engine with <</>>/&/| (SQL twin uses the
    same expression).  Callers bucket raw values first (e.g. epoch-day,
    id ranges); clamping makes out-of-range inputs saturate instead of
    colliding."""
    cap = (1 << bits) - 1
    ac = F.least(F.greatest(a.cast("long"), F.lit(0)), F.lit(cap))
    bc = F.least(F.greatest(b.cast("long"), F.lit(0)), F.lit(cap))
    # Column `&`/`|` are LOGICAL operators in PySpark — bitwise math needs
    # the explicit bitwiseAND/bitwiseOR methods.
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(ac, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(bc, i).bitwiseAND(one), 2 * i + 1))
    return z


def zorder_by(
    df: DataFrame,
    a: Column,
    b: Column,
    num_partitions: int = 32,
    bits: int = 16,
    z_col: str = "_z",
) -> DataFrame:
    """Physically cluster ``df`` on the Morton curve of (a, b):
    range-partition by the interleaved z-value (each output partition =
    one tight z-range = small extent in BOTH dimensions), ready for a
    partition-per-file write.  The write itself is the caller's
    (``.write.parquet`` emits one file per partition); this operator is
    the layout transform."""
    return df.withColumn(z_col, zvalue(a, b, bits)).repartitionByRange(
        num_partitions, F.col(z_col)
    )


def compaction_plan(
    files: DataFrame,
    file_col: str = "file_name",
    size_col: str = "bytes",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-files compaction planner: assign every file to an output bin
    of ~``target_bytes`` using contiguous next-fit over the size-DESC
    ordering — bin = floor(start_offset / target) where start_offset is
    the exact cumulative size of all larger files.  Deterministic (size
    then name tiebreak) and fully relational, so the plan is
    value-checkable; big files land alone in their bins (a file >= target
    spans its own bin range), small files pack together.

    Input is a file MANIFEST frame — in production `spark.read.parquet(
    path).select(F.col("_metadata.file_path"), F.col("_metadata.
    file_size")).distinct()` — which is always orders of magnitude
    smaller than the data; the cumulative offset still goes through the
    range-partitioned two-phase scan (stats.global_cumsum), so even a
    100M-file manifest never hits a single-partition window."""
    from .stats import global_cumsum

    f = files.select(
        F.col(file_col).alias("file_name"),
        F.col(size_col).cast("long").alias("bytes"),
        (-F.col(size_col).cast("long")).alias("_neg"),
    )
    cum = global_cumsum(f, ["_neg", "file_name"], ["bytes"])
    return cum.select(
        "file_name",
        "bytes",
        F.floor((F.col("cum_bytes") - F.col("bytes")) / F.lit(target_bytes))
        .cast("long")
        .alias("bin"),
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a frame as a BUCKETED parquet table (``bucketBy`` +
    optional ``sortBy`` + ``saveAsTable``) — the co-located-join layout:
    two tables bucketed the same way on their join key join WITHOUT any
    Exchange (verified from executed plans and SQLMetrics in
    tests/test_layout.py), because every bucket id holds the same key
    slice on both sides.

    The 100 TB contract: a fact table joined repeatedly on the same key
    pays its shuffle ONCE at write time; every subsequent join (and
    groupBy on a prefix of the bucket columns) reuses the layout.  Pair
    ``sort_cols`` with the bucket columns to also skip the sort of a
    sort-merge join.  num_buckets should be sized like shuffle
    partitions at full scale (the session.autosize arithmetic: total
    bytes / ~128 MB).

    Spark-specific notes, stated so callers don't rediscover them:
    - bucketing metadata lives in the session catalog (saveAsTable);
      plain ``.parquet(path)`` writes LOSE it, and reading the files
      directly (not the table) ignores it.
    - both join sides must have the SAME bucket count (or one a divisor
      of the other with spark.sql.bucketing.coalesceBucketsInJoin
      enabled) and bucket columns == join columns.
    - spark.sql.sources.bucketing.enabled (default true) must be on at
      READ time.
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    if not bucket_cols:
        raise ValueError("bucket_cols must name at least one column")
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)
