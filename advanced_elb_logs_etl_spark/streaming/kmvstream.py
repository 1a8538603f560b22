"""Streaming K-Minimum-Values sketch: the batch KMV operator
(operators/kmv.py) maintained across micro-batches with the bounded,
restart-safe parquet store of streaming/cmstream.py.

The k smallest distinct hashes of a growing set are a MONOTONE fold —
union the prior minima with the batch's hashes, keep the k smallest —
so the cumulative streamed sketch equals the single-pass batch sketch
WHATEVER the micro-batch slicing (mergeable summaries, Agarwal et al.
2012), making the operator value-exact-checkable against the batch SQL
twin at any geometry (the cmstream/histogram discipline, not a
compacting summary like Misra-Gries).

Store layout under ``store_dir``: ``hashes/batch=N`` holds the
CUMULATIVE k-row minima set as of batch N; reads filter
``batch < batch_id`` (retry-safe), writes are overwrite-idempotent,
and snapshots older than the retry-read predecessor are pruned (the
cmstream ADVICE-r9 fix, inherited here from day one).  No empty-batch
sentinel is needed: the state is the full minima set, so an empty
batch rewrites the prior state verbatim and the latest-prior read is
always correct.

Scale shape (100 TB/day stream): per micro-batch one hash projection +
distinct + TakeOrdered(k) over the batch, a union with the k-row prior,
and one k-row write.  State is k rows regardless of stream length;
sketches from independent streams merge by kmv.kmv_union, and the
result feeds kmv.kmv_estimate / kmv_intersect_estimate unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import kmv

__all__ = [
    "kmv_batch_step",
    "kmv_stream",
    "current_kmv",
    "replay_kmv",
    "kmv_grouped_batch_step",
    "kmv_stream_grouped",
    "current_kmv_grouped",
    "replay_kmv_grouped",
]

HASHES_SCHEMA = T.StructType(
    [
        T.StructField("h", T.LongType()),
        T.StructField("batch", T.IntegerType()),
    ]
)


def kmv_batch_step(
    batch_df: DataFrame,
    prev_hashes: DataFrame | None,
    key_col: str = "key",
    k: int = kmv.K,
) -> DataFrame:
    """One fold step: k smallest distinct hashes of (prior minima ++
    batch keys).  Delegates the batch side to kmv.kmv_build so the two
    lanes can never drift, then re-minimizes the union (a 2k-row
    TakeOrdered)."""
    batch_sketch = kmv.kmv_build(batch_df, key_col, k)
    if prev_hashes is None:
        return batch_sketch
    return kmv.kmv_union(
        batch_sketch, prev_hashes.select("h"), k=k
    )


def _read_prior(
    spark: SparkSession, path: str, before_batch: int
) -> DataFrame | None:
    """Latest cumulative minima snapshot strictly before
    ``before_batch`` via store.read_latest_snapshot (directory-listing
    batch selection, single-partition scan — prune-race-free, ADVICE
    r10).  Missing store == no prior state; transient FS errors
    propagate (silently dropping prior minima would overestimate every
    subsequent distinct count)."""
    from .store import read_latest_snapshot

    return read_latest_snapshot(spark, path, HASHES_SCHEMA, before_batch)


def _process_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    key_col: str,
    k: int,
) -> None:
    """foreachBatch body (module-level, retry-safe: reads batches <
    batch_id, overwrite-idempotent write, superseded snapshots pruned —
    the cmstream contract)."""
    from .cmstream import _prune_history

    hashes_dir = os.path.join(store_dir, "hashes")
    prev = _read_prior(batch_df.sparkSession, hashes_dir, batch_id)
    out = kmv_batch_step(batch_df, prev, key_col, k)
    out.write.mode("overwrite").parquet(
        os.path.join(hashes_dir, f"batch={batch_id}")
    )
    _prune_history(batch_df.sparkSession, hashes_dir, batch_id)


def kmv_stream(
    stream: DataFrame,
    store_dir: str,
    key_col: str = "key",
    k: int = kmv.K,
):
    """Attach the sketch to a streaming frame; returns a configured
    DataStreamWriter (caller adds trigger/checkpoint and starts it).
    One store per checkpoint lineage."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _process_batch(batch_df, batch_id, store_dir, key_col, k)

    return stream.writeStream.foreachBatch(_process).outputMode("update")


def current_kmv(spark: SparkSession, store_dir: str) -> DataFrame:
    """The latest cumulative minima set (column ``h``) — feed it to
    kmv.kmv_estimate / kmv_intersect_estimate, or kmv_union to combine
    with other stores."""
    hashes = _read_prior(spark, os.path.join(store_dir, "hashes"), 2**31 - 1)
    if hashes is None:
        return spark.createDataFrame([], "h long")
    return hashes


def replay_kmv(
    spark: SparkSession,
    df: DataFrame,
    key_col: str,
    k: int = kmv.K,
    num_batches: int = 1,
    order_col: str | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Replay a batch frame through the streaming sketch (real
    micro-batch engine: staged parquet source, foreachBatch sink,
    availableNow trigger) and return the final minima set — which
    equals kmv_build of the whole frame whatever the slicing."""
    import shutil
    import tempfile
    import time as _time

    order_col = order_col or key_col
    tmp = tempfile.mkdtemp(prefix="sparkgraft_kmv_")
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        src = os.path.join(tmp, "src")
        ckpt = os.path.join(tmp, "ckpt")
        store = os.path.join(tmp, "store")
        if num_batches <= 1:
            df.coalesce(8).write.parquet(src)
        else:
            df.repartitionByRange(
                num_batches, F.col(order_col)
            ).sortWithinPartitions(order_col).write.parquet(src)
            base = _time.time() - 3600
            parts = sorted(
                f
                for f in os.listdir(src)
                if f.startswith("part-") and not f.endswith(".crc")
            )
            for i, fname in enumerate(parts):
                os.utime(os.path.join(src, fname), (base + i, base + i))
        reader = spark.readStream.schema(df.schema)
        if num_batches > 1:
            reader = reader.option("maxFilesPerTrigger", 1).option(
                "latestFirst", "false"
            )
        stream = reader.parquet(src)
        writer = kmv_stream(stream, store, key_col, k)
        q = (
            writer.option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"KMV replay did not drain within {timeout_sec}s — refusing"
                " to read a partially-populated store"
            )
        final = current_kmv(spark, store)
        rows = final.collect()  # materialize before the store dir is removed
        return spark.createDataFrame(rows, "h long")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Grouped streaming KMV: per-group minima sets maintained on the stream —
# the streaming form of the reference's per-hour COUNT(DISTINCT client_ip)
# (reference advanced_elb_logs_etl.py:345-363): per-(hour, ...) distinct
# estimates that stay queryable while the stream runs, roll up across
# groups via kmv.kmv_merge_grouped, and merge across independent stores.
# Same monotone cumulative store as the global form — the per-group fold
# keeps each group's k smallest hashes, so the streamed state equals the
# batch grouped build whatever the slicing; an empty batch (or a batch
# missing a group) rewrites that group's prior rows verbatim.
# ---------------------------------------------------------------------------


def _grouped_state_schema(spark: SparkSession, groups_ddl: str) -> T.StructType:
    """State schema for the grouped store: the caller's group columns
    (DDL string, e.g. "hour string, segment string") + (h long,
    batch int).  Built through createDataFrame so the DDL parse follows
    the session's resolver."""
    return spark.createDataFrame(
        [], f"{groups_ddl}, h long, batch int"
    ).schema


def kmv_grouped_batch_step(
    batch_df: DataFrame,
    prev_hashes: DataFrame | None,
    group_cols: list[str],
    key_col: str = "key",
    k: int = kmv.K,
) -> DataFrame:
    """One grouped fold step: per-group k smallest distinct hashes of
    (prior minima ++ batch keys).  Delegates both lanes to the batch
    grouped operators so the streams can never drift from them."""
    batch_sk = kmv.kmv_build_grouped(batch_df, group_cols, key_col, k)
    if prev_hashes is None:
        return batch_sk
    return kmv.kmv_merge_grouped(
        batch_sk.unionByName(prev_hashes.select(*group_cols, "h")),
        group_cols,
        k,
    )


def _process_batch_grouped(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    group_cols: list[str],
    groups_ddl: str,
    key_col: str,
    k: int,
) -> None:
    """foreachBatch body (module-level, retry-safe: reads batches <
    batch_id via the single-partition snapshot read, overwrite-
    idempotent write, superseded snapshots pruned — the cmstream
    contract, unchanged by grouping)."""
    from .cmstream import _prune_history
    from .store import read_latest_snapshot

    spark = batch_df.sparkSession
    hashes_dir = os.path.join(store_dir, "hashes")
    prev = read_latest_snapshot(
        spark, hashes_dir, _grouped_state_schema(spark, groups_ddl), batch_id
    )
    out = kmv_grouped_batch_step(batch_df, prev, group_cols, key_col, k)
    out.write.mode("overwrite").parquet(
        os.path.join(hashes_dir, f"batch={batch_id}")
    )
    _prune_history(spark, hashes_dir, batch_id)


def kmv_stream_grouped(
    stream: DataFrame,
    store_dir: str,
    group_cols: list[str],
    groups_ddl: str,
    key_col: str = "key",
    k: int = kmv.K,
):
    """Attach the per-group sketch to a streaming frame; returns a
    configured DataStreamWriter (caller adds trigger/checkpoint and
    starts it).  ``groups_ddl`` declares the group columns' types for
    the store reads (e.g. "hour string").  One store per checkpoint
    lineage.

    Scale shape: per micro-batch one grouped distinct agg + one
    row_number window keyed on the group, a union with the <= k-rows-
    per-group prior, and one bounded write — state is k rows PER GROUP
    (the caller bounds group cardinality: hours, sources, tenants),
    independent of stream length."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty; use kmv_stream")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _process_batch_grouped(
            batch_df, batch_id, store_dir, group_cols, groups_ddl, key_col, k
        )

    return stream.writeStream.foreachBatch(_process).outputMode("update")


def current_kmv_grouped(
    spark: SparkSession, store_dir: str, groups_ddl: str
) -> DataFrame:
    """The latest per-group cumulative minima (group_cols..., h) — feed
    it to kmv.kmv_estimate_grouped for per-group distinct estimates,
    kmv.kmv_merge_grouped to roll up, or union with another store's
    frame and re-minimize (kmv_merge_grouped again) to merge stores."""
    from .store import read_latest_snapshot

    hashes = read_latest_snapshot(
        spark,
        os.path.join(store_dir, "hashes"),
        _grouped_state_schema(spark, groups_ddl),
        2**31 - 1,
    )
    if hashes is None:
        return spark.createDataFrame([], f"{groups_ddl}, h long")
    return hashes


def replay_kmv_grouped(
    spark: SparkSession,
    df: DataFrame,
    group_cols: list[str],
    groups_ddl: str,
    key_col: str,
    k: int = kmv.K,
    num_batches: int = 1,
    order_col: str | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Replay a batch frame through the grouped streaming sketch (real
    micro-batch engine: staged parquet source, foreachBatch sink,
    availableNow trigger) and return the final per-group minima — which
    equal kmv_build_grouped of the whole frame whatever the slicing."""
    import shutil
    import tempfile
    import time as _time

    order_col = order_col or key_col
    tmp = tempfile.mkdtemp(prefix="sparkgraft_gkmv_")
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        src = os.path.join(tmp, "src")
        ckpt = os.path.join(tmp, "ckpt")
        store = os.path.join(tmp, "store")
        if num_batches <= 1:
            df.coalesce(8).write.parquet(src)
        else:
            df.repartitionByRange(
                num_batches, F.col(order_col)
            ).sortWithinPartitions(order_col).write.parquet(src)
            base = _time.time() - 3600
            parts = sorted(
                f
                for f in os.listdir(src)
                if f.startswith("part-") and not f.endswith(".crc")
            )
            for i, fname in enumerate(parts):
                os.utime(os.path.join(src, fname), (base + i, base + i))
        reader = spark.readStream.schema(df.schema)
        if num_batches > 1:
            reader = reader.option("maxFilesPerTrigger", 1).option(
                "latestFirst", "false"
            )
        stream = reader.parquet(src)
        writer = kmv_stream_grouped(
            stream, store, group_cols, groups_ddl, key_col, k
        )
        q = (
            writer.option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"grouped KMV replay did not drain within {timeout_sec}s — "
                "refusing to read a partially-populated store"
            )
        final = current_kmv_grouped(spark, store, groups_ddl)
        rows = final.collect()  # materialize before the store dir is removed
        return spark.createDataFrame(rows, f"{groups_ddl}, h long")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
        shutil.rmtree(tmp, ignore_errors=True)
