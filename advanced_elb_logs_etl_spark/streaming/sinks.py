"""Streaming sinks beyond the built-ins: stream-static enrichment and a
foreachBatch keyed upsert into a parquet target.

Structured Streaming's file sink is append-only; real pipelines usually
need MERGE semantics (latest record per key wins) into a queryable table.
Lakehouse formats (Delta/Iceberg/Hudi) provide transactional MERGE INTO —
in a plain-parquet environment the equivalent is a foreachBatch
read-union-dedup-rewrite, which this module implements with the
restartability caveats spelled out.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def enrich_stream(events: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against the
    CURRENT snapshot of the static side — the streaming twin of the batch
    dim_enrich_join (operators/geo.py).

    Stateless: Spark re-plans the static side per micro-batch, so a dim
    backed by a path picks up file-level updates between batches (snapshot
    consistency per batch, no SCD semantics — for as-of correctness
    against a versioned dim, join on the SCD2 interval form from
    operators/warehouse.py instead).

    Scale: the static side should broadcast (dim tables against a
    firehose); the explicit hint keeps a grown dim from silently flipping
    the plan into a per-batch shuffle of the stream side."""
    return events.join(F.broadcast(dim), on=key, how="left")


def merge_upsert_sink(
    stream_df: DataFrame,
    target_path: str,
    keys: list[str],
    order_col: str,
    checkpoint_dir: str,
    trigger_once: bool = False,
) -> StreamingQuery:
    """foreachBatch keyed upsert into a parquet directory: after each
    micro-batch the target holds exactly one row per key — the one with
    the greatest ``order_col`` (event time / version) seen so far, ties
    resolved toward the incoming batch. Two rows with the SAME key and
    order value inside one batch have no defined winner (the same row a
    lakehouse MERGE would reject as a multi-match) — give records a
    version/sequence column if the source can emit same-key ties.

    Mechanics per batch: read current target (if any), union the batch,
    keep the max-order row per key (window rank with an is_new tiebreak),
    write to a swap directory, atomically-ish replace the target. The
    swap-then-rename bounds the unreadable window to the rename itself;
    a crash between rename steps is recoverable from the swap dir, and
    foreachBatch re-delivery (same epoch id re-run after restart) is
    IDEMPOTENT here because merging a batch twice yields the same target.

    This is deliberately the plain-parquet fallback: on a lakehouse table
    the body of ``_merge`` becomes a transactional MERGE INTO and the
    rewrite cost drops from O(target) to O(touched files). The full
    target rewrite per batch is the documented cost ceiling — use only
    for dimension-sized targets (the use case: a continuously-updated
    device/session registry), never for fact streams.

    Scale: the per-key latest-row reduction shuffles on the key hash
    once; the target re-read is a parquet scan pruned to key+payload
    columns only if the caller pre-projected — pass a narrow stream."""
    if not keys:
        raise ValueError("merge_upsert_sink requires an explicit key list")
    if order_col in keys:
        raise ValueError(f"order_col {order_col!r} cannot be a merge key")

    spark = stream_df.sparkSession

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        new = batch_df.withColumn("__is_new", F.lit(1))
        if os.path.isdir(target_path):
            cur = spark.read.parquet(target_path).withColumn("__is_new", F.lit(0))
            allrows = cur.unionByName(new)
        else:
            allrows = new
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(), F.col("__is_new").desc()
        )
        latest = (
            allrows.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .drop("__rk", "__is_new")
        )
        swap = target_path.rstrip("/") + ".__swap__"
        latest.write.mode("overwrite").parquet(swap)
        old = target_path.rstrip("/") + ".__old__"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(target_path):
            os.rename(target_path, old)
        os.rename(swap, target_path)
        if os.path.isdir(old):
            shutil.rmtree(old)

    writer = stream_df.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
