"""Shared snapshot-store read helpers for the CUMULATIVE foreachBatch
stores (cmstream cells, kmvstream hashes, heavyhitters summary+meta,
histogram counts).

Store layout contract: ``<path>/batch=N`` holds the full cumulative
state as of batch N; writes are overwrite-idempotent; reads want the
LATEST batch strictly before some cut (the retry-safe prior for a
foreachBatch body, or 2^31-1 for a current_* reader).

Why the read selects the batch from the DIRECTORY LISTING and then
scans ONLY that one partition (ADVICE r10):

- Race: ``_prune_history`` deletes superseded snapshots concurrently
  with live readers.  The old read scanned every ``batch=`` partition
  and picked the max with an in-plan join, so a prune landing between
  Spark's file listing and the scan could fail the read with
  FileNotFoundException on a file it was never going to use.  The one
  directory this helper reads is by construction the newest prior
  snapshot — exactly the directory the prune contract never deletes
  (prune keeps the newest prior M and the in-flight N; it only removes
  batches < M).
- Scale: O(1) directories opened per read regardless of how many
  superseded snapshots pruning hasn't caught up with — on a long-lived
  stream with best-effort pruning the old full-store listing grew
  linearly with backlog.

Error contract (r9, kept): ONLY "store path does not exist" (first
batch / never started) reads as no-state.  Transient FS errors during
listing or scan PROPAGATE — treating them as no-state would persist a
cumulative snapshot missing all prior counts, a permanent silent
undercount.

NOT for delta stores whose reads union ALL prior batches (the neardup
first-seen key store): those never prune, so they keep the full-store
scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["list_batches", "read_latest_snapshot"]


def list_batches(spark: SparkSession, path: str) -> list[int] | None:
    """Batch numbers of the ``batch=N`` subdirectories under ``path``
    (one driver-side Hadoop FS listing — no Spark job), or None when
    the store path itself does not exist."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    out: list[int] = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return out


def read_latest_snapshot(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    before_batch: int,
    at_batch: int | None = None,
) -> DataFrame | None:
    """The latest cumulative snapshot strictly before ``before_batch``
    (or exactly ``at_batch`` when given), with the ``batch`` partition
    column dropped; None when the store is missing or holds no
    qualifying snapshot.  Reads ONLY the selected partition directory
    (see module docstring for why)."""
    if at_batch is None:
        batches = list_batches(spark, path)
        if not batches:
            return None
        prior = [b for b in batches if b < before_batch]
        if not prior:
            return None
        at_batch = max(prior)
    leaf = os.path.join(path, f"batch={int(at_batch)}")
    df = (
        spark.read.schema(schema)
        .option("basePath", path)
        .parquet(leaf)
    )
    return df.drop("batch")
