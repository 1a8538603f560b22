"""Batch-replay harness: run a REAL Structured Streaming query over a
batch frame's data and hand the finished result back as a batch DataFrame.

This is the bridge that lets the streaming surface participate in the
value-exact DuckDB correctness gate: the batch frame is staged as parquet,
re-read with ``readStream`` (a genuine streaming source — micro-batch
planner, state store, watermarks all engaged), pushed through the caller's
streaming transformation, and drained to completion with an
``availableNow`` trigger into an in-memory sink.  The sink table is pinned
and returned, so the caller can compare it row-for-row against the batch
twin's oracle SQL.

Equivalence discipline (why these results CAN be value-exact):

- aggregation queries replay in ``complete`` output mode: append mode
  would suppress windows the end-of-stream watermark has not passed —
  an inherent streaming/batch divergence, not a bug — while complete mode
  emits every window exactly as the batch aggregation would;
- stateless/dedup/join queries replay in ``append`` mode with a watermark
  delay far longer than the fixture's event-time span, so no row is
  dropped as late and no state is finalized early;
- every float aggregate is DECIMAL-snapped inside the streaming plan
  (same dround contract as the batch catalog).

Scale note: the staging parquet is written once and read once — the
harness adds two linear passes over the input, nothing quadratic.  On a
real cluster the same ``build`` functions attach to a Kafka/file source
directly; ``replay_stream`` exists so tests and the correctness driver can
exercise the identical plan hermetically.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

#: Session-scoped staged-source cache (r15, guide §6 — fewer redundant
#: I/O passes): queries replaying the SAME batch frame share ONE staged
#: parquet copy instead of each paying a write + source listing.  Keyed
#: by (SparkContext id, caller key); the caller key certifies the
#: batch_df is identical for every sharer (same table, same projection)
#: — the first caller's write is reused verbatim.  clear_stage_cache()
#: is the bench/test isolation hook, mirroring the catalogs' shared
#: persisted-frame clear functions.
_STAGE_CACHE: dict[tuple, str] = {}


def clear_stage_cache() -> None:
    """Remove every shared staged-source directory (bench isolation
    hook — isolated reruns then charge each query a full re-stage)."""
    import shutil as _shutil

    while _STAGE_CACHE:
        _, d = _STAGE_CACHE.popitem()
        _shutil.rmtree(os.path.dirname(d), ignore_errors=True)


def replay_stream(
    spark: SparkSession,
    batch_df: DataFrame,
    build: Callable[[DataFrame], DataFrame],
    query_name: str,
    output_mode: str = "complete",
    timeout_sec: int = 300,
    staging_partitions: int = 8,
    shuffle_partitions: int | None = 16,
    sink: str = "memory",
    staging_key: tuple | None = None,
) -> DataFrame:
    """Replay ``batch_df`` through ``build(stream_df)`` as a real streaming
    query (availableNow trigger) and return the final sink table pinned
    as a batch DataFrame.

    ``sink`` picks the drain: "memory" (default — fine for small
    results, but the memory sink materializes every output row ON THE
    DRIVER) or "parquet" — a foreachBatch writer that lands each
    trigger's result as parquet and reads it back, keeping large results
    executor-side end to end (complete-mode output REPLACES the
    directory per trigger, so the last trigger wins, matching the memory
    sink's complete semantics; measured 19.1 s -> 14.4 s on the 19k-row
    LSH canonicalization replay at sf0.1, value-identical). Use
    "parquet" whenever the streaming result is O(corpus).

    The temp staging/checkpoint directory is removed before returning; the
    result is localCheckpoint-pinned first so nothing re-reads it.

    Harness tuning (measured at sf0.1 on the session-window query,
    5.7 s -> 1.5 s): the staging write coalesces to ``staging_partitions``
    files (a 32-way write costs more in per-file stream-source overhead
    than the parallelism returns at fixture scale), and
    ``spark.sql.shuffle.partitions`` is temporarily lowered to
    ``shuffle_partitions`` for the stateful replay (state-store instances
    scale with shuffle partitions; restored in a finally). These are
    HARNESS knobs — a production streaming job sizes its real source and
    state partitions to the stream, not to a replayed fixture; pass
    ``shuffle_partitions=None`` to leave the session untouched.

    ``staging_key``: opt-in shared staging (see _STAGE_CACHE).  Callers
    passing the same key MUST pass a value-identical ``batch_df`` — the
    staged copy is written by the first caller and re-read by the rest,
    so the equivalence each replay proves is unchanged (same rows, same
    real streaming engine); only the redundant staging write + listing
    is shared.  The shared copy survives until clear_stage_cache()."""
    if sink not in ("memory", "parquet"):
        raise ValueError(f"unknown replay sink {sink!r}")
    tmp = tempfile.mkdtemp(prefix="sparkgraft_replay_")
    name = f"{query_name}_{uuid.uuid4().hex[:8]}"
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        ckpt = os.path.join(tmp, "ckpt")
        dst = os.path.join(tmp, "dst")
        if staging_key is not None:
            ckey = (id(spark.sparkContext),) + tuple(staging_key)
            src = _STAGE_CACHE.get(ckey)
            if src is None or not os.path.isdir(src):
                sdir = tempfile.mkdtemp(prefix="sparkgraft_stage_")
                src = os.path.join(sdir, "src")
                batch_df.coalesce(staging_partitions).write.parquet(src)
                _STAGE_CACHE[ckey] = src
        else:
            src = os.path.join(tmp, "src")
            batch_df.coalesce(staging_partitions).write.parquet(src)
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        stream = spark.readStream.schema(batch_df.schema).parquet(src)
        out = build(stream)
        if sink == "memory":
            writer = out.writeStream.format("memory").queryName(name)
        else:

            # complete mode re-emits the WHOLE result per trigger -> the
            # last trigger's overwrite IS the final table; append mode
            # emits each row once -> accumulate
            _mode = "overwrite" if output_mode == "complete" else "append"

            def _drain(bdf: DataFrame, _bid: int) -> None:
                bdf.write.mode(_mode).parquet(dst)

            writer = out.writeStream.foreachBatch(_drain).queryName(name)
        q = (
            writer.outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:  # pragma: no cover - defensive timeout path
            q.stop()
            raise TimeoutError(f"streaming replay {name} did not drain")
        if q.exception() is not None:
            raise q.exception()
        if sink == "memory":
            result = spark.table(name).localCheckpoint(eager=True)
        elif not os.path.isdir(dst):
            # the replayed query emitted NO output batch (empty source, or
            # an append-mode build whose triggers produced nothing), so
            # foreachBatch never wrote dst — return an empty frame with
            # the sink schema, matching the memory sink's semantics
            result = spark.createDataFrame([], out.schema).localCheckpoint(
                eager=True
            )
        else:
            result = spark.read.parquet(dst).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
        shutil.rmtree(tmp, ignore_errors=True)
        if sink == "memory":
            spark.catalog.dropTempView(name)
    return result
