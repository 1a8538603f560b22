"""Round-5 streaming<->batch equivalence wave (VERDICT r4 item 6).

Each query here runs a REAL Structured Streaming job — micro-batch
planner, state store, watermarks — via the batch-replay harness
(streaming/replay.py) and returns the drained sink as a batch frame, so
the driver's DuckDB oracle gate checks the STREAMING execution path
value-for-value against plain batch SQL.  These pin the claim the pytest
streaming suite can only assert piecewise: that the streaming surface's
session windows, tumbling windows, watermark dedup, and stream-stream
interval joins produce byte-identical results to their batch twins when
the stream is drained.

The reference is pure batch (SURVEY.md §2.8); this is the extension
surface's equivalence proof, not a reference-parity item.

Output-mode discipline (see replay.py docstring): aggregations replay in
``complete`` mode (append would suppress windows the end-of-stream
watermark has not passed — inherent semantics, not a bug); dedup and the
stream-stream join replay in ``append`` with a watermark delay far beyond
the fixture's 30-day event-time span, so no row drops as late.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import dround
from ..streaming.replay import replay_stream
from ..streaming.sessions import dedup_stream, sessionize_stream
from .catalog import _t, _us, register
from .catalog_r3 import _SESSION_WINDOW_ORACLE, _TUMBLE_ORACLE

#: Shared staged-source projection for the replay_stream event queries
#: (r15, guide §6): the five equivalence replays over `events` stage ONE
#: parquet copy of this column union instead of five near-identical
#: copies — each build still selects what it needs and the streaming
#: scan prunes columns, so every replay proves exactly what it did
#: before.  bench.py clears the cache around its isolated rows
#: (streaming.replay.clear_stage_cache) so per-query attribution keeps
#: charging a full stage.
_STREAM_EVENTS_COLS = ("event_id", "user_id", "event_type", "ts", "value")


def _staged_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select(*_STREAM_EVENTS_COLS)


def _events_key(sf_dir: str) -> tuple:
    return ("events", sf_dir) + _STREAM_EVENTS_COLS


# ---------------------------------------------------------------------------
# stream_session_window_equiv — native session_window, streaming execution
# ---------------------------------------------------------------------------


@register("stream_session_window_equiv", _SESSION_WINDOW_ORACLE)
def q_stream_session_window_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization executed by the STREAMING engine
    (session_window + watermark + state store, drained with availableNow)
    and compared against the exact same oracle as the batch twin
    `session_window_batch` — one oracle, two execution paths.

    The streaming expression is streaming/sessions.sessionize_stream
    re-aggregated with the batch twin's outputs (count + snapped sum); the
    groupBy/agg shape is identical, so state partitions by user exactly
    like the batch shuffle.

    Scale: streaming sessionization state is O(open sessions); complete
    mode is for the equivalence check only — production append mode emits
    finalized sessions incrementally."""
    ev = _staged_events(spark, sf_dir)

    def build(s: DataFrame) -> DataFrame:
        return (
            s.select("user_id", "ts", "value")
            .withWatermark("ts", "1 hour")
            .groupBy(
                F.session_window(F.col("ts"), "30 minutes").alias("sw"),
                F.col("user_id"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                dround(F.sum("value"), 4).alias("sum_value"),
            )
        )

    out = replay_stream(
        spark, ev, build, "stream_session_window", output_mode="complete",
        staging_key=_events_key(sf_dir),
    )
    return out.select(
        "user_id",
        _us(F.col("sw.start")).alias("session_start_us"),
        _us(F.col("sw.end")).alias("session_end_us"),
        "n_events",
        "sum_value",
    ).orderBy("user_id", "session_start_us")


# ---------------------------------------------------------------------------
# stream_hourly_agg_equiv — tumbling event-time windows, streaming execution
# ---------------------------------------------------------------------------


@register("stream_hourly_agg_equiv", _TUMBLE_ORACLE)
def q_stream_hourly_agg_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly tumbling windows executed by the STREAMING engine
    (window() aggregation + watermark, availableNow) against the batch
    twin `tumbling_window_agg`'s integer-bucket oracle.  window() starts
    are epoch-hour-aligned UTC instants, so `unix_micros(window.start)`
    equals the oracle's `(epoch_us // 3600e6) * 3600e6` bucket exactly.

    Scale: the canonical streaming aggregation — state is one row per
    (user, open window), evicted by the watermark in production append
    mode."""
    ev = _staged_events(spark, sf_dir)

    def build(s: DataFrame) -> DataFrame:
        return (
            s.select("user_id", "ts", "value")
            .withWatermark("ts", "1 hour")
            .groupBy(F.window(F.col("ts"), "1 hour").alias("w"), F.col("user_id"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                dround(F.sum("value"), 4).alias("sum_value"),
            )
        )

    out = replay_stream(
        spark, ev, build, "stream_hourly_agg", output_mode="complete",
        staging_key=_events_key(sf_dir),
    )
    return out.select(
        "user_id",
        _us(F.col("w.start")).alias("window_start_us"),
        "n_events",
        "sum_value",
    ).orderBy("user_id", "window_start_us")


# ---------------------------------------------------------------------------
# stream_dedup_equiv — watermarked streaming dedup vs batch DISTINCT
# ---------------------------------------------------------------------------

_STREAM_DEDUP_ORACLE = """
SELECT DISTINCT user_id, event_type
FROM events
ORDER BY user_id, event_type
"""


@register("stream_dedup_equiv", _STREAM_DEDUP_ORACLE)
def q_stream_dedup_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark, bounded
    per-key state) drained over the fixture and compared against batch
    DISTINCT.  The emitted row per key is whichever arrived first — a
    nondeterministic choice under parallel replay — so the query projects
    exactly the dedup KEY columns, making the output the deterministic
    distinct key set.

    The 90-day watermark delay exceeds the fixture's 30-day span: nothing
    is dropped as late, so the within-watermark form is exhaustive here
    while still exercising the bounded-state code path production uses."""
    ev = _staged_events(spark, sf_dir)

    def build(s: DataFrame) -> DataFrame:
        return dedup_stream(
            s.select("user_id", "event_type", "ts"),
            keys=["user_id", "event_type"], ts="ts", watermark="90 days",
        ).select("user_id", "event_type")

    out = replay_stream(
        spark, ev, build, "stream_dedup", output_mode="append",
        staging_key=_events_key(sf_dir),
    )
    return out.orderBy("user_id", "event_type")


# ---------------------------------------------------------------------------
# stream_join_equiv — watermarked stream-stream interval join vs batch SQL
# ---------------------------------------------------------------------------

_STREAM_JOIN_ORACLE = """
SELECT v.event_id AS view_id, c.event_id AS click_id,
       v.user_id AS user_id,
       epoch_us(v.ts)::BIGINT AS view_us, epoch_us(c.ts)::BIGINT AS click_us
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
ORDER BY view_id, click_id
"""


@register("stream_join_equiv", _STREAM_JOIN_ORACLE)
def q_stream_join_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (view->click attribution
    within 10 minutes, both sides watermarked, event-time range predicate
    bounding the state store) executed by the streaming engine and
    compared against the equivalent batch interval join SQL.

    The range predicate is the 100 TB contract: it lets Spark drop a
    buffered view once the click watermark passes view_ts + horizon, so
    join state is O(key-rate x horizon), never O(stream).  The 90-day
    delay again exceeds the fixture span, so the drained result is the
    complete join."""
    ev = _staged_events(spark, sf_dir)

    def build(s: DataFrame) -> DataFrame:
        s = s.select("event_id", "user_id", "event_type", "ts")
        views = (
            s.where(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "90 days")
        )
        clicks = (
            s.where(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user_id"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", "90 days")
        )
        return views.join(
            clicks,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (F.col("click_ts") <= F.col("view_ts") + F.expr("interval 10 minutes")),
        ).select(
            "view_id",
            "click_id",
            "user_id",
            _us(F.col("view_ts")).alias("view_us"),
            _us(F.col("click_ts")).alias("click_us"),
        )

    out = replay_stream(
        spark, ev, build, "stream_join", output_mode="append",
        staging_key=_events_key(sf_dir),
    )
    return out.orderBy("view_id", "click_id")


# ---------------------------------------------------------------------------
# stream_lsh_band_canonical — streaming MinHash/LSH bucket canonicalization
# ---------------------------------------------------------------------------

from .catalog_llm import (  # noqa: E402  (shared md5/minhash SQL fragments)
    _DOCS_SHINGLED,
    _SIGS,
    _band_key_sql,
)
from ..operators.dedup import NUM_BANDS  # noqa: E402

_LSH_STREAM_ORACLE = f"""
WITH {_DOCS_SHINGLED},
sh2 AS (SELECT doc_id, hashes FROM sh WHERE len(hashes) > 0),
sigs AS (SELECT doc_id, {_SIGS} FROM sh2),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {_band_key_sql(b)} AS key FROM sigs" for b in range(NUM_BANDS))}
)
SELECT band, key, min(doc_id) AS canonical_doc, count(*)::BIGINT AS n_docs
FROM bands GROUP BY band, key
ORDER BY band, key
"""


@register("stream_lsh_band_canonical", _LSH_STREAM_ORACLE)
def q_stream_lsh_band_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MinHash/LSH near-dup surface under the value-exact gate:
    the PER-ROW band-key formulation (streaming/neardup.py — shingles ->
    h60 -> minhash -> band keys as pure Column expressions, no shuffle)
    runs as a REAL streaming aggregation (per-bucket min-id canonical +
    population, complete mode via the replay harness) and value-matches
    the batch md5/minhash SQL twin shared with the batch LSH catalog
    queries — proving the streaming path computes the exact same band
    keys as the batch posexplode kernel.

    Scale: the stateless prefix is a narrow map on the stream; state is
    one row per occupied band bucket, keyed like the batch bucket join;
    production adds an event-time watermark to bound the horizon."""
    from ..streaming.neardup import lsh_band_canonical_stream
    from ..streaming.replay import replay_stream

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = replay_stream(
        spark,
        docs,
        lambda s: lsh_band_canonical_stream(s),
        "stream_lsh_canonical",
        output_mode="complete",
        # O(corpus)-sized result: drain executor-side (parquet foreachBatch)
        # instead of marshalling every bucket row onto the driver
        sink="parquet",
    )
    return out.orderBy("band", "key")


# ---------------------------------------------------------------------------
# stream_first_seen_dedup — first-seen-wins near-dup policy (round 6)
# ---------------------------------------------------------------------------

from .catalog_llm import _DEDUP_CORPUS_ORACLE  # noqa: E402


@register("stream_first_seen_dedup", _DEDUP_CORPUS_ORACLE)
def q_stream_first_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION streaming dedup policy (VERDICT r5 item 6) under the
    value-exact gate: documents replay through a real micro-batch query
    whose foreachBatch sink applies first-seen-wins — docs colliding with
    an earlier batch's kept docs drop at LSH-candidate level against a
    band-key store; within a batch the exact verified-pairs → connected
    components → min-id rule runs (streaming/neardup.py).  The replay is
    ONE micro-batch, for which the policy is value-identical to batch
    dedup_corpus — hence the shared recursive-CTE closure oracle; the
    arrival-order-dependent multi-batch path is pinned by the hermetic
    invariants in tests/test_streaming_firstseen.py (the documented
    reason it cannot sit under a parallel-replay oracle itself).

    Scale: per batch, one (band, key)-keyed semi-join probe against the
    store + the batch dedup pipeline at micro-batch size; the store
    grows by NUM_BANDS rows per KEPT doc and is retention-prunable."""
    from ..streaming.neardup import replay_first_seen_dedup

    docs = _t(spark, sf_dir, "documents")
    kept = replay_first_seen_dedup(spark, docs.select("doc_id", "text"), num_batches=1)
    return (
        kept.select("doc_id")
        .join(docs.select("doc_id", "lang", "source"), ["doc_id"], "inner")
        .orderBy("doc_id")
    )
