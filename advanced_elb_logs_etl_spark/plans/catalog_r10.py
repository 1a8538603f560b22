"""Round-10 catalog wave: the Count-Min sketch pair enters the driver
window from the r9 stash (the build-now/register-in-window freeze
discipline — both operators shipped WITH tests and pre-rehearsed DuckDB
twins in the r9 session; this module is the mechanical move the
tests/test_cmsketch.py and tests/test_streaming_cm.py comments promised,
and those tests now import the registered bodies from here so the
rehearsal exercises the exact catalog entries).

- `cm_point_frequency` (operators/cmsketch.py): Count-Min sketch
  (Cormode & Muthukrishnan 2005, public method) over the documents
  token stream — point-frequency estimates for an unbounded key domain,
  the gap between Misra-Gries' top-C and the numeric histogram.
  Deterministic md5 row-hashes make the sketch CONTENTS value-exact
  twinnable, so the gate hashes real estimates plus the one-sided
  guarantee, not a bound alone.
- `stream_cm_point_frequency` (streaming/cmstream.py): the same sketch
  maintained across REAL micro-batches with the histogram store's
  monotone cumulative layout.  Counts are exact sums, so the fold is
  slicing-invariant and the replay is value-exact against the same SQL
  twin shape.

Same contract as plans.catalog: value-exact DuckDB twins, scale notes
on every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import tokens
from ..operators import cmsketch as cm
from ..streaming import cmstream as cms
from .catalog import _t, register

# Mix of high-frequency corpus vocabulary (join/hash/row/... are the
# synthetic documents' top terms), mid-frequency, and two absent
# controls — so the gate hash covers real estimates, not a zero column.
_CM_PROBE_TERMS = [
    "join", "hash", "row", "batch", "scan", "column",
    "filter", "merge", "table", "the", "data", "vector",
    "gardenpath", "entropy",
]

# Table-bound twin: replicate the sketch (same md5 bucket math) over the
# documents token stream, estimate the probe terms, and emit
# (key, est, exact, overestimate_ok).  Pre-rehearsed hash-green at
# sf0.01 in the r9 session (tests/test_cmsketch.py keeps the rehearsal).
_CM_ORACLE = f"""
WITH tok AS (
  SELECT u.tk AS key
  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents), UNNEST(toks) AS u(tk)
), cells AS (
  SELECT r.i AS row,
         ('0x' || substr(md5(r.i || ':' || key), 1, 15))::BIGINT % {cm.WIDTH}
           AS bucket,
         count(*)::BIGINT AS cnt
  FROM tok, (SELECT UNNEST(generate_series(0, {cm.DEPTH - 1})) AS i) r
  GROUP BY 1, 2
), probe AS (
  SELECT * FROM (VALUES {", ".join(f"('{t}')" for t in sorted(_CM_PROBE_TERMS))}) v(key)
), probe_cells AS (
  SELECT p.key, r.i AS row,
         ('0x' || substr(md5(r.i || ':' || p.key), 1, 15))::BIGINT % {cm.WIDTH}
           AS bucket
  FROM probe p, (SELECT UNNEST(generate_series(0, {cm.DEPTH - 1})) AS i) r
), est AS (
  SELECT pc.key, min(coalesce(c.cnt, 0)) AS est
  FROM probe_cells pc
  LEFT JOIN cells c ON c.row = pc.row AND c.bucket = pc.bucket
  GROUP BY pc.key
), exact AS (
  SELECT key, count(*)::BIGINT AS exact FROM tok GROUP BY key
)
SELECT e.key, e.est, coalesce(x.exact, 0) AS exact,
       e.est >= coalesce(x.exact, 0) AS overestimate_ok
FROM est e LEFT JOIN exact x USING (key)
"""


@register("cm_point_frequency", _CM_ORACLE)
def q_cm_point_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point-frequency estimates (Cormode & Muthukrishnan
    2005, public method) over the documents token stream: build the
    d x w sketch, probe a fixed term list (high/mid/absent mix), emit
    (key, est, exact, overestimate_ok) so the driver hash covers both
    the deterministic estimates and the one-sided guarantee.

    Scale: the build is ONE hash aggregation over (row, bucket) — d·w
    cells max regardless of key cardinality, map-side combinable, and
    mergeable across shards/days by cell-wise sum (cm_merge).  Probing
    joins the |probe|·d bucket rows against the broadcast-sized cell
    frame.  The `exact` lane here is gate-only instrumentation (one
    token-count agg); production callers probe the sketch alone."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("key"))
    # Materialize the <= d*w-cell sketch (bounded) so the geometry guard
    # and the probe join read the cells instead of re-running the corpus
    # tokenize+build — measured +59% wall when the guard re-evaluates a
    # 10M-row build lineage (tools/scale_kmv_wave.py, SCALE.md r10).
    sk = cm.cm_build(tok).localCheckpoint(eager=True)
    probes = docs.sparkSession.createDataFrame(
        [(t,) for t in _CM_PROBE_TERMS], "key string"
    )
    est = cm.cm_estimate(sk, probes)
    exact = tok.groupBy("key").agg(F.count(F.lit(1)).alias("exact"))
    return est.join(exact, "key", "left").select(
        "key",
        "est",
        F.coalesce(F.col("exact"), F.lit(0)).alias("exact"),
        (F.col("est") >= F.coalesce(F.col("exact"), F.lit(0))).alias(
            "overestimate_ok"
        ),
    )


# Same twin shape over the events event_type stream (the streamed
# cumulative sketch equals the single-pass batch build — slicing
# invariance is pytest-pinned, so one SQL twin covers the replay).
_STREAM_CM_ORACLE = f"""
WITH keys AS (
  SELECT event_type AS key FROM events WHERE event_type IS NOT NULL
), cells AS (
  SELECT r.i AS row,
         ('0x' || substr(md5(r.i || ':' || key), 1, 15))::BIGINT % {cm.WIDTH}
           AS bucket,
         count(*)::BIGINT AS cnt
  FROM keys, (SELECT UNNEST(generate_series(0, {cm.DEPTH - 1})) AS i) r
  GROUP BY 1, 2
), probe AS (
  SELECT DISTINCT event_type AS key FROM events WHERE event_type IS NOT NULL
  UNION SELECT 'absent_key'
), probe_cells AS (
  SELECT p.key, r.i AS row,
         ('0x' || substr(md5(r.i || ':' || p.key), 1, 15))::BIGINT % {cm.WIDTH}
           AS bucket
  FROM probe p, (SELECT UNNEST(generate_series(0, {cm.DEPTH - 1})) AS i) r
), est AS (
  SELECT pc.key, min(coalesce(c.cnt, 0)) AS est
  FROM probe_cells pc
  LEFT JOIN cells c ON c.row = pc.row AND c.bucket = pc.bucket
  GROUP BY pc.key
), exact AS (
  SELECT key, count(*)::BIGINT AS exact FROM keys GROUP BY key
)
SELECT e.key, e.est, coalesce(x.exact, 0) AS exact,
       e.est >= coalesce(x.exact, 0) AS overestimate_ok
FROM est e LEFT JOIN exact x USING (key)
"""


@register("stream_cm_point_frequency", _STREAM_CM_ORACLE)
def q_stream_cm_point_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Count-Min: replay the events event_type stream through
    the cumulative sketch store in 3 REAL micro-batches (foreachBatch,
    availableNow), then point-estimate every observed type plus one
    absent control.

    Scale: per-batch state is the d·w cell frame (bounded, independent
    of stream length); the fold is cell-wise sum so retries are
    idempotent via batch-id-keyed snapshots and shards merge by
    cm_merge.  The probe/exact lanes are the same gate shape as the
    batch entry."""
    ev = _t(spark, sf_dir, "events")
    keys = ev.filter(F.col("event_type").isNotNull()).select(
        "event_id", F.col("event_type").alias("key")
    )
    sk = cms.replay_cm(spark, keys, "key", num_batches=3, order_col="event_id")
    # .distinct() AFTER the union: the DuckDB twin's UNION is set
    # semantics, so if 'absent_key' ever appears as a real event_type the
    # two probe sets must still agree (ADVICE r10).  cm_estimate dedupes
    # probes internally too — this keeps the two lanes equivalent at the
    # source rather than relying on that.
    probes = (
        keys.select("key")
        .distinct()
        .unionByName(spark.createDataFrame([("absent_key",)], "key string"))
        .distinct()
    )
    est = cm.cm_estimate(sk, probes)
    exact = keys.groupBy("key").agg(F.count(F.lit(1)).alias("exact"))
    return est.join(exact, "key", "left").select(
        "key",
        "est",
        F.coalesce(F.col("exact"), F.lit(0)).alias("exact"),
        (F.col("est") >= F.coalesce(F.col("exact"), F.lit(0))).alias(
            "overestimate_ok"
        ),
    )


# Production forms (r11, the pq/ivf precedent): the headline bench
# number measures what a production caller runs — sketch build +
# estimates — while the registered gate form (with its corpus-sized
# exact lanes) keeps its own `<name>_gate` row in every record.
from .catalog import register_production  # noqa: E402


@register_production("cm_point_frequency")
def q_cm_point_frequency_production(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Production shape: build the sketch, estimate the probe terms —
    no exact token-frequency lane (that groupBy is as big as the key
    domain; avoiding it is the sketch's reason to exist)."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("key"))
    sk = cm.cm_build(tok).localCheckpoint(eager=True)
    probes = docs.sparkSession.createDataFrame(
        [(t,) for t in _CM_PROBE_TERMS], "key string"
    )
    return cm.cm_estimate(sk, probes)


@register_production("stream_cm_point_frequency")
def q_stream_cm_point_frequency_production(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Production shape: real 3-batch replay + point estimates from the
    materialized store — no exact count lane."""
    ev = _t(spark, sf_dir, "events")
    keys = ev.filter(F.col("event_type").isNotNull()).select(
        "event_id", F.col("event_type").alias("key")
    )
    sk = cms.replay_cm(spark, keys, "key", num_batches=3, order_col="event_id")
    probes = (
        keys.select("key")
        .distinct()
        .unionByName(spark.createDataFrame([("absent_key",)], "key string"))
        .distinct()
    )
    return cm.cm_estimate(sk, probes)
