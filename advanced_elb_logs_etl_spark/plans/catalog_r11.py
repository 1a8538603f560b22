"""Round-11 catalog wave: FOUR stash operators enter the driver window
(the build-now/register-in-window freeze discipline, with the stash
drain widened per VERDICT r10 item 5 — the backlog was six deep at the
2-per-round pace).  All four shipped WITH tests and pre-rehearsed DuckDB
twins in earlier sessions; this module is the mechanical move those
test-file comments promised, and the tests now import the registered
bodies from here so the rehearsal exercises the exact catalog entries.

- `kmv_distinct_setops` (operators/kmv.py): KMV/theta distinct sketch
  (Bar-Yossef et al. 2002 k-minimum-values; Beyer et al. 2007 unbiased
  estimator; theta-sketch set operations per Dasgupta et al.) — union
  AND intersection cardinality estimates across two event segments, the
  set-operation lane HLL cannot provide.  Deterministic md5 h60 hashes
  and floored-integer estimators make the sketch contents AND the
  estimates value-exact twinnable.
- `stream_kmv_distinct` (streaming/kmvstream.py): the same minima set
  maintained across REAL micro-batches with the cmstream monotone
  cumulative store (pruned, retry-idempotent).  k-minima are a
  mergeable summary, so the fold is slicing-invariant and one batch SQL
  twin covers the replay.
- `butterfly_census` (operators/graph.py): bipartite butterfly
  (4-cycle) census of the customer-part purchase graph (Wang et al.
  2019 vertex-priority counting motivates the side-selection; the
  census here is the exact wedge-aggregation form) — the bipartite
  analog of the triangle census, the cohesion statistic for
  user-item/doc-term graphs that triangles cannot see (bipartite graphs
  are triangle-free).
- `attribution_report` (operators/events.py): first/last/linear
  multi-touch attribution of purchase conversions to prior-touch
  channels inside a 7-day lookback (standard marketing-analytics
  models, all-integer micro-credit surface; windows keyed by
  (user, conversion) per ADVICE r10).

Same contract as plans.catalog: value-exact DuckDB twins, scale notes
on every query docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import events as ev_ops
from ..operators import graph, kmv
from ..streaming import kmvstream as kms
from .catalog import _t, register, register_production

# ---------------------------------------------------------------------------
# kmv_distinct_setops
# ---------------------------------------------------------------------------

#: Gate geometry: saturated at sf0.01 (150 distinct users per event type
#: > 64), exact at sf0.001 — both regimes carry driver signal over time.
GATE_K = 64
_KM = float((GATE_K - 1) << 60)
_M_INT = kmv.M
_M_F = float(kmv.M)

# Table-bound twin: replicate the k-minimum-values sketch (same md5 h60
# hash), the floored-integer estimators, and the theta intersection over
# the two event segments; emit estimates beside the exact counts.
# Pre-rehearsed hash-green at sf0.01 in the r10 session
# (tests/test_kmv.py keeps the rehearsal and imports this body).
KMV_SETOPS_ORACLE = f"""
WITH a_h AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE event_type = 'click' AND user_id IS NOT NULL
), b_h AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
), a_sk AS (SELECT h FROM a_h ORDER BY h LIMIT {GATE_K}
), b_sk AS (SELECT h FROM b_h ORDER BY h LIMIT {GATE_K}
), u_sk AS (
  SELECT h FROM (SELECT h FROM a_sk UNION SELECT h FROM b_sk)
  ORDER BY h LIMIT {GATE_K}
), est AS (
  SELECT
    (SELECT CASE WHEN count(*) < {GATE_K} THEN count(*)
                 ELSE CAST(floor({_KM!r} / CAST(max(h) AS DOUBLE)) AS BIGINT)
            END FROM a_sk) AS est_a,
    (SELECT CASE WHEN count(*) < {GATE_K} THEN count(*)
                 ELSE CAST(floor({_KM!r} / CAST(max(h) AS DOUBLE)) AS BIGINT)
            END FROM b_sk) AS est_b,
    (SELECT CASE WHEN count(*) < {GATE_K} THEN count(*)
                 ELSE CAST(floor({_KM!r} / CAST(max(h) AS DOUBLE)) AS BIGINT)
            END FROM u_sk) AS est_union
), th AS (
  SELECT least(
    (SELECT CASE WHEN count(*) >= {GATE_K} THEN max(h) ELSE {_M_INT} END FROM a_sk),
    (SELECT CASE WHEN count(*) >= {GATE_K} THEN max(h) ELSE {_M_INT} END FROM b_sk)
  ) AS theta
), common AS (
  SELECT count(*)::BIGINT AS n_common
  FROM a_sk JOIN b_sk USING (h), th WHERE h < theta
), inter AS (
  SELECT CASE WHEN th.theta >= {_M_INT} THEN c.n_common
              ELSE CAST(floor(CAST(c.n_common AS DOUBLE) * {_M_F!r}
                              / CAST(th.theta AS DOUBLE)) AS BIGINT)
         END AS est_intersect
  FROM common c, th
), exact AS (
  SELECT
    count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)::BIGINT
      AS exact_a,
    count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)::BIGINT
      AS exact_b,
    count(DISTINCT CASE WHEN event_type IN ('click', 'purchase')
                        THEN user_id END)::BIGINT AS exact_union
  FROM events WHERE user_id IS NOT NULL
), exact_i AS (
  SELECT count(*)::BIGINT AS exact_intersect FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
      AND user_id IS NOT NULL
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
      AND user_id IS NOT NULL
  )
)
SELECT est_a, exact_a, est_b, exact_b, est_union, exact_union,
       est_intersect, exact_intersect
FROM est, exact, inter, exact_i
"""


@register("kmv_distinct_setops", KMV_SETOPS_ORACLE)
def q_kmv_distinct_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketches of two event segments' user sets, union + theta-
    intersection estimates beside the exact counts.

    Scale: each build is one map-side-partial distinct agg +
    TakeOrdered(k) over its segment; every later frame is k rows, so
    the set operations never touch the corpus again.  Sketches are
    localCheckpointed (k rows) so the four consumers read cells, not
    the corpus lineage.  The exact lanes are gate-only instrumentation
    (the ivf/pq bounded-gate pattern); production callers keep only the
    k-row sketches, which also merge across shards/days (kmv_union) and
    prefilter the next epoch's build with this epoch's theta
    (SQLMetrics-measured 19,500x shuffle cut in tests/test_kmv.py)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    a_keys = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("key")
    )
    b_keys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key")
    )
    a = kmv.kmv_build(a_keys, k=GATE_K).localCheckpoint(eager=True)
    b = kmv.kmv_build(b_keys, k=GATE_K).localCheckpoint(eager=True)
    est_a = kmv.kmv_estimate(a, k=GATE_K).select(
        F.col("est_distinct").alias("est_a")
    )
    est_b = kmv.kmv_estimate(b, k=GATE_K).select(
        F.col("est_distinct").alias("est_b")
    )
    est_u = kmv.kmv_estimate(kmv.kmv_union(a, b, k=GATE_K), k=GATE_K).select(
        F.col("est_distinct").alias("est_union")
    )
    est_i = kmv.kmv_intersect_estimate(a, b, k=GATE_K).select(
        F.col("est_intersect")
    )
    exact = ev.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("exact_a"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_b"),
        F.countDistinct(
            F.when(
                F.col("event_type").isin("click", "purchase"),
                F.col("user_id"),
            )
        ).alias("exact_union"),
    )
    exact_i = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .intersect(
            ev.filter(F.col("event_type") == "purchase").select("user_id")
        )
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
    )
    return (
        est_a.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(est_b))
        .crossJoin(F.broadcast(est_u))
        .crossJoin(F.broadcast(est_i))
        .crossJoin(F.broadcast(exact_i))
        .select(
            "est_a", "exact_a", "est_b", "exact_b",
            "est_union", "exact_union", "est_intersect", "exact_intersect",
        )
    )


@register_production("kmv_distinct_setops")
def q_kmv_distinct_setops_production(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Production shape (the pq/ivf precedent): sketches + the four
    estimates — no exact countDistinct/INTERSECT lanes (those re-scan
    the corpus; avoiding them is the sketch's reason to exist).  The
    registered gate form keeps its own `_gate` bench row."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    a_keys = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("key")
    )
    b_keys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key")
    )
    a = kmv.kmv_build(a_keys, k=GATE_K).localCheckpoint(eager=True)
    b = kmv.kmv_build(b_keys, k=GATE_K).localCheckpoint(eager=True)
    est_a = kmv.kmv_estimate(a, k=GATE_K).select(
        F.col("est_distinct").alias("est_a")
    )
    est_b = kmv.kmv_estimate(b, k=GATE_K).select(
        F.col("est_distinct").alias("est_b")
    )
    est_u = kmv.kmv_estimate(kmv.kmv_union(a, b, k=GATE_K), k=GATE_K).select(
        F.col("est_distinct").alias("est_union")
    )
    est_i = kmv.kmv_intersect_estimate(a, b, k=GATE_K).select(
        F.col("est_intersect")
    )
    return (
        est_a.crossJoin(F.broadcast(est_b))
        .crossJoin(F.broadcast(est_u))
        .crossJoin(F.broadcast(est_i))
    )


# ---------------------------------------------------------------------------
# stream_kmv_distinct
# ---------------------------------------------------------------------------

# Slicing-invariant (k-minima are mergeable), so the oracle is the plain
# batch twin.  All-BIGINT surface.  Pre-rehearsed hash-green at sf0.01
# with the real micro-batch engine in the r10 session
# (tests/test_streaming_kmv.py keeps the rehearsal and imports this body).
STREAM_KMV_ORACLE = f"""
WITH keys AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
), sk AS (SELECT h FROM keys ORDER BY h LIMIT {GATE_K}
), est AS (
  SELECT count(*)::BIGINT AS n_hashes, max(h) AS kth_hash,
         CASE WHEN count(*) < {GATE_K} THEN count(*)
              ELSE CAST(floor({_KM!r} / CAST(max(h) AS DOUBLE)) AS BIGINT)
         END AS est_distinct
  FROM sk
), exact AS (
  SELECT count(DISTINCT user_id)::BIGINT AS exact_distinct
  FROM events WHERE user_id IS NOT NULL
)
SELECT n_hashes, kth_hash, est_distinct, exact_distinct FROM est, exact
"""


@register("stream_kmv_distinct", STREAM_KMV_ORACLE)
def q_stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming KMV: replay the events user_id stream through the
    cumulative minima store in 3 REAL micro-batches (foreachBatch,
    availableNow), then the distinct estimate beside the exact count.

    Scale: per-batch state is the k-row minima set (bounded, independent
    of stream length); the fold is a 2k-row TakeOrdered union so retries
    are idempotent via batch-id-keyed snapshots, superseded snapshots
    are pruned, and independent stream stores merge by kmv_union.  The
    exact lane is gate-only instrumentation."""
    ev = _t(spark, sf_dir, "events")
    keys = ev.filter(F.col("user_id").isNotNull()).select(
        "event_id", F.col("user_id").alias("key")
    )
    sk = kms.replay_kmv(
        spark, keys, "key", k=GATE_K, num_batches=3, order_col="event_id"
    )
    est = kmv.kmv_estimate(sk, k=GATE_K)
    exact = keys.agg(F.countDistinct("key").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(exact)).select(
        "n_hashes", "kth_hash", "est_distinct", "exact_distinct"
    )


@register_production("stream_kmv_distinct")
def q_stream_kmv_distinct_production(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Production shape: replay + the estimate from the k-row store —
    no exact countDistinct lane."""
    ev = _t(spark, sf_dir, "events")
    keys = ev.filter(F.col("user_id").isNotNull()).select(
        "event_id", F.col("user_id").alias("key")
    )
    sk = kms.replay_kmv(
        spark, keys, "key", k=GATE_K, num_batches=3, order_col="event_id"
    )
    return kmv.kmv_estimate(sk, k=GATE_K)


# ---------------------------------------------------------------------------
# butterfly_census
# ---------------------------------------------------------------------------

# Exact wedge-aggregation census: co-neighbor pair weights w give
# sum(C(w,2)) butterflies; wedge count from right-degree C(d,2).
# All-integer surface.  Pre-rehearsed hash-green at sf0.01 in the r10
# session (tests/test_butterfly.py keeps the rehearsal).
BUTTERFLY_ORACLE = """
WITH e AS (
  SELECT DISTINCT o_custkey AS l, l_partkey AS r
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), pairs AS (
  SELECT e1.l AS u1, e2.l AS u2, count(*)::BIGINT AS w
  FROM e e1 JOIN e e2 ON e1.r = e2.r AND e1.l < e2.l
  GROUP BY 1, 2
), bf AS (
  SELECT coalesce(sum(w * (w - 1) // 2), 0)::BIGINT AS n_butterflies,
         count(*)::BIGINT AS n_coneighbor_pairs
  FROM pairs
), wd AS (
  SELECT (coalesce(sum(d * (d - 1)), 0) // 2)::BIGINT AS n_wedges
  FROM (SELECT count(*)::BIGINT AS d FROM e GROUP BY r)
), counts AS (
  SELECT count(DISTINCT l)::BIGINT AS n_left,
         count(DISTINCT r)::BIGINT AS n_right,
         count(*)::BIGINT AS n_edges
  FROM e
)
SELECT n_left, n_right, n_edges, n_wedges, n_coneighbor_pairs,
       n_butterflies
FROM counts, wd, bf
"""


@register("butterfly_census", BUTTERFLY_ORACLE)
def q_butterfly_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Butterfly (bipartite 4-cycle) census of the customer-part
    purchase graph, wedging through parts.

    Scale: one wedge self-join on the wedge-side key + two hash aggs —
    the SHJ-hinted probe shape of the triangle census, with the wedge
    side pinned to 'right' so the registered plan carries no protocol
    collect (the side-selection fold is an optimization for callers
    that opt into through='auto').  Wedge fan-out is sum over parts of
    C(degree, 2); at 100 TB the hazard lane is a hub part — cap or
    sample hub degrees the way tools/scale_r12_wave.py measures."""
    edges = graph.bipartite_edges_customer_part(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )
    return graph.butterfly_stats(edges, through="right")


# ---------------------------------------------------------------------------
# attribution_report
# ---------------------------------------------------------------------------

# Windows key on (u, conv_id): conversion ids are only guaranteed unique
# per user (ADVICE r10 — mirrors the operator).  All-integer
# micro-credit surface; per-conversion credits sum to exactly 1e6 per
# model.  Pre-rehearsed hash-green at sf0.01 in the r10 session
# (tests/test_attribution.py keeps the rehearsal).
ATTRIBUTION_ORACLE = """
WITH conv AS (
  SELECT user_id AS u, event_id AS conv_id, epoch_us(ts) AS conv_us
  FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL
), touch AS (
  SELECT user_id AS u, event_id AS touch_id, event_type AS channel,
         epoch_us(ts) AS touch_us
  FROM events
  WHERE event_type <> 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL
), pairs AS (
  SELECT c.u, c.conv_id, t.channel, t.touch_us, t.touch_id
  FROM conv c JOIN touch t ON c.u = t.u
  WHERE t.touch_us < c.conv_us
    AND t.touch_us >= c.conv_us - 604800000000
), scored AS (
  SELECT channel, u, conv_id,
    row_number() OVER (PARTITION BY u, conv_id
                       ORDER BY touch_us ASC, touch_id ASC) AS rn_first,
    row_number() OVER (PARTITION BY u, conv_id
                       ORDER BY touch_us DESC, touch_id DESC) AS rn_last,
    count(*) OVER (PARTITION BY u, conv_id) AS n
  FROM pairs
)
SELECT channel,
  count(*)::BIGINT AS n_touches,
  count(DISTINCT (u, conv_id))::BIGINT AS n_conversions_touched,
  sum(CASE WHEN rn_first = 1 THEN 1000000 ELSE 0 END)::BIGINT
    AS first_touch_micro,
  sum(CASE WHEN rn_last = 1 THEN 1000000 ELSE 0 END)::BIGINT
    AS last_touch_micro,
  sum(1000000 // n
      + CASE WHEN rn_last = 1 THEN 1000000 - (1000000 // n) * n
             ELSE 0 END)::BIGINT AS linear_micro
FROM scored GROUP BY channel
"""


@register("attribution_report", ATTRIBUTION_ORACLE)
def q_attribution_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last/linear multi-touch attribution of purchase conversions
    to prior-touch channels, 7-day lookback.

    Scale: one per-user equi-join with the lookback predicate in the
    join filter, three windows all keyed on the join's own (u, conv_id)
    prefix (one Exchange), one hash agg on channel.  Per-user fan-out is
    conversions x in-window touches — at 100 TB bound it with the
    bucketized range-join lane (operators/temporal.py) or a shorter
    lookback; a power-user salt follows the skew.py pattern."""
    return ev_ops.attribution_by_channel(_t(spark, sf_dir, "events"))
