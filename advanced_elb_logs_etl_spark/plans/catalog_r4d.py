"""Round-4d wave: SQL-surface completeness and journey/featurization
analytics — set operations (INTERSECT/EXCEPT, distinct AND bag
semantics), the null-semantics battery (null-safe equality joins, IS
DISTINCT FROM, null ordering), the temperature-flattened training-mix
sampler, first-order Markov journey transitions, time-to-conversion,
the hashing-trick vectorizer, and windowed view->purchase conversion.

Same contract as plans.catalog: value-exact DuckDB twins, deterministic
orderings. Scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import dround
from .catalog import _t, _us, register

# ---------------------------------------------------------------------------
# set_ops_battery — INTERSECT / EXCEPT with both distinct and ALL semantics
# ---------------------------------------------------------------------------

_SETOPS_ORACLE = """
WITH a AS (
  SELECT l.l_partkey AS pk FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderpriority = '1-URGENT'
), b AS (
  SELECT l.l_partkey AS pk FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderpriority = '5-LOW'
)
SELECT
  (SELECT count(*) FROM (SELECT pk FROM a INTERSECT SELECT pk FROM b))::BIGINT
    AS n_intersect,
  (SELECT count(*) FROM (SELECT pk FROM a INTERSECT ALL SELECT pk FROM b))::BIGINT
    AS n_intersect_all,
  (SELECT count(*) FROM (SELECT pk FROM a EXCEPT SELECT pk FROM b))::BIGINT
    AS n_except,
  (SELECT count(*) FROM (SELECT pk FROM a EXCEPT ALL SELECT pk FROM b))::BIGINT
    AS n_except_all,
  (SELECT count(*) FROM a)::BIGINT AS n_a,
  (SELECT count(*) FROM b)::BIGINT AS n_b
"""


@register("set_ops_battery", _SETOPS_ORACLE)
def q_set_ops_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / INTERSECT ALL / EXCEPT / EXCEPT ALL over the part sets
    sold in urgent vs low-priority orders — the four SQL set operations
    with their distinct-vs-bag multiplicity semantics exercised in one
    report row (intersectAll/exceptAll preserve per-key multiplicities:
    min(m_a, m_b) and max(m_a - m_b, 0) respectively).

    Scale: Spark plans all four as hash aggregations/joins on the key —
    distinct forms via LeftSemi/LeftAnti after dedup, ALL forms via a
    count-tagged aggregate — no sort, no window. The two inputs derive
    from the same lineitem-orders broadcast-dim join and are
    localCheckpoint-pinned ONCE: the six lanes reference each side up
    to five times, and without the pin every lazy reference replayed
    the scan+join (20 source scans in the executed plan — the
    neyman-class fan-out the r13 SCAN_FANOUT lint gate now rejects);
    pinned, the battery reads lineitem twice total."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")

    def side(priority: str) -> DataFrame:
        return (
            li.join(
                F.broadcast(o.where(F.col("o_orderpriority") == priority)),
                li.l_orderkey == o.o_orderkey,
            )
            .select(F.col("l_partkey").alias("pk"))
            .localCheckpoint(eager=True)
        )

    a, b = side("1-URGENT"), side("5-LOW")

    def one(df: DataFrame, alias: str) -> DataFrame:
        return df.groupBy().agg(F.count("*").alias(alias))

    return (
        one(a.intersect(b), "n_intersect")
        .crossJoin(F.broadcast(one(a.intersectAll(b), "n_intersect_all")))
        .crossJoin(F.broadcast(one(a.subtract(b), "n_except")))
        .crossJoin(F.broadcast(one(a.exceptAll(b), "n_except_all")))
        .crossJoin(F.broadcast(one(a, "n_a")))
        .crossJoin(F.broadcast(one(b, "n_b")))
    )


# ---------------------------------------------------------------------------
# null_semantics_battery — null-safe equality, IS DISTINCT FROM, null order
# ---------------------------------------------------------------------------

_NULLSEM_ORACLE = """
WITH e AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS et,
         CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS v
  FROM events
), j AS (
  -- null-safe self-pair count per user: et matches et' under IS NOT
  -- DISTINCT FROM (NULL pairs with NULL)
  SELECT count(*) AS n_nullsafe_pairs
  FROM e a JOIN e b
    ON a.user_id = b.user_id AND a.event_id < b.event_id
   AND a.et IS NOT DISTINCT FROM b.et
), d AS (
  SELECT count(*) AS n_distinct_from
  FROM e WHERE et IS DISTINCT FROM 'click'
), o AS (
  -- null ordering: with NULLS FIRST the first 100 v-ordered ids
  SELECT sum(event_id) AS first100_nulls_first_idsum
  FROM (SELECT event_id FROM e ORDER BY v ASC NULLS FIRST, event_id LIMIT 100)
), o2 AS (
  SELECT sum(event_id) AS first100_nulls_last_idsum
  FROM (SELECT event_id FROM e ORDER BY v ASC NULLS LAST, event_id LIMIT 100)
), c AS (
  SELECT count(*) FILTER (WHERE et IS NULL) AS n_null_et,
         count(*) FILTER (WHERE v IS NULL) AS n_null_v,
         count(DISTINCT et) AS ndv_et_excl_null
  FROM e
)
SELECT n_nullsafe_pairs::BIGINT AS n_nullsafe_pairs,
       n_distinct_from::BIGINT AS n_distinct_from,
       first100_nulls_first_idsum::BIGINT AS first100_nulls_first_idsum,
       first100_nulls_last_idsum::BIGINT AS first100_nulls_last_idsum,
       n_null_et::BIGINT AS n_null_et, n_null_v::BIGINT AS n_null_v,
       ndv_et_excl_null::BIGINT AS ndv_et_excl_null
FROM j CROSS JOIN d CROSS JOIN o CROSS JOIN o2 CROSS JOIN c
"""


@register("null_semantics_battery", _NULLSEM_ORACLE)
def q_null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics battery over a deterministically null-injected view
    of events: null-safe equality (<=>) in a join predicate (NULL pairs
    with NULL), IS DISTINCT FROM filtering (NULL rows pass a != that SQL
    equality would drop), NULLS FIRST vs NULLS LAST ordering under a
    top-100, and null-aware counts (count(col) vs count(*), distinct
    excludes NULL).

    Scale: the null-safe join hashes on user_id (the <=> predicate rides
    the equi-join); the two orderings are TakeOrdered top-100s, never full
    sorts."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("event_type")
        ).alias("et"),
        F.when(F.col("event_id") % 11 == 0, F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    j = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & F.col("a.et").eqNullSafe(F.col("b.et")),
        )
        .groupBy()
        .agg(F.count("*").alias("n_nullsafe_pairs"))
    )
    d = (
        e.where(~F.col("et").eqNullSafe(F.lit("click")))
        .groupBy()
        .agg(F.count("*").alias("n_distinct_from"))
    )
    o = (
        e.orderBy(F.col("v").asc_nulls_first(), "event_id")
        .limit(100)
        .groupBy()
        .agg(F.sum("event_id").alias("first100_nulls_first_idsum"))
    )
    o2 = (
        e.orderBy(F.col("v").asc_nulls_last(), "event_id")
        .limit(100)
        .groupBy()
        .agg(F.sum("event_id").alias("first100_nulls_last_idsum"))
    )
    c = e.groupBy().agg(
        F.count(F.when(F.col("et").isNull(), 1)).alias("n_null_et"),
        F.count(F.when(F.col("v").isNull(), 1)).alias("n_null_v"),
        F.count_distinct("et").alias("ndv_et_excl_null"),
    )
    return (
        j.crossJoin(F.broadcast(d))
        .crossJoin(F.broadcast(o))
        .crossJoin(F.broadcast(o2))
        .crossJoin(F.broadcast(c))
    )


# ---------------------------------------------------------------------------
# temperature_mix_sample — temperature-flattened multi-source training mix
# ---------------------------------------------------------------------------

from ..operators import sampling  # noqa: E402

_MIX_ORACLE = f"""
WITH c AS (SELECT source, count(*)::DOUBLE AS c FROM documents GROUP BY source),
tot AS (SELECT sum(sqrt(c)) AS z FROM c),
r AS (
  SELECT source,
         CAST(round(CAST(least(1.0, 300.0 * (sqrt(c) / z) / c)
              AS DECIMAL(28,8)), 8) AS DOUBLE) AS rate
  FROM c CROSS JOIN tot
),
u AS (
  SELECT doc_id, d.source,
         ('0x' || substr(md5('{sampling.MIX_SEED}:' || doc_id::VARCHAR), 1, 15))::BIGINT
           / {float(1 << 60)!r} AS u
  FROM documents d
)
SELECT u.doc_id, u.source, r.rate
FROM u JOIN r USING (source) WHERE u.u < r.rate
ORDER BY doc_id
"""


@register("temperature_mix_sample", _MIX_ORACLE)
def q_temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixing (tau=0.5, target 300 rows):
    rate_s = min(1, target * (c_s^0.5 / sum c^0.5) / c_s) — small sources
    upweighted, large sources downsampled, every keep decision a
    deterministic md5 hash-coin (operators/sampling.py temperature_mix).

    Value-exact: tau=0.5 computes via sqrt (correctly-rounded IEEE), rates
    snap through DECIMAL(28,8) before the comparison, and the uniform is
    an exact dyadic scaling of the 60-bit hash.

    Scale: per-source counts broadcast back; keep filter is a narrow
    projection — the corpus never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    out = sampling.temperature_mix(docs, "source", target_rows=300.0, tau=0.5)
    return out.select("doc_id", "source", "rate").orderBy("doc_id")


# ---------------------------------------------------------------------------
# event_transition_matrix — first-order Markov transitions per user journey
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
), t AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
), tot AS (SELECT from_type, sum(n) AS row_n FROM t GROUP BY from_type)
SELECT t.from_type, t.to_type, t.n::BIGINT AS n,
       CAST(t.n AS DOUBLE) / CAST(tot.row_n AS DOUBLE) AS p
FROM t JOIN tot USING (from_type)
ORDER BY from_type, to_type
"""


@register("event_transition_matrix", _TRANSITION_ORACLE)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys: for each
    (from, to) event-type pair, the transition count and row-normalized
    probability — the user-path / next-action primitive.

    Scale: ONE keyed window (lead over user journeys, hash-partitioned by
    user) then a |types|^2-cell hash agg; probabilities are single
    divisions of exact BIGINTs — bit-identical, unrounded."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    t = s.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    tot = t.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return (
        t.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            (F.col("n").cast("double") / F.col("row_n").cast("double")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# time_to_conversion — signup -> first purchase latency distribution
# ---------------------------------------------------------------------------

_TTC_ORACLE = """
WITH su AS (
  SELECT user_id, min(epoch_us(ts)) AS su_us FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), pu AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS pu_us
  FROM events e JOIN su ON su.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.su_us
  GROUP BY e.user_id
), d AS (
  SELECT su.user_id, pu.pu_us - su.su_us AS delta_us FROM su JOIN pu USING (user_id)
)
SELECT count(*)::BIGINT AS n_converted,
       (SELECT count(*) FROM su)::BIGINT AS n_signed_up,
       CAST(min(delta_us) AS BIGINT) AS min_us,
       CAST(max(delta_us) AS BIGINT) AS max_us,
       CAST(round(CAST(median(delta_us) AS DECIMAL(28,8)), 1) AS DOUBLE) AS median_us,
       CAST(sum(delta_us) AS BIGINT) AS total_us
FROM d
"""


@register("time_to_conversion", _TTC_ORACLE)
def q_time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-event: per user, first signup to first SUBSEQUENT purchase;
    one report row with conversion counts and the exact latency
    distribution (min/max/median/total in integer microseconds — the
    median interpolates two exact BIGINTs, identical cross-engine,
    decimal-snapped at 0.1 us for the emit).

    Scale: two keyed min-aggregations and one equi-join on user_id; the
    'purchase after signup' constraint rides the join (no window over raw
    events needed)."""
    ev = _t(spark, sf_dir, "events")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(_us("ts")).alias("su_us"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", _us("ts").alias("p_us"))
        .join(su, "user_id")
        .where(F.col("p_us") >= F.col("su_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("pu_us"))
    )
    d = su.join(pu, "user_id").select(
        (F.col("pu_us") - F.col("su_us")).alias("delta_us")
    )
    n_su = su.groupBy().agg(F.count("*").alias("n_signed_up"))
    return (
        d.groupBy()
        .agg(
            F.count("*").alias("n_converted"),
            F.min("delta_us").cast("long").alias("min_us"),
            F.max("delta_us").cast("long").alias("max_us"),
            F.round(
                F.expr("percentile(delta_us, 0.5)").cast("decimal(28,8)"), 1
            ).cast("double").alias("median_us"),
            F.sum("delta_us").cast("long").alias("total_us"),
        )
        .crossJoin(F.broadcast(n_su))
        .select(
            "n_converted", "n_signed_up", "min_us", "max_us", "median_us", "total_us"
        )
    )


# ---------------------------------------------------------------------------
# feature_hashing_vectors — hashing-trick bag-of-words vectorizer
# ---------------------------------------------------------------------------

_FHASH_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            t -> t != '')) AS t
  FROM documents
), b AS (
  SELECT doc_id,
         ('0x' || substr(md5('7:' || t), 1, 15))::BIGINT % 64 AS bucket,
         count(*) AS c
  FROM tok GROUP BY doc_id, ('0x' || substr(md5('7:' || t), 1, 15))::BIGINT % 64
)
SELECT doc_id,
       string_agg(bucket::VARCHAR || ':' || c::VARCHAR, ' ' ORDER BY bucket)
         AS vec,
       sum(c)::BIGINT AS n_tokens,
       count(*)::BIGINT AS n_nonzero
FROM b GROUP BY doc_id ORDER BY doc_id
"""


@register("feature_hashing_vectors", _FHASH_ORACLE)
def q_feature_hashing_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words vectorizer: every token hashes into one
    of 64 buckets (md5-derived 60-bit hash mod 64 — the same cross-engine
    hash family as the sampling/split stack), per-document sparse count
    vectors emitted in canonical 'bucket:count' form — the fixed-width
    featurization that needs NO vocabulary build, the property that makes
    it a single narrow pass at 100 TB.

    Scale: explode + one (doc, bucket) hash agg + one per-doc agg; no
    vocabulary state, no join, no window."""
    from ..functions.hashing import h60

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit(""))
        ).alias("t"),
    )
    b = tok.groupBy(
        "doc_id", (h60(F.col("t"), seed=7) % 64).alias("bucket")
    ).agg(F.count("*").alias("c"))
    return (
        b.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("bucket", "c"))
                    ),
                    lambda s: F.concat_ws(
                        ":", s["bucket"].cast("string"), s["c"].cast("string")
                    ),
                ),
                " ",
            ).alias("vec"),
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_nonzero"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# view_to_purchase_within_hour — windowed conversion via next-event scan
# ---------------------------------------------------------------------------

_V2P_ORACLE = """
WITH s AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_purchase_us
  FROM events
)
SELECT count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_views,
       count(*) FILTER (WHERE event_type = 'view'
                          AND next_purchase_us IS NOT NULL
                          AND next_purchase_us - us <= 3600000000)::BIGINT
         AS n_converted,
       CAST(count(*) FILTER (WHERE event_type = 'view'
                          AND next_purchase_us IS NOT NULL
                          AND next_purchase_us - us <= 3600000000) AS DOUBLE)
         / CAST(count(*) FILTER (WHERE event_type = 'view') AS DOUBLE)
         AS conversion_rate
FROM s
"""


@register("view_to_purchase_within_hour", _V2P_ORACLE)
def q_view_to_purchase_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed conversion: share of 'view' events followed by a purchase
    from the same user within one hour — computed with a REVERSE running
    min over the user's stream (next-purchase instant per row), so there
    is no views x purchases self-join at all.

    Scale: one keyed window (hash partition by user) in the exact
    integer-microsecond domain, then a 1-row conditional-count fold; the
    rate is one division of exact BIGINTs."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    s = ev.select(
        "event_type",
        _us("ts").alias("us"),
        F.min(
            F.when(F.col("event_type") == "purchase", _us("ts"))
        ).over(w).alias("next_purchase_us"),
    )
    is_view = F.col("event_type") == "view"
    converted = (
        is_view
        & F.col("next_purchase_us").isNotNull()
        & (F.col("next_purchase_us") - F.col("us") <= 3_600_000_000)
    )
    return s.groupBy().agg(
        F.count(F.when(is_view, 1)).alias("n_views"),
        F.count(F.when(converted, 1)).alias("n_converted"),
        (
            F.count(F.when(converted, 1)).cast("double")
            / F.count(F.when(is_view, 1)).cast("double")
        ).alias("conversion_rate"),
    )


# ---------------------------------------------------------------------------
# rolling_median_value — sliding-frame order statistic per series
# ---------------------------------------------------------------------------

_ROLLMED_ORACLE = """
WITH w AS (
  SELECT event_type, event_id, ts,
         list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS frame
  FROM events
), m AS (
  SELECT event_type, event_id, ts, list_sort(frame) AS s, len(frame) AS n
  FROM w
), med AS (
  SELECT event_type, event_id, ts,
         CASE WHEN n % 2 = 1 THEN s[(n + 1) // 2]
              ELSE (s[n // 2] + s[n // 2 + 1]) / 2.0 END AS rolling_median
  FROM m
), r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY ts DESC, event_id DESC) AS rk
  FROM med
)
SELECT event_type, event_id,
       CAST(round(CAST(rolling_median AS DECIMAL(28,8)), 6) AS DOUBLE)
         AS rolling_median
FROM r WHERE rk <= 3 ORDER BY event_type, event_id
"""


@register("rolling_median_value", _ROLLMED_ORACLE)
def q_rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling median over the trailing 10 events of each series —
    the sliding-frame ORDER STATISTIC (W6/W7 are sliding sums/means; a
    median cannot be expressed as a running aggregate, so the frame is
    collected and sorted per row). Emits the 3 most recent points per
    series.

    Scale: one keyed window; per-row work is O(k log k) on the BOUNDED
    frame (k=10), so cost is linear in rows — the frame bound is what
    keeps the collect admissible (an unbounded rolling median would need
    a two-heap/indexed structure instead). Median of two exact doubles
    interpolates identically cross-engine; dround(6) for belt and braces."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    s = F.array_sort(F.collect_list("value").over(w))
    n = F.size(s)
    half = F.floor(n / 2).cast("int")
    med = F.when(
        n % 2 == 1, F.element_at(s, half + 1)
    ).otherwise((F.element_at(s, half) + F.element_at(s, half + 1)) / 2.0)
    wr = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select("event_type", "event_id", "ts", med.alias("rm"))
        .withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= 3)
        .select("event_type", "event_id", dround(F.col("rm"), 6).alias("rolling_median"))
        .orderBy("event_type", "event_id")
    )


# ---------------------------------------------------------------------------
# sequence_top_paths — most common 3-step journey paths
# ---------------------------------------------------------------------------

_PATHS_ORACLE = """
WITH s AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events
), p AS (
  SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
  FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY 1
), r AS (
  SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rk FROM p
)
SELECT path, n::BIGINT AS n, rk::BIGINT AS rk FROM r WHERE rk <= 10
ORDER BY rk
"""


@register("sequence_top_paths", _PATHS_ORACLE)
def q_sequence_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent 3-step user journey paths (event-type
    trigrams) — the sequence-mining primitive behind funnel discovery.

    Scale: ONE keyed window computes both leads (shared sort), then a
    bounded hash agg (|types|^3 max keys) and a TakeOrdered top-10 over
    the aggregate — ranking over at most 125 path rows, never data."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    p = s.groupBy(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).agg(F.count("*").alias("n"))
    wr = Window.orderBy(F.desc("n"), "path")
    return (
        p.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= 10)
        .select("path", F.col("n").cast("long").alias("n"), F.col("rk").cast("long").alias("rk"))
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# cohort_ltv_curve — cumulative revenue per signup cohort over event-months
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH su AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), rev AS (
  SELECT su.cohort,
         datediff('week', su.cohort, date_trunc('week', e.ts)) AS week_no,
         sum(CAST(round(e.value * 100) AS BIGINT)) AS rev_cents
  FROM events e JOIN su ON su.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= su.cohort
  GROUP BY 1, 2
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, week_no::BIGINT AS week_no,
       rev_cents::BIGINT AS rev_cents,
       sum(rev_cents) OVER (PARTITION BY cohort ORDER BY week_no)::BIGINT
         AS cum_rev_cents
FROM rev ORDER BY cohort_week, week_no
"""


@register("cohort_ltv_curve", _LTV_ORACLE)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: per signup-WEEK cohort, purchase
    revenue by weeks-since-signup plus the cumulative LTV running sum —
    the revenue twin of cohort_retention (which counts users). Weekly
    grain because the synthetic event stream spans one month.

    Exactness: revenue is integer CENTS (round(value*100) on both
    engines) so the running sums are exact longs; week arithmetic stays
    in date_trunc/datediff week space (both engines truncate to Monday).

    Scale: per-user cohort min + keyed join + (cohort, week) hash agg;
    the running sum windows over weeks PER COHORT (bounded series)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    )
    # NOTE: min(date_trunc) == date_trunc(min) — min ts is in the min week
    week_no = F.floor(
        F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort")) / 7
    ).cast("long")
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(F.col("ts") >= F.col("cohort"))
        .groupBy("cohort", week_no.alias("week_no"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev_cents"))
    )
    w = Window.partitionBy("cohort").orderBy("week_no")
    return (
        rev.select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            F.col("week_no"),
            F.col("rev_cents").cast("long").alias("rev_cents"),
            F.sum("rev_cents").over(w).cast("long").alias("cum_rev_cents"),
        )
        .orderBy("cohort_week", "week_no")
    )


# ---------------------------------------------------------------------------
# repeated_kgram_spans — cross-document exact repeated-substring spans
# ---------------------------------------------------------------------------

_KGRAM_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS w
  FROM documents
), g AS (
  SELECT doc_id, i AS pos,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
         w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] AS gram
  FROM t, (SELECT unnest(generate_series(1, 4096)) AS i) s
  WHERE i <= len(w) - 7
), rep AS (
  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) > 1
), hits AS (
  SELECT g.doc_id, g.pos FROM g JOIN rep USING (gram)
), isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM hits
)
SELECT doc_id, min(pos)::BIGINT AS start_pos,
       (max(pos) + 7)::BIGINT AS end_pos,
       (max(pos) + 8 - min(pos))::BIGINT AS span_tokens
FROM isl GROUP BY doc_id, island
ORDER BY doc_id, start_pos
"""


@register("repeated_kgram_spans", _KGRAM_ORACLE)
def q_repeated_kgram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring detection, the Lee et al. ("Deduplicating
    Training Data Makes Language Models Better") exact-substring method
    re-expressed relationally: every 8-token gram that occurs in MORE THAN
    ONE document marks its positions, and adjacent marked positions merge
    into maximal repeated SPANS per document (token start/end indices) —
    the spans a curation pipeline cuts or attributes.

    The suffix-array formulation is inherently sequential; the k-gram
    relational form is the distributable equivalent: explode positions ->
    one gram hash agg (cross-doc distinct count) -> semi join back ->
    per-doc islands window. Every step is keyed; nothing is corpus-global
    except the gram aggregate itself.

    Scale: gram rows = total tokens (8x text bytes with string grams —
    production would hash them to longs like operators/setsim.py; kept as
    strings here so the oracle is byte-identical). Islands via the
    pos - row_number trick, one window per doc. The SQL twin enumerates
    positions from a 4096-wide series (far above the corpus's max doc
    length); the Spark side has no such cap."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    k = 8
    w = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit("")).alias("w"),
    )
    gram = F.concat_ws(
        " ", *[F.element_at(F.col("w"), F.col("pos") + j) for j in range(k)]
    )
    # guard: Spark sequence(1, 0) yields a DESCENDING [1, 0], not empty —
    # docs shorter than k tokens must emit no positions at all
    positions = F.when(
        F.size("w") >= k, F.sequence(F.lit(1), F.size("w") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    g = (
        w.select("doc_id", F.explode(positions).alias("pos"), "w")
        .select("doc_id", "pos", gram.alias("gram"))
    )
    rep = g.groupBy("gram").agg(
        F.count_distinct("doc_id").alias("nd")
    ).where(F.col("nd") > 1).select("gram")
    hits = g.join(rep, "gram", "left_semi")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn("island", F.col("pos") - F.row_number().over(wd))
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("start_pos"),
            (F.max("pos") + (k - 1)).cast("long").alias("end_pos"),
            (F.max("pos") + k - F.min("pos")).cast("long").alias("span_tokens"),
        )
        .drop("island")
        .select("doc_id", "start_pos", "end_pos", "span_tokens")
        .orderBy("doc_id", "start_pos")
    )
