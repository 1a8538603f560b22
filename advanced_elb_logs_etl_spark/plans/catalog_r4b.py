"""Round-4b catalog wave: exact set-similarity join (prefix filtering),
GROUPING SETS, scalable two-phase scan statistics (KS distance, ntile-based
RFM segmentation), distributed hypothesis tests (chi-square, Welch t),
batch debounce, deterministic decimal-snapped centroid cosines, a
higher-order array-function battery, and co-occurrence lift.

Same contract as plans.catalog: every Spark query has a DuckDB oracle twin
computing byte-identical values — integer time math in epoch microseconds,
DECIMAL-snapped floats via functions.scalars.dround, int-ratio divisions
emitted raw (bit-identical), deterministic tiebreaks on every ordering.
Scale notes inline per query; the wave's theme is REPLACING
single-partition `Window.orderBy` patterns with the range-partitioned
two-phase scan (operators/stats.py global_cumsum / scalable_ntile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import dround
from ..operators import setsim, stats
from .catalog import _t, _us, register

_DR6 = "CAST(round(CAST({x} AS DECIMAL(28,8)), 6) AS DOUBLE)"


# ---------------------------------------------------------------------------
# setsim_prefix_join — exact prefix-filtered shingle-set Jaccard join
# ---------------------------------------------------------------------------

_SETSIM_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '') AS w
  FROM documents
), s AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(w) - 2),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS toks
  FROM t WHERE len(w) >= 3
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.toks, b.toks))::BIGINT AS n_common,
         len(a.toks)::BIGINT AS n_a, len(b.toks)::BIGINT AS n_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, n_common, n_a, n_b,
       CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) AS jaccard
FROM p
WHERE n_common > 0
  AND CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) >= 0.6
ORDER BY id_a, id_b
"""


@register("setsim_prefix_join", _SETSIM_ORACLE)
def q_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-shingle-set Jaccard >= 0.6 pairs via AllPairs/PPJoin prefix
    filtering (operators/setsim.py) — the exact counterpart that validates
    the MinHash/SimHash approximate near-dup stack.

    Scale: the oracle is the O(n^2) all-pairs truth (fine at driver SF);
    the Spark plan is the 100 TB shape — rare-first prefix equi-join for
    candidates (no cartesian), per-document windows only, array-intersect
    verification on the surviving pairs. Jaccard is a BIGINT ratio:
    bit-identical, unrounded."""
    docs = _t(spark, sf_dir, "documents")
    out = setsim.prefix_filtered_jaccard_join(docs, "doc_id", "text", threshold=0.6)
    return out.orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# grouping_sets_pricing — GROUPING SETS with grouping flags
# ---------------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag)::BIGINT AS g_rf,
       grouping(l_linestatus)::BIGINT AS g_ls,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*)::BIGINT AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
"""


@register("grouping_sets_pricing", _GSETS_ORACLE)
def q_grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((rf, ls), (rf), ()) with grouping() flags — the
    multi-granularity rollup report in ONE pass.

    Scale: Spark compiles grouping sets to a single Expand + one hash
    aggregation — data is read once and each row contributes to all three
    granularities map-side; no per-granularity rescan, no union of
    aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_rf"),
            F.grouping("l_linestatus").cast("long").alias("g_ls"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# ks_two_sample_values — Kolmogorov–Smirnov distance, two-phase scan
# ---------------------------------------------------------------------------

_KS_ORACLE = """
WITH two AS (
  SELECT event_type, value FROM events WHERE event_type IN ('click', 'purchase')
), pv AS (
  SELECT value AS v,
         count(*) FILTER (WHERE event_type = 'click') AS ca,
         count(*) FILTER (WHERE event_type = 'purchase') AS cb
  FROM two GROUP BY value
), cum AS (
  SELECT sum(ca) OVER (ORDER BY v) AS cca, sum(cb) OVER (ORDER BY v) AS ccb
  FROM pv
), n AS (
  SELECT count(*) FILTER (WHERE event_type = 'click') AS n_a,
         count(*) FILTER (WHERE event_type = 'purchase') AS n_b
  FROM two
)
SELECT max(abs(CAST(cca AS DOUBLE) / CAST(n_a AS DOUBLE)
            - CAST(ccb AS DOUBLE) / CAST(n_b AS DOUBLE))) AS d_stat,
       n_a::BIGINT AS n_a, n_b::BIGINT AS n_b
FROM cum, n GROUP BY n_a, n_b
"""


@register("ks_two_sample_values", _KS_ORACLE)
def q_ks_two_sample_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the click and
    purchase value distributions (operators/stats.py).

    Scale: the oracle's `sum() OVER (ORDER BY v)` is exactly the
    single-partition-window trap; the Spark side computes the SAME
    cumulative counts with the range-partitioned two-phase prefix scan
    (global_cumsum): per-value hash agg first (data-sized reduction), then
    a partition-local window plus a broadcast of per-partition offsets.
    D is a max over BIGINT ratios — bit-identical, unrounded."""
    ev = _t(spark, sf_dir, "events")
    return stats.ks_two_sample(ev, "value", "event_type", "click", "purchase")


# ---------------------------------------------------------------------------
# chi_square_type_bucket — independence test over a contingency table
# ---------------------------------------------------------------------------

_CHI2_ORACLE = f"""
WITH obs AS (
  SELECT event_type AS r, CAST(floor(value / 100.0) AS BIGINT) AS c, count(*) AS o
  FROM events GROUP BY 1, 2
), rm AS (SELECT r, sum(o) AS rt FROM obs GROUP BY r),
cm AS (SELECT c, sum(o) AS ct FROM obs GROUP BY c),
nn AS (SELECT sum(o) AS n FROM obs),
cells AS (
  SELECT obs.o, CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) AS e, n
  FROM obs JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN nn
), agg AS (
  -- zero cells (O=0, E>0) contribute E each; their total is N - sum(E over
  -- observed cells) -- the closed form mirrored by operators/stats.py
  SELECT sum((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e)
           + (CAST(n AS DOUBLE) - sum(e)) AS chi2,
         (SELECT count(*) FROM rm) AS nr, (SELECT count(*) FROM cm) AS nc, n
  FROM cells GROUP BY n
)
SELECT {_DR6.format(x='chi2')} AS chi2,
       ((nr - 1) * (nc - 1))::BIGINT AS dof, n::BIGINT AS n
FROM agg
"""


@register("chi_square_type_bucket", _CHI2_ORACLE)
def q_chi_square_type_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test: event_type x value-bucket
    (width-100 bins) contingency table, computed relationally
    (operators/stats.py chi_square).

    Scale: one hash agg for cells, two tiny margin re-aggs broadcast back
    — the contingency table (|types| x |buckets|) is the only shuffled
    state, never the event rows. Cell sums are exact BIGINTs; the one
    float fold is DECIMAL-snapped at 1e-6."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "bucket", F.floor(F.col("value") / 100.0)
    )
    out = stats.chi_square(ev, "event_type", "bucket")
    return out.select(dround(F.col("chi2"), 6).alias("chi2"), "dof", "n")


# ---------------------------------------------------------------------------
# welch_t_values — Welch's unequal-variance t statistic from moments
# ---------------------------------------------------------------------------

_WELCH_ORACLE = f"""
WITH m AS (
  SELECT count(*) FILTER (WHERE event_type = 'purchase') AS na,
         count(*) FILTER (WHERE event_type = 'error') AS nb,
         sum(value) FILTER (WHERE event_type = 'purchase') AS sa,
         sum(value) FILTER (WHERE event_type = 'error') AS sb,
         sum(value * value) FILTER (WHERE event_type = 'purchase') AS qa,
         sum(value * value) FILTER (WHERE event_type = 'error') AS qb
  FROM events WHERE event_type IN ('purchase', 'error')
), x AS (
  SELECT na, nb,
         sa / CAST(na AS DOUBLE) AS mean_a, sb / CAST(nb AS DOUBLE) AS mean_b,
         ((qa - sa * sa / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1))
           / CAST(na AS DOUBLE) AS se2a,
         ((qb - sb * sb / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1))
           / CAST(nb AS DOUBLE) AS se2b
  FROM m
)
SELECT {_DR6.format(x='(mean_a - mean_b) / sqrt(se2a + se2b)')} AS t_stat,
       {_DR6.format(x='(se2a + se2b) * (se2a + se2b) / (se2a * se2a / (CAST(na AS DOUBLE) - 1) + se2b * se2b / (CAST(nb AS DOUBLE) - 1))')} AS dof_welch,
       {_DR6.format(x='mean_a')} AS mean_a, {_DR6.format(x='mean_b')} AS mean_b,
       na::BIGINT AS n_a, nb::BIGINT AS n_b
FROM x
"""


@register("welch_t_values", _WELCH_ORACLE)
def q_welch_t_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t statistic (purchase vs error values) from one-pass moment
    aggregates — n, sum, sum-of-squares per group — plus the
    Welch–Satterthwaite effective degrees of freedom.

    Scale: ONE map-side-combinable hash agg over the filtered rows, then a
    1-row combine; no sort, no window, no second pass. Double sums
    accumulate in partition order, so all float outputs are
    DECIMAL-snapped at 1e-6 on both engines."""
    ev = _t(spark, sf_dir, "events")
    out = stats.welch_t_stats(ev, "value", "event_type", "purchase", "error")
    return out.select(
        dround(F.col("t_stat"), 6).alias("t_stat"),
        dround(F.col("dof_welch"), 6).alias("dof_welch"),
        dround(F.col("mean_a"), 6).alias("mean_a"),
        dround(F.col("mean_b"), 6).alias("mean_b"),
        "n_a",
        "n_b",
    )


# ---------------------------------------------------------------------------
# rfm_segmentation — recency/frequency/monetary quintiles, scalable ntile
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH pc AS (
  SELECT o_custkey,
         epoch_us(max(o_orderdate)) AS last_us,
         count(*) AS freq,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY o_custkey
), s AS (
  SELECT ntile(5) OVER (ORDER BY last_us, o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY freq, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
  FROM pc
)
SELECT r_score::BIGINT AS r_score, f_score::BIGINT AS f_score,
       m_score::BIGINT AS m_score, count(*)::BIGINT AS n_customers
FROM s GROUP BY 1, 2, 3
ORDER BY r_score, f_score, m_score
"""


@register("rfm_segmentation", _RFM_ORACLE)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency (last order
    instant), frequency (order count), monetary (exact DECIMAL spend),
    each scored into quintiles, then segment population counts.

    Scale: the oracle's three `ntile(5) OVER (ORDER BY ...)` are
    single-partition sorts; the Spark side fuses all three quintile
    layouts into ONE two-phase range scan (r15, guide §2.4 — one
    exchange serving three orderings): the per-customer frame melts to
    (metric_idx, value, custkey) rows — every metric is exactly
    order-preserving under the decimal(38,6) cast and contributes
    exactly N rows, so the within-metric rank is the global rank minus
    metric_idx * N — then one exact ntile bucket formula and a
    per-customer pivot agg.  The r14 form ran three sequential
    scalable_ntile passes (three range shuffles + three eager pins);
    this runs one range shuffle of 3N narrow rows.  Determinism: every
    order has a custkey tiebreak; monetary sums are DECIMAL(18,2)-exact
    so bucket boundaries cannot drift with partition order."""
    o = _t(spark, sf_dir, "orders")
    # lazy checkpoint: the melt AND the row-count agg both read the
    # per-customer frame — the checkpoint guarantees the orders
    # aggregation computes once without leaving a persisted frame behind
    pc = o.groupBy("o_custkey").agg(
        F.max(_us("o_orderdate")).alias("last_us"),
        F.count("*").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    ).localCheckpoint(eager=False)
    metrics = ["last_us", "freq", "monetary"]
    melted = pc.select(
        "o_custkey",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("_m"),
                        F.col(c).cast("decimal(38,6)").alias("_val"),
                    )
                    for i, c in enumerate(metrics)
                ]
            )
        ).alias("_e"),
    ).select(
        "o_custkey",
        F.col("_e._m").alias("_m"),
        F.col("_e._val").alias("_val"),
        F.lit(1).alias("_one"),
    )
    ranked = stats.global_cumsum(
        melted, ["_m", "_val", "o_custkey"], ["_one"], pin="defer"
    ).withColumnRenamed("cum__one", "_grank")
    n = pc.groupBy().agg(F.count("*").alias("_n"))
    # within-metric rank + the exact SQL ntile bucket formula (the
    # scalable_ntile expressions verbatim, k=5)
    k = 5
    rank = F.col("_grank") - F.col("_m").cast("long") * F.col("_n")
    big = F.floor(F.col("_n") / k) + 1
    rem = F.col("_n") % k
    bucket = F.when(rank <= big * rem, F.ceil(rank / big)).otherwise(
        rem + F.ceil((rank - big * rem) / F.greatest(F.floor(F.col("_n") / k), F.lit(1)))
    )
    scored = (
        ranked.crossJoin(F.broadcast(n))
        .withColumn("_b", bucket.cast("int"))
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("_m") == 0, F.col("_b"))).alias("r_score"),
            F.max(F.when(F.col("_m") == 1, F.col("_b"))).alias("f_score"),
            F.max(F.when(F.col("_m") == 2, F.col("_b"))).alias("m_score"),
        )
    )
    return (
        scored.groupBy(
            F.col("r_score").cast("long").alias("r_score"),
            F.col("f_score").cast("long").alias("f_score"),
            F.col("m_score").cast("long").alias("m_score"),
        )
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# debounce_events_batch — time-window dedup (batch twin of the streaming
# transformWithState debounce in streaming/state.py)
# ---------------------------------------------------------------------------

_DEBOUNCE_ORACLE = """
WITH l AS (
  SELECT event_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT event_id FROM l WHERE gap IS NULL OR gap > 300000000
ORDER BY event_id
"""


@register("debounce_events_batch", _DEBOUNCE_ORACLE)
def q_debounce_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window deduplication: keep an event only if no same
    (user, type) event occurred within the previous 300 s — the batch twin
    of streaming/state.py's transformWithState debounce.

    Scale: one keyed window (hash-partitioned by user) in the exact
    integer-microsecond domain; emits surviving event ids row-level so the
    oracle checks the SEMANTICS, not a summary."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = _us("ts") - F.lag(_us("ts")).over(w)
    return (
        ev.withColumn("gap", gap)
        .where(F.col("gap").isNull() | (F.col("gap") > 300_000_000))
        .select("event_id")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# centroid_cosine_outliers — deterministic decimal-snapped centroid cosine
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = """
WITH e AS (
  SELECT vec_id, label, t.i AS pos, embedding[t.i]::DOUBLE AS c
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) t
  WHERE t.i <= len(embedding)
), cent AS (
  SELECT label, pos,
         CAST(sum(CAST(c AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS cc
  FROM e GROUP BY label, pos
), nc AS (
  SELECT label, CAST(sum(CAST(cc * cc AS DECIMAL(38,18))) AS DOUBLE) AS nc2
  FROM cent GROUP BY label
), pv AS (
  SELECT e.vec_id, e.label,
         CAST(sum(CAST(e.c * cent.cc AS DECIMAL(38,18))) AS DOUBLE) AS dot,
         CAST(sum(CAST(e.c * e.c AS DECIMAL(38,18))) AS DOUBLE) AS nv2
  FROM e JOIN cent ON e.label = cent.label AND e.pos = cent.pos
  GROUP BY e.vec_id, e.label
), cosd AS (
  SELECT vec_id, label,
         CAST(round(CAST(dot / (sqrt(nv2) * sqrt(nc2)) AS DECIMAL(28,8)), 6) AS DOUBLE) AS cosine
  FROM pv JOIN nc USING (label)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY label ORDER BY cosine, vec_id) AS rk
  FROM cosd
)
SELECT label::BIGINT AS label, vec_id, cosine AS cosine_to_centroid
FROM ranked WHERE rk <= 3 ORDER BY label, cosine_to_centroid, vec_id
"""


@register("centroid_cosine_outliers", _CENTROID_ORACLE)
def q_centroid_cosine_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids and the 3 vectors FARTHEST from their
    own centroid (lowest cosine) — the mislabel/outlier audit for an
    embedding corpus.

    Determinism is the point: a naive avg()/sum() centroid is only
    reproducible up to partition-order ulps (why ivf_cosine_topk is
    rows-only). Here every float reduction is snapped to DECIMAL(38,18)
    BEFORE summing — decimal sums are exact integers, so the centroid,
    dot products, and norms are order-independent and bit-identical across
    engines; ranking uses the 1e-6-rounded cosine with a vec_id tiebreak.

    Scale: posexplode -> two hash aggs ((label,pos) then (vec_id)) + a
    broadcast of the tiny centroid frame; no window wider than a label."""
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "cf")
    ).withColumn("c", F.col("cf").cast("double"))

    def dsum(col):
        return F.sum(col.cast("decimal(38,18)")).cast("double")

    cent = e.groupBy("label", "pos").agg(
        (dsum(F.col("c")) / F.count("*")).alias("cc")
    )
    nc = cent.groupBy("label").agg(dsum(F.col("cc") * F.col("cc")).alias("nc2"))
    pv = (
        e.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            dsum(F.col("c") * F.col("cc")).alias("dot"),
            dsum(F.col("c") * F.col("c")).alias("nv2"),
        )
    )
    cosd = pv.join(F.broadcast(nc), "label").select(
        "vec_id",
        "label",
        dround(
            F.col("dot") / (F.sqrt(F.col("nv2")) * F.sqrt(F.col("nc2"))), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("label").orderBy("cosine", "vec_id")
    return (
        cosd.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            F.col("label").cast("long").alias("label"),
            "vec_id",
            F.col("cosine").alias("cosine_to_centroid"),
        )
        .orderBy("label", "cosine_to_centroid", "vec_id")
    )


# ---------------------------------------------------------------------------
# array_hof_battery — higher-order array functions, per-row left folds
# ---------------------------------------------------------------------------

_HOF_ORACLE = """
WITH a AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
)
SELECT vec_id,
       sqrt(list_reduce(list_transform(v, x -> x * x), (x, y) -> x + y)) AS l2_norm,
       len(list_filter(v, x -> x < 0))::BIGINT AS n_neg,
       list_max(v) AS max_comp,
       list_reduce(v[1:8], (x, y) -> x + y) AS head8_sum
FROM a ORDER BY vec_id
"""


@register("array_hof_battery", _HOF_ORACLE)
def q_array_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function battery over the embedding column:
    L2 norm (aggregate fold), negative-component count (filter + size),
    max component, prefix-8 sum (slice + fold).

    Scale: pure per-row Column expressions inside whole-stage codegen — no
    shuffle, no UDF, no explode. Folds run left-to-right in array order on
    both engines (0.0 + x == x exactly), so raw doubles match without
    rounding."""
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        ).alias("l2_norm"),
        F.size(F.filter(v, lambda x: x < 0)).cast("long").alias("n_neg"),
        F.array_max(v).alias("max_comp"),
        F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x).alias(
            "head8_sum"
        ),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# event_cooccurrence_lift — market-basket co-occurrence over event types
# ---------------------------------------------------------------------------

_LIFT_ORACLE = """
WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
pairs AS (
  SELECT a.event_type AS et_a, b.event_type AS et_b, count(*) AS n_pair
  FROM u a JOIN u b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
), singles AS (SELECT event_type, count(*) AS n_u FROM u GROUP BY 1),
nn AS (SELECT count(DISTINCT user_id) AS n_users FROM u)
SELECT et_a, et_b, n_pair::BIGINT AS n_pair,
       CAST(n_pair AS DOUBLE) / CAST(n_users AS DOUBLE) AS support,
       CAST(n_pair AS DOUBLE) * CAST(n_users AS DOUBLE)
         / (CAST(sa.n_u AS DOUBLE) * CAST(sb.n_u AS DOUBLE)) AS lift
FROM pairs
JOIN singles sa ON sa.event_type = et_a
JOIN singles sb ON sb.event_type = et_b
CROSS JOIN nn
ORDER BY et_a, et_b
"""


@register("event_cooccurrence_lift", _LIFT_ORACLE)
def q_event_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over event types: per user-distinct
    baskets, pair support and lift = P(a,b) / (P(a) P(b)).

    Scale: the self-join is per-user AFTER a distinct projection, so each
    user contributes at most C(|types|, 2) pairs — bounded fan-out, not
    all-pairs of rows; singles and the user count broadcast back. All
    floats are single divisions/products of exact BIGINTs in a fixed
    expression shape — bit-identical, unrounded."""
    ev = _t(spark, sf_dir, "events")
    u = ev.select("user_id", "event_type").distinct()
    pairs = (
        u.alias("a")
        .join(u.alias("b"), "user_id")
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("et_a"), F.col("b.event_type").alias("et_b")
        )
        .agg(F.count("*").alias("n_pair"))
    )
    singles = u.groupBy("event_type").agg(F.count("*").alias("n_u"))
    nn = u.groupBy().agg(F.count_distinct("user_id").alias("n_users"))
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("event_type").alias("et_a"), F.col("n_u").alias("nu_a"))),
            "et_a",
        )
        .join(
            F.broadcast(singles.select(F.col("event_type").alias("et_b"), F.col("n_u").alias("nu_b"))),
            "et_b",
        )
        .crossJoin(F.broadcast(nn))
        .select(
            "et_a",
            "et_b",
            F.col("n_pair").cast("long").alias("n_pair"),
            (F.col("n_pair").cast("double") / F.col("n_users").cast("double")).alias(
                "support"
            ),
            (
                F.col("n_pair").cast("double")
                * F.col("n_users").cast("double")
                / (F.col("nu_a").cast("double") * F.col("nu_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy("et_a", "et_b")
    )
