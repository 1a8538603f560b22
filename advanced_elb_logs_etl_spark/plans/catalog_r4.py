"""Round-4 catalog wave: exact-decimal ledgers, interval sweeps, dynamic-gap
sessionization, per-language n-gram ranking, robust scaling, weighted
percentiles, UNPIVOT, map/query-string explosion, bitmap distinct-date
compression, an explicit salted join, shingle-set containment, last-touch
attribution, time-spine gap fill, the vendored UA-family classifier under
the driver gate, and exact heavy hitters.

Same contract as plans.catalog: every Spark query has a DuckDB oracle twin
computing byte-identical values (integer time math via epoch-microseconds,
DECIMAL-snapped floats via functions.scalars.dround, DECIMAL-typed exact
ledgers emitted as strings, deterministic tiebreaks on every ordering).
Scale notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import dround
from ..functions.useragent import ua_browser_family, ua_os_family
from .catalog import _t, _us, register

_DR6 = "CAST(round(CAST({x} AS DECIMAL(28,8)), 6) AS DOUBLE)"
_DR4 = "CAST(round(CAST({x} AS DECIMAL(28,8)), 4) AS DOUBLE)"
_DR2 = "CAST(round(CAST({x} AS DECIMAL(28,8)), 2) AS DOUBLE)"


# ---------------------------------------------------------------------------
# decimal_exact_ledger — DECIMAL-typed exact revenue ledger
# ---------------------------------------------------------------------------

_LEDGER_ORACLE = """
SELECT l_returnflag,
       count(*)::BIGINT AS n,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_qty,
       CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(6,4))) AS DECIMAL(28,6)))
            AS DECIMAL(38,6)) AS VARCHAR) AS sum_disc_price,
       CAST(CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(6,4))) AS DECIMAL(28,6))
                 * (1 + CAST(l_tax AS DECIMAL(6,4))) AS DECIMAL(28,10)))
            AS DECIMAL(38,10)) AS VARCHAR) AS sum_charge
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("decimal_exact_ledger", _LEDGER_ORACLE)
def q_decimal_exact_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Financial-grade ledger: every money expression is DECIMAL-typed end
    to end, so the sums are EXACT (no float accumulation error) and
    bit-identical across engines and partition orders — the property a
    billing/revenue pipeline needs that double aggregation cannot give.
    Scales chosen so no rounding ever occurs: price(2dp) x discount(4dp)
    = 6dp exactly; x tax(4dp) = 10dp exactly. Sums emitted as strings to
    make the fixed-scale values canonicalization-proof.

    Scale: one partial+final hash agg; decimal sums are partial-aggregable
    (long-backed Decimal128 in Tungsten), so this is the same shuffle shape
    as the double-typed pricing_summary."""
    # spread the single-partition lineitem scan so the decimal partial
    # aggregation runs on all cores (the narrow 5-column shuffle costs less
    # than a serialized Decimal128 agg over 600k rows)
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    ).repartition(spark.sparkContext.defaultParallelism)
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    tax = F.col("l_tax").cast("decimal(6,4)")
    disc_price = (price * (F.lit(1) - disc)).cast("decimal(28,6)")
    charge = (disc_price * (F.lit(1) + tax)).cast("decimal(28,10)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("decimal(38,4)").cast("string").alias("sum_qty"),
            F.sum(disc_price).cast("decimal(38,6)").cast("string").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,10)").cast("string").alias("sum_charge"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# interval_overlap_join — banded interval-overlap pair analytics
# ---------------------------------------------------------------------------

_IVL_ORACLE = f"""
WITH iv AS (
  SELECT user_id, user_id % 8 AS grp,
         min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
  FROM events WHERE user_id < 1200
  GROUP BY user_id HAVING count(*) >= 2 AND max(epoch_us(ts)) > min(epoch_us(ts))
)
SELECT a.grp AS grp,
       count(*)::BIGINT AS n_pairs,
       count(*) FILTER (a.s <= b.e AND b.s <= a.e)::BIGINT AS n_overlap,
       coalesce(sum(CASE WHEN a.s <= b.e AND b.s <= a.e
                         THEN least(a.e, b.e) - greatest(a.s, b.s) END), 0)::BIGINT
         AS total_overlap_us
FROM iv a JOIN iv b ON a.grp = b.grp AND a.user_id < b.user_id
GROUP BY a.grp ORDER BY a.grp
"""


@register("interval_overlap_join", _IVL_ORACLE)
def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap pair statistics: per-user activity intervals
    [first event, last event], paired within a hash band, overlap tested
    with closed-interval logic and measured in exact integer microseconds.

    Scale: the pair join is an EQUI join on the band key with the overlap
    range predicates riding along (hash join, no NL/cartesian); the band
    bounds the per-key pair population, which is how a 100 TB interval
    join must be blocked (band by coarse time bucket or entity shard).
    The user_id cap bounds the interval population at any sf."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 1200)
    iv = (
        ev.groupBy("user_id")
        .agg(
            F.min(_us("ts")).alias("s"),
            F.max(_us("ts")).alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter((F.col("n") >= 2) & (F.col("e") > F.col("s")))
        .withColumn("grp", F.col("user_id") % 8)
    )
    a = iv.alias("a")
    b = iv.alias("b")
    pair = a.join(
        b,
        (F.col("a.grp") == F.col("b.grp")) & (F.col("a.user_id") < F.col("b.user_id")),
    )
    overlap = (F.col("a.s") <= F.col("b.e")) & (F.col("b.s") <= F.col("a.e"))
    ov_len = F.least("a.e", "b.e") - F.greatest("a.s", "b.s")
    return (
        pair.groupBy(F.col("a.grp").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_if(overlap).alias("n_overlap"),
            # exact integer total, not a rounded double avg — averages of
            # exact integers tie at the round digit whenever the count
            # divides a power of 10, and the engines disagree on ties
            F.coalesce(F.sum(F.when(overlap, ov_len)), F.lit(0))
            .cast("long").alias("total_overlap_us"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# sessionize_gap_dynamic — per-user adaptive-gap sessionization
# ---------------------------------------------------------------------------

_SESS_DYN_ORACLE = f"""
WITH d AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS delta
  FROM events WHERE user_id < 500
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
th AS (
  SELECT user_id, 2.0 * avg(delta) AS thresh FROM d WHERE delta IS NOT NULL
  GROUP BY user_id
),
s AS (
  SELECT d.user_id, d.us, d.event_id,
         sum(CASE WHEN d.delta IS NULL OR d.delta > th.thresh THEN 1 ELSE 0 END)
           OVER (PARTITION BY d.user_id ORDER BY d.us, d.event_id
                 ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM d JOIN th USING (user_id)
),
per_sess AS (
  SELECT user_id, sess_id, count(*)::BIGINT AS n_events,
         max(us) - min(us) AS dur_us
  FROM s GROUP BY user_id, sess_id
)
SELECT user_id,
       max(sess_id)::BIGINT AS n_sessions,
       sum(n_events)::BIGINT AS n_events,
       max(n_events)::BIGINT AS max_sess_events,
       sum(dur_us)::BIGINT AS total_dur_us,
       (sum(dur_us) // max(sess_id))::BIGINT AS avg_dur_us_floor
FROM per_sess GROUP BY user_id ORDER BY user_id
"""


@register("sessionize_gap_dynamic", _SESS_DYN_ORACLE)
def q_sessionize_gap_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a PER-USER adaptive gap threshold (2x the user's
    mean inter-event delta) instead of a global constant — the form that
    survives heterogeneous activity rates in a real clickstream. Exact:
    deltas are integer microseconds; the threshold is one double division
    identical in both engines.

    Scale: two window passes and one small join, all partitioned by
    user_id — a single hash partitioning reused across lag, threshold
    join-back, and the running session counter (no extra shuffle between
    stages)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 500)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    d = ev.select(
        "user_id", "event_id", _us("ts").alias("us")
    ).withColumn("delta", F.col("us") - F.lag("us").over(w))
    th = (
        d.filter(F.col("delta").isNotNull())
        .groupBy("user_id")
        .agg((F.lit(2.0) * F.avg("delta")).alias("thresh"))
    )
    s = d.join(th, "user_id").withColumn(
        "sess_id",
        F.sum(
            F.when(F.col("delta").isNull() | (F.col("delta") > F.col("thresh")), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_sess = s.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("dur_us"),
    )
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.max("sess_id").cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.max("n_events").cast("long").alias("max_sess_events"),
            F.sum("dur_us").cast("long").alias("total_dur_us"),
            # floor-divided average: duration stats stay in the EXACT
            # integer domain — a rounded double avg ties at .xx5 whenever
            # the session count divides a power of 10, and Spark
            # (HALF_UP on decimal) and DuckDB disagree on ties.
            F.expr("sum(dur_us) div max(sess_id)").cast("long").alias("avg_dur_us_floor"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# top_ngrams_per_lang — per-language bigram ranking
# ---------------------------------------------------------------------------

_NGRAM_TOP_ORACLE = """
WITH toks AS (
  SELECT lang, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT lang, unnest(CASE WHEN len(t) >= 2
    THEN list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])
    ELSE [] END) AS gram
  FROM toks
),
counted AS (
  SELECT lang, gram, count(*)::BIGINT AS cnt FROM grams GROUP BY lang, gram
)
SELECT lang, gram, cnt, rnk FROM (
  SELECT lang, gram, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram) AS rnk
  FROM counted
) WHERE rnk <= 5 ORDER BY lang, rnk
"""


@register("top_ngrams_per_lang", _NGRAM_TOP_ORACLE)
def q_top_ngrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word bigrams per language — the corpus-profiling pass behind
    boilerplate detection and language-model contamination checks. Bigrams
    are built with an index-lambda transform over the token array (no
    self-join), exploded once, counted in one hash agg, ranked with a
    deterministic (count DESC, gram ASC) tiebreak.

    Scale: explode -> single hash agg -> per-group top-k window over the
    counted (small) frame; candidate state is the distinct-bigram
    vocabulary, not the corpus."""
    # the single-row-group documents file scans as ONE partition; spread it
    # before the bigram transform+explode or the whole tokenize/gram stage
    # runs on one core (measured 8.5s -> ~1s at sf0.1 on local[32])
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counted = (
        docs.select("lang", F.explode(grams).alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("gram"))
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .orderBy("lang", "rnk")
    )


# ---------------------------------------------------------------------------
# robust_scale_features — median/IQR scaling per group
# ---------------------------------------------------------------------------

_ROBUST_ORACLE = f"""
WITH q AS (
  SELECT c_mktsegment,
         quantile_cont(o_totalprice, 0.25) AS p25,
         quantile_cont(o_totalprice, 0.50) AS med,
         quantile_cont(o_totalprice, 0.75) AS p75
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c_mktsegment
)
SELECT q.c_mktsegment AS segment,
       count(*)::BIGINT AS n,
       {_DR6.format(x="avg((o_totalprice - med) / (p75 - p25))")} AS mean_scaled,
       {_DR6.format(x="min((o_totalprice - med) / (p75 - p25))")} AS min_scaled,
       {_DR6.format(x="max((o_totalprice - med) / (p75 - p25))")} AS max_scaled
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN q ON q.c_mktsegment = c.c_mktsegment
GROUP BY q.c_mktsegment ORDER BY q.c_mktsegment
"""


@register("robust_scale_features", _ROBUST_ORACLE)
def q_robust_scale_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust feature scaling ((x - median) / IQR) per market segment — the
    outlier-resistant normalization an ML feature pipeline applies before
    training. Exact interpolated quantiles (matches quantile_cont), then
    one broadcast join-back of the 5-row quantile frame.

    Scale: the quantile pass is the only non-partial agg (exact
    percentile); the join-back broadcasts 5 rows, so the scaled pass adds
    no shuffle beyond the original grouping."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    oc = o.join(c, o.o_custkey == c.c_custkey).select("c_mktsegment", "o_totalprice")
    pcts = F.percentile("o_totalprice", F.lit([0.25, 0.50, 0.75]))
    q = oc.groupBy("c_mktsegment").agg(
        F.element_at(pcts, 1).alias("p25"),
        F.element_at(pcts, 2).alias("med"),
        F.element_at(pcts, 3).alias("p75"),
    )
    scaled = (F.col("o_totalprice") - F.col("med")) / (F.col("p75") - F.col("p25"))
    return (
        oc.join(F.broadcast(q), "c_mktsegment")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.avg(scaled), 6).alias("mean_scaled"),
            dround(F.min(scaled), 6).alias("min_scaled"),
            dround(F.max(scaled), 6).alias("max_scaled"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# weighted_percentile — weighted median via cumulative-weight window
# ---------------------------------------------------------------------------

_WPCT_ORACLE = """
WITH cw AS (
  SELECT l_returnflag, l_extendedprice,
         sum(l_quantity) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice, l_orderkey, l_linenumber
                               ROWS UNBOUNDED PRECEDING) AS cum_w,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tot_w
  FROM lineitem
)
SELECT l_returnflag,
       min(l_extendedprice) FILTER (cum_w >= tot_w / 2) AS weighted_median,
       CAST(round(max(tot_w)) AS BIGINT) AS total_weight
FROM cw GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("weighted_percentile", _WPCT_ORACLE)
def q_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: sort by value,
    accumulate weight, take the first value whose cumulative weight crosses
    half the total — the exact weighted-percentile definition, computed
    with one window pass (no per-group value collection).

    Scale: one hash partitioning by group serves both the running and the
    total-weight window; state per row is a single accumulator. The same
    shape generalizes to any weighted quantile (replace /2)."""
    li = _t(spark, sf_dir, "lineitem")
    wrun = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    cw = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(wrun).alias("cum_w"),
        F.sum("l_quantity").over(wall).alias("tot_w"),
    )
    return (
        cw.groupBy("l_returnflag")
        .agg(
            F.min(F.when(F.col("cum_w") >= F.col("tot_w") / 2, F.col("l_extendedprice")))
            .alias("weighted_median"),
            F.round(F.max("tot_w")).cast("long").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# unpivot_metrics — UNPIVOT/melt + per-metric aggregation
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = f"""
WITH m AS (
  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
)
SELECT l_returnflag, metric,
       count(*)::BIGINT AS n,
       {_DR4.format(x="sum(val)")} AS total,
       {_DR6.format(x="avg(val)")} AS mean
FROM m GROUP BY l_returnflag, metric ORDER BY l_returnflag, metric
"""


@register("unpivot_metrics", _UNPIVOT_ORACLE)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT (melt) of three measure columns into
    (metric, value) rows, then per-(group, metric) aggregation — the
    inverse of pivot_event_counts and the standard first step of a
    metrics-warehouse normalization.

    Scale: Spark's unpivot is an Expand (each input row emits 3 rows
    in-place, no shuffle); the only exchange is the final hash agg."""
    li = _t(spark, sf_dir, "lineitem")
    m = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return (
        m.groupBy("l_returnflag", "metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.sum("val"), 4).alias("total"),
            dround(F.avg("val"), 6).alias("mean"),
        )
        .orderBy("l_returnflag", "metric")
    )


# ---------------------------------------------------------------------------
# url_query_explode — query-string -> map -> exploded key analytics
# ---------------------------------------------------------------------------

_QS_EXPR_SQL = (
    "'q=' || event_type || '&v=' || CAST(event_id % 7 AS VARCHAR)"
    " || '&u=' || CAST(user_id % 13 AS VARCHAR)"
    " || CASE WHEN event_id % 3 = 0 THEN '&flag=1' ELSE '' END"
)

_URLQ_ORACLE = f"""
WITH kv AS (
  SELECT unnest(string_split({_QS_EXPR_SQL}, '&')) AS pair
  FROM events
)
SELECT split_part(pair, '=', 1) AS key,
       count(*)::BIGINT AS n,
       count(DISTINCT split_part(pair, '=', 2))::BIGINT AS n_values
FROM kv GROUP BY key ORDER BY key
"""


@register("url_query_explode", _URLQ_ORACLE)
def q_url_query_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-string decomposition at scale: build the query string, parse
    it with str_to_map, explode to (key, value) rows, and profile key
    frequency and value cardinality — the URL-analytics step after the
    parser's P9 query_params extraction.

    Scale: str_to_map + explode are per-row narrow ops; the single shuffle
    is the final (tiny, one row per distinct key) hash agg."""
    ev = _t(spark, sf_dir, "events")
    qs = F.concat(
        F.lit("q="), F.col("event_type"),
        F.lit("&v="), (F.col("event_id") % 7).cast("string"),
        F.lit("&u="), (F.col("user_id") % 13).cast("string"),
        F.when(F.col("event_id") % 3 == 0, F.lit("&flag=1")).otherwise(F.lit("")),
    )
    kv = ev.select(F.explode(F.str_to_map(qs, F.lit("&"), F.lit("="))).alias("key", "val"))
    return (
        kv.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col("val")).alias("n_values"),
        )
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# bitmap_distinct_dates — day-of-month bitmap distinct compression
# ---------------------------------------------------------------------------

_BITMAP_ORACLE = """
WITH per_month AS (
  SELECT user_id, date_trunc('month', ts) AS month,
         bit_count(bit_or(1::BIGINT << (extract(day FROM ts)::INT - 1)))::BIGINT
           AS active_days,
         count(DISTINCT date_trunc('day', ts))::BIGINT AS exact_days
  FROM events WHERE user_id < 2000
  GROUP BY user_id, date_trunc('month', ts)
)
SELECT user_id,
       count(*)::BIGINT AS n_months,
       sum(active_days)::BIGINT AS days_active,
       max(active_days)::BIGINT AS max_days_in_month,
       sum(exact_days)::BIGINT AS days_active_exact
FROM per_month GROUP BY user_id ORDER BY user_id
"""


@register("bitmap_distinct_dates", _BITMAP_ORACLE)
def q_bitmap_distinct_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-active-days per user via day-of-month BITMAPS: each month
    folds to one 31-bit mask with bit_or, popcounted with bit_count — the
    roaring-bitmap-style distinct compression warehouses use for activity
    metrics (8 bytes of state per (user, month) instead of a distinct set).
    The exact count_distinct column is emitted alongside to pin the
    equivalence under the same value hash.

    Scale: bit_or is a trivially partial-aggregable long accumulator —
    the whole query is two stacked hash aggs with fixed-width state, vs
    the expanding hash-set state of count(DISTINCT)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 2000)
    # F.shiftleft only takes a literal bit count; the per-row shift needs expr
    day_bit = F.expr("shiftleft(CAST(1 AS BIGINT), day(ts) - 1)")
    per_month = (
        ev.groupBy("user_id", F.date_trunc("month", "ts").alias("month"))
        .agg(
            F.bit_count(F.bit_or(day_bit)).cast("long").alias("active_days"),
            F.count_distinct(F.date_trunc("day", "ts")).alias("exact_days"),
        )
    )
    return (
        per_month.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            F.sum("active_days").cast("long").alias("days_active"),
            F.max("active_days").cast("long").alias("max_days_in_month"),
            F.sum("exact_days").cast("long").alias("days_active_exact"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# skew_salted_join — explicit salt-expanded join, plain-join oracle
# ---------------------------------------------------------------------------

_SALT_JOIN_ORACLE = f"""
SELECT event_type,
       count(*)::BIGINT AS n,
       {_DR4.format(x="sum(value * length(event_type))")} AS weighted_sum
FROM events GROUP BY event_type ORDER BY event_type
"""

_SALT_BUCKETS = 16


@register("skew_salted_join", _SALT_JOIN_ORACLE)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated dimension join: the dim side is replicated across
    {_SALT_BUCKETS} salt buckets and the fact side joins on
    (key, fact_salt), so one hot key's rows spread over {_SALT_BUCKETS}
    tasks instead of one straggler. The oracle is the UNSALTED
    equivalent — salting must change the plan, never the answer.

    Scale: this is the manual form; AQE skew-join handles moderate skew
    automatically, but deterministic pre-salting is the tool when one key
    is orders of magnitude hot (a 100 TB log's top URL). Dim replication
    cost: |dim| x {_SALT_BUCKETS} rows, broadcast."""
    ev = _t(spark, sf_dir, "events")
    dim = (
        ev.select("event_type").distinct()
        .withColumn("weight", F.length("event_type").cast("double"))
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT_BUCKETS - 1))))
    )
    fact = ev.select(
        "event_type", "value", (F.col("event_id") % _SALT_BUCKETS).alias("salt")
    )
    joined = fact.join(F.broadcast(dim), ["event_type", "salt"])
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.sum(F.col("value") * F.col("weight")), 4).alias("weighted_sum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# doc_minhash_containment — exact shingle-set containment on blocked pairs
# ---------------------------------------------------------------------------

_CONTAIN_ORACLE = """
WITH sh AS (
  SELECT doc_id, lang, n_chars // 200 AS bucket,
         list_distinct(list_transform(
           CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 3
             THEN list_transform(
               generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
               i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+2])
             ELSE [] END,
           s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS hashes
  FROM documents WHERE doc_id < 300
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       len(list_intersect(a.hashes, b.hashes))::BIGINT AS n_common,
       CAST(round(CAST(len(list_intersect(a.hashes, b.hashes))
            / greatest(len(a.hashes), 1) AS DECIMAL(28,8)), 6) AS DOUBLE)
         AS containment
FROM sh a JOIN sh b
  ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.hashes, b.hashes)) > 0
ORDER BY doc_a, doc_b
"""


@register("doc_minhash_containment", _CONTAIN_ORACLE)
def q_doc_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set CONTAINMENT (|A∩B| / |A|) for blocked candidate
    pairs — the asymmetric overlap measure dedup uses to catch quote/
    subset relationships that symmetric Jaccard under-scores. Pairs are
    blocked on (lang, length bucket); sets are the same md5 3-gram shingle
    hashes the MinHash stack uses (operators/dedup.py:56).

    Scale: blocked equi-join (never all-pairs); array_intersect on the
    hash arrays is a per-pair in-memory set op. The doc_id cap bounds the
    demo; the production path chains LSH candidates into this verifier."""
    from ..operators.dedup import with_shingle_hashes

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    sh = with_shingle_hashes(docs).join(
        docs.select(
            "doc_id", "lang", (F.col("n_chars").cast("long") / 200).cast("long").alias("bucket")
        ),
        "doc_id",
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.hashes"), F.col("b.hashes")))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.cast("long").alias("n_common"),
            dround(
                inter / F.greatest(F.size(F.col("a.hashes")), F.lit(1)), 6
            ).alias("containment"),
        )
        .filter(F.col("n_common") > 0)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# event_attribution_last_touch — last-touch attribution window
# ---------------------------------------------------------------------------

_ATTR_24H_US = 24 * 3600 * 1_000_000

_ATTR_ORACLE = f"""
WITH t AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS UNBOUNDED PRECEDING) AS last_click_us
  FROM events
)
SELECT user_id % 10 AS cohort,
       count(*)::BIGINT AS n_purchases,
       count(*) FILTER (last_click_us IS NOT NULL
                        AND us - last_click_us <= {_ATTR_24H_US})::BIGINT
         AS n_attributed,
       coalesce(sum(CASE WHEN last_click_us IS NOT NULL
                         AND us - last_click_us <= {_ATTR_24H_US}
                         THEN us - last_click_us END), 0)::BIGINT
         AS total_gap_us
FROM t WHERE event_type = 'purchase'
GROUP BY user_id % 10 ORDER BY cohort
"""


@register("event_attribution_last_touch", _ATTR_ORACLE)
def q_event_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is attributed to the user's
    most recent click within a 24h lookback, computed as a running
    conditional max over the event stream (one window pass — no
    self-join of purchases against clicks). Exact integer-microsecond
    lookback test; deterministic (ts, event_id) ordering.

    Scale: the running-max window carries 8 bytes of state per user and
    rides one hash partitioning; the purchases-x-clicks join it replaces
    is quadratic in hot users."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = ev.select(
        "user_id", "event_id", "event_type", _us("ts").alias("us")
    ).withColumn(
        "last_click_us",
        F.max(F.when(F.col("event_type") == "click", F.col("us"))).over(w),
    )
    attributed = F.col("last_click_us").isNotNull() & (
        (F.col("us") - F.col("last_click_us")) <= _ATTR_24H_US
    )
    gap_us = F.col("us") - F.col("last_click_us")
    return (
        t.filter(F.col("event_type") == "purchase")
        .groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count_if(attributed).alias("n_attributed"),
            # exact integer total gap (see interval_overlap_join note on
            # rounded-average halfway ties)
            F.coalesce(F.sum(F.when(attributed, gap_us)), F.lit(0))
            .cast("long").alias("total_gap_us"),
        )
        .orderBy("cohort")
    )


# ---------------------------------------------------------------------------
# time_spine_gap_fill — hourly spine densification + gap islands
# ---------------------------------------------------------------------------

_SPINE_ORACLE = """
WITH hrs AS (
  SELECT DISTINCT event_type, epoch_us(ts) // 3600000000 AS hr FROM events
),
bounds AS (
  SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM hrs GROUP BY event_type
),
spine AS (
  SELECT b.event_type, unnest(generate_series(b.h0, b.h1)) AS hr FROM bounds b
),
missing AS (
  SELECT s.event_type, s.hr,
         s.hr - row_number() OVER (PARTITION BY s.event_type ORDER BY s.hr) AS island
  FROM spine s LEFT JOIN hrs h ON h.event_type = s.event_type AND h.hr = s.hr
  WHERE h.hr IS NULL
),
islands AS (
  SELECT event_type, island, count(*)::BIGINT AS gap_len
  FROM missing GROUP BY event_type, island
)
SELECT b.event_type,
       (b.h1 - b.h0 + 1)::BIGINT AS n_hours,
       coalesce(sum(i.gap_len), 0)::BIGINT AS n_missing,
       coalesce(max(i.gap_len), 0)::BIGINT AS longest_gap
FROM bounds b LEFT JOIN islands i ON i.event_type = b.event_type
GROUP BY b.event_type, b.h0, b.h1 ORDER BY b.event_type
"""


@register("time_spine_gap_fill", _SPINE_ORACLE)
def q_time_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine densification: generate the full hourly spine per series
    (sequence + explode), anti-match actual activity to find missing
    hours, and measure gap runs with the islands trick (hr - row_number
    is constant within a consecutive run) — the warehouse gap-fill /
    SLA-hole-detection pattern.

    Scale: the spine is O(series x hours) narrow rows generated
    executor-side (no driver loop); islands need one window pass over
    only the MISSING rows. Integer hour indices keep it exact."""
    ev = _t(spark, sf_dir, "events")
    hrs = ev.select(
        "event_type", (_us("ts") / 3_600_000_000).cast("long").alias("hr")
    ).distinct()
    bounds = hrs.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    spine = bounds.select(
        "event_type", "h0", "h1",
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr"),
    )
    missing = (
        spine.join(hrs, ["event_type", "hr"], "left_anti")
        .withColumn(
            "island",
            F.col("hr")
            - F.row_number().over(Window.partitionBy("event_type").orderBy("hr")),
        )
    )
    islands = missing.groupBy("event_type", "island").agg(
        F.count(F.lit(1)).alias("gap_len")
    )
    return (
        bounds.join(islands, "event_type", "left")
        .groupBy("event_type", "h0", "h1")
        .agg(
            F.coalesce(F.sum("gap_len"), F.lit(0)).cast("long").alias("n_missing"),
            F.coalesce(F.max("gap_len"), F.lit(0)).cast("long").alias("longest_gap"),
        )
        .select(
            "event_type",
            (F.col("h1") - F.col("h0") + 1).cast("long").alias("n_hours"),
            "n_missing",
            "longest_gap",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ua_family_counts — vendored UA classifier under the driver gate
# ---------------------------------------------------------------------------

# 12 canonical UA strings (subset of tests/test_useragent.py goldens) keyed
# by event_id % 12; the oracle states the EXPECTED families directly, so the
# driver gate independently pins the vendored uap-core-style rule table —
# including one $1-template rule (YandexImages).
_UA_VARIANTS = [
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/137.0.0.0 Safari/537.36", "Chrome", "Windows"),
    ("Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",
     "Firefox", "Linux"),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
     "(KHTML, like Gecko) Version/17.0 Safari/605.1.15", "Safari", "Mac OS X"),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91", "Edge", "Windows"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 "
     "(KHTML, like Gecko) Version/17.0 Mobile/15E148 Safari/604.1",
     "Mobile Safari", "iOS"),
    ("Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/120.0.6099.144 Mobile Safari/537.36", "Chrome Mobile", "Android"),
    ("Mozilla/5.0 (Linux; Android 14; SM-S918B) AppleWebKit/537.36 (KHTML, like Gecko) "
     "SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36",
     "Samsung Internet", "Android"),
    ("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
     "Googlebot", "Unknown"),
    ("curl/8.4.0", "curl", "Unknown"),
    ("python-requests/2.31.0", "Python Requests", "Unknown"),
    ("Mozilla/5.0 (compatible; YandexImages/3.0; +http://yandex.com/bots)",
     "YandexImages", "Unknown"),
    ("Mozilla/5.0 (Linux; Android 14; Pixel 8; wv) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Version/4.0 Chrome/120.0.6099.144 Mobile Safari/537.36",
     "Chrome Mobile WebView", "Android"),
]

_UA_ORACLE = (
    "WITH fam AS (SELECT CASE event_id % 12\n"
    + "\n".join(
        f"  WHEN {i} THEN '{b}'" for i, (_, b, _o) in enumerate(_UA_VARIANTS)
    )
    + "\n END AS browser_family, CASE event_id % 12\n"
    + "\n".join(
        f"  WHEN {i} THEN '{o}'" for i, (_, _b, o) in enumerate(_UA_VARIANTS)
    )
    + "\n END AS os_family FROM events)\n"
    "SELECT browser_family, os_family, count(*)::BIGINT AS n\n"
    "FROM fam GROUP BY browser_family, os_family\n"
    "ORDER BY browser_family, os_family"
)


@register("ua_family_counts", _UA_ORACLE)
def q_ua_family_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UA-family traffic profile: synthesize a 12-variant UA population
    (browsers, mobile/webview variants, crawlers, tooling) keyed by
    event_id, classify it with the REAL vendored uap-core-style rule
    table (functions/useragent.py — including the $1 family_replacement
    path), and count by (browser, os). The oracle states the expected
    families literally, so any rule-table drift breaks the hash.

    Scale: the classifier is a pure-Column CASE chain in whole-stage
    codegen with the non-browser pre-gate; one hash agg on a
    12-value key space."""
    # spread the single-partition events scan before the rule-chain
    # projection (same reason as top_ngrams_per_lang; measured 4.8s -> ~1s)
    ev = _t(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    ua = F.element_at(
        F.array(*[F.lit(u) for u, _b, _o in _UA_VARIANTS]),
        (F.col("event_id") % 12).cast("int") + 1,
    )
    return (
        ev.select(
            ua_browser_family(ua).alias("browser_family"),
            ua_os_family(ua).alias("os_family"),
        )
        .groupBy("browser_family", "os_family")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("browser_family", "os_family")
    )


# ---------------------------------------------------------------------------
# freq_items_battery — exact heavy hitters over two key spaces
# ---------------------------------------------------------------------------

_FREQ_ORACLE = f"""
WITH a AS (
  SELECT 'event_type' AS col, event_type AS item, count(*)::BIGINT AS cnt,
         sum(count(*)) OVER () AS total
  FROM events GROUP BY event_type
),
b AS (
  SELECT 'user_bucket' AS col, CAST(user_id % 100 AS VARCHAR) AS item,
         count(*)::BIGINT AS cnt, sum(count(*)) OVER () AS total
  FROM events GROUP BY user_id % 100
),
u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
SELECT col, item, cnt, {_DR6.format(x="cnt / total")} AS share
FROM u WHERE cnt > total / 20.0 ORDER BY col, item
"""


@register("freq_items_battery", _FREQ_ORACLE)
def q_freq_items_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (support > 1/20) over two key spaces in one
    result — the exact-count oracle form of frequent-item sketching
    (Misra-Gries / spaceSaving give the same answer with bounded state;
    this exact form is the verifier). The total enters via a window sum
    over the grouped frame, not a driver collect.

    Scale: each branch is one hash agg whose state is the DISTINCT key
    population (5 and 100 here); the window-total pass runs over the
    grouped (tiny) frame. For open-ended key spaces the sketch replaces
    the exact agg; the support filter is identical."""
    ev = _t(spark, sf_dir, "events")

    def branch(col_label: str, key: F.Column) -> DataFrame:
        g = ev.groupBy(key.alias("item")).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.partitionBy()
        return g.select(
            F.lit(col_label).alias("col"),
            F.col("item").cast("string").alias("item"),
            F.col("cnt"),
            F.sum("cnt").over(w).alias("total"),
        )

    u = branch("event_type", F.col("event_type")).unionByName(
        branch("user_bucket", F.col("user_id") % 100)
    )
    return (
        u.filter(F.col("cnt") > F.col("total") / 20.0)
        .select(
            "col", "item", "cnt", dround(F.col("cnt") / F.col("total"), 6).alias("share")
        )
        .orderBy("col", "item")
    )


# ---------------------------------------------------------------------------
# Next-window queue (positions 51+ this round): five more operators, locally
# oracle-verified now, rotated into the checked window next round.
# ---------------------------------------------------------------------------

_STRAGG_ORACLE = """
SELECT l_returnflag,
       string_agg(DISTINCT l_linestatus, '|' ORDER BY l_linestatus) AS statuses,
       count(DISTINCT l_linestatus)::BIGINT AS n_statuses
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("string_agg_sorted", _STRAGG_ORACLE)
def q_string_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string aggregation: DISTINCT values, sorted, joined —
    the LISTAGG/GROUP_CONCAT warehouse primitive in its only
    oracle-comparable form (collect_list order is partition-dependent;
    sort-then-join is what makes it stable).

    Scale: state per group is the distinct-value set (bounded by the value
    vocabulary, 2 here), one hash agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.array_sort(F.collect_set("l_linestatus")).alias("_s"))
        .select(
            "l_returnflag",
            F.array_join("_s", "|").alias("statuses"),
            F.size("_s").cast("long").alias("n_statuses"),
        )
        .orderBy("l_returnflag")
    )


_MAD_ORACLE = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m ON e.event_type = m.event_type
)
SELECT event_type,
       count(*)::BIGINT AS n,
       {_DR6.format(x="max(med)")} AS median_value,
       {_DR6.format(x="quantile_cont(adev, 0.5)")} AS mad,
       count(*) FILTER (adev > 3 * (SELECT quantile_cont(d2.adev, 0.5) FROM dev d2
                                    WHERE d2.event_type = dev.event_type))::BIGINT
         AS n_outliers_3mad
FROM dev GROUP BY event_type ORDER BY event_type
"""


@register("mad_robust_stats", _MAD_ORACLE)
def q_mad_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group + 3-MAD outlier counts — the
    robust spread/outlier screen that survives heavy tails where stddev
    (value_outliers_z) is dragged by the outliers it is hunting.

    Scale: two exact-percentile passes (median, then median of absolute
    deviations) over the same hash partitioning, with the tiny per-group
    median frames broadcast back between them."""
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_raw")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.max("med"), 6).alias("median_value"),
            dround(F.max("mad_raw"), 6).alias("mad"),
            F.count_if(F.col("adev") > 3 * F.col("mad_raw")).alias("n_outliers_3mad"),
        )
        .orderBy("event_type")
    )


_RUNDIST_ORACLE = """
WITH first_seen AS (
  SELECT user_id, min(epoch_us(ts) // 86400000000) AS day0
  FROM events GROUP BY user_id
),
per_day AS (
  SELECT day0 AS day, count(*)::BIGINT AS new_users FROM first_seen GROUP BY day0
)
SELECT day,
       new_users,
       sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)::BIGINT
         AS cum_distinct_users
FROM per_day ORDER BY day
"""


@register("running_distinct_users", _RUNDIST_ORACLE)
def q_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day via the FIRST-SEEN trick: a
    running count(DISTINCT) window is non-partial-aggregable, but
    min(day) per user -> count per day -> running sum computes the same
    curve with two cheap hash aggs and one tiny window — the standard
    growth-accounting rewrite.

    Scale: distinct-user state appears once (the first agg); the running
    sum runs over the per-day frame (O(days) rows), not the event
    stream."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        (F.min(_us("ts")) / F.lit(86_400_000_000)).cast("long").alias("day0")
    )
    per_day = first_seen.groupBy(F.col("day0").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per_day.select(
            "day",
            "new_users",
            F.sum("new_users").over(w).cast("long").alias("cum_distinct_users"),
        )
        .orderBy("day")
    )


_REGR_ORACLE = f"""
WITH t AS (
  SELECT event_type, value, (epoch_us(ts) // 86400000000)::DOUBLE AS x_day
  FROM events
)
SELECT event_type,
       count(*)::BIGINT AS n,
       {_DR6.format(x="regr_slope(value, x_day)")} AS slope,
       {_DR6.format(x="regr_intercept(value, x_day)")} AS intercept,
       {_DR6.format(x="regr_r2(value, x_day)")} AS r2
FROM t GROUP BY event_type ORDER BY event_type
"""


@register("regression_battery", _REGR_ORACLE)
def q_regression_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend via the SQL regression aggregates
    (regr_slope/intercept/r2) — single-pass moment accumulation, the
    declarative form of per_key_trend's hand-built OLS. Integer epoch-DAY
    x keeps magnitudes small so the 1e-6 snap dominates accumulation
    noise (same discipline as stats_moments_battery).

    Scale: one partial+final hash agg carrying fixed-size moment
    tuples."""
    ev = _t(spark, sf_dir, "events")
    x_day = (_us(F.col("ts")) / F.lit(86_400_000_000)).cast("long").cast("double")
    return (
        ev.select("event_type", "value", x_day.alias("x_day"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.regr_slope("value", "x_day"), 6).alias("slope"),
            dround(F.regr_intercept("value", "x_day"), 6).alias("intercept"),
            dround(F.regr_r2("value", "x_day"), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


_DATEFN_ORACLE = """
SELECT extract(quarter FROM o_orderdate)::BIGINT AS q,
       extract(month FROM o_orderdate)::BIGINT AS m,
       count(*)::BIGINT AS n_orders,
       count(DISTINCT CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR))::BIGINT
         AS n_month_ends,
       min(extract(isodow FROM o_orderdate))::BIGINT AS min_isodow,
       max(extract(week FROM o_orderdate))::BIGINT AS max_isoweek
FROM orders
GROUP BY extract(quarter FROM o_orderdate), extract(month FROM o_orderdate)
ORDER BY q, m
"""


@register("date_function_battery", _DATEFN_ORACLE)
def q_date_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function battery over order dates: quarter/month rollup
    with last_day, ISO day-of-week, and ISO week — the date-dimension
    derivations a warehouse computes inline instead of joining a calendar
    table. ISO variants are chosen deliberately: Spark's weekday()+1 and
    weekofyear() match DuckDB's isodow and week, while dayofweek()/
    DuckDB dow disagree on Sunday (driver-contract gotcha, verify
    SKILL.md).

    Scale: pure Column derivations + one hash agg."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.quarter("o_orderdate").cast("long").alias("q"),
            F.month("o_orderdate").cast("long").alias("m"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct(
                F.last_day(F.col("o_orderdate")).cast("string")
            ).alias("n_month_ends"),
            F.min(F.weekday("o_orderdate") + 1).cast("long").alias("min_isodow"),
            F.max(F.weekofyear("o_orderdate")).cast("long").alias("max_isoweek"),
        )
        .orderBy("q", "m")
    )


_UNIGRAM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
freq AS (
  SELECT tok, count(*)::DOUBLE AS c, sum(count(*)) OVER ()::DOUBLE AS total
  FROM tok GROUP BY tok
),
scored AS (
  SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
         sum(ln(f.c / f.total)) / count(*) AS avg_logp
  FROM tok t JOIN freq f ON t.tok = f.tok
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       {_DR6.format(x="avg_logp")} AS avg_logp,
       (CASE WHEN avg_logp < -9.0 THEN 1 ELSE 0 END)::BIGINT AS flag_unusual
FROM scored WHERE doc_id < 500 ORDER BY doc_id
"""


@register("unigram_logprob_score", _UNIGRAM_ORACLE)
def q_unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution — the KenLM-proxy fluency/quality score corpus
    curation uses to flag gibberish and boilerplate-stuffed documents
    (very negative = dominated by rare tokens).

    Scale: vocab frequencies are one explode + hash agg (state = vocab
    size); the per-token probability join hashes on the token (or
    broadcasts when the vocab fits); the per-doc mean is a second hash
    agg. No per-doc vocabulary state, no cross join. Float discipline:
    ln() of identical doubles on both engines, snapped at 1e-6 — same
    contract as tfidf_top_terms."""
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    # corpus token total as a broadcast 1-row frame: a global window here
    # would force the whole VOCABULARY into one partition (vocab grows with
    # the corpus — flagged by tools/plan_lint.py)
    counts = tok.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("c"))
    total = counts.groupBy().agg(F.sum("c").alias("total"))
    freq = counts.crossJoin(F.broadcast(total))
    scored = (
        tok.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum(F.log(F.col("c") / F.col("total"))) / F.count(F.lit(1))).alias("avg_logp"),
        )
    )
    return (
        scored.filter(F.col("doc_id") < 500)
        .select(
            "doc_id",
            "n_tokens",
            dround(F.col("avg_logp"), 6).alias("avg_logp"),
            F.when(F.col("avg_logp") < -9.0, 1).otherwise(0).cast("long").alias("flag_unusual"),
        )
        .orderBy("doc_id")
    )
