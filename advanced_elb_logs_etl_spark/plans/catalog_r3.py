"""Round-3 catalog wave: adapted TPC-H analytics (Q4/Q10/Q12/Q14/Q16/Q17 on
the available columns), a window-function battery (lead gaps, first/last,
ntile, percent_rank/cume_dist), statistics aggregates (moments, arg-min/max,
mode, histogram), grouping sets, and text/array operators (language-ID
confusion, BPE token counts, blocked Levenshtein pairs, run-length dedup,
tumbling windows, sorted collect_set, zip_with cosine).

Same contract as plans.catalog: every Spark query has a DuckDB oracle twin
computing byte-identical values (integer time math via epoch-microseconds,
DECIMAL-snapped floats via functions.scalars.dround, deterministic
tiebreaks on every ordering). Scale notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import dround
from ..operators import similarity, text
from .catalog import _t, _us, register
from .catalog_llm import _cos, _lang_sql, _TOKS

_DR6 = "CAST(round(CAST({x} AS DECIMAL(28,8)), 6) AS DOUBLE)"
_DR4 = "CAST(round(CAST({x} AS DECIMAL(28,8)), 4) AS DOUBLE)"
_DR2 = "CAST(round(CAST({x} AS DECIMAL(28,8)), 2) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Adapted TPC-H: Q4 — order-priority count with EXISTS semi join
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1995-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("order_priority_q4", _Q4_ORACLE)
def q_order_priority_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted to this schema (no commit/receipt dates): orders in
    a 6-month window having at least one lineitem shipped >60 days after
    the order date, counted by priority.

    Scale: LEFT SEMI join — the non-equi ship-late predicate rides on the
    equi orderkey join, so this stays a hash semi join (no NL join); the
    date filter prunes the probe side before the exchange, and the agg is a
    5-row hash agg."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Adapted TPC-H: Q14 — promo revenue share per ship-month
# ---------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
       {_DR4.format(x='''100.0 * sum(CASE WHEN p_type = 'PROMO'
             THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
           / sum(l_extendedprice * (1 - l_discount))''')} AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1 ORDER BY 1
"""


@register("promo_revenue_q14", _Q14_ORACLE)
def q_promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 adapted (p_type is a single word here): monthly % of
    revenue from PROMO parts over one year.

    Scale: part is dimension-shaped -> broadcast onto the lineitem scan
    (no lineitem shuffle until the 12-row month agg); the conditional sum
    is one pass, map-side combinable."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            dround(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
        .orderBy("ship_month")
    )


# ---------------------------------------------------------------------------
# Adapted TPC-H: Q12 — late-line share by linestatus x priority class
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
         AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@register("linestatus_priority_q12", _Q12_ORACLE)
def q_linestatus_priority_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no shipmode column — linestatus plays the grouping
    role): very-late lines (shipped >=90 days after ordering) split into
    high/low order-priority counts.

    Scale: the one real join in the query shuffles both fact sides on
    orderkey (orders is not broadcastable at 100 TB); the late filter is
    join-conditional so it evaluates during the join, and the output agg is
    2 rows. Conditional counts are single-pass count_if."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Adapted TPC-H: Q16 — supplier counts per part attribute group
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("parts_supplier_q16", _Q16_ORACLE)
def q_parts_supplier_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (lineitem stands in for partsupp): distinct
    supplier count per (brand, type, size) for selected sizes, one brand
    excluded.

    Scale: part broadcasts onto lineitem with the brand/size filters pushed
    into the part scan; count(DISTINCT suppkey) plans the standard
    two-phase distinct agg keyed by the group — no Expand (single distinct
    column)."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Adapted TPC-H: Q10 — top-20 customers by returned revenue
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name,
       {_DR2.format(x='sum(l_extendedprice * (1 - l_discount))')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("returned_item_q10", _Q10_ORACLE)
def q_returned_item_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers ranked by revenue lost to returns, top 20 with
    their nation.

    Scale: returnflag filter prunes lineitem in-scan; orderkey join is the
    one big exchange; customer and nation broadcast. The top-20 runs as
    TakeOrderedAndProject (no global sort), deterministic via the custkey
    tiebreak. Revenue is DECIMAL-snapped BEFORE ordering so the boundary
    row matches the oracle."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Adapted TPC-H: Q17 — small-quantity revenue vs per-part average
# ---------------------------------------------------------------------------

_Q17_ORACLE = f"""
SELECT {_DR2.format(x='coalesce(sum(l_extendedprice), 0.0) / 7.0')} AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
  FROM lineitem GROUP BY l_partkey
) a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND l.l_quantity < a.half_avg_qty
"""


@register("small_quantity_revenue_q17", _Q17_ORACLE)
def q_small_quantity_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (threshold 0.5x to suit this data's quantity range):
    revenue of below-half-average-quantity lines for one brand, scaled to a
    yearly figure.

    Scale: the correlated scalar subquery is decorrelated by hand into a
    per-part aggregate joined back on partkey — the same rewrite Catalyst
    would produce, but explicit. Both lineitem passes shuffle on partkey;
    AQE can reuse the exchange. part broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_q = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(avg_q, li["l_partkey"] == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            dround(
                F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)) / F.lit(7.0), 2
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Window battery: lead gaps
# ---------------------------------------------------------------------------

_LEAD_ORACLE = """
SELECT event_id, user_id,
       epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - epoch_us(ts)
         AS next_gap_us
FROM events
"""


@register("window_lead_gap", _LEAD_ORACLE)
def q_window_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead() twin of the sessionize lag pattern: microseconds until each
    user's NEXT event (null for their last) — the forward-looking gap used
    for churn/abandonment features.

    Scale: one window = one hash partition by user_id + in-partition sort;
    integer epoch-microsecond math end to end; event_id tiebreak makes
    colliding timestamps deterministic."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (_us(F.lead("ts").over(w)) - _us(F.col("ts"))).alias("next_gap_us"),
    )


# ---------------------------------------------------------------------------
# Window battery: per-key first/last
# ---------------------------------------------------------------------------

_FIRST_LAST_ORACLE = """
WITH r AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_z
  FROM events
)
SELECT user_id,
       min(CASE WHEN rn_a = 1 THEN event_type END) AS first_event_type,
       min(CASE WHEN rn_z = 1 THEN event_type END) AS last_event_type,
       min(epoch_us(ts))::BIGINT AS first_ts_us,
       max(epoch_us(ts))::BIGINT AS last_ts_us,
       count(*)::BIGINT AS n_events
FROM r GROUP BY user_id ORDER BY user_id
"""


@register("first_last_by_key", _FIRST_LAST_ORACLE)
def q_first_last_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user first/last event type + first/last timestamp + count — the
    entry/exit-page primitive.

    Scale: expressed as min_by/max_by over a (ts, event_id) struct key, so
    it is ONE hash aggregation (map-side combinable) — not a window sort
    followed by a distinct, which is the naive two-shuffle formulation. The
    oracle uses the row_number form; results are identical because the
    struct order equals the (ts, event_id) sort order."""
    ev = _t(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.min_by(F.col("event_type"), key).alias("first_event_type"),
            F.max_by(F.col("event_type"), key).alias("last_event_type"),
            F.min(_us(F.col("ts"))).alias("first_ts_us"),
            F.max(_us(F.col("ts"))).alias("last_ts_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Window battery: ntile deciles
# ---------------------------------------------------------------------------

_NTILE_ORACLE = f"""
WITH t AS (
  SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS decile
  FROM events WHERE event_type = 'purchase'
)
SELECT decile::BIGINT AS decile, count(*)::BIGINT AS cnt,
       {_DR6.format(x='min(value)')} AS min_value,
       {_DR6.format(x='max(value)')} AS max_value
FROM t GROUP BY decile ORDER BY decile
"""


@register("ntile_latency_buckets", _NTILE_ORACLE)
def q_ntile_latency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth deciles of purchase values via ntile(10): bucket
    boundaries + counts — the quantile-bucketing primitive.

    Scale: since round 4b this uses operators/stats.py scalable_ntile
    (range-partitioned two-phase rank + the exact SQL ntile bucket
    formula) instead of the single-task `ntile OVER (ORDER BY ...)` the
    oracle writes — identical output, no global sort into one task.
    Deterministic via the event_id tiebreak.  pin="defer" (r7): the
    correctness persist stays, but the eager checkpoint JOB moves out of
    the query (the bench/test harness releases the parked cache after
    the action — VERDICT r6 item 4a; the pinned-vs-deferred value
    equality is pinned in tests/test_stats_setsim.py)."""
    from ..operators import stats

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        stats.scalable_ntile(ev, ["value", "event_id"], 10, "decile", pin="defer")
        .select("value", "decile")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dround(F.min("value"), 6).alias("min_value"),
            dround(F.max("value"), 6).alias("max_value"),
        )
        .withColumn("decile", F.col("decile").cast("long"))
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Window battery: percent_rank / cume_dist / dense_rank
# ---------------------------------------------------------------------------

_RANK_ORACLE = f"""
SELECT event_id, event_type,
       {_DR6.format(x='percent_rank() OVER w')} AS pct_rank,
       {_DR6.format(x='cume_dist() OVER w')} AS cume,
       dense_rank() OVER w AS dense_rk
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""


@register("rank_battery", _RANK_ORACLE)
def q_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function battery per event type: percent_rank, cume_dist,
    dense_rank over (value, event_id) — the remaining SQL rank family in
    one pass.

    Scale: all three share ONE window spec -> one Exchange+Sort; the
    user_id filter bounds the demo output, not the plan shape."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        dround(F.percent_rank().over(w), 6).alias("pct_rank"),
        dround(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).cast("long").alias("dense_rk"),
    )


# ---------------------------------------------------------------------------
# Statistics: moment battery
# ---------------------------------------------------------------------------

_MOMENTS_ORACLE = f"""
WITH t AS (
  SELECT event_type, value,
         CAST(epoch_us(ts) // 86400000000 AS DOUBLE) AS x_day
  FROM events
)
SELECT event_type,
       count(*)::BIGINT AS n,
       {_DR6.format(x='avg(value)')} AS mean_v,
       {_DR6.format(x='stddev_samp(value)')} AS sd_v,
       {_DR6.format(x='var_pop(value)')} AS var_v,
       {_DR6.format(x='corr(value, x_day)')} AS corr_vd,
       {_DR6.format(x='covar_samp(value, x_day)')} AS covar_vd
FROM t GROUP BY event_type ORDER BY event_type
"""


@register("stats_moments_battery", _MOMENTS_ORACLE)
def q_stats_moments_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per event type: stddev, variance,
    correlation and covariance of value against event day.

    Scale: one partial+final hash agg; the shuffle carries moment tuples
    only. The x axis is integer epoch-DAYS (not microseconds) so covariance
    magnitudes stay ~1e2 and the 1e-6 DECIMAL snap dominates partition-
    order accumulation noise by many orders."""
    ev = _t(spark, sf_dir, "events")
    x_day = (_us(F.col("ts")) / F.lit(86_400_000_000)).cast("long").cast("double")
    return (
        ev.select("event_type", "value", x_day.alias("x_day"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.avg("value"), 6).alias("mean_v"),
            dround(F.stddev_samp("value"), 6).alias("sd_v"),
            dround(F.var_pop("value"), 6).alias("var_v"),
            dround(F.corr("value", "x_day"), 6).alias("corr_vd"),
            dround(F.covar_samp("value", "x_day"), 6).alias("covar_vd"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Statistics: deterministic arg-min / arg-max
# ---------------------------------------------------------------------------

_ARG_ORACLE = f"""
WITH r AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn_min,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rn_max
  FROM events
)
SELECT event_type,
       min(CASE WHEN rn_min = 1 THEN event_id END) AS argmin_event_id,
       min(CASE WHEN rn_max = 1 THEN event_id END) AS argmax_event_id,
       {_DR6.format(x='min(value)')} AS min_value,
       {_DR6.format(x='max(value)')} AS max_value
FROM r GROUP BY event_type ORDER BY event_type
"""


@register("min_max_by_battery", _ARG_ORACLE)
def q_min_max_by_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic arg-min/arg-max per event type: WHICH event had the
    extreme value, with a (value, event_id) struct key so duplicate values
    can't make the answer run-dependent (events.value has ~34% duplicates
    at sf0.01 — bare min_by would be a lottery there).

    Scale: min_by/max_by over a struct is still ONE hash aggregation; the
    oracle's row_number formulation needs a window sort — the agg form is
    the one that survives 100 TB."""
    ev = _t(spark, sf_dir, "events")
    key = F.struct(F.col("value"), F.col("event_id"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.min_by(F.col("event_id"), key).alias("argmin_event_id"),
            F.max_by(F.col("event_id"), key).alias("argmax_event_id"),
            dround(F.min("value"), 6).alias("min_value"),
            dround(F.max("value"), 6).alias("max_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Statistics: deterministic mode
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
WITH c AS (
  SELECT source, lang, count(*)::BIGINT AS cnt FROM documents GROUP BY source, lang
),
r AS (
  SELECT source, lang, cnt,
         row_number() OVER (PARTITION BY source ORDER BY cnt DESC, lang) AS rn
  FROM c
)
SELECT source, lang AS modal_lang, cnt AS modal_cnt FROM r WHERE rn = 1 ORDER BY source
"""


@register("mode_per_group", _MODE_ORACLE)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent language per source
    (ties broken by language code — built-in mode() leaves ties
    implementation-defined in both engines, so neither side uses it).

    Scale: count agg keyed (source, lang), then a max_by struct agg keyed
    source — two shuffles, both on aggregated (small) data; no window
    sort."""
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    # max_by over (cnt, reversed-lang) == order by cnt desc, lang asc.
    # Reversal trick avoided: use min_by over (-cnt, lang) — integer negate
    # keeps the struct orderable with the lang ASC tiebreak.
    key = F.struct((-F.col("cnt")).alias("neg"), F.col("lang"))
    return (
        counts.groupBy("source")
        .agg(
            F.min_by(F.col("lang"), key).alias("modal_lang"),
            F.min_by(F.col("cnt"), key).alias("modal_cnt"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Statistics: fixed-width histogram
# ---------------------------------------------------------------------------

_HIST_ORACLE = f"""
WITH b AS (
  SELECT least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bin, value
  FROM events
)
SELECT bin,
       CAST(bin * 50.0 AS DOUBLE) AS bin_lo,
       count(*)::BIGINT AS cnt,
       {_DR6.format(x='avg(value)')} AS mean_in_bin
FROM b GROUP BY bin ORDER BY bin
"""


@register("histogram_latency", _HIST_ORACLE)
def q_histogram_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values: 50-unit bins, top bin open
    (width_bucket semantics without the builtin, so both engines share the
    exact integer floor arithmetic).

    Scale: binning is a pure projection; the agg output is <= 10 rows.
    This is the O(1)-memory histogram — contrast ntile deciles, which need
    a global sort."""
    ev = _t(spark, sf_dir, "events")
    bin_ = F.least(F.floor(F.col("value") / F.lit(50.0)).cast("long"), F.lit(9))
    return (
        ev.select(bin_.alias("bin"), "value")
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"), dround(F.avg("value"), 6).alias("mean_in_bin"))
        .select("bin", (F.col("bin") * F.lit(50.0)).alias("bin_lo"), "cnt", "mean_in_bin")
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Grouping sets (beyond rollup/cube)
# ---------------------------------------------------------------------------

_GSETS_ORACLE = f"""
WITH e AS (
  -- DuckDB dayofweek is 0=Sunday; Spark's is 1=Sunday — align to Spark's
  SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, value FROM events
)
SELECT event_type, dow,
       GROUPING(event_type)::BIGINT AS g_type, GROUPING(dow)::BIGINT AS g_dow,
       count(*)::BIGINT AS cnt, {_DR2.format(x='sum(value)')} AS sum_value
FROM e
GROUP BY GROUPING SETS ((event_type), (dow), ())
ORDER BY g_type, g_dow, event_type, dow
"""


@register("grouping_sets_events", _GSETS_ORACLE)
def q_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((event_type), (dow), ()) — two disjoint
    single-column breakdowns plus the grand total in ONE pass; not
    expressible as a single rollup or cube (those add the cross term).

    Scale: one Expand (3 lanes) + one hash agg — same shape Spark plans
    for rollup_pricing; the GROUPING() flags disambiguate a NULL group key
    from the all-rows lane. Uses the native DataFrame.groupingSets API —
    no temp-view side effect on the shared session catalog."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.dayofweek("ts").cast("long").alias("dow"),
        "value",
    )
    return (
        ev.groupingSets(
            [[F.col("event_type")], [F.col("dow")], []],
            F.col("event_type"),
            F.col("dow"),
        )
        .agg(
            F.grouping("event_type").cast("bigint").alias("g_type"),
            F.grouping("dow").cast("bigint").alias("g_dow"),
            F.count(F.lit(1)).alias("cnt"),
            dround(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("g_type", "g_dow", "event_type", "dow")
    )


# ---------------------------------------------------------------------------
# Text: language-ID confusion matrix
# ---------------------------------------------------------------------------

_LANGID_ORACLE = f"""
WITH toks_t AS (
  SELECT lang, {_TOKS} AS toks FROM documents
),
pred AS (
  SELECT lang, {_lang_sql()} AS lang_pred FROM toks_t
)
SELECT lang, lang_pred, count(*)::BIGINT AS cnt
FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred
"""


@register("language_id_heuristic", _LANGID_ORACLE)
def q_language_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-based language-ID confusion matrix: labeled lang x predicted
    lang counts — the eval view of the lang_id heuristic (text_stats emits
    the per-doc prediction; this is its accuracy rollup).

    Scale: pure-Column scoring (array_intersect on the distinct token set,
    no UDF) + one small hash agg."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", text.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("lang", "lang_pred")
    )


# ---------------------------------------------------------------------------
# Text: BPE-ish token accounting per source
# ---------------------------------------------------------------------------

_BPE_ORACLE = f"""
WITH d AS (
  SELECT source,
         len({_TOKS})::BIGINT AS n_tok,
         len(regexp_extract_all(text, '{text.BPE_ISH_PATTERN}'))::BIGINT AS n_wp
  FROM documents
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(n_tok)::BIGINT AS total_tokens,
       sum(n_wp)::BIGINT AS total_wordpieces,
       {_DR4.format(x='avg(n_wp)')} AS mean_wordpieces
FROM d GROUP BY source ORDER BY source
"""


@register("token_bpe_counts", _BPE_ORACLE)
def q_token_bpe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget accounting per source: whitespace tokens and BPE-ish
    wordpieces (letter runs / digit runs / single symbols) — the "how many
    training tokens does this corpus buy" rollup.

    Scale: regex counting is JVM codegen in the scan projection; the agg
    output is one row per source."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            text.token_count(F.col("text")).alias("n_tok"),
            text.bpe_ish_token_count(F.col("text")).alias("n_wp"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_wp").alias("total_wordpieces"),
            dround(F.avg("n_wp"), 4).alias("mean_wordpieces"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Text: blocked Levenshtein near-match pairs
# ---------------------------------------------------------------------------

_LEV_ORACLE = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40))::BIGINT AS lev40
FROM documents a JOIN documents b
  ON a.source = b.source AND a.n_chars // 50 = b.n_chars // 50 AND a.doc_id < b.doc_id
WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 24
ORDER BY id_a, id_b
"""


@register("levenshtein_block_pairs", _LEV_ORACLE)
def q_levenshtein_block_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-match pairs on 40-char prefixes, BLOCKED by
    (source, 50-char length bucket) so the self-join is an equi-join on a
    compound blocking key — the string-similarity-join pattern: block
    cheaply, verify the expensive metric inside blocks only.

    Blocking is the scalability knob and an explicit recall trade: near
    matches across distant length buckets are outside this demo's recall
    contract (real corpora would block on MinHash bands instead —
    minhash_lsh_neardup is that operator). Measured: source-only blocking
    left 2500-doc blocks at sf0.1 (62M candidate pairs, 36 s); the length
    bucket cuts candidates 1000x to 61k (sub-second) with the identical
    verify step. Candidate count is sum over blocks of |block|^2 — never
    all-pairs, never cartesian (plan-pinned); levenshtein is JVM built-in
    (no UDF), 40-char prefixes cap the DP cost per pair.

    Since round 5 this delegates to operators/dedup.levenshtein_blocked_pairs,
    which carries the AUTOMATIC density guard: a block whose pair count
    exceeds the 5M budget gets a first-token sub-band (the SCALE.md
    compound-key mitigation, now engaged by estimate instead of manually).
    At driver scale factors no block approaches the budget, so the oracle
    stays value-exact; the engaged path is pinned by the planted-density
    stress test in tests/test_llm_ops.py."""
    from ..operators.dedup import levenshtein_blocked_pairs

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        "source",
        F.floor(F.col("n_chars") / F.lit(50)).alias("len_bucket"),
    )
    return (
        levenshtein_blocked_pairs(
            d,
            block_cols=["source", "len_bucket"],
            prefix_len=40,
            max_distance=24,
        )
        .withColumnRenamed("lev_prefix", "lev40")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Events: run-length encoding of consecutive duplicates
# ---------------------------------------------------------------------------

_RUNS_ORACLE = """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS new_run
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, event_type,
         sum(new_run) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
  FROM marked
),
per_run AS (
  SELECT user_id, run_id, count(*)::BIGINT AS run_len FROM runs GROUP BY user_id, run_id
)
SELECT user_id,
       sum(run_len)::BIGINT AS n_events,
       count(*)::BIGINT AS n_runs,
       max(run_len)::BIGINT AS max_run_len
FROM per_run GROUP BY user_id ORDER BY user_id
"""


@register("sequential_dedup_runs", _RUNS_ORACLE)
def q_sequential_dedup_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length view of each user's event stream: consecutive repeats of
    the same event type collapse into runs (the keep-first-of-run dedup
    primitive for double-fire/bot-burst cleanup); reports per-user event,
    run, and longest-run counts.

    Scale: lag + running sum share ONE (user_id, ts, event_id)
    Exchange+Sort; the two downstream aggs run on already-partitioned
    keys. Same single-shuffle discipline as sessionize (W1-W5)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_run = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    runs = ev.select(
        "user_id",
        new_run.alias("new_run"),
        F.sum(new_run).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("run_id"),
    )
    per_run = runs.groupBy("user_id", "run_id").agg(F.count(F.lit(1)).alias("run_len"))
    return (
        per_run.groupBy("user_id")
        .agg(
            F.sum("run_len").alias("n_events"),
            F.count(F.lit(1)).alias("n_runs"),
            F.max("run_len").alias("max_run_len"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Events: tumbling-window aggregation (batch twin of streaming windows)
# ---------------------------------------------------------------------------

_TUMBLE_ORACLE = f"""
SELECT user_id,
       (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
       count(*)::BIGINT AS n_events,
       {_DR4.format(x='sum(value)')} AS sum_value
FROM events
GROUP BY user_id, (epoch_us(ts) // 3600000000) * 3600000000
ORDER BY user_id, window_start_us
"""


@register("tumbling_window_agg", _TUMBLE_ORACLE)
def q_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly tumbling windows as integer epoch-bucket math — the
    batch twin of streaming's window(ts, '1 hour') group (streaming/ has
    the readStream form; this one is oracle-checkable).

    Scale: bucketing is a projection; ONE hash agg on (user, bucket). The
    integer floor-divide keeps window boundaries bit-identical across
    engines (no timezone/timestamp-truncation semantics in play)."""
    ev = _t(spark, sf_dir, "events")
    bucket = (_us(F.col("ts")) / F.lit(3_600_000_000)).cast("long") * F.lit(
        3_600_000_000
    )
    return (
        ev.groupBy("user_id", bucket.alias("window_start_us"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("user_id", "window_start_us")
    )


# ---------------------------------------------------------------------------
# Events: conditional ratios + share-of-total
# ---------------------------------------------------------------------------

_RATIO_ORACLE = f"""
WITH g AS (
  SELECT event_type, count(*)::BIGINT AS cnt,
         sum(CASE WHEN value > 400.0 THEN 1 ELSE 0 END)::BIGINT AS hi_cnt
  FROM events GROUP BY event_type
)
SELECT event_type, cnt, hi_cnt,
       {_DR6.format(x='hi_cnt::DOUBLE / cnt::DOUBLE')} AS hi_ratio,
       {_DR6.format(x='cnt::DOUBLE / (sum(cnt) OVER ())::DOUBLE')} AS share_of_total
FROM g ORDER BY event_type
"""


@register("conditional_ratio_report", _RATIO_ORACLE)
def q_conditional_ratio_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type conditional ratio (share of high-value events) plus
    share-of-total via a window over the AGGREGATED frame — the standard
    'percent of column total' report shape.

    Scale: the unpartitioned sum-over window runs on 5 aggregated rows,
    not the input — the only safe place for a global window."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("value") > 400.0, 1).otherwise(0)).alias("hi_cnt"),
    )
    w_all = Window.partitionBy()
    return g.select(
        "event_type",
        "cnt",
        "hi_cnt",
        dround(F.col("hi_cnt").cast("double") / F.col("cnt").cast("double"), 6).alias(
            "hi_ratio"
        ),
        dround(
            F.col("cnt").cast("double") / F.sum("cnt").over(w_all).cast("double"), 6
        ).alias("share_of_total"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Arrays: sorted collect_set
# ---------------------------------------------------------------------------

_COLLECT_ORACLE = """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), '|') AS event_types,
       len(list(DISTINCT event_type))::BIGINT AS n_types
FROM events WHERE user_id < 50
GROUP BY user_id ORDER BY user_id
"""


@register("collect_set_sorted", _COLLECT_ORACLE)
def q_collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user distinct event-type vocabulary as a SORTED, '|'-joined
    string — collect_set is partition-order-nondeterministic, so array_sort
    is what makes set aggregation comparable, and the join-to-scalar is what
    makes the result canonicalizable by value-hash tooling (raw array
    columns are not hashable in pandas-based comparators).

    Scale: collect_set state is bounded by the event-type vocabulary (5
    here), not the row count — safe; sorting happens on the tiny final
    arrays."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("_types"))
        # derive both outputs from the ONE aggregated array — a second
        # collect_set would maintain a duplicate accumulator per group
        .select(
            "user_id",
            F.array_join("_types", "|").alias("event_types"),
            F.size("_types").cast("long").alias("n_types"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Arrays: zip_with cosine between adjacent embeddings
# ---------------------------------------------------------------------------

_ZIPCOS_ORACLE = f"""
SELECT a.vec_id AS vec_id,
       CAST(round(CAST({_cos('a.embedding', 'b.embedding')} AS DECIMAL(28,8)), 8) AS DOUBLE)
         AS cos_next
FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
WHERE a.vec_id < 200
ORDER BY vec_id
"""


@register("array_zip_cosine", _ZIPCOS_ORACLE)
def q_array_zip_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine between each embedding and its successor, entirely in JVM
    Column algebra (zip_with product + aggregate fold — the interpreted
    kernel from operators/similarity, no Python, no UDF): the drift/
    continuity check for ordered embedding streams.

    Scale: self-join on an integer key (broadcastable range filter), then
    a narrow projection; the fold is index-ordered so results are
    bit-identical to the SQL list_reduce twin."""
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") < 200).alias("a")
    b = emb.alias("b")
    return (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.col("a.vec_id").alias("vec_id"),
            dround(
                similarity.cosine(F.col("a.embedding"), F.col("b.embedding")), 8
            ).alias("cos_next"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Native session_window in BATCH mode (Spark-first sessionization)
# ---------------------------------------------------------------------------

_SESSION_WINDOW_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_nr
  FROM marked
)
SELECT user_id,
       min(epoch_us(ts))::BIGINT AS session_start_us,
       (max(epoch_us(ts)) + 1800000000)::BIGINT AS session_end_us,
       count(*)::BIGINT AS n_events,
       {_DR4.format(x='sum(value)')} AS sum_value
FROM sess GROUP BY user_id, session_nr
ORDER BY user_id, session_start_us
"""


@register("session_window_batch", _SESSION_WINDOW_ORACLE)
def q_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE session_window aggregation in batch
    mode — the engine merges overlapping [ts, ts+gap) intervals itself, so
    there is no lag/cumsum plumbing at all (contrast `sessionize`, which
    implements the reference's manual W3-W5 pipeline; the streaming twin in
    streaming/sessions.py shares this exact expression).

    Session semantics: a 30-minute gap CLOSES a session (Spark merges an
    event iff it starts strictly before previous-end = prev_ts + gap); the
    window end is last_ts + gap. The oracle replicates that with the
    >= 30-min new-session rule in plain window SQL.

    Scale: one hash partition by user + in-partition interval merge — the
    same single-shuffle cost as the manual form, with the merge loop in JVM
    code instead of three window expressions."""
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("sw"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 4).alias("sum_value"),
        )
    )
    return out.select(
        "user_id",
        _us(F.col("sw.start")).alias("session_start_us"),
        _us(F.col("sw.end")).alias("session_end_us"),
        "n_events",
        "sum_value",
    ).orderBy("user_id", "session_start_us")


# ---------------------------------------------------------------------------
# Partial-aggregate re-merge (incremental pipeline composability)
# ---------------------------------------------------------------------------

_INCR_ORACLE = f"""
SELECT event_type,
       count(*)::BIGINT AS cnt,
       {_DR4.format(x='sum(value)')} AS sum_value,
       {_DR6.format(x='sum(value) / count(*)')} AS mean_value,
       {_DR6.format(x='min(value)')} AS min_value,
       {_DR6.format(x='max(value)')} AS max_value
FROM events
GROUP BY event_type ORDER BY event_type
"""


@register("incremental_agg_merge", _INCR_ORACLE)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregable partial states, merged: the input is split into two
    disjoint chunks (as an incremental pipeline would see per-day
    partitions), each chunk is pre-aggregated to (count, sum, min, max)
    partial states, and the states are UNIONed and merged — producing
    byte-identical results to a direct aggregation (the oracle IS the
    direct form). The mean is derived sum/count at the END, never averaged
    across partials — the classic incremental-agg correctness trap, done
    right.

    Scale: this is the algebraic property that lets 100 TB backfills run
    as per-partition aggs + a tiny merge instead of one global pass; the
    demo plans two partial hash aggs + a 5-row merge agg."""
    ev = _t(spark, sf_dir, "events")

    def partial(chunk: DataFrame) -> DataFrame:
        return chunk.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("p_cnt"),
            F.sum("value").alias("p_sum"),
            F.min("value").alias("p_min"),
            F.max("value").alias("p_max"),
        )

    half = F.col("event_id") % 2 == 0
    states = partial(ev.filter(half)).unionByName(partial(ev.filter(~half)))
    return (
        states.groupBy("event_type")
        .agg(
            F.sum("p_cnt").alias("cnt"),
            dround(F.sum("p_sum"), 4).alias("sum_value"),
            dround(F.sum("p_sum") / F.sum("p_cnt"), 6).alias("mean_value"),
            dround(F.min("p_min"), 6).alias("min_value"),
            dround(F.max("p_max"), 6).alias("max_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Winsorization: percentile-clipped aggregates (outlier-robust reporting)
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = f"""
WITH pct AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       {_DR6.format(x='avg(e.value)')} AS mean_raw,
       {_DR6.format(x='avg(least(greatest(e.value, p.lo), p.hi))')} AS mean_winsorized,
       sum(CASE WHEN e.value < p.lo OR e.value > p.hi THEN 1 ELSE 0 END)::BIGINT
         AS n_clipped,
       count(*)::BIGINT AS n
FROM events e JOIN pct p ON e.event_type = p.event_type
GROUP BY e.event_type ORDER BY e.event_type
"""


@register("winsorize_values", _WINSOR_ORACLE)
def q_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p05/p95-clipped) means per event type — the
    outlier-robust aggregate a pipeline reports next to the raw mean, plus
    how many rows the clip touched.

    Exactness note: the percentile bounds feed comparisons BEFORE any
    rounding; that is safe because an interpolated percentile either equals
    a data value exactly (no arithmetic in both engines) or sits strictly
    between two data values — ulp noise cannot flip a `value < lo` test.

    Scale: percentile pass (groups are small: 5 types) -> broadcast the
    5-row bounds frame back -> one clipped aggregation. At 100 TB swap the
    exact percentile for approx_percentile; the join-back shape is
    unchanged."""
    ev = _t(spark, sf_dir, "events")
    pcts = F.percentile("value", F.lit([0.05, 0.95]))
    bounds = ev.groupBy(F.col("event_type").alias("p_type")).agg(
        F.element_at(pcts, 1).alias("lo"), F.element_at(pcts, 2).alias("hi")
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), ev["event_type"] == F.col("p_type"))
        .groupBy("event_type")
        .agg(
            dround(F.avg("value"), 6).alias("mean_raw"),
            dround(F.avg(clipped), 6).alias("mean_winsorized"),
            F.sum(
                F.when((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1)
                .otherwise(0)
            ).alias("n_clipped"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis, hash-random)
# ---------------------------------------------------------------------------

_WSAMPLE_SEED = 303

_WSAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         ln(('0x' || substr(md5('{_WSAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            / 1152921504606846976.0) / n_chars AS es_key
  FROM documents
),
ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY es_key DESC, doc_id) AS rk
  FROM keyed
)
SELECT source, doc_id, n_chars, rk FROM ranked WHERE rk <= 5
ORDER BY source, rk
"""


@register("weighted_sample_es", _WSAMPLE_ORACLE)
def q_weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, 5 docs per source, weight =
    n_chars (longer docs proportionally likelier): the Efraimidis-Spirakis
    one-pass scheme, es_key = ln(u)/w with the repo's deterministic md5
    uniform instead of rand() — so the sample is reproducible and the SQL
    twin is value-exact (same lesson as hash_stratified_split).

    Scale: one narrow projection (hash + ln) and one per-group top-k
    window — no global sort, no second pass over the data; this is THE
    distributed weighted-reservoir algorithm (each partition can keep a
    local top-k heap and merge)."""
    from ..operators.sampling import hash_uniform

    docs = _t(spark, sf_dir, "documents")
    u = hash_uniform(F.col("doc_id"), seed=_WSAMPLE_SEED)
    keyed = docs.select(
        "source", "doc_id", "n_chars",
        (F.log(u) / F.col("n_chars")).alias("es_key"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("es_key"), "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("source", "doc_id", "n_chars", F.col("rk").cast("long").alias("rk"))
        .orderBy("source", "rk")
    )


# ---------------------------------------------------------------------------
# Time-weighted average (irregular event-time series)
# ---------------------------------------------------------------------------

_TWA_ORACLE = f"""
WITH gaps AS (
  SELECT user_id, value,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS gap_us
  FROM events
)
SELECT user_id,
       {_DR6.format(x='sum(value * gap_us) / sum(gap_us)')} AS twa_value,
       count(gap_us)::BIGINT AS n_intervals,
       sum(gap_us)::BIGINT AS span_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


@register("time_weighted_avg", _TWA_ORACLE)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-weighted mean of an irregularly-sampled series: each
    value is held until the next event and weighted by its holding time
    (step-function integral / total span) — the correct average for
    sensor/price/gauge data, where the arithmetic mean over-weights bursts.

    Scale: one window pass (lead, integer-µs gaps) sharing its partitioning
    with the final per-user agg — single Exchange+Sort, same discipline as
    sessionize; weights stay integers until the final division."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "value",
        (_us(F.lead("ts").over(w)) - _us(F.col("ts"))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            dround(
                F.sum(F.col("value") * F.col("gap_us")) / F.sum("gap_us"), 6
            ).alias("twa_value"),
            F.count("gap_us").alias("n_intervals"),
            F.sum("gap_us").alias("span_us"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Shannon entropy of the token distribution per source
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest({_TOKS}) AS token FROM documents
),
cnts AS (
  SELECT source, token, count(*)::DOUBLE AS c FROM tok GROUP BY source, token
),
tot AS (
  SELECT source, sum(c) AS n FROM cnts GROUP BY source
)
SELECT cnts.source,
       {_DR6.format(x='-sum((c / n) * log2(c / n))')} AS entropy_bits,
       count(*)::BIGINT AS vocab_size
FROM cnts JOIN tot ON cnts.source = tot.source
GROUP BY cnts.source ORDER BY cnts.source
"""


@register("entropy_per_source", _ENTROPY_ORACLE)
def q_entropy_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each source's token distribution plus its
    vocabulary size — the corpus-diversity screen (near-zero entropy means
    templated/spam text; the Gopher-style repetition gates catch the
    per-document version, this is the per-slice one).

    Scale: explode -> two keyed hash aggs -> a per-source join of one row
    per (source, token). The token-count frame is the same shape TF-IDF
    builds; log2 terms sum per source with the DECIMAL snap absorbing
    accumulation-order ulps."""
    docs = _t(spark, sf_dir, "documents")
    from ..functions.hashing import tokens as _tokens

    cnts = (
        docs.select("source", F.explode(_tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    tot = cnts.groupBy(F.col("source").alias("t_source")).agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        cnts.join(tot, cnts["source"] == F.col("t_source"))
        .groupBy("source")
        .agg(
            dround(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"),
            F.count(F.lit(1)).alias("vocab_size"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation per key (is the series trending or noise?)
# ---------------------------------------------------------------------------

_AUTOCORR_ORACLE = f"""
WITH lagged AS (
  SELECT user_id, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
  FROM events
)
SELECT user_id,
       {_DR6.format(x='corr(value, prev_value)')} AS autocorr_lag1,
       count(prev_value)::BIGINT AS n_pairs
FROM lagged WHERE prev_value IS NOT NULL
GROUP BY user_id HAVING count(prev_value) >= 3 ORDER BY user_id
"""


@register("autocorr_lag1", _AUTOCORR_ORACLE)
def q_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each user's value series — the
    "is this metric trending or white noise" screen (near 0 for iid
    values, near 1 for drifting gauges).

    Scale: the lag window and the per-user corr aggregation share one
    (user_id, ts, event_id) Exchange+Sort; corr ships moment tuples only."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", "value", F.lag("value").over(w).alias("prev_value")
    ).filter(F.col("prev_value").isNotNull())
    return (
        lagged.groupBy("user_id")
        .agg(
            dround(F.corr("value", "prev_value"), 6).alias("autocorr_lag1"),
            F.count("prev_value").alias("n_pairs"),
        )
        .filter(F.col("n_pairs") >= 3)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Month-over-month revenue deltas (lag over the AGGREGATED frame)
# ---------------------------------------------------------------------------

_MOM_ORACLE = f"""
WITH monthly AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         {_DR2.format(x='sum(o_totalprice)')} AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY 1
)
SELECT month, revenue,
       {_DR2.format(x='revenue - lag(revenue) OVER (ORDER BY month)')} AS delta,
       {_DR6.format(x='(revenue - lag(revenue) OVER (ORDER BY month)) / lag(revenue) OVER (ORDER BY month)')}
         AS pct_change
FROM monthly ORDER BY month
"""


@register("month_over_month_revenue", _MOM_ORACLE)
def q_month_over_month_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with month-over-month absolute and percentage change
    — the standard reporting delta, with the lag window running over the
    ALREADY-AGGREGATED 24-row frame (revenue is DECIMAL-snapped BEFORE the
    delta so both engines difference identical inputs).

    Scale: the unpartitioned lag window is safe precisely because it runs
    on the aggregate, not the fact table — same rule as
    conditional_ratio_report's share-of-total."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(dround(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        dround(F.col("revenue") - prev, 2).alias("delta"),
        dround((F.col("revenue") - prev) / prev, 6).alias("pct_change"),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# Benford first-digit distribution (fraud/data-quality screen)
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = f"""
WITH d AS (
  SELECT substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
           AS first_digit
  FROM orders WHERE o_totalprice > 0
)
SELECT first_digit, count(*)::BIGINT AS cnt,
       {_DR6.format(x='count(*)::DOUBLE / (sum(count(*)) OVER ())::DOUBLE')} AS share,
       {_DR6.format(x="log2(1.0 + 1.0 / CAST(first_digit AS DOUBLE)) / log2(10.0)")} AS benford_expected
FROM d GROUP BY first_digit ORDER BY first_digit
"""


@register("benford_first_digit", _BENFORD_ORACLE)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law expectation — the classic fabricated-numbers screen.

    Exactness: the first digit comes from integer-cents string prefixes
    (floor to BIGINT prints identically in both engines), NOT from
    floor(log10(x)) — log10 of exact powers of ten lands one ulp below the
    integer and mis-digits them.

    Scale: pure projection + 9-row agg; the share window runs over the
    9-row aggregate."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    )
    g = o.select(digit.alias("first_digit")).groupBy("first_digit").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_all = Window.partitionBy()
    return g.select(
        "first_digit",
        "cnt",
        dround(F.col("cnt").cast("double") / F.sum("cnt").over(w_all).cast("double"), 6).alias("share"),
        dround(
            F.log2(1.0 + 1.0 / F.col("first_digit").cast("double")) / F.log2(F.lit(10.0)),
            6,
        ).alias("benford_expected"),
    ).orderBy("first_digit")


# ---------------------------------------------------------------------------
# Gini coefficient of revenue concentration per market segment
# ---------------------------------------------------------------------------

_GINI_ORACLE = f"""
WITH spend AS (
  SELECT c.c_mktsegment, o.o_custkey, sum(o.o_totalprice) AS s
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
),
ranked AS (
  SELECT c_mktsegment, s,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY s, o_custkey) AS i,
         count(*) OVER (PARTITION BY c_mktsegment) AS n,
         sum(s) OVER (PARTITION BY c_mktsegment) AS tot
  FROM spend
)
SELECT c_mktsegment,
       {_DR6.format(x='sum((2.0 * i - n - 1) * s) / (max(n) * max(tot))')} AS gini,
       max(n)::BIGINT AS n_customers
FROM ranked GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


@register("gini_revenue_concentration", _GINI_ORACLE)
def q_gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer spend inside each market segment —
    the inequality/concentration metric (0 = every customer spends the
    same, ->1 = one whale), via the rank formulation
    G = sum((2i - n - 1) * s_i) / (n * sum(s)) over spend sorted ascending.

    Determinism: the rank's tiebreak is the customer key, but the formula
    is tie-insensitive anyway (equal s values contribute symmetric rank
    weights within a tie group... the tiebreak just pins identical plans).

    Scale: per-customer agg (broadcast customer dim), ONE window sort per
    segment for the ranks, then a per-segment fold — no all-pairs |s_i -
    s_j| form, which is the naive O(n^2) Gini."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    spend = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("s", "o_custkey")
    wn = Window.partitionBy("c_mktsegment")
    ranked = spend.select(
        "c_mktsegment",
        "s",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
        F.sum("s").over(wn).alias("tot"),
    )
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            # n and tot are group constants: max() just lifts them into the
            # aggregation context
            dround(
                F.sum((2.0 * F.col("i") - F.col("n") - 1) * F.col("s"))
                / (F.max("n") * F.max("tot")),
                6,
            ).alias("gini"),
            F.max("n").alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )
