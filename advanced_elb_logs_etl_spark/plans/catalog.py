"""Query catalog: every implemented operator as a (Spark query, DuckDB oracle)
pair over the driver's synthetic tables.

Each entry demonstrates one or more operators from SURVEY.md §2 (citations in
the docstrings refer to the reference, /root/reference/advanced_elb_logs_etl.py).
The Spark side and the SQL side compute byte-identical values: integer math is
used where possible (epoch-microsecond arithmetic for time deltas, exact
median), and floating aggregates are rounded to a fixed scale on BOTH sides
so accumulation-order ulp noise can't break the driver's value hash.

Scale notes are inline per query — partitioning, shuffle counts, and
broadcast decisions are part of the contract, not an afterthought.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql | None). Populated by @register below.
CATALOG: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        CATALOG[name] = (fn, oracle)
        return fn

    return deco


# The driver's per-round correctness gate covers a bounded prefix of the
# catalog (round 2 recorded rows for the first 50 of 76 entries).  Queries
# listed here are emitted FIRST by queries()/oracle_sql() so that entries
# that have never received a driver correctness row — the warehouse wave,
# the curation/sampling wave, and anything newly added this round — land
# inside that window.  Long-green §2 entries (all hash-matched in
# CORRECTNESS_r01/r02) follow.  Names not present in CATALOG are ignored,
# so this list may safely lead registration.
FRONT_OF_CATALOG: list[str] = [
    # ======== ROUND-14 WINDOW (positions 1-50) ========
    # VERDICT r13 items 1, 2 in one move.  Layout (histogram after
    # CORRECTNESS_r13: r13=50, r12=50, r11=50, r10=48, r9=29,
    # never=0):
    #   positions 1-3   — the r14 stash drain: the three gates built
    #                     + pytest-pinned + twin-rehearsed at sf0.01
    #                     AND sf0.1 on vanilla sessions in the r13
    #                     session; registered in plans/catalog_r14.py
    #                     (the r12/r13 freeze-discipline precedent:
    #                     16/16 green first try).  Stash after this
    #                     window: EMPTY (refilled late-r14 only after
    #                     the SCALE rows land — VERDICT r13 item 8).
    #   positions 4-32  — the 29 remaining r9-green entries
    #                     (CORRECTNESS_r09 record order; after this
    #                     window nothing is staler than r10).
    #   positions 33-50 — the first 18 of the r10-green cycle in
    #                     CORRECTNESS_r10 record order (the remaining
    #                     30 head the r15 queue below).
    "kcore_copurchase_report",
    "sorted_neighborhood_linkage",
    "sq_adc_topk",
    # r9-green leftovers (CORRECTNESS_r09 record order, the 29 that
    # did not fit the r13 window):
    "debounce_events_batch",
    "null_semantics_battery",
    "array_hof_battery",
    "impute_battery",
    "variant_extract_stats",
    "sequence_top_paths",
    "event_transition_matrix",
    "event_cooccurrence_lift",
    "time_to_conversion",
    "view_to_purchase_within_hour",
    "cohort_ltv_curve",
    "rfm_segmentation",
    "temperature_mix_sample",
    "auc_mann_whitney",
    "calibration_bins",
    "chi_square_type_bucket",
    "cohens_kappa",
    "correlation_matrix",
    "ewma_control_chart",
    "km_survival",
    "ks_two_sample_values",
    "mutual_information",
    "psi_value_drift",
    "two_proportion_ztest",
    "referential_integrity_audit",
    "alternating_components",
    "pq_adc_topk",
    "stream_heavy_hitters",
    "stream_latency_histogram",
    # r10-green cycle, first 18 (CORRECTNESS_r10 record order —
    # these close the r14 window at position 50):
    "grouping_sets_pricing",
    "set_ops_battery",
    "welch_t_values",
    "rolling_median_value",
    "triangle_count_sampled",
    "cm_point_frequency",
    "stream_cm_point_frequency",
    "pricing_summary",
    "pipeline_e2e_hourly",
    "sessionize",
    "stream_first_seen_dedup",
    "minhash_lsh_neardup",
    "ann_cosine_topk",
    "anti_join_uncached",
    "asof_join_state",
    "bot_origin_summary",
    "bpe_train_merges",
    "cohort_retention",
    # ======== position 51+ (the r15 rotation queue, full and exact) ===
    # After this window ships the histogram is r14=50, r13=50,
    # r12=50, r11=50, r10=30 — so the r15 window is: the two-gate
    # late-r14 stash refill FIRST (its positions 1-2), then the 30
    # remaining r10-green entries (listed below), then the r11-green
    # cycle in CORRECTNESS_r11 record order (the first 18 complete
    # the r15 window; the rest head r16).  The r14 stash drained to
    # EMPTY at registration; the late-r14 session then REFILLED it
    # with two pre-rehearsed gates (the freeze discipline: build +
    # pytest + twin FIRST, register in the next window; both
    # twin-green at sf0.01 AND sf0.1 on vanilla sessions):
    #   - densest_subgraph_report (operators/graph.py
    #     densest_subgraph_peel — Bahmani-Kumar-Vassilvitskii 2012
    #     greedy 2(1+eps)-approx peel, eps=0.5, all-integer per-round
    #     trace; gate body + unrolled MATERIALIZED-CTE oracle in
    #     tests/test_densest.py; empties in 2-3 rounds at sf0.01/0.1,
    #     12-round unroll with a strict-inside assertion).
    #   - frequent_subsequences_report (operators/seqmine.py —
    #     GSP/PrefixSpan gappy-subsequence support counting via the
    #     min/max-ord existence trick, once-per-user semantics that
    #     sequence_top_paths' contiguous-trigram counts do NOT cover;
    #     gate body + oracle in tests/test_seqmine.py; 150 pattern
    #     rows on the 5-type alphabet).
    # r10-green cycle, remaining 30 (CORRECTNESS_r10 record order):
    "compaction_plan_bins",
    "date_parts",
    "dedup_exact",
    "dedup_keep_last",
    "dsir_importance_topk",
    "embedding_neardup_pairs",
    "full_outer_nation_suppliers",
    "funnel_conversion",
    "grouped_topk_orders",
    "hll_shard_union",
    "hourly_agg_approx",
    "ivf_cosine_topk",
    "json_extract_summary",
    "large_orders_q18",
    "local_supplier_q5",
    "minhash_signatures",
    "multimodal_meta",
    "ngram_jaccard_pairs",
    "null_coding_cast",
    "path_features",
    "percentile_battery",
    "pivot_event_counts",
    "profile_table_approx",
    "range_join_windows",
    "rolling_5min_count",
    "salted_agg_counts",
    "semi_join_active",
    "session_report",
    "shipping_priority_q3",
    "simhash_neardup",
]


def _ordered_names() -> list[str]:
    front = [n for n in FRONT_OF_CATALOG if n in CATALOG]
    seen = set(front)
    return front + [n for n in CATALOG if n not in seen]


def queries() -> dict[str, QueryFn]:
    return {name: CATALOG[name][0] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: CATALOG[name][1]
        for name in _ordered_names()
        if CATALOG[name][1] is not None
    }


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Production forms of GATE-SHAPED catalog entries (VERDICT r7 item 3).
# A few catalog queries deliberately compute ground truth alongside the
# approximate operator so the driver's value hash covers an error/recall
# bound — correct for CORRECTNESS, wrong as a performance record (the
# brute-force lane dominates the timing).  Entries here are what a user
# would actually run; bench.py times THESE under the catalog name and
# keeps the gate form as a separate `<name>_gate` row.
PRODUCTION_FORMS: dict[str, QueryFn] = {}


def register_production(name: str):
    """Register fn as the production (headline-benched) form of a
    gate-shaped catalog entry `name`."""

    def deco(fn: QueryFn) -> QueryFn:
        PRODUCTION_FORMS[name] = fn
        return fn

    return deco


# epoch microseconds of a timestamp instant — exact integer domain shared
# with DuckDB's epoch_us(); all time-delta math happens here so Spark and the
# oracle produce bit-identical doubles.
def _us(col):
    return F.unix_micros(F.col(col) if isinstance(col, str) else col)


from ..functions.scalars import dround  # cross-engine-stable rounding


# ---------------------------------------------------------------------------
# Flagship + aggregate battery (A1-A6: count / countDistinct / avg / median /
# sum / conditional count — reference write_hourly_aggregation, :345-363)
# ---------------------------------------------------------------------------

_PRICING_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                            AS sum_qty,
  round(sum(l_extendedprice), 2)                       AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)    AS sum_disc_price,
  CAST(round(CAST(avg(l_quantity) AS DECIMAL(28,8)), 4) AS DOUBLE) AS avg_qty,
  CAST(round(CAST(avg(l_extendedprice) AS DECIMAL(28,8)), 4) AS DOUBLE) AS avg_price,
  count(*)::BIGINT                                     AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", _PRICING_ORACLE)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary (A1/A3/A5 battery).

    Scale: one hash aggregation with map-side partial agg; grouping
    cardinality is tiny (|returnflag| x |linestatus|), so the shuffle moves
    only partial aggregate rows, not data rows. Survives 100 TB trivially.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        dround(F.avg("l_quantity"), 4).alias("avg_qty"),
        dround(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


_HOURLY_ORACLE = """
SELECT
  year(ts)::BIGINT    AS request_year,
  month(ts)::BIGINT   AS request_month,
  day(ts)::BIGINT     AS request_day,
  hour(ts)::BIGINT    AS request_hour,
  event_type,
  count(user_id)::BIGINT          AS request_count,
  count(DISTINCT user_id)::BIGINT AS unique_client_ips_count,
  CAST(round(CAST(avg(value) AS DECIMAL(28,8)), 4) AS DOUBLE) AS average_value,
  median(value)                   AS median_value,
  round(sum(value), 2)            AS sum_value,
  count_if(value > 100.0)::BIGINT AS count_high,
  count_if(value <= 10.0)::BIGINT AS count_low
FROM events
WHERE event_type IS NOT NULL
GROUP BY 1, 2, 3, 4, 5
"""


@register("hourly_agg", _HOURLY_ORACLE)
def q_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly aggregation battery — the Spark twin of the reference's
    write_hourly_aggregation (advanced_elb_logs_etl.py:345-363): count,
    countDistinct (A2), avg (A3), exact interpolated median (A4), sum (A5),
    conditional counts via count_if (A6).

    Parity: pandas groupby drops null group keys (dropna=True); Spark keeps
    them, so the explicit IS NOT NULL filter replicates the reference
    (SURVEY.md §2.5). Scale: single shuffle on the 5 group keys; median is
    the only non-partial aggregate — at 100 TB swap in approx_percentile
    via the `exact=False` variant in operators/reports.py.
    """
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    return ev.groupBy(
        F.year("ts").cast("long").alias("request_year"),
        F.month("ts").cast("long").alias("request_month"),
        F.dayofmonth("ts").cast("long").alias("request_day"),
        F.hour("ts").cast("long").alias("request_hour"),
        "event_type",
    ).agg(
        F.count("user_id").alias("request_count"),
        F.countDistinct("user_id").alias("unique_client_ips_count"),
        dround(F.avg("value"), 4).alias("average_value"),
        F.median("value").alias("median_value"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.count_if(F.col("value") > 100.0).alias("count_high"),
        F.count_if(F.col("value") <= 10.0).alias("count_low"),
    )


# ---------------------------------------------------------------------------
# Scalar/projection operators (P3/P4 null-coding casts, P12 bucketing,
# P13 date parts, P14/P15 path features, P8/P9 request/URL decomposition)
# ---------------------------------------------------------------------------

_STATUS_ORACLE = """
SELECT
  CASE
    WHEN code BETWEEN 100 AND 199 THEN '1xx_Informational'
    WHEN code BETWEEN 200 AND 299 THEN '2xx_Success'
    WHEN code BETWEEN 300 AND 399 THEN '3xx_Redirection'
    WHEN code BETWEEN 400 AND 499 THEN '4xx_ClientError'
    WHEN code BETWEEN 500 AND 599 THEN '5xx_ServerError'
    ELSE 'Unknown'
  END AS status_code_type,
  count(*)::BIGINT AS n
FROM (SELECT 100 + (event_id % 550) AS code FROM events) t
GROUP BY 1
"""


@register("status_bucket", _STATUS_ORACLE)
def q_status_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status-code bucketing (P12, reference status_code_type :268-277),
    applied to a synthesized code column then aggregated. Pure Column CASE
    expression — whole-stage codegen, no UDF."""
    from ..functions.scalars import status_code_type

    ev = _t(spark, sf_dir, "events")
    code = (F.lit(100) + F.col("event_id") % 550).alias("code")
    return (
        ev.select(status_code_type(code).alias("status_code_type"))
        .groupBy("status_code_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_DATEPARTS_ORACLE = """
SELECT
  event_id,
  year(ts)::BIGINT       AS request_year,
  month(ts)::BIGINT      AS request_month,
  day(ts)::BIGINT        AS request_day,
  hour(ts)::BIGINT       AS request_hour,
  dayname(ts)            AS request_day_of_week,
  weekofyear(ts)::BIGINT AS request_week_of_year
FROM events
"""


@register("date_parts", _DATEPARTS_ORACLE)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part feature battery (P13, reference :292-298): year/month/day/
    hour, English day name, ISO week — all builtin Column functions."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").cast("long").alias("request_year"),
        F.month("ts").cast("long").alias("request_month"),
        F.dayofmonth("ts").cast("long").alias("request_day"),
        F.hour("ts").cast("long").alias("request_hour"),
        F.date_format("ts", "EEEE").alias("request_day_of_week"),
        F.weekofyear("ts").cast("long").alias("request_week_of_year"),
    )


_PATH_ORACLE = """
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN NULL
              ELSE '/' || source || '/doc/' || (doc_id % 7)::VARCHAR END AS path
  FROM documents
), q AS (
  SELECT doc_id, path, coalesce(path, 'None') AS path_str FROM p
)
SELECT doc_id,
       path,
       (length(path_str) - length(replace(path_str, '/', '')))::BIGINT AS path_depth,
       CASE WHEN length(path_str) - length(replace(path_str, '/', '')) >= 1
            THEN split_part(path_str, '/', 2) END AS path_main_segment
FROM q
"""


@register("path_features", _PATH_ORACLE)
def q_path_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path features (P14/P15, reference :300-301) including the 'None'-string
    quirk: pandas `astype(str)` turns null paths into the literal 'None'
    (depth 0, main segment null) — replicated explicitly on both sides."""
    from ..functions.scalars import path_depth, path_main_segment

    docs = _t(spark, sf_dir, "documents")
    path = F.when(
        F.col("doc_id") % 13 != 0,
        F.concat(
            F.lit("/"), F.col("source"), F.lit("/doc/"), (F.col("doc_id") % 7).cast("string")
        ),
    )
    return docs.select(
        "doc_id",
        path.alias("path"),
        path_depth(path).alias("path_depth"),
        path_main_segment(path).alias("path_main_segment"),
    )


_URL_ORACLE = """
WITH r AS (
  SELECT doc_id,
         'GET https://ex' || (doc_id % 3)::VARCHAR || '.com:' ||
         (8080 + doc_id % 2)::VARCHAR || '/api/v' || (doc_id % 4)::VARCHAR ||
         '/items?q=' || lang || ' HTTP/1.1' AS request
  FROM documents
), s AS (
  SELECT doc_id, request,
         split_part(request, ' ', 1) AS http_method,
         split_part(request, ' ', 2) AS full_url,
         split_part(request, ' ', 3) AS http_version
  FROM r
)
SELECT doc_id, http_method, full_url, http_version,
       regexp_extract(full_url, '^([a-z]+)://', 1)       AS protocol,
       regexp_extract(full_url, '://([^/:]+)', 1)        AS hostname,
       TRY_CAST(regexp_extract(full_url, ':([0-9]+)/', 1) AS BIGINT) AS port,
       regexp_extract(full_url, '://[^/]+(/[^?]*)', 1)   AS path,
       regexp_extract(full_url, '\\?(.*)$', 1)           AS query_params
FROM s
"""


@register("url_parse", _URL_ORACLE)
def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP request + URL decomposition (P8/P9, reference :111-121): method/
    url/version split and scheme/host/port/path/query extraction as pure
    Column expressions (regexp — parse_url is avoided so the oracle can use
    the identical regex)."""
    docs = _t(spark, sf_dir, "documents")
    request = F.concat(
        F.lit("GET https://ex"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit(".com:"),
        (F.lit(8080) + F.col("doc_id") % 2).cast("string"),
        F.lit("/api/v"),
        (F.col("doc_id") % 4).cast("string"),
        F.lit("/items?q="),
        F.col("lang"),
        F.lit(" HTTP/1.1"),
    )
    df = docs.select("doc_id", request.alias("request"))
    parts = F.split(F.col("request"), " ")
    url = parts.getItem(1)
    return df.select(
        "doc_id",
        parts.getItem(0).alias("http_method"),
        url.alias("full_url"),
        parts.getItem(2).alias("http_version"),
        F.regexp_extract(url, r"^([a-z]+)://", 1).alias("protocol"),
        F.regexp_extract(url, r"://([^/:]+)", 1).alias("hostname"),
        F.regexp_extract(url, r":([0-9]+)/", 1).try_cast("long").alias("port"),
        F.regexp_extract(url, r"://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract(url, r"\?(.*)$", 1).alias("query_params"),
    )


_NULLCAST_ORACLE = """
WITH k AS (
  SELECT event_id, TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS kv
  FROM events
), r AS (
  SELECT event_id,
         CASE WHEN kv % 7 = 0 THEN '-'
              WHEN kv % 11 = 0 THEN ''
              ELSE kv::VARCHAR END AS raw
  FROM k
)
SELECT event_id, raw,
       TRY_CAST(nullif(nullif(raw, '-'), '') AS BIGINT) AS parsed_int,
       TRY_CAST(nullif(nullif(raw, '-'), '') AS DOUBLE) AS parsed_float
FROM r
"""


@register("null_coding_cast", _NULLCAST_ORACLE)
def q_null_coding_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-coding casts (P3/P4, reference to_int/to_float :52-62): '-', ''
    and unparseable values become null, valid numerics parse. Implemented
    with try_cast — no UDF, ANSI-safe."""
    from ..functions.scalars import to_float_col, to_int_col

    ev = _t(spark, sf_dir, "events")
    kv = F.regexp_extract("props", "[0-9]+", 0).try_cast("long")
    raw = (
        F.when(kv % 7 == 0, F.lit("-"))
        .when(kv % 11 == 0, F.lit(""))
        .otherwise(kv.cast("string"))
    )
    return ev.select(
        "event_id",
        raw.alias("raw"),
        to_int_col(raw).alias("parsed_int"),
        to_float_col(raw).alias("parsed_float"),
    )


# ---------------------------------------------------------------------------
# Windows (W1-W7: lag, delta, session boundary, grouped cumsum, session id,
# trailing range-frame count/avg — reference add_advanced_features :303-319)
# ---------------------------------------------------------------------------

_SESSION_ORACLE = """
WITH l AS (
  SELECT event_id, user_id, ts,
         lag(epoch_us(ts)) OVER w AS prev_us,
         epoch_us(ts) AS us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), d AS (
  SELECT event_id, user_id, ts, prev_us, us,
         (us - prev_us) / 60000000.0 AS time_diff_min,
         (prev_us IS NULL OR (us - prev_us) / 60000000.0 > 30.0) AS new_session
  FROM l
)
SELECT event_id, user_id, time_diff_min, new_session,
       sum(CASE WHEN new_session THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::VARCHAR
         || '-' || user_id::VARCHAR AS session_id
FROM d
"""


@register("sessionize", _SESSION_ORACLE)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (W1-W5, reference :303-308): lag, event-time
    delta in minutes, 30-minute-gap session boundary, per-key running session
    ordinal, session id synthesis.

    Scale: ONE hash partitioning by user_id serves both window specs (Spark
    plans a single Exchange; the two Window operators share it). Time deltas
    are integer microsecond arithmetic, so results are deterministic. Skewed
    keys (one hot IP) are the known hazard at 100 TB — AQE skew handling does
    not apply inside windows, so operators/sessions.py documents the salting
    escape hatch."""
    from ..operators.sessions import sessionize

    ev = _t(spark, sf_dir, "events")
    out = sessionize(ev, key="user_id", ts="ts", order_tiebreak="event_id", gap_min=30.0)
    return out.select("event_id", "user_id", "time_diff_min", "new_session", "session_id")


_ROLL5_ORACLE = """
SELECT event_id, user_id,
       count(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 299999999 PRECEDING AND CURRENT ROW)::BIGINT
         AS rolling_5min_req_count
FROM events
"""


@register("rolling_5min_count", _ROLL5_ORACLE)
def q_rolling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-minute request count (W6, reference :310-314). pandas
    rolling('5T') frames are left-OPEN `(t-5min, t]`; Spark/SQL RANGE frames
    are closed — parity via a 299_999_999-microsecond bound (SURVEY.md §2.6)."""
    from ..operators.sessions import rolling_count

    ev = _t(spark, sf_dir, "events")
    out = rolling_count(
        ev, key="user_id", ts="ts", value_col="event_type", window_sec=300,
        out_col="rolling_5min_req_count",
    )
    return out.select("event_id", "user_id", "rolling_5min_req_count")


_ROLL1H_ORACLE = """
SELECT event_id, user_id,
       CAST(round(CAST(avg(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW) AS DECIMAL(28,8)), 4) AS DOUBLE)
         AS rolling_1h_avg_value
FROM events
"""


@register("rolling_1h_avg", _ROLL1H_ORACLE)
def q_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 60-minute mean (W7, reference :315-319), same open-left
    frame; avg skips nulls in both engines. Rounded to 4dp on both sides
    (windowed float accumulation order differs between engines)."""
    from ..operators.sessions import rolling_avg

    ev = _t(spark, sf_dir, "events")
    out = rolling_avg(
        ev, key="user_id", ts="ts", value_col="value", window_sec=3600,
        out_col="rolling_1h_avg_value", round_dp=4,
    )
    return out.select("event_id", "user_id", "rolling_1h_avg_value")


# ---------------------------------------------------------------------------
# Joins & set ops (J1 broadcast left join + rename P16, J2 anti probe,
# J3 union, J4 keep-last dedup — reference enrich_with_geolocation :231-265)
# ---------------------------------------------------------------------------

_GEOJOIN_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment,
       n.n_name AS nation_name, r.r_name AS region_name
FROM customer c
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@register("dim_enrich_join", _GEOJOIN_ORACLE)
def q_dim_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension enrichment left join + rename (J1/P16, reference :250-261).
    Both dims are broadcast — zero shuffle of the fact side; exactly how the
    geo cache join must run at 100 TB (the cache is ~|distinct IPs| rows)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


_ANTI_ORACLE = """
SELECT c_custkey
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


@register("anti_join_uncached", _ANTI_ORACLE)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-membership probe (J2, reference :235-236 — 'which keys are NOT in
    the cache'): customers with no urgent order (the filter keeps the result
    non-empty at every sf, so the check discriminates). left_anti join; at
    scale the probe side reduces to distinct keys before the shuffle."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


_UNION_ORACLE = """
SELECT c_name AS name FROM customer
UNION
SELECT s_name FROM supplier
"""


@register("union_distinct_names", _UNION_ORACLE)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union/append + distinct (J3, reference pd.concat :245,:413)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_name").alias("name"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_name").alias("name"))
    return c.unionByName(s).distinct()


_KEEPLAST_ORACLE = """
SELECT event_id, user_id, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
"""


@register("dedup_keep_last", _KEEPLAST_ORACLE)
def q_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-last dedup (J4, reference cache upsert :246): newest row per key
    wins, deterministic tie-break. row_number + filter — the scalable idiom
    (single shuffle on the key, no global sort)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# Filters / reports (F3 IN-list, F4 boolean, P17 stringify, P18 projection,
# A7 group size — reference write_error_report / write_bot_traffic_reports)
# ---------------------------------------------------------------------------

_ERROR_ORACLE = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS time_str,
       event_type, round(value, 2) AS value_r
FROM events
WHERE event_type IN ('error', 'signup')
"""


@register("error_report", _ERROR_ORACLE)
def q_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-report slice (F3 IN-list filter + P17 timestamp stringify + P18
    projection, reference :365-378). The IN filter is pushed into the
    parquet scan (PushedFilters: In(event_type, ...))."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("error", "signup")).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("time_str"),
        "event_type",
        F.round("value", 2).alias("value_r"),
    )


_BOTAGG_ORACLE = """
SELECT event_type, user_id, count(*)::BIGINT AS bot_request_count
FROM events
WHERE value > 150.0
GROUP BY event_type, user_id
"""


@register("bot_origin_summary", _BOTAGG_ORACLE)
def q_bot_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-filter + group-size report (F4/A7, reference :380-391):
    filter then `.size()`-style count(*) per group."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value") > 150.0)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("bot_request_count"))
    )


_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("topk_orders", _TOPK_ORACLE)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by value with deterministic tie-break (§2.7 extension; the
    reference only has limit-5 sampling O2). Spark plans TakeOrderedAndProject
    — per-partition heaps + driver merge, no global sort at any scale."""
    o = _t(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey", "o_totalprice").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    ).limit(100)


# ---------------------------------------------------------------------------
# Scale-hardening variants (SURVEY §4.3 / §7.8)
# ---------------------------------------------------------------------------

_SALTED_ORACLE = """
SELECT user_id, event_type,
       count(event_id)::BIGINT AS n_events,
       round(sum(value), 2)   AS sum_value,
       min(event_id)          AS first_event,
       max(event_id)          AS last_event
FROM events
GROUP BY user_id, event_type
"""


@register("salted_agg_counts", _SALTED_ORACLE)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation (operators/skew.py): one hot key spreads
    over 16 reducers in phase 1, partials merge in phase 2. The oracle is
    the PLAIN groupBy — identical results is exactly the point (salting is
    a physical rewrite, not a semantic one)."""
    from ..operators.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["user_id", "event_type"],
        aggs={
            "n_events": ("event_id", "count"),
            "sum_value": ("value", "sum"),
            "first_event": ("event_id", "min"),
            "last_event": ("event_id", "max"),
        },
        num_salts=16,
        salt_source="event_id",
    )
    return out.withColumn("sum_value", F.round("sum_value", 2))


_HOURLY_APPROX_ORACLE = """
SELECT
  year(ts)::BIGINT    AS request_year,
  month(ts)::BIGINT   AS request_month,
  day(ts)::BIGINT     AS request_day,
  hour(ts)::BIGINT    AS request_hour,
  event_type,
  count(user_id)::BIGINT AS request_count,
  round(sum(value), 2)   AS sum_value,
  TRUE AS distinct_within_bound,
  TRUE AS median_within_band
FROM events
WHERE event_type IS NOT NULL
GROUP BY 1, 2, 3, 4, 5
"""


@register("hourly_agg_approx", _HOURLY_APPROX_ORACLE)
def q_hourly_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of the hourly battery: approx_count_distinct (HLL)
    and approx percentile replace the exact-distinct expand and the
    full-sort median — single-pass sketches, one shuffle.

    Sketch VALUES are engine-specific, so the hash covers the sketch's
    ERROR BOUND instead (VERDICT r5 item 8): per group,
    ``distinct_within_bound`` asserts |approx − exact| ≤
    max(0.15·exact, 5) — 0.15 is a 3-sigma envelope at the default rsd
    0.05, and the absolute floor of 5 covers Spark's HLL++ small-range
    behavior (no sparse representation: tiny groups routinely land ±1-4
    off; measured max |err| = 4 across every group at sf0.1) — and
    ``median_within_band`` asserts the approx median is one of the
    group's two DISCRETE middle elements — percentile_approx returns an
    actual element with rank error ≤ n/accuracy, which at gate scale
    (n ≪ accuracy=10000) means exactly rank ⌈n/2⌉; an interpolated
    quantile band would wrongly reject 2-element groups whose approx
    median is the lower element. The oracle emits literal
    TRUE, so any bound violation flips the value hash. This gate query
    deliberately computes BOTH exact and approx aggregates; the
    production form drops the exact lanes (that's the whole point of the
    sketch), and the exact twin (hourly_agg) carries the value-level
    burden for them. The middle-element check's collect_list is
    per-group-bounded and GATE-ONLY — at 100 TB an (hour, type) group
    can hold billions of rows, so the production check (if any) samples
    groups; none of the production aggregates materialize a group."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    approx_d = F.approx_count_distinct("user_id")
    exact_d = F.count_distinct("user_id")
    approx_m = F.percentile_approx("value", 0.5)
    # discrete middle elements (1-based): rank floor((n+1)/2) and
    # floor(n/2)+1 of the sorted non-null values — equal for odd n
    _sorted_vals = F.sort_array(F.collect_list("value"))
    _n_vals = F.size(_sorted_vals)
    _mid_lo = F.floor((_n_vals + F.lit(1)) / F.lit(2)).cast("int")
    _mid_hi = (F.floor(_n_vals / F.lit(2)) + F.lit(1)).cast("int")
    return ev.groupBy(
        F.year("ts").cast("long").alias("request_year"),
        F.month("ts").cast("long").alias("request_month"),
        F.dayofmonth("ts").cast("long").alias("request_day"),
        F.hour("ts").cast("long").alias("request_hour"),
        "event_type",
    ).agg(
        F.count("user_id").alias("request_count"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        (
            F.abs(approx_d - exact_d).cast("double")
            <= F.greatest(F.lit(0.15) * exact_d.cast("double"), F.lit(5.0))
        ).alias("distinct_within_bound"),
        F.when(approx_m.isNull(), F.lit(True))
        .otherwise(
            (approx_m >= F.try_element_at(_sorted_vals, _mid_lo))
            & (approx_m <= F.try_element_at(_sorted_vals, _mid_hi))
        )
        .alias("median_within_band"),
    )


@register_production("hourly_agg_approx")
def q_hourly_agg_approx_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a user actually runs at 100 TB: the sketch lanes ONLY —
    approx_count_distinct + percentile_approx, single-pass, one shuffle,
    no exact-distinct expand, no collect_list.  The gate form above
    additionally computes the exact lanes to adjudicate the sketch
    bounds; benching that number as the headline recorded a 4x "regression"
    that was really ground-truth-verification cost (VERDICT r7 item 3)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    return ev.groupBy(
        F.year("ts").cast("long").alias("request_year"),
        F.month("ts").cast("long").alias("request_month"),
        F.dayofmonth("ts").cast("long").alias("request_day"),
        F.hour("ts").cast("long").alias("request_hour"),
        "event_type",
    ).agg(
        F.count("user_id").alias("request_count"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.approx_count_distinct("user_id").alias("approx_unique_users"),
        F.percentile_approx("value", 0.5).alias("approx_median_value"),
    )


# ---------------------------------------------------------------------------
# Join/grouping surface beyond strict reference parity (the reference only
# needs J1-J4 — SURVEY §2.4 — but a complete engine offers the full family)
# ---------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
)
"""


@register("semi_join_active", _SEMI_ORACLE)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers having at least one large order. Plans as a
    broadcast/shuffled semi join — no row duplication, no post-dedup."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


_FULLJOIN_ORACLE = """
SELECT coalesce(n.n_nationkey, s.s_nationkey)::BIGINT AS nation_key,
       n.n_name,
       count(s.s_suppkey)::BIGINT AS supplier_count
FROM nation n
FULL OUTER JOIN supplier s ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


@register("full_outer_nation_suppliers", _FULLJOIN_ORACLE)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join + aggregate: nations with zero suppliers and any
    orphaned supplier nation keys both survive."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey, "full_outer")
        .groupBy(
            F.coalesce(F.col("n_nationkey"), F.col("s_nationkey"))
            .cast("long")
            .alias("nation_key"),
            "n_name",
        )
        .agg(F.count("s_suppkey").alias("supplier_count"))
    )


_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice), 2) AS revenue,
       count(*)::BIGINT AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_pricing", _ROLLUP_ORACLE)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: per-(flag,status), per-flag subtotals, and the
    grand total in one aggregation pass (Expand + single shuffle)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# End-to-end parser check: synthesize ALB lines from events, run the REAL
# tokenizer+parser, compare against fields computed directly from the source
# columns (P1/P2/P5-P9/P11 under oracle check; throughput under bench)
# ---------------------------------------------------------------------------

_ALB_ORACLE = """
SELECT
  'app/e' || event_id::VARCHAR AS elb,
  '10.' || (user_id % 200)::VARCHAR || '.0.' || (event_id % 250)::VARCHAR AS client_ip,
  strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS raw_time,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS parsed_time_utc,
  (200 + (event_id % 4) * 100)::BIGINT AS status,
  'GET' AS http_method,
  'h' || (event_id % 5)::VARCHAR || '.example.com' AS hostname,
  8000 + (event_id % 3)::BIGINT AS port,
  '/api/v' || (event_id % 7)::VARCHAR || '/items' AS path,
  'q=' || event_type AS query_params,
  (event_id % 11 = 0) AS is_bot
FROM events
"""


def _synth_alb_lines(ev: DataFrame) -> DataFrame:
    """One full 30-field ALB line per event row, every interesting field a
    deterministic function of the source columns so oracles can recompute
    expected values in SQL: timestamps from ts, client ip / status / URL /
    latencies / byte counts from event_id+user_id, a bot UA on every 11th
    row. Shared by alb_parse_roundtrip (parser differential) and
    pipeline_e2e_hourly (full reference main() path)."""
    # Repartition the narrow SOURCE columns first so the concat below (and
    # any filter Catalyst later pushes beneath it — predicate pushdown
    # substitutes projection expressions into pushed filters) runs on all
    # cores: the sf* events table is ONE parquet file -> one scan
    # partition, and everything below a post-concat repartition would run
    # single-core (measured 10.3 s -> 4.3 s at sf0.1 for the parse when
    # the lines were spread; spreading the 4 source columns instead of the
    # 500-char lines also halves the shuffle bytes).  This models the real
    # input shape — a log scan is thousands of gzip files, naturally
    # parallel.  Row-preserving, so both consumers' results are unchanged.
    ev = ev.select("event_id", "user_id", "event_type", "ts").repartition(
        ev.sparkSession.sparkContext.defaultParallelism
    )
    ip = F.concat(
        F.lit("10."), (F.col("user_id") % 200).cast("string"),
        F.lit(".0."), (F.col("event_id") % 250).cast("string"),
    )
    tstr = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    code = (F.lit(200) + (F.col("event_id") % 4) * 100).cast("string")
    # 3-decimal latency strings: req 0.000-0.009, tgt 0.000-0.099, resp fixed
    req_t = F.concat(F.lit("0.00"), (F.col("event_id") % 10).cast("string"))
    tgt_t = F.concat(F.lit("0.0"), F.lpad((F.col("event_id") % 100).cast("string"), 2, "0"))
    rcvd = ((F.col("event_id") % 500) + 20).cast("string")
    sent = ((F.col("event_id") % 700) + 100).cast("string")
    url = F.concat(
        F.lit("https://h"), (F.col("event_id") % 5).cast("string"),
        F.lit(".example.com:"), (F.lit(8000) + F.col("event_id") % 3).cast("string"),
        F.lit("/api/v"), (F.col("event_id") % 7).cast("string"),
        F.lit("/items?q="), F.col("event_type"),
    )
    ua = F.when(
        F.col("event_id") % 11 == 0,
        F.lit("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)"),
    ).otherwise(F.lit("Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/137.0.0.0 Safari/537.36"))
    line = F.concat(
        F.lit("h2 "), tstr,
        F.lit(" app/e"), F.col("event_id").cast("string"),
        F.lit(" "), ip, F.lit(":51234 172.31.0.9:80 "),
        req_t, F.lit(" "), tgt_t, F.lit(" 0.003 "),
        code, F.lit(" "), code, F.lit(" "), rcvd, F.lit(" "), sent, F.lit(" "),
        F.lit('"GET '), url, F.lit(' HTTP/2.0" "'), ua, F.lit('" '),
        F.lit("TLS_AES_128_GCM_SHA256 TLSv1.3 arn:aws:elb:tg/x "),
        F.lit('"Root=1-abc" "h0.example.com" "-" 1 '), tstr,
        F.lit(' "forward" "-" "-" "172.31.0.9:80" "'), code,
        F.lit('" "-" "-" TID_deadbeef'),
    )
    return ev.select(line.alias("value"))


# Persisted synthesized-lines frames, one per (context, sf_dir) — the same
# FIFO-evicting convention as catalog_llm._hashed_docs.  Both parse-path
# queries (alb_parse_roundtrip, pipeline_e2e_hourly) consume the same
# synthesized corpus, and WITHOUT materialization every filter Catalyst
# pushes down re-evaluates the 500-char concat per consumer (and the
# from_csv duplication in parse_alb_lines compounds it — measured 2.8 s
# vs 0.7 s for the parse at sf0.1).  The cache also mirrors the real
# pipeline shape: the parser reads a materialized source, never a fused
# synthesis expression.
_LINES_CACHE: dict[tuple, DataFrame] = {}
_LINES_CACHE_MAX = 4


def _alb_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (id(spark.sparkContext), sf_dir)
    if key not in _LINES_CACHE:
        while len(_LINES_CACHE) >= _LINES_CACHE_MAX:
            oldest = next(iter(_LINES_CACHE))
            old = _LINES_CACHE.pop(oldest)
            try:
                old.unpersist()
            except Exception:
                pass  # stopped context; nothing to release
        frame = _synth_alb_lines(_t(spark, sf_dir, "events")).persist()
        _LINES_CACHE[key] = frame
    return _LINES_CACHE[key]


def clear_lines_cache() -> None:
    """Unpersist and drop the shared synthesized-lines frames (bench
    isolation hook, mirroring catalog_llm.clear_hashed_cache)."""
    while _LINES_CACHE:
        _, frame = _LINES_CACHE.popitem()
        try:
            frame.unpersist()
        except Exception:
            pass  # stopped context; nothing to release


@register("alb_parse_roundtrip", _ALB_ORACLE)
def q_alb_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential parser check: build a full 30-field ALB line per event
    row (timestamps, ips, URLs, UA — bot UA on every 11th row), push it
    through the REAL tokenizer + parser (operators/parse.py), and emit the
    parsed fields. The oracle computes every expected value straight from
    the source columns — if tokenization, positional binding, timestamp
    parsing, URL decomposition, or the bot flag drift, the hash breaks.
    Doubles as the parse-throughput benchmark entry (one line per event)."""
    from ..operators.parse import parse_alb_lines

    parsed = parse_alb_lines(_alb_lines(spark, sf_dir))
    return parsed.select(
        "elb",
        "client_ip",
        F.col("time").alias("_t"),
        F.col("request_creation_time").alias("raw_time"),
        F.col("elb_status_code").try_cast("long").alias("status"),
        "http_method",
        "hostname",
        F.col("port").cast("long").alias("port"),
        "path",
        "query_params",
        "is_bot",
    ).select(
        "elb", "client_ip", "raw_time",
        F.date_format("_t", "yyyy-MM-dd HH:mm:ss").alias("parsed_time_utc"),
        "status", "http_method", "hostname", "port", "path", "query_params", "is_bot",
    )


# ---------------------------------------------------------------------------
# End-to-end pipeline check: the full reference main() path — synthesize ALB
# lines, then REAL parse -> geo-enrich (broadcast dim join) -> add_features
# (Eastern date parts, status buckets, null-coding casts) -> hourly
# aggregation — under one value hash. Every expected value is recomputed in
# SQL straight from the events/nation source columns.
# ---------------------------------------------------------------------------

_E2E_ORACLE = """
WITH e AS (
  SELECT timezone('America/New_York', timezone('UTC', ts)) AS lt,
         '10.' || (user_id % 200)::VARCHAR || '.0.' || (event_id % 250)::VARCHAR AS client_ip,
         (user_id % 200) AS u,
         200 + (event_id % 4) * 100 AS code,
         round((('0.00' || (event_id % 10)::VARCHAR)::DOUBLE
              + ('0.0' || lpad((event_id % 100)::VARCHAR, 2, '0'))::DOUBLE
              + '0.003'::DOUBLE) * 1000, 3) AS total_ms,
         (event_id % 500) + 20 AS rcvd,
         (event_id % 700) + 100 AS sent
  FROM events
)
SELECT year(lt)::BIGINT   AS request_year,
       month(lt)::BIGINT  AS request_month,
       day(lt)::BIGINT    AS request_day,
       hour(lt)::BIGINT   AS request_hour,
       n.n_name AS countryName,
       'city_' || (u % 10)::VARCHAR AS city,
       count(client_ip)::BIGINT AS request_count,
       count(DISTINCT client_ip)::BIGINT AS unique_client_ips_count,
       CAST(round(CAST(avg(total_ms) AS DECIMAL(28,8)), 4) AS DOUBLE)
         AS average_total_processing_time,
       median(total_ms) AS median_total_processing_time,
       sum(sent)::BIGINT AS sum_sent_bytes,
       sum(rcvd)::BIGINT AS sum_received_bytes,
       count_if(code BETWEEN 200 AND 299)::BIGINT AS count_2xx,
       count_if(code BETWEEN 400 AND 499)::BIGINT AS count_4xx,
       count_if(code BETWEEN 500 AND 599)::BIGINT AS count_5xx
FROM e JOIN nation n ON (u % 25) = n.n_nationkey
GROUP BY 1, 2, 3, 4, 5, 6
"""


@register("pipeline_e2e_hourly", _E2E_ORACLE)
def q_pipeline_e2e_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference main() flow (:395-442) end-to-end under a value hash:
    synthesized ALB lines -> REAL tokenizer/parser -> broadcast geo dim join
    (enrich, geo attrs derived deterministically from the ip's second octet
    + the nation table) -> add_features (Eastern wall-clock date parts,
    null-coding casts, status buckets) -> the reference's hourly aggregation
    battery. One lazy DAG, same operator composition as plans/pipeline.py
    minus the sinks; the oracle recomputes every value from source columns.

    Scale shape: parse is a narrow map; the geo dim is dimension-sized and
    broadcast (fact side never shuffles for the join); the single shuffle is
    the 6-key hash aggregation with map-side partials."""
    from ..operators.features import add_features
    from ..operators.geo import enrich
    from ..operators.parse import parse_alb_lines
    from ..operators.reports import hourly_aggregation

    ev = _t(spark, sf_dir, "events")
    parsed = parse_alb_lines(_alb_lines(spark, sf_dir))

    # Geo "cache" dim: one row per distinct client ip, attributes a pure
    # function of the ip's second octet (u = user_id % 200) + nation names —
    # the offline stand-in for the reference's ip-api cache parquet.
    nation = _t(spark, sf_dir, "nation")
    ips = (
        ev.select(
            F.concat(
                F.lit("10."), (F.col("user_id") % 200).cast("string"),
                F.lit(".0."), (F.col("event_id") % 250).cast("string"),
            ).alias("query")
        ).distinct()
    )
    u = F.split(F.col("query"), "\\.").getItem(1).cast("long")
    cache = ips.join(F.broadcast(nation), u % 25 == F.col("n_nationkey")).select(
        "query",
        F.col("n_name").alias("country"),
        F.concat(F.lit("city_"), (u % 10).cast("string")).alias("city"),
        F.concat(F.lit("isp_"), (u % 7).cast("string")).alias("isp"),
        F.substring("n_name", 1, 2).alias("countryCode"),
    )

    featured = add_features(enrich(parsed, cache))
    agg = hourly_aggregation(featured, exact=True)
    return agg.select(
        F.col("request_year").cast("long"),
        F.col("request_month").cast("long"),
        F.col("request_day").cast("long"),
        F.col("request_hour").cast("long"),
        "countryName",
        "city",
        "request_count",
        "unique_client_ips_count",
        dround(F.col("average_total_processing_time"), 4).alias("average_total_processing_time"),
        "median_total_processing_time",
        "sum_sent_bytes",
        "sum_received_bytes",
        "count_2xx",
        "count_4xx",
        "count_5xx",
    )


_SESSION_REPORT_ORACLE = """
WITH l AS (
  SELECT user_id, event_id, value, ts, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pus
  FROM events
), d AS (
  SELECT *, (pus IS NULL OR (us - pus) / 60000000.0 > 30.0) AS new_session FROM l
), s AS (
  SELECT *, sum(CASE WHEN new_session THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_n
  FROM d
)
SELECT session_n::VARCHAR || '-' || user_id::VARCHAR AS session_id,
       user_id,
       count(*)::BIGINT AS n_events,
       (max(us) - min(us)) / 60000000.0 AS duration_min,
       CAST(round(CAST(avg(value) AS DECIMAL(28,8)), 4) AS DOUBLE) AS avg_value
FROM s
GROUP BY session_n, user_id
"""


@register("session_report", _SESSION_REPORT_ORACLE)
def q_session_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite: the full reference flow shape in ONE lazy plan —
    sessionization windows feeding a per-session aggregation. Catalyst
    shares the user_id hash partitioning between the window block and the
    (session, user) groupBy, so the whole report costs two narrow shuffles."""
    from ..operators.sessions import sessionize

    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", order_tiebreak="event_id")
    us = F.unix_micros(F.col("ts"))
    return (
        s.groupBy("session_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            ((F.max(us) - F.min(us)) / F.lit(60000000.0)).alias("duration_min"),
            dround(F.avg("value"), 4).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-join analytical queries (TPC-H Q3/Q5 shapes): the join-reordering /
# pushdown / partial-agg machinery exercised together
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT l.l_orderkey,
       CAST(round(CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate_str,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-06-01'
  AND l.l_shipdate > TIMESTAMP '1996-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@register("shipping_priority_q3", _Q3_ORACLE)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 shape: selective dim filter -> 3-way join -> partial-agg ->
    top-k. All three filters reach their scans (PushedFilters); customer is
    broadcast into orders; the orders⨝lineitem join is HINTED shuffle_hash —
    left to its size estimates the planner broadcasts the filtered
    lineitem (the FACT side: ~half the table survives the shipdate
    filter), which costs a relation build per run here and is exactly the
    wrong side at 100 TB; a shuffled hash join on l_orderkey is
    scale-correct and measured 0.65 s vs 1.05 s isolated-warm at sf0.1
    (r6 adjudication of the r5 bench outlier). The top-10 is
    TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-06-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-06-01")
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .hint("shuffle_hash")
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate_str"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@register("local_supplier_q5", _Q5_ORACLE)
def q_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 shape: 6-way join with a same-nation theta condition and a
    region filter that prunes through two dimension hops. nation/region/
    supplier broadcast; Catalyst pushes r_name='ASIA' into the region scan
    and prunes nations before the fact joins."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


_ASOF_ORACLE = """
WITH state AS (
  SELECT user_id, ts AS state_ts, value AS state_value
  FROM events
  WHERE event_type = 'signup'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
)
SELECT e.event_id, e.user_id,
       s.state_value AS state_value_asof,
       (epoch_us(e.ts) - epoch_us(s.state_ts)) / 60000000.0 AS state_age_min
FROM events e
ASOF LEFT JOIN state s ON e.user_id = s.user_id AND e.ts >= s.state_ts
"""


@register("asof_join_state", _ASOF_ORACLE)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join — an operator Spark lacks as a builtin,
    composed as union + ONE keyed window (operators/temporal.py): every
    event gets the latest 'signup' state at-or-before it, plus the state
    age. Cost is one shuffle of |events|+|state| rows; the oracle is
    DuckDB's native ASOF LEFT JOIN."""
    from ..operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    state = (
        ev.filter(F.col("event_type") == "signup")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("user_id", F.col("ts").alias("state_ts"), F.col("value").alias("state_value"))
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        state,
        on="user_id",
        left_ts="ts",
        right_ts="state_ts",
        value_cols=["state_ts", "state_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("state_value_asof"),
        (
            (F.unix_micros("ts") - F.unix_micros("state_ts_asof")) / F.lit(60000000.0)
        ).alias("state_age_min"),
    )


_RANGE_ORACLE = """
WITH ivl AS (
  SELECT user_id, ts AS start_ts, ts + INTERVAL 2 HOUR AS end_ts,
         event_id AS ivl_id
  FROM events WHERE event_type = 'signup'
)
SELECT e.event_id, e.user_id, i.ivl_id AS ivl_ivl_id,
       (epoch_us(e.ts) - epoch_us(i.start_ts)) / 60000000.0 AS mins_into_interval
FROM events e
JOIN ivl i ON e.user_id = i.user_id
          AND e.ts >= i.start_ts AND e.ts < i.end_ts
"""


@register("range_join_windows", _RANGE_ORACLE)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join — the second temporal operator Spark lacks as a
    builtin (operators/temporal.py): events matched to every 2-hour
    post-signup window containing them. Bucketized equi-join instead of the
    BroadcastNestedLoopJoin a naive theta-join plans; the oracle is the
    plain inequality join."""
    from ..operators.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    ivl = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
        F.col("event_id").alias("ivl_id"),
    )
    out = range_join(
        ev.select("event_id", "user_id", "ts"), ivl, on="user_id", bucket_seconds=1800
    )
    return out.select(
        "event_id",
        "user_id",
        "ivl_ivl_id",
        (
            (F.unix_micros("ts") - F.unix_micros("ivl_start_ts")) / F.lit(60000000.0)
        ).alias("mins_into_interval"),
    )


# ---------------------------------------------------------------------------
# Semi-structured extraction + reshaping (JSON props, PIVOT, grouped top-k)
# ---------------------------------------------------------------------------

_JSON_ORACLE = """
WITH x AS (SELECT event_type, (props->>'k')::BIGINT AS k FROM events)
SELECT event_type,
  count(*)::BIGINT AS n_events,
  count(k)::BIGINT AS n_with_k,
  sum(k)::BIGINT   AS sum_k,
  CAST(round(CAST(avg(k) AS DECIMAL(28,8)), 4) AS DOUBLE) AS avg_k,
  max(k)::BIGINT   AS max_k
FROM x GROUP BY event_type
"""


@register("json_extract_summary", _JSON_ORACLE)
def q_json_extract_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull `$.k` out of the JSON `props`
    column (get_json_object — JVM-side JsonPath, no Python) and aggregate
    per event type. At scale the extraction is a narrow map fused into the
    scan stage; only the 5-group aggregate shuffles."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count("k").cast("long").alias("n_with_k"),
        F.sum("k").cast("long").alias("sum_k"),
        dround(F.avg("k"), 4).alias("avg_k"),
        F.max("k").cast("long").alias("max_k"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = f"""
SELECT user_id,
  {", ".join(f"count_if(event_type = '{t}')::BIGINT AS {t}" for t in _EVENT_TYPES)}
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
"""


@register("pivot_event_counts", _PIVOT_ORACLE)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (long -> wide reshape): per-user event-type counts as columns.
    The pivot values are EXPLICIT — with them Spark plans a single
    conditional-count aggregation (one shuffle); without them it must run a
    distinct-values job first, a silent extra pass at 100 TB."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    wide = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in _EVENT_TYPES],
    )


_GROUPED_TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rank
  FROM orders
) WHERE rank <= 3
"""


@register("grouped_topk_orders", _GROUPED_TOPK_ORACLE)
def q_grouped_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k PER GROUP (vs topk_orders' global top-k): each customer's 3
    largest orders via row_number over a per-key window. One hash-partition
    shuffle on the group key; AQE handles stragglers. Deterministic
    tie-break on o_orderkey so ranks are reproducible cross-engine."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


# ---------------------------------------------------------------------------
# Exact per-group percentile battery + CUBE grouping sets
# ---------------------------------------------------------------------------

_PCT = "CAST(round(CAST({x} AS DECIMAL(28,8)), 6) AS DOUBLE)"

_PERCENTILE_ORACLE = f"""
SELECT event_type,
  {_PCT.format(x="quantile_cont(value, 0.25)")} AS p25,
  {_PCT.format(x="quantile_cont(value, 0.50)")} AS p50,
  {_PCT.format(x="quantile_cont(value, 0.75)")} AS p75,
  {_PCT.format(x="quantile_cont(value, 0.95)")} AS p95,
  count(value)::BIGINT AS n
FROM events
GROUP BY event_type
"""


@register("percentile_battery", _PERCENTILE_ORACLE)
def q_percentile_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles (p25/p50/p75/p95) per event type in
    one aggregation — the distribution-profiling pass a pipeline runs before
    choosing filter thresholds. Exact percentile is the one non-partial
    aggregate in the repo: it collects per-group value lists, so it's the
    small-group profiling tool; the 100 TB form is approx_percentile
    (hourly_agg_approx), which sketches in one pass."""
    ev = _t(spark, sf_dir, "events")
    pcts = F.percentile("value", F.lit([0.25, 0.50, 0.75, 0.95]))
    return ev.groupBy("event_type").agg(
        *[
            dround(F.element_at(pcts, i + 1), 6).alias(f"p{int(q * 100)}")
            for i, q in enumerate([0.25, 0.50, 0.75, 0.95])
        ],
        F.count("value").cast("long").alias("n"),
    )


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice), 2) AS revenue,
       count(*)::BIGINT AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_pricing", _CUBE_ORACLE)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (completes the ROLLUP family): all four
    combinations of (flag, status) subtotals in ONE Expand + single
    shuffle — versus four separate scans+aggregations without it."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Behavioral analytics: ordered funnel + cohort retention (events)
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
s1 AS (SELECT e.user_id, min(ts) AS t1 FROM events e JOIN s0 USING (user_id)
       WHERE event_type = 'click' AND ts >= t0 GROUP BY e.user_id),
s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
       WHERE event_type = 'purchase' AND ts >= t1 GROUP BY e.user_id)
SELECT 0::BIGINT AS stage, 'view' AS event_type, count(*)::BIGINT AS users FROM s0
UNION ALL
SELECT 1::BIGINT, 'click', count(*)::BIGINT FROM s1
UNION ALL
SELECT 2::BIGINT, 'purchase', count(*)::BIGINT FROM s2
"""


@register("funnel_conversion", _FUNNEL_ORACLE)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel view -> click -> purchase: stage
    k's per-user entry time is the earliest stage-k event at-or-after the
    user's stage k-1 time; output counts users surviving each prefix.
    Iterative conditional min-aggregation, every shuffle keyed on user_id
    (operators/events.py)."""
    from ..operators import events as ev_ops

    ev = _t(spark, sf_dir, "events")
    return ev_ops.funnel_counts(ev)


_COHORT_ORACLE = """
WITH days AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
first AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
SELECT cohort_day, date_diff('day', cohort_day, day)::BIGINT AS day_offset,
       count(DISTINCT d.user_id)::BIGINT AS users
FROM days d JOIN first USING (user_id)
GROUP BY cohort_day, day_offset
"""


@register("cohort_retention", _COHORT_ORACLE)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention triangle: users bucketed by first-activity
    day, counted per later activity day. The raw stream collapses to
    distinct (user, day) BEFORE any join, so the cohort join touches a
    dimension-sized frame (operators/events.py)."""
    from ..operators import events as ev_ops

    ev = _t(spark, sf_dir, "events")
    return ev_ops.cohort_retention(ev)


# ---------------------------------------------------------------------------
# Distribution-based outlier flagging (data-quality gate on events)
# ---------------------------------------------------------------------------

_OUTLIER_ORACLE = """
WITH s AS (
  SELECT event_type,
         avg(value) AS mu,
         stddev_samp(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       CAST(round(CAST((e.value - s.mu) / s.sigma AS DECIMAL(28,8)), 6) AS DOUBLE)
         AS zscore
FROM events e JOIN s USING (event_type)
WHERE s.sigma > 0
  AND abs(CAST(round(CAST((e.value - s.mu) / s.sigma AS DECIMAL(28,8)), 6)
          AS DOUBLE)) > 2.5
"""


@register("value_outliers_z", _OUTLIER_ORACLE)
def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier flagging (|z| > 2.5) — the distributional
    data-quality gate run before aggregates are trusted. Two passes over
    the stream: one partial+final moments aggregation (5 groups), then the
    group stats broadcast back onto the scan — no window over the full
    stream, no second shuffle of the events.

    Spark's stddev_samp and DuckDB's both use numerically-stable one-pass
    updates; the 2.5 cut compares the DECIMAL(28,8)-ROUNDED z on both
    engines so partition-order ulp drift in the moments cannot flip a
    boundary row between runs."""
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter((F.col("sigma") > 0) & (F.abs(dround(z, 6)) > 2.5))
        .select("event_id", "event_type", dround(z, 6).alias("zscore"))
    )


_Q7_ORACLE = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l.l_shipdate)::BIGINT AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, l_year
"""


@register("volume_shipping_q7", _Q7_ORACLE)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: bidirectional nation-pair trade volume by year. The
    disjunctive nation predicate CANNOT push into either single-nation scan
    — it's a pair constraint — so the right plan broadcasts both tiny
    nation dims (and supplier/customer here) and applies the OR after the
    joins; lineitem's only hash shuffles are the orders join key and the
    final 4-group aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250
)
SELECT c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate_str,
       round(o.o_totalprice, 2) AS totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM orders o
JOIN big ON big.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@register("large_orders_q18", _Q18_ORACLE)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: a HAVING-gated self-semi-join — find orders whose
    total quantity exceeds the threshold, then re-join the order lines for
    the report. The `big` frame is the aggregation's own output (tiny after
    the HAVING cut), so it broadcasts back onto lineitem; lineitem itself
    shuffles ONCE on l_orderkey and AQE reuses that exchange for both the
    gate aggregation and the final per-order rollup."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 250)
        .select(F.col("l_orderkey").alias("big_okey"))
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == F.col("big_okey"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate_str"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )
