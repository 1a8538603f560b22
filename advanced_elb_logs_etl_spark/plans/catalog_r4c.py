"""Round-4c catalog wave: quality-aware dedup survivor selection, a
pairwise correlation matrix, truncated-EWMA control charting, mutual
information, and a referential-integrity audit.

Same contract as plans.catalog: value-exact DuckDB twins, DECIMAL-snapped
floats (dround), deterministic tiebreaks. Scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import dround
from ..operators import dedup, stats
from ..operators.text import quality_score
from .catalog import _t, register
from .catalog_llm import _DR, _PAIRS_CTE, _QS_SQL, _TOKS, _hashed_docs

_DR6 = "CAST(round(CAST({x} AS DECIMAL(28,8)), 6) AS DOUBLE)"


# ---------------------------------------------------------------------------
# dedup_keep_best — near-dedup with quality-argmax survivor selection
# ---------------------------------------------------------------------------

_KEEP_BEST_ORACLE = f"""
WITH RECURSIVE {_PAIRS_CTE},
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a),
d2 AS (SELECT doc_id, source, text, {_TOKS} AS toks FROM documents),
q AS (SELECT doc_id, source, {_DR.format(x=_QS_SQL)} AS quality_score FROM d2),
m AS (
  SELECT q.doc_id, q.source, q.quality_score,
         coalesce(c.component, q.doc_id) AS component
  FROM q LEFT JOIN comp c USING (doc_id)
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY component ORDER BY quality_score DESC, doc_id) AS rk
  FROM m
)
SELECT doc_id, source, quality_score, component FROM r WHERE rk = 1
ORDER BY doc_id
"""


@register("dedup_keep_best", _KEEP_BEST_ORACLE)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dedup APPLY with quality-aware survivor selection: LSH pairs ->
    connected components -> keep the HIGHEST-quality member per cluster
    (dedup.dedup_corpus_keep_best) — what a training pipeline actually
    wants, vs dedup_corpus's min-id convention.

    Scale: identical shape to dedup_corpus (banded LSH, min-label CC,
    shared persisted shingle-hash frame); survivor pick is one
    per-component window. Oracle: the recursive-CTE transitive closure
    plus the same rounded-quality argmax."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.dedup_corpus_keep_best(
        docs,
        dround(quality_score(F.col("text")), 6),
        hashed=_hashed_docs(spark, sf_dir),
    )
    return out.select(
        "doc_id",
        "source",
        F.col("_score").alias("quality_score"),
        "component",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# correlation_matrix — pairwise Pearson correlations in one pass
# ---------------------------------------------------------------------------

_CORR_ORACLE = f"""
SELECT
  {_DR6.format(x='corr(l_quantity, l_extendedprice)')} AS corr_qty_price,
  {_DR6.format(x='corr(l_quantity, l_discount)')}      AS corr_qty_disc,
  {_DR6.format(x='corr(l_quantity, l_tax)')}           AS corr_qty_tax,
  {_DR6.format(x='corr(l_extendedprice, l_discount)')} AS corr_price_disc,
  {_DR6.format(x='corr(l_extendedprice, l_tax)')}      AS corr_price_tax,
  {_DR6.format(x='corr(l_discount, l_tax)')}           AS corr_disc_tax,
  count(*)::BIGINT AS n
FROM lineitem
"""


@register("correlation_matrix", _CORR_ORACLE)
def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation over the four lineitem measures — the
    feature-redundancy screen before model training.

    Scale: all six correlations are co-moment aggregates computed in ONE
    map-side-combinable pass (a single HashAggregate; only moment tuples
    shuffle). Engines accumulate in different orders -> dround(6)."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice", "corr_qty_price"),
        ("l_quantity", "l_discount", "corr_qty_disc"),
        ("l_quantity", "l_tax", "corr_qty_tax"),
        ("l_extendedprice", "l_discount", "corr_price_disc"),
        ("l_extendedprice", "l_tax", "corr_price_tax"),
        ("l_discount", "l_tax", "corr_disc_tax"),
    ]
    return li.groupBy().agg(
        *[dround(F.corr(a, b), 6).alias(name) for a, b, name in pairs],
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# ewma_control_chart — truncated EWMA over trailing window
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH w AS (
  SELECT event_type, event_id, ts,
         list(value::DOUBLE) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS frame
  FROM events
), e AS (
  SELECT event_type, event_id, ts,
    list_reduce(list_transform(generate_series(1, len(frame)),
        i -> list_reverse(frame)[i] * (0.3 * pow(0.7, (i - 1)::DOUBLE))),
        (x, y) -> x + y)
      /
    list_reduce(list_transform(generate_series(1, len(frame)),
        i -> 0.3 * pow(0.7, (i - 1)::DOUBLE)), (x, y) -> x + y) AS ewma
  FROM w
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rk
  FROM e
)
SELECT event_type, event_id,
       CAST(round(CAST(ewma AS DECIMAL(28,8)), 6) AS DOUBLE) AS ewma
FROM r WHERE rk <= 3 ORDER BY event_type, event_id
"""


@register("ewma_control_chart", _EWMA_ORACLE)
def q_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated EWMA(alpha=0.3, span=20) per event-type series — the
    control-chart smoother; emits the 3 most recent points per series.

    Scale: the recursive EWMA is sequential, but the trailing-span
    truncation makes it a bounded-frame keyed window (hash partition by
    series, one deterministic left fold per row) — operators/stats.py
    ewma_window; truncation error (1-alpha)^span < 0.1%. pow/fold ulps
    are snapped by dround(6)."""
    ev = _t(spark, sf_dir, "events")
    out = stats.ewma_window(
        ev, "value", ["event_type"], ["ts", "event_id"], alpha=0.3, span=20
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        out.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("event_type", "event_id", dround(F.col("ewma"), 6).alias("ewma"))
        .orderBy("event_type", "event_id")
    )


# ---------------------------------------------------------------------------
# mutual_information — MI + marginal entropies from the contingency table
# ---------------------------------------------------------------------------

_MI_ORACLE = f"""
WITH obs AS (
  SELECT event_type AS r, CAST(floor(value / 100.0) AS BIGINT) AS c, count(*) AS o
  FROM events GROUP BY 1, 2
), rm AS (SELECT r, sum(o) AS rt FROM obs GROUP BY r),
cm AS (SELECT c, sum(o) AS ct FROM obs GROUP BY c),
nn AS (SELECT sum(o) AS n FROM obs),
mi AS (
  SELECT sum((CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                  / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)))) AS mi, n
  FROM obs JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN nn GROUP BY n
),
hr AS (SELECT -sum((CAST(rt AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(rt AS DOUBLE) / CAST(n AS DOUBLE))) AS h_row
       FROM rm CROSS JOIN nn),
hc AS (SELECT -sum((CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))) AS h_col
       FROM cm CROSS JOIN nn)
SELECT {_DR6.format(x='mi')} AS mi, {_DR6.format(x='h_row')} AS h_row,
       {_DR6.format(x='h_col')} AS h_col, n::BIGINT AS n
FROM mi CROSS JOIN hr CROSS JOIN hc
"""


@register("mutual_information", _MI_ORACLE)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(event_type; value-bucket) plus the marginal
    entropies — the dependence measure complementing chi_square (zero
    cells contribute 0 to MI, so the observed-cell sum IS the full sum).

    Scale: same contingency shape as chi_square — one hash agg for cells,
    tiny margin re-aggs broadcast back; ln() ulps snapped by dround(6)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "bucket", F.floor(F.col("value") / 100.0)
    )
    obs = ev.groupBy(F.col("event_type").alias("r"), F.col("bucket").alias("c")).agg(
        F.count("*").alias("o")
    )
    rm = obs.groupBy("r").agg(F.sum("o").alias("rt"))
    cm = obs.groupBy("c").agg(F.sum("o").alias("ct"))
    nn = obs.groupBy().agg(F.sum("o").alias("n"))
    od, nd = F.col("o").cast("double"), F.col("n").cast("double")
    mi = (
        obs.join(F.broadcast(rm), "r")
        .join(F.broadcast(cm), "c")
        .crossJoin(F.broadcast(nn))
        .groupBy("n")
        .agg(
            F.sum(
                (od / nd)
                * F.log(
                    od * nd / (F.col("rt").cast("double") * F.col("ct").cast("double"))
                )
            ).alias("mi")
        )
    )
    hr = (
        rm.crossJoin(F.broadcast(nn))
        .groupBy()
        .agg(
            (-F.sum(
                (F.col("rt").cast("double") / nd)
                * F.log(F.col("rt").cast("double") / nd)
            )).alias("h_row")
        )
    )
    hc = (
        cm.crossJoin(F.broadcast(nn))
        .groupBy()
        .agg(
            (-F.sum(
                (F.col("ct").cast("double") / nd)
                * F.log(F.col("ct").cast("double") / nd)
            )).alias("h_col")
        )
    )
    return (
        mi.crossJoin(F.broadcast(hr))
        .crossJoin(F.broadcast(hc))
        .select(
            dround(F.col("mi"), 6).alias("mi"),
            dround(F.col("h_row"), 6).alias("h_row"),
            dround(F.col("h_col"), 6).alias("h_col"),
            F.col("n").cast("long").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# referential_integrity_audit — FK orphans / duplicate PKs / null keys
# ---------------------------------------------------------------------------

_RI_ORACLE = """
SELECT
  (SELECT count(*) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
  )::BIGINT AS li_order_orphans,
  (SELECT count(*) FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
  )::BIGINT AS ord_cust_orphans,
  (SELECT count(*) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
  )::BIGINT AS li_part_orphans,
  (SELECT count(*) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
  )::BIGINT AS li_supp_orphans,
  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)::BIGINT AS dup_orderkeys,
  (SELECT count(*) FROM orders WHERE o_custkey IS NULL)::BIGINT AS null_custkeys
"""


@register("referential_integrity_audit", _RI_ORACLE)
def q_referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse constraint audit in one report row: FK orphan counts
    across the three lineitem/orders relationships, primary-key duplicate
    count, and null-FK count — the data-quality gate run before
    publishing a snapshot.

    Scale: each orphan count is a LEFT ANTI hash join (dims broadcast
    when small) reduced to a count; the 1-row frames cross-join at the
    end. No windows, no collects."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")

    def anti_count(fact, dim, fk, pk, alias):
        return (
            fact.join(dim, fact[fk] == dim[pk], "left_anti")
            .groupBy()
            .agg(F.count("*").alias(alias))
        )

    a1 = anti_count(li, o, "l_orderkey", "o_orderkey", "li_order_orphans")
    a2 = anti_count(o, c, "o_custkey", "c_custkey", "ord_cust_orphans")
    a3 = anti_count(li, p, "l_partkey", "p_partkey", "li_part_orphans")
    a4 = anti_count(li, s, "l_suppkey", "s_suppkey", "li_supp_orphans")
    a5 = o.groupBy().agg(
        (F.count("*") - F.count_distinct("o_orderkey")).alias("dup_orderkeys")
    )
    a6 = o.groupBy().agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_custkeys")
    )
    out = a1
    for frame in (a2, a3, a4, a5, a6):
        out = out.crossJoin(F.broadcast(frame))
    return out
