"""Probabilistic record linkage scoring — the Fellegi-Sunter model
(Fellegi & Sunter 1969, "A Theory for Record Linkage" — public method):
each blocked candidate pair accumulates a log-likelihood-ratio score
over field-agreement comparisons, where an agreeing field contributes
ln(m/u) and a disagreeing one ln((1-m)/(1-u)) (m = P(agree | match),
u = P(agree | non-match)); thresholds split pairs into link / possible
/ non-link.

This completes the entity-resolution lane the engine already carries:
blocking (dedup banding, setsim prefix filtering, levenshtein blocks)
-> THIS scoring -> clustering (cc.alternating_components) -> keep-best
survivorship (dedup.dedup_keep_best).

Exactness discipline (the r10 float policy): the m/u weights are
snapped to integer micro-nats IN PYTHON (round(ln(m/u) * 1e6)) and ride
the plan as literals — the same move as BM25's k1/b and the LM floor —
so pair scores are exact integer sums and the SQL twin inlines the
identical literals.  No transcendental is ever evaluated per row by
either engine.

Scale shape: scoring is pure Column math over the blocked-pair frame
(zero extra shuffles beyond the caller's blocking join); classification
is one CASE; top-k selection is TakeOrdered.  The pair frame's size is
the caller's blocking quality — every blocking lane above bounds it.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1_000_000


def fs_weight_micro(m: float, u: float) -> tuple[int, int]:
    """(agreement, disagreement) weights in integer micro-nats for one
    field, from its m- and u-probabilities.  Python-side so both
    engines consume identical literals."""
    if not (0.0 < u < m < 1.0):
        raise ValueError(
            f"need 0 < u < m < 1 (agreement must be evidence FOR a "
            f"match), got m={m}, u={u}"
        )
    return (
        round(math.log(m / u) * _SCALE),
        round(math.log((1.0 - m) / (1.0 - u)) * _SCALE),
    )


def score_pairs(
    pairs: DataFrame,
    fields: dict[str, tuple[float, float]],
    upper_micro: int,
    lower_micro: int,
) -> DataFrame:
    """Score + classify blocked candidate pairs.

    ``pairs`` carries one BOOLEAN column per comparison field (NULL is
    treated as disagreement — absent evidence is not agreement);
    ``fields`` maps those column names to (m, u).  Adds:
    score_micro (exact integer log-likelihood ratio), n_agree, and
    decision ('link' >= upper_micro, 'non_link' < lower_micro,
    'possible' between)."""
    if not fields:
        raise ValueError("fields must name at least one comparison column")
    if lower_micro > upper_micro:
        raise ValueError(
            f"lower_micro {lower_micro} must be <= upper_micro {upper_micro}"
        )
    score: Column = F.lit(0).cast("long")
    agree: Column = F.lit(0)
    for col, (m, u) in fields.items():
        w_a, w_d = fs_weight_micro(m, u)
        hit = F.coalesce(F.col(col), F.lit(False))
        score = score + F.when(hit, F.lit(w_a)).otherwise(F.lit(w_d))
        agree = agree + F.when(hit, F.lit(1)).otherwise(F.lit(0))
    scored = pairs.withColumn("score_micro", score).withColumn(
        "n_agree", agree.cast("int")
    )
    return scored.withColumn(
        "decision",
        F.when(F.col("score_micro") >= F.lit(int(upper_micro)), F.lit("link"))
        .when(
            F.col("score_micro") < F.lit(int(lower_micro)), F.lit("non_link")
        )
        .otherwise(F.lit("possible")),
    )


def customer_block_pairs(customer: DataFrame) -> DataFrame:
    """Gate-shaped blocking for the TPC-H customer table: candidate
    pairs share a nation (the blocking key), with three agreement
    fields — market segment equality, account balance within 5.00
    currency units (compared on exact integer cents), and balance-sign
    agreement.  Pure demonstration blocking: per-nation pair fan-out is
    C(n_h, 2); production blocking uses the banding/prefix lanes."""
    c = customer.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("id1"),
            F.col("b.c_custkey").alias("id2"),
            (F.col("a.c_mktsegment") == F.col("b.c_mktsegment")).alias(
                "f_segment"
            ),
            (
                F.abs(F.col("a.bal_cents") - F.col("b.bal_cents"))
                <= F.lit(500)
            ).alias("f_balance"),
            (
                (F.col("a.bal_cents") >= 0) == (F.col("b.bal_cents") >= 0)
            ).alias("f_bal_sign"),
        )
    )


def resolve_entities(
    records: DataFrame,
    scored: DataFrame,
    id_col: str,
) -> DataFrame:
    """Entity resolution: collapse linked record pairs into canonical
    entities — the standard Fellegi-Sunter pipeline tail (score pairs ->
    keep decision='link' -> transitive closure -> one entity id per
    connected set), the record-linkage analog of the near-dup cluster
    step in the dedup lane.

    ``records``: the full record frame (``id_col`` unique);
    ``scored``: score_pairs output over any blocking of those records
    (id1, id2, decision).  Output: records' columns + ``entity_id`` —
    the smallest record id reachable through link edges; records in no
    link pair are their own entity.  Deterministic: a pure function of
    the link set.

    Scale shape (100 TB): the closure reuses the dedup lane's
    min-label components (diameter-bounded rounds, one keyed shuffle
    per round — link graphs are unions of small cliques, so 2-3 rounds
    in practice); the backfill is one broadcast-sized left join
    (components exist only for linked records, a small fraction).  The
    quadratic hazard lives in the caller's blocking, not here."""
    from .dedup import neardup_components

    links = scored.filter(F.col("decision") == "link").select(
        F.col("id1").alias("id_a"), F.col("id2").alias("id_b")
    )
    comp = neardup_components(links).withColumnRenamed("doc_id", id_col)
    return records.join(comp, id_col, "left").withColumn(
        "entity_id", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("component")


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_cols: list[str],
    window: int,
    num_ranges: int = 32,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995, "The
    merge/purge problem for large databases" — public method): sort the
    records by a blocking key and emit every pair within ``window``
    positions of each other.  The second classic blocking strategy next
    to equi-key blocking (customer_block_pairs): equi-blocking misses
    matches that straddle a block boundary, sorted-neighborhood misses
    matches further than ``window`` apart in sort order — production
    linkage runs BOTH and unions the candidate sets (multi-pass
    merge/purge), which the pair surface here makes a plain unionByName.

    Output: (id1, id2, rank1, rank2, rank_gap) with rank1 < rank2,
    rank_gap in [1, window-1] — ranks are the 1-based position in the
    total order (sort_cols + id_col tiebreak, so the order — and hence
    the candidate set — is deterministic and value-exact twinnable).
    Pair payloads join back by id (keeps this operator payload-agnostic
    and the pair frame narrow).

    Scale shape (100 TB): the global rank uses the two-phase
    range-partitioned scan (repartitionByRange -> per-partition
    row_number -> add per-partition offsets computed over a
    num_ranges-row frame) — NO single-partition window, the
    global_cumsum discipline.  Pair generation is one equi-join of the
    ranked frame against itself on rank = rank + d for the exploded
    d in [1, window-1] — output is exactly (n - d) pairs per offset,
    linear in n for fixed window, never quadratic.  The ranked frame is
    localCheckpoint-pinned: RangePartitioner samples its bounds, so an
    unpinned re-execution could place boundary rows differently and
    des-align the two join sides (the global_cumsum pin rationale)."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if not sort_cols:
        raise ValueError("sort_cols must be non-empty")
    order = [F.col(c) for c in sort_cols] + [F.col(id_col)]
    # persist, not just compose: `local` and `counts` both read this
    # frame, and RangePartitioner SAMPLES its bounds — two independent
    # re-executions can place boundary rows in different partitions,
    # des-aligning local ranks from offsets (the global_cumsum pin
    # rationale, observed there at sf0.1).  The eager checkpoint below
    # materializes everything in one pass; the persist guarantees that
    # pass reads ONE partitioning, and is released before returning.
    ranged = (
        df.select(id_col, *sort_cols)
        .repartitionByRange(num_ranges, *order)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    w_local = Window.partitionBy("_pid").orderBy(*order)
    local = ranged.withColumn("_lrank", F.row_number().over(w_local))
    counts = local.groupBy("_pid").agg(F.max("_lrank").alias("_n"))
    w_off = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    try:
        ranked = (
            local.join(F.broadcast(offsets), "_pid")
            .select(
                F.col(id_col),
                (F.col("_lrank") + F.col("_off")).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        # always release the pinned frame — an exception during the eager
        # checkpoint must not leak the cache for the session lifetime
        ranged.unpersist()
    gaps = F.explode(
        F.array(*[F.lit(d) for d in range(1, window)])
    ).alias("rank_gap")
    left = ranked.select(
        F.col(id_col).alias("id1"), F.col("rank").alias("rank1"), gaps
    )
    right = ranked.select(
        F.col(id_col).alias("id2"), F.col("rank").alias("rank2")
    )
    return left.join(
        right, left.rank1 + left.rank_gap == right.rank2
    ).select("id1", "id2", "rank1", "rank2", "rank_gap")
