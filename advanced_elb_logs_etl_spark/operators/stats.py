"""Distributed statistical tests and scan primitives.

Everything here reduces to hash aggregations plus (where a total order is
unavoidable) a RANGE-PARTITIONED two-phase prefix scan — the scalable
rewrite of `Window.orderBy(...)` (which Spark executes on ONE partition).

Float discipline (the cross-engine oracle contract, see
functions.scalars.dround): statistics that sum doubles in engine-dependent
order are DECIMAL-snapped before comparison; statistics that are pure
integer ratios (KS distance, Jaccard, lift denominators) are emitted raw —
int division is bit-identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "global_cumsum",
    "release_deferred_caches",
    "scalable_ntile",
    "ks_two_sample",
    "chi_square",
    "welch_t_stats",
    "ewma_window",
    "auc_mann_whitney",
]


#: Deferred-release registry for pin="defer" (see global_cumsum): the
#: persisted internal range frames whose release the CALLER owns.  The
#: bench harness and the catalog tests call release_deferred_caches()
#: between queries — same lifecycle convention as the catalogs' shared
#: feature frames (catalog_llm.clear_hashed_cache).
_DEFERRED_CACHES: list = []


def release_deferred_caches() -> int:
    """Unpersist every pin='defer' internal cache and return the count."""
    n = 0
    while _DEFERRED_CACHES:
        try:
            _DEFERRED_CACHES.pop().unpersist()
        except Exception:  # stopped context: nothing to release
            pass
        n += 1
    return n


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_cols: list[str],
    num_ranges: int = 32,
    pin: bool | str = True,
) -> DataFrame:
    """Totally-ordered running sums WITHOUT a single-partition window.

    `Window.orderBy(...)` with no partitionBy collapses to one task — the
    classic Spark scale trap.  The scalable form is the textbook two-phase
    scan: range-partition by the order key, compute partition-LOCAL
    running sums with an ordinary per-partition window, then add each
    partition's prefix offset (an aggregate over `num_ranges` rows — tiny,
    window over it is free).

    Appends `cum_<v>` for every v in value_cols.  The order defined by
    order_cols must be total (pass a tiebreak column) for deterministic
    output.

    With pin=True (default) the function is EAGER: the output is pinned
    with localCheckpoint and the internal range-partitioned cache is
    released before returning, so repeated calls (rfm_segmentation makes
    three) do not accumulate session-lifetime persisted frames.  pin=False
    returns the fully-lazy composed plan for inspection/composition — the
    caller then owns the double-execution hazard documented below and the
    `ranged` cache marking.

    pin="defer" (VERDICT r6 item 4a) keeps the CORRECTNESS persist but
    skips the eager localCheckpoint JOB — the fixed extra materialization
    pass that pin=True charges every call (measured +0.7 s on the
    sf0.1 ntile bench query).  The internal cache is parked in
    _DEFERRED_CACHES and released by release_deferred_caches(), which the
    bench harness runs between queries and the catalog's pytest teardown
    runs per test — the same caller-owned lifecycle as the catalogs'
    shared feature frames.  Use it for one-shot query plans whose single
    downstream action materializes everything at once; keep pin=True for
    library callers (rfm, ks) that loop.
    """
    # The ranged frame feeds two consumers (local scan + per-partition
    # totals). The persist is a CORRECTNESS requirement, not a perf nicety:
    # RangePartitioner derives its bounds by sampling, so two independent
    # re-executions of this subtree can place boundary rows in different
    # partitions — local ranks from one partitioning plus offsets from
    # another yield wrong global ranks (observed at sf0.1 before pinning).
    ranged = (
        df.repartitionByRange(num_ranges, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.select(
        "*", *[F.sum(v).over(w_local).alias(f"_local_{v}") for v in value_cols]
    )
    totals = ranged.groupBy("_pid").agg(
        *[F.sum(v).alias(f"_tot_{v}") for v in value_cols]
    )
    w_pid = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid",
        *[
            F.coalesce(F.sum(f"_tot_{v}").over(w_pid), F.lit(0)).alias(f"_off_{v}")
            for v in value_cols
        ],
    )
    out = local.join(F.broadcast(offsets), "_pid").select(
        *df.columns,
        *[
            (F.col(f"_local_{v}") + F.col(f"_off_{v}")).alias(f"cum_{v}")
            for v in value_cols
        ],
    )
    if pin == "defer":
        _DEFERRED_CACHES.append(ranged)
    elif pin:
        # Materialize before releasing the cache: unpersisting while `out`
        # is still lazy would reintroduce the double-execution hazard the
        # persist exists to prevent.
        out = out.localCheckpoint(eager=True)
        ranged.unpersist()
    return out


def scalable_ntile(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    out_col: str,
    num_ranges: int = 32,
    pin: bool | str = True,
) -> DataFrame:
    """SQL `ntile(k) OVER (ORDER BY ...)` without the single-partition
    window: global rank via the two-phase range scan (`global_cumsum` of a
    ones column), then the exact ntile bucket formula — the first
    `n mod k` buckets get `floor(n/k) + 1` rows, the rest `floor(n/k)`.

    order_cols must define a total order (append a key tiebreak) so the
    rank — and therefore every bucket boundary — is deterministic and
    matches the SQL twin row-for-row."""
    ranked = global_cumsum(
        df.withColumn("_one", F.lit(1)), order_cols, ["_one"], num_ranges, pin=pin
    ).withColumnRenamed("cum__one", "_rank")
    n = ranked.groupBy().agg(F.count("*").alias("_n"))
    big = F.floor(F.col("_n") / k) + 1  # size of the first (n % k) buckets
    rem = F.col("_n") % k
    bucket = F.when(
        F.col("_rank") <= big * rem, F.ceil(F.col("_rank") / big)
    ).otherwise(
        # greatest(..,1) guards ANSI div-by-zero when n < k (branch unused)
        rem
        + F.ceil(
            (F.col("_rank") - big * rem) / F.greatest(F.floor(F.col("_n") / k), F.lit(1))
        )
    )
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(out_col, bucket.cast("int"))
        .drop("_one", "_rank", "_n")
    )


def ks_two_sample(
    df: DataFrame, value_col: str, group_col: str, group_a: str, group_b: str
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance: D = sup_x |F_a(x) - F_b(x)|.

    Plan: one hash agg to per-distinct-value counts (the data-sized
    reduction happens FIRST), then the two-phase range scan for the
    cumulative counts, then a 1-row max.  D is a max over differences of
    BIGINT ratios — bit-identical across engines, no rounding.

    Returns 1 row: (d_stat double, n_a bigint, n_b bigint).
    """
    two = df.where(F.col(group_col).isin([group_a, group_b]))
    per_value = two.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.when(F.col(group_col) == group_a, 1)).alias("ca"),
        F.count(F.when(F.col(group_col) == group_b, 1)).alias("cb"),
    )
    cum = global_cumsum(per_value, ["v"], ["ca", "cb"])
    return (
        cum.crossJoin(
            F.broadcast(
                two.groupBy().agg(
                    F.count(F.when(F.col(group_col) == group_a, 1)).alias("n_a"),
                    F.count(F.when(F.col(group_col) == group_b, 1)).alias("n_b"),
                )
            )
        )
        .select(
            F.abs(
                F.col("cum_ca").cast("double") / F.col("n_a").cast("double")
                - F.col("cum_cb").cast("double") / F.col("n_b").cast("double")
            ).alias("diff"),
            "n_a",
            "n_b",
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("diff").alias("d_stat"))
        .select("d_stat", F.col("n_a").cast("long"), F.col("n_b").cast("long"))
    )


def chi_square(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """Pearson chi-square test of independence over the (row_col, col_col)
    contingency table, computed relationally: one hash agg for observed
    cell counts, two re-aggs for the margins, broadcast joins back, one
    1-row fold.  Cell/margin counts are exact BIGINTs; only the final
    statistic is float.

    Zero cells: the observed agg only materializes cells with O >= 1, but
    an (r, c) combination with O = 0 and E > 0 still contributes
    (0-E)^2/E = E to the statistic.  Since the E's over the FULL cross
    product sum to N, the missing-cell mass is exactly N - sum(E over
    observed cells) — added as a closed form, no dense cross join needed.

    Returns 1 row: (chi2 double, dof bigint, n bigint) — chi2 is NOT
    rounded here; snap it with dround at the query edge.
    """
    obs = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count("*").alias("o"))
    row_m = obs.groupBy("r").agg(F.sum("o").alias("rt"))
    col_m = obs.groupBy("c").agg(F.sum("o").alias("ct"))
    n = obs.groupBy().agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(row_m), "r")
        .join(F.broadcast(col_m), "c")
        .crossJoin(F.broadcast(n))
        .select(
            "r",
            "c",
            "o",
            "n",
            (
                F.col("rt").cast("double")
                * F.col("ct").cast("double")
                / F.col("n").cast("double")
            ).alias("e"),
        )
    )
    return (
        cells.groupBy("n")
        .agg(
            (
                F.sum(
                    (F.col("o").cast("double") - F.col("e"))
                    * (F.col("o").cast("double") - F.col("e"))
                    / F.col("e")
                )
                + (F.first("n").cast("double") - F.sum("e"))
            ).alias("chi2"),
            F.count_distinct("r").alias("nr"),
            F.count_distinct("c").alias("nc"),
        )
        .select(
            "chi2",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
            F.col("n").cast("long").alias("n"),
        )
    )


def welch_t_stats(
    df: DataFrame, value_col: str, group_col: str, group_a: str, group_b: str
) -> DataFrame:
    """Welch's unequal-variance t statistic between two groups, from
    single-pass moment aggregates (n, sum, sum of squares) — one hash agg,
    one 1-row combine.  Welch–Satterthwaite effective dof included.

    Sums of doubles accumulate in partition order; snap outputs with
    dround at the query edge (the oracle does the same).

    Returns 1 row: (t_stat, dof_welch, mean_a, mean_b, n_a, n_b).
    """
    v = F.col(value_col).cast("double")
    m = (
        df.where(F.col(group_col).isin([group_a, group_b]))
        .groupBy()
        .agg(
            F.count(F.when(F.col(group_col) == group_a, 1)).alias("na"),
            F.count(F.when(F.col(group_col) == group_b, 1)).alias("nb"),
            F.sum(F.when(F.col(group_col) == group_a, v)).alias("sa"),
            F.sum(F.when(F.col(group_col) == group_b, v)).alias("sb"),
            F.sum(F.when(F.col(group_col) == group_a, v * v)).alias("qa"),
            F.sum(F.when(F.col(group_col) == group_b, v * v)).alias("qb"),
        )
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    mean_a, mean_b = F.col("sa") / na, F.col("sb") / nb
    # unbiased sample variances from raw moments
    var_a = (F.col("qa") - F.col("sa") * F.col("sa") / na) / (na - 1)
    var_b = (F.col("qb") - F.col("sb") * F.col("sb") / nb) / (nb - 1)
    se2_a, se2_b = var_a / na, var_b / nb
    t = (mean_a - mean_b) / F.sqrt(se2_a + se2_b)
    dof = (se2_a + se2_b) * (se2_a + se2_b) / (
        se2_a * se2_a / (na - 1) + se2_b * se2_b / (nb - 1)
    )
    return m.select(
        t.alias("t_stat"),
        dof.alias("dof_welch"),
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
    )


def auc_mann_whitney(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Exact tie-aware ROC AUC as a relational computation — the
    Mann-Whitney U identity, no per-pair work:

        U = sum over distinct scores s of  pos_s * (neg_below(s) + neg_s/2)
        AUC = U / (P * N)

    Plan: ONE hash agg to per-distinct-score (pos, neg) counts (the
    data-sized reduction happens first), the two-phase range scan for the
    cumulative negative count, a 1-row fold.  Everything stays in the
    integer domain via the doubled form U2 = sum pos_s * (2*neg_below +
    neg_s); AUC = U2 / (2*P*N) is ONE double division of exact BIGINTs —
    bit-identical across engines, no rounding needed.

    ``label_col`` must be an int/bool 0-1 column.  NULL scores are
    dropped before ranking (a NULL has no rank: Spark's range scan
    orders nulls first while other engines order them last, so keeping
    them would make the result engine-dependent — SQL twins must mirror
    the filter).  Degenerate single-class input (n_pos or n_neg = 0)
    yields auc = NULL instead of a division error: AUC is undefined
    without both classes.  Returns 1 row:
    (auc double, n_pos bigint, n_neg bigint).
    """
    lab = F.col(label_col).cast("long")
    df = df.where(F.col(score_col).isNotNull())
    per_score = df.groupBy(F.col(score_col).alias("s")).agg(
        F.sum(lab).alias("pos"),
        F.sum(F.lit(1) - lab).alias("neg"),
    )
    cum = global_cumsum(per_score, ["s"], ["neg"])
    u2 = cum.select(
        (F.col("pos") * (F.lit(2) * (F.col("cum_neg") - F.col("neg")) + F.col("neg")))
        .alias("u2c"),
        "pos",
        "neg",
    ).groupBy().agg(
        F.sum("u2c").alias("u2"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
    )
    return u2.select(
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("u2").cast("double")
            / (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("double"),
        ).alias("auc"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
    )


def ewma_window(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    order_cols: list[str],
    alpha: float = 0.3,
    span: int = 20,
    out_col: str = "ewma",
) -> DataFrame:
    """Truncated exponentially-weighted moving average over the trailing
    `span` rows of each key's ordered series:

        ewma_t = sum_{j=0..span-1} w_j * x_{t-j} / sum_j w_j,
        w_j = alpha * (1-alpha)^j

    (normalized, so short leading windows are proper weighted means).

    The textbook recursive EWMA (s_t = a*x_t + (1-a)*s_{t-1}) is
    inherently sequential; the trailing-span truncation makes it a
    bounded-frame WINDOW computation that distributes like any other keyed
    window (hash partition by key, sort within).  Truncation error vs the
    infinite form is (1-alpha)^span (< 0.1% at the defaults).

    Implementation: `span` lag() columns sharing ONE window spec with
    compile-time weight literals — measured ~1.8x faster at sf0.1 than the
    equivalent collect_list + higher-order fold (no array materialization
    per row).  Null lags (series shorter than span at its start) drop out
    of numerator and denominator alike, which is exactly the normalized
    short-window semantics.  Addition order matches the ascending-j fold,
    and any ulp gap vs an oracle's pow()-generated weights is far below
    the dround 1e-6 snap the query layer applies."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    x = F.col(value_col).cast("double")
    num = None
    den = None
    for j in range(span):
        wt = alpha * (1.0 - alpha) ** j
        lagged = F.lag(x, j).over(w) if j else x
        term_num = F.coalesce(lagged, F.lit(0.0)) * F.lit(wt)
        term_den = F.when(lagged.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term_num if num is None else num + term_num
        den = term_den if den is None else den + term_den
    return df.withColumn(out_col, num / den)
