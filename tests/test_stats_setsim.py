"""Unit tests for the round-4b wave: two-phase scan primitives
(global_cumsum / scalable_ntile vs their single-partition-window
references), distributed hypothesis tests vs numpy-computed references,
and the prefix-filtered set-similarity join vs the brute-force truth."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import setsim, stats
from advanced_elb_logs_etl_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# global_cumsum / scalable_ntile vs the single-partition window reference
# ---------------------------------------------------------------------------


def test_global_cumsum_matches_single_window(spark):
    ev = load_table(spark, SF, "events").select("event_id", "value")
    got = (
        stats.global_cumsum(ev, ["value", "event_id"], ["value"], num_ranges=7)
        .select("event_id", "cum_value")
        .collect()
    )
    w = Window.orderBy("value", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    want = ev.select("event_id", F.sum("value").over(w).alias("cum_value")).collect()
    g = {r.event_id: r.cum_value for r in got}
    for r in want:
        assert math.isclose(g[r.event_id], r.cum_value, rel_tol=1e-9), r.event_id


@pytest.mark.parametrize("k", [3, 5, 8])
def test_scalable_ntile_matches_sql_ntile(spark, k):
    ev = load_table(spark, SF, "events").select("event_id", "value")
    got = (
        stats.scalable_ntile(ev, ["value", "event_id"], k, "bucket", num_ranges=5)
        .select("event_id", "bucket")
        .collect()
    )
    w = Window.orderBy("value", "event_id")
    want = ev.select("event_id", F.ntile(k).over(w).alias("bucket")).collect()
    g = {r.event_id: r.bucket for r in got}
    for r in want:
        assert g[r.event_id] == r.bucket, (r.event_id, g[r.event_id], r.bucket)


def test_scalable_ntile_n_smaller_than_k(spark):
    df = spark.range(3).withColumnRenamed("id", "v")
    got = sorted(
        (r.v, r.b)
        for r in stats.scalable_ntile(df, ["v"], 5, "b", num_ranges=2).collect()
    )
    # SQL ntile with n < k: one row per bucket 1..n
    assert got == [(0, 1), (1, 2), (2, 3)]


# ---------------------------------------------------------------------------
# hypothesis tests vs numpy references
# ---------------------------------------------------------------------------


def _two_groups(spark):
    ev = load_table(spark, SF, "events")
    pdf = ev.select("event_type", "value").toPandas()
    a = pdf[pdf.event_type == "click"].value.to_numpy()
    b = pdf[pdf.event_type == "purchase"].value.to_numpy()
    return ev, a, b


def test_ks_two_sample_matches_numpy(spark):
    ev, a, b = _two_groups(spark)
    row = stats.ks_two_sample(ev, "value", "event_type", "click", "purchase").first()
    xs = np.sort(np.unique(np.concatenate([a, b])))
    d = np.max(
        np.abs(
            np.searchsorted(np.sort(a), xs, side="right") / len(a)
            - np.searchsorted(np.sort(b), xs, side="right") / len(b)
        )
    )
    assert row.n_a == len(a) and row.n_b == len(b)
    assert math.isclose(row.d_stat, d, rel_tol=1e-12)


def test_welch_t_matches_numpy(spark):
    ev, a, b = _two_groups(spark)
    row = stats.welch_t_stats(ev, "value", "event_type", "click", "purchase").first()
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2a, se2b = va / len(a), vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2a + se2b)
    dof = (se2a + se2b) ** 2 / (se2a**2 / (len(a) - 1) + se2b**2 / (len(b) - 1))
    assert math.isclose(row.t_stat, t, rel_tol=1e-9)
    assert math.isclose(row.dof_welch, dof, rel_tol=1e-9)


def test_chi_square_matches_numpy(spark):
    ev = load_table(spark, SF, "events").withColumn(
        "bucket", F.floor(F.col("value") / 100.0)
    )
    row = stats.chi_square(ev, "event_type", "bucket").first()
    pdf = ev.select("event_type", "bucket").toPandas()
    ct = pdf.groupby(["event_type", "bucket"]).size().unstack(fill_value=0).to_numpy()
    n = ct.sum()
    e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2 = float((np.where(e > 0, (ct - e) ** 2 / np.where(e > 0, e, 1), 0)).sum())
    assert row.n == n
    assert row.dof == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert math.isclose(row.chi2, chi2, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# set-similarity join: prefix filtering is exact (no false negatives)
# ---------------------------------------------------------------------------


def _brute_force_pairs(spark, docs, threshold):
    arrays = docs.select(
        F.col("doc_id").alias("id"), setsim.shingle_set(F.col("text")).alias("toks")
    ).where(F.col("toks").isNotNull())
    a, b = arrays.alias("a"), arrays.alias("b")
    return {
        (r.id_a, r.id_b): r.jac
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                F.size(F.array_intersect("a.toks", "b.toks")).cast("double")
                / (
                    F.size("a.toks")
                    + F.size("b.toks")
                    - F.size(F.array_intersect("a.toks", "b.toks"))
                ).cast("double")
            ).alias("jac"),
        )
        .where(F.col("jac") >= threshold)
        .collect()
    }


@pytest.mark.parametrize("threshold", [0.4, 0.6, 0.8])
def test_prefix_join_matches_brute_force(spark, threshold):
    docs = load_table(spark, SF, "documents")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in setsim.prefix_filtered_jaccard_join(
            docs, threshold=threshold
        ).collect()
    }
    want = _brute_force_pairs(spark, docs, threshold)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=0, abs_tol=0)


def test_prefix_join_no_cartesian(spark):
    docs = load_table(spark, SF, "documents")
    # caller-owned spine keeps the result lazy so the REAL join plan is
    # inspected (the internally-spined form returns a checkpointed frame)
    toks = setsim.distinct_shingles(docs, "doc_id", "text")
    plan = (
        setsim.prefix_filtered_jaccard_join(docs, threshold=0.6, toks=toks)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_global_cumsum_plan_is_range_partitioned(spark):
    ev = load_table(spark, SF, "events").select("event_id", "value")
    plan = (
        stats.global_cumsum(ev, ["value", "event_id"], ["value"], pin=False)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
        .lower()
    )
    assert "repartitionbyexpression" in plan or "rangepartitioning" in plan


# ---------------------------------------------------------------------------
# round-4c: quality-aware dedup survivor selection / EWMA
# ---------------------------------------------------------------------------


def test_dedup_keep_best_semantics(spark):
    from advanced_elb_logs_etl_spark.operators import dedup
    from advanced_elb_logs_etl_spark.operators.text import quality_score
    from advanced_elb_logs_etl_spark.functions.scalars import dround

    docs = load_table(spark, SF, "documents")
    best = dedup.dedup_corpus_keep_best(docs, dround(quality_score(F.col("text")), 6))
    plain = dedup.dedup_corpus(docs)
    got = best.select("doc_id", "_score", "component").collect()
    # one survivor per component, same cluster structure as min-id dedup
    assert len(got) == plain.count()
    comps = [r.component for r in got]
    assert len(comps) == len(set(comps))
    # every survivor carries the max score of its cluster
    pairs = dedup.minhash_neardup_pairs(docs)
    allc = dedup.neardup_components(pairs).collect()
    comp_of = {r.doc_id: r.component for r in allc}
    scored = {
        r.doc_id: r._score
        for r in docs.select(
            "doc_id", dround(quality_score(F.col("text")), 6).alias("_score")
        ).collect()
    }
    import collections

    best_by_comp = collections.defaultdict(lambda: -1.0)
    for d, s in scored.items():
        c = comp_of.get(d, d)
        best_by_comp[c] = max(best_by_comp[c], s)
    for r in got:
        assert r._score == best_by_comp[r.component], r


def test_ewma_window_matches_reference(spark):
    from advanced_elb_logs_etl_spark.operators import stats

    ev = load_table(spark, SF, "events")
    got = {
        (r.event_type, r.event_id): r.ewma
        for r in stats.ewma_window(
            ev, "value", ["event_type"], ["ts", "event_id"], alpha=0.3, span=20
        ).collect()
    }
    pdf = ev.select("event_type", "event_id", "ts", "value").toPandas()
    pdf = pdf.sort_values(["event_type", "ts", "event_id"])
    a = 0.3
    for et, g in pdf.groupby("event_type"):
        vals = g.value.tolist()
        ids = g.event_id.tolist()
        for t in range(len(vals)):
            lo = max(0, t - 19)
            window = vals[lo : t + 1][::-1]  # most recent first
            ws = [a * (1 - a) ** j for j in range(len(window))]
            ref = sum(x * w for x, w in zip(window, ws)) / sum(ws)
            assert math.isclose(got[(et, ids[t])], ref, rel_tol=1e-9)


def test_temperature_mix_semantics(spark):
    from advanced_elb_logs_etl_spark.operators import sampling

    docs = load_table(spark, SF, "documents")
    counts = {r.source: r.c for r in docs.groupBy("source").count()
              .withColumnRenamed("count", "c").collect()}
    # tau=1: natural proportions — rate_s = min(1, target/total) for all s
    out1 = sampling.temperature_mix(docs, "source", target_rows=20.0, tau=1.0)
    rates1 = {r.source: r.rate for r in out1.select("source", "rate").distinct().collect()}
    total = sum(counts.values())
    for s, r in rates1.items():
        assert abs(r - min(1.0, 20.0 * counts[s] / total / counts[s])) < 1e-6
    # tau=0.5: smaller sources get HIGHER rates
    out5 = sampling.temperature_mix(docs, "source", target_rows=20.0, tau=0.5)
    rates5 = {r.source: r.rate for r in out5.select("source", "rate").distinct().collect()}
    bysize = sorted(counts, key=counts.get)
    rs = [rates5[s] for s in bysize if s in rates5]
    assert rs == sorted(rs, reverse=True)
    # determinism: same call twice -> identical kept sets
    k1 = sorted(r.doc_id for r in out5.select("doc_id").collect())
    k2 = sorted(r.doc_id for r in sampling.temperature_mix(
        docs, "source", target_rows=20.0, tau=0.5).select("doc_id").collect())
    assert k1 == k2


def test_ewma_null_values_drop_out(spark):
    """A null VALUE mid-series drops out of both numerator and
    denominator — the remaining weights renormalize (null-skipping
    weighted mean), and rows after the null still get finite output."""
    from advanced_elb_logs_etl_spark.operators import stats

    rows = [(1, 1, 10.0), (1, 2, None), (1, 3, 30.0)]
    df = spark.createDataFrame(rows, "k int, t int, value double")
    got = {r.t: r.ewma for r in stats.ewma_window(
        df, "value", ["k"], ["t"], alpha=0.5, span=3).collect()}
    assert math.isclose(got[1], 10.0)
    # t=2: value null -> only lag-1 term (10.0) contributes
    assert math.isclose(got[2], 10.0)
    # t=3: weights 0.5 (x=30), 0.25 (null, dropped), 0.125 (x=10)
    assert math.isclose(got[3], (0.5 * 30 + 0.125 * 10) / (0.5 + 0.125))


def test_internal_caches_are_released(spark):
    """Neither global_cumsum (pin=True) nor an internally-spined
    prefix_filtered_jaccard_join may leave a persisted frame behind for
    the session lifetime (ADVICE r4): the cache manager must be as empty
    after the call as before it."""
    cm = spark._jsparkSession.sharedState().cacheManager()
    cm.clearCache()
    ev = load_table(spark, SF, "events").select("event_id", "value").limit(200)
    stats.global_cumsum(ev, ["value", "event_id"], ["value"]).collect()
    assert cm.isEmpty()
    docs = load_table(spark, SF, "documents").limit(60)
    setsim.prefix_filtered_jaccard_join(docs, "doc_id", "text", 0.6).collect()
    assert cm.isEmpty()


def test_auc_mann_whitney_matches_pairwise_definition(spark):
    """Exact tie-aware AUC vs the O(P*N) definition on a small frame with
    planted ties (including a tied pos/neg pair)."""
    rows = [(0.1, 0), (0.2, 0), (0.2, 1), (0.5, 0), (0.5, 1),
            (0.7, 1), (0.7, 1), (0.9, 0), (1.0, 1)]
    df = spark.createDataFrame(rows, "score double, lab int")
    got = stats.auc_mann_whitney(df, "score", "lab").first()
    pos = [s for s, l in rows if l == 1]
    neg = [s for s, l in rows if l == 0]
    u = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    assert math.isclose(got.auc, u / (len(pos) * len(neg)), rel_tol=0, abs_tol=0)


def test_auc_mann_whitney_extremes(spark):
    perfect = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (0.1, 0), (0.2, 0)], "score double, lab int"
    )
    assert stats.auc_mann_whitney(perfect, "score", "lab").first().auc == 1.0
    inverted = spark.createDataFrame(
        [(0.1, 1), (0.2, 1), (1.0, 0), (2.0, 0)], "score double, lab int"
    )
    assert stats.auc_mann_whitney(inverted, "score", "lab").first().auc == 0.0


def test_auc_mann_whitney_null_scores_dropped(spark):
    """NULL scores have no rank: they are filtered before the range scan
    (engines disagree on null ordering), so a nullable score column gives
    the same AUC as the non-null subset."""
    base = [(0.1, 0), (0.4, 1), (0.6, 0), (0.9, 1)]
    with_nulls = base + [(None, 1), (None, 0), (None, 0)]
    clean = spark.createDataFrame(base, "score double, lab int")
    dirty = spark.createDataFrame(with_nulls, "score double, lab int")
    want = stats.auc_mann_whitney(clean, "score", "lab").first()
    got = stats.auc_mann_whitney(dirty, "score", "lab").first()
    assert (got.auc, got.n_pos, got.n_neg) == (want.auc, want.n_pos, want.n_neg)


def test_auc_mann_whitney_single_class_is_null(spark):
    """AUC is undefined without both classes: NULL, not a zero division."""
    one_class = spark.createDataFrame(
        [(0.1, 1), (0.5, 1), (0.9, 1)], "score double, lab int"
    )
    row = stats.auc_mann_whitney(one_class, "score", "lab").first()
    assert row.auc is None and row.n_pos == 3 and row.n_neg == 0


def test_global_cumsum_defer_matches_pinned(spark):
    """pin='defer' (no eager checkpoint job) must be value-identical to
    pin=True — the correctness persist is shared; only the cache
    LIFECYCLE differs (VERDICT r6 item 4a: the pin's materialization
    moved to the harness/test path)."""
    ev = load_table(spark, SF, "events").select("event_id", "value").limit(500)
    pinned = {
        r.event_id: r.cum_value
        for r in stats.global_cumsum(
            ev, ["value", "event_id"], ["value"], num_ranges=7, pin=True
        ).collect()
    }
    deferred_df = stats.global_cumsum(
        ev, ["value", "event_id"], ["value"], num_ranges=7, pin="defer"
    )
    deferred = {r.event_id: r.cum_value for r in deferred_df.collect()}
    assert deferred == pinned
    # the internal cache is parked (still registered), not leaked forever:
    # release_deferred_caches drains it and empties the cache manager
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert not cm.isEmpty(), "defer must keep the correctness persist alive"
    assert stats.release_deferred_caches() >= 1
    assert cm.isEmpty()


def test_scalable_ntile_defer_matches_pinned(spark):
    ev = load_table(spark, SF, "events").select("event_id", "value").limit(400)
    a = sorted(
        (r.event_id, r.b)
        for r in stats.scalable_ntile(
            ev, ["value", "event_id"], 7, "b", num_ranges=5, pin=True
        ).collect()
    )
    b = sorted(
        (r.event_id, r.b)
        for r in stats.scalable_ntile(
            ev, ["value", "event_id"], 7, "b", num_ranges=5, pin="defer"
        ).collect()
    )
    stats.release_deferred_caches()
    assert a == b
