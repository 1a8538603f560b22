"""Production forms of the bounded-gate catalog entries (bench.py times
THESE under the catalog names — VERDICT r7 item 3's decomposition).  The
gate queries are driver-hash-checked; these tests keep the production
forms honest so the headline bench rows can't silently go wrong-fast:
each production form's exact lanes must equal the exact query, and its
sketch lanes must sit inside the same bounds the gate adjudicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.plans.catalog import CATALOG, PRODUCTION_FORMS

SF = "/root/testdata/sf0.001"


def test_every_gate_has_a_registered_production_form():
    assert sorted(PRODUCTION_FORMS) == [
        "bloom_dedup_report",
        "cm_join_size",
        "cm_point_frequency",
        "hll_shard_union",
        "hourly_agg_approx",
        "ivf_cosine_topk",
        "kmv_distinct_setops",
        "leakage_safe_split_report",
        "pq_adc_topk",
        "profile_table_approx",
        "quantile_sketch_report",
        "stream_cm_point_frequency",
        "stream_kmv_distinct",
    ]
    for name in PRODUCTION_FORMS:
        assert name in CATALOG, name


def test_hourly_approx_production_lanes(spark):
    out = {
        (r.request_year, r.request_month, r.request_day, r.request_hour,
         r.event_type): r
        for r in PRODUCTION_FORMS["hourly_agg_approx"](spark, SF).collect()
    }
    from advanced_elb_logs_etl_spark.sources.testdata import load_table

    ev = load_table(spark, SF, "events").filter(F.col("event_type").isNotNull())
    want = {
        (r.y, r.m, r.d, r.h, r.t): r
        for r in ev.groupBy(
            F.year("ts").cast("long").alias("y"),
            F.month("ts").cast("long").alias("m"),
            F.dayofmonth("ts").cast("long").alias("d"),
            F.hour("ts").cast("long").alias("h"),
            F.col("event_type").alias("t"),
        )
        .agg(
            F.count("user_id").alias("cnt"),
            F.round(F.sum("value"), 2).alias("sv"),
            F.count_distinct("user_id").alias("nd"),
        )
        .collect()
    }
    assert set(out) == set(want)
    for key, r in out.items():
        w = want[key]
        # exact lanes identical
        assert r.request_count == w.cnt, key
        assert r.sum_value == w.sv, key
        # sketch lane inside the gate's bound
        assert abs(r.approx_unique_users - w.nd) <= max(0.15 * w.nd, 5), key


def test_ivf_production_recall_bound(spark):
    from advanced_elb_logs_etl_spark.operators import similarity
    from advanced_elb_logs_etl_spark.sources.testdata import load_table

    emb = load_table(spark, SF, "embeddings")
    ivf = PRODUCTION_FORMS["ivf_cosine_topk"](spark, SF)
    brute = similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5
    )
    got = {(r.q_id, r.neighbor_id) for r in ivf.collect()}
    truth = {(r.q_id, r.neighbor_id) for r in brute.collect()}
    # every query produced a full k, and overall recall meets the gate bar
    assert len(got) == len(truth)
    assert len(got & truth) >= 0.3 * len(truth)


def test_pq_production_recall_bound(spark):
    """The production ADC search (no exact-L2 lane) must itself meet the
    recall bar the gate adjudicates — wrong-fast is not allowed."""
    from advanced_elb_logs_etl_spark.operators import pq
    from advanced_elb_logs_etl_spark.plans import catalog_r9 as r9

    emb, searches = r9._pq_searches(spark, SF)
    prod = PRODUCTION_FORMS["pq_adc_topk"](spark, SF)
    got = {(r.q_id, r.neighbor_id) for r in prod.collect()}
    snapped = emb.select(
        "vec_id", pq.snap_micro(F.col("embedding")).alias("_micro")
    )
    truth = set()
    for q_id, qm, _ in searches:
        q_arr = F.array(*[F.lit(v).cast("long") for v in qm])
        truth |= {
            (q_id, r.vec_id)
            for r in snapped.select(
                "vec_id", pq._sqdist(F.col("_micro"), q_arr).alias("d2")
            )
            .orderBy("d2", "vec_id")
            .limit(r9._PQ_TOPK)
            .collect()
        }
    # every query produced a full k, and overall recall meets the gate bar
    assert len(got) == r9._PQ_NQ * r9._PQ_TOPK
    assert len(got & truth) >= 0.25 * len(truth)


def test_profile_production_equals_gate_lanes(spark):
    gate = {
        r.col_name: r for r in CATALOG["profile_table_approx"][0](spark, SF).collect()
    }
    prod = {
        r.col_name: r
        for r in PRODUCTION_FORMS["profile_table_approx"](spark, SF).collect()
    }
    assert set(gate) == set(prod)
    for c, g in gate.items():
        p = prod[c]
        assert p.n_rows == g.n_rows and p.n_nulls == g.n_nulls, c
        # the production n_distinct IS the approx lane the gate bounded
        assert g.distinct_within_bound, c
        assert abs(p.n_distinct - g.n_distinct) <= max(0.15 * g.n_distinct, 5), c


def test_hll_production_estimate_bound(spark):
    from advanced_elb_logs_etl_spark.sources.testdata import load_table

    est = PRODUCTION_FORMS["hll_shard_union"](spark, SF).collect()[0].estimate
    exact = (
        load_table(spark, SF, "events")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()[0]
        .n
    )
    assert abs(est - exact) <= 0.05 * exact


def test_cm_production_estimates_equal_gate_lanes(spark):
    """The sketch math is deterministic, so the production (key, est)
    must equal the gate's estimate lane value-for-value — both batch
    and streaming forms."""
    for name in ("cm_point_frequency", "stream_cm_point_frequency"):
        prod = {
            r.key: r.est for r in PRODUCTION_FORMS[name](spark, SF).collect()
        }
        gate = {
            r.key: r.est for r in CATALOG[name][0](spark, SF).collect()
        }
        assert prod == gate, name


def test_kmv_production_estimates_equal_gate_lanes(spark):
    prod = PRODUCTION_FORMS["kmv_distinct_setops"](spark, SF).collect()[0]
    gate = CATALOG["kmv_distinct_setops"][0](spark, SF).collect()[0]
    for c in ("est_a", "est_b", "est_union", "est_intersect"):
        assert getattr(prod, c) == getattr(gate, c), c
    sprod = PRODUCTION_FORMS["stream_kmv_distinct"](spark, SF).collect()[0]
    sgate = CATALOG["stream_kmv_distinct"][0](spark, SF).collect()[0]
    for c in ("n_hashes", "kth_hash", "est_distinct"):
        assert getattr(sprod, c) == getattr(sgate, c), c


def test_cm_join_size_production_equals_gate_estimate(spark):
    """The production form (the estimate alone) must emit exactly the
    gate's est_join_size — same sketches, same inner product."""
    gate = CATALOG["cm_join_size"][0](spark, SF).collect()[0]
    prod = PRODUCTION_FORMS["cm_join_size"](spark, SF).collect()[0]
    assert prod.est_join_size == gate.est_join_size


def test_quantile_report_production_equals_gate_sketch_lane(spark):
    """The production form (sketch lane alone) must agree with the
    gate's (p_micro, n_sample, est_value) columns — the exact-rank lane
    is the only thing the gate adds."""
    gate = {
        r.p_micro: (r.n_sample, r.est_value)
        for r in CATALOG["quantile_sketch_report"][0](spark, SF).collect()
    }
    prod = {
        r.p_micro: (r.n_sample, r.est_value)
        for r in PRODUCTION_FORMS["quantile_sketch_report"](
            spark, SF
        ).collect()
    }
    assert prod == gate


def test_bloom_production_equals_gate_bloom_lane(spark):
    """The production form (bloom lane alone) must agree with the
    gate's n_items / n_bloom_dup columns — the exact lane (and its fp
    accounting) is the only thing the gate adds."""
    gate = CATALOG["bloom_dedup_report"][0](spark, SF).collect()[0]
    prod = PRODUCTION_FORMS["bloom_dedup_report"](spark, SF).collect()[0]
    assert prod.n_items == gate.n_items
    assert prod.n_bloom_dup == gate.n_bloom_dup
    assert prod.n_bloom_new == gate.n_items - gate.n_bloom_dup


def test_leakage_production_equals_gate_accounting(spark):
    """The production form (assignment + per-split counts, no audit
    self-joins) must agree with the gate's per-split accounting."""
    gate = {
        r.split: (r.n_docs, r.n_components)
        for r in CATALOG["leakage_safe_split_report"][0](
            spark, SF
        ).collect()
    }
    prod = {
        r.split: (r.n_docs, r.n_components)
        for r in PRODUCTION_FORMS["leakage_safe_split_report"](
            spark, SF
        ).collect()
    }
    assert prod == gate
