"""Mergeable quantile sketch (operators/qsketch.py): pure-Python replica
differentials, the exact-under-k regime, mergeability (= build of the
concatenation), grouped build/roll-up, the integer rank/CDF surface, the
TakeOrdered plan shape, and the DuckDB twin rehearsals for the r12 gate
(`quantile_sketch_report`, registered in plans/catalog_r12.py) and the
queued r13/r14 layout gate (`quantile_range_layout`)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import qsketch

K = 8  # small k so the saturated regime is cheap to exercise


def _h_py(s) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def _sketch_py(rows, k=K):
    """(h, v) bottom-k by (h, v) — the module's total order."""
    pairs = sorted(
        (_h_py(i), v) for i, v in rows if i is not None and v is not None
    )
    return pairs[:k]


def _quant_py(vals, p_micro):
    vs = sorted(vals)
    n = len(vs)
    r = max(1, -(-(p_micro * n) // qsketch.MICRO))  # ceil div
    return vs[r - 1]


def _rows(spark, rows):
    return spark.createDataFrame(rows, "id bigint, v double")


ROWS_A = [(i, float((i * 37) % 100)) for i in range(40)] + [
    (100, None),
    (None, 5.0),
]
ROWS_B = [(1000 + i, float(i) / 3.0) for i in range(50)]
ROWS_SMALL = [(1, 3.0), (2, 1.0), (3, 2.0), (4, None), (None, 9.0)]


def test_build_matches_python_bottom_k(spark):
    got = [(r.h, r.v) for r in qsketch.q_build(_rows(spark, ROWS_A), k=K).collect()]
    assert sorted(got) == _sketch_py(ROWS_A)
    # NULL ids and NULL values are excluded from the sampled population
    small = [
        (r.h, r.v)
        for r in qsketch.q_build(_rows(spark, ROWS_SMALL), k=K).collect()
    ]
    assert sorted(small) == _sketch_py(ROWS_SMALL)
    with pytest.raises(ValueError):
        qsketch.q_build(_rows(spark, ROWS_SMALL), k=1)


def test_unsaturated_quantiles_are_exact(spark):
    """Population smaller than k: the sample IS the population, so every
    estimated quantile equals the exact discrete quantile."""
    sk = qsketch.q_build(_rows(spark, ROWS_SMALL), k=K)
    got = {
        r.p_micro: (r.n_sample, r.est_value)
        for r in qsketch.q_quantiles(sk, [0.0, 0.25, 0.5, 1.0], k=K).collect()
    }
    vals = [3.0, 1.0, 2.0]
    for pm, (n, est) in got.items():
        assert n == len(vals)
        assert est == _quant_py(vals, pm)
    # p=0 clamps to rank 1 (the minimum)
    assert got[0] == (3, 1.0)
    with pytest.raises(ValueError):
        qsketch.q_quantiles(sk, [])
    with pytest.raises(ValueError):
        qsketch.q_quantiles(sk, [1.5])


def test_merge_equals_build_of_concatenation_and_is_idempotent(spark):
    merged = qsketch.q_merge(
        qsketch.q_build(_rows(spark, ROWS_A), k=K),
        qsketch.q_build(_rows(spark, ROWS_B), k=K),
        k=K,
    )
    whole = qsketch.q_build(_rows(spark, ROWS_A + ROWS_B), k=K)
    assert sorted((r.h, r.v) for r in merged.collect()) == sorted(
        (r.h, r.v) for r in whole.collect()
    )
    # distinct makes self-merge a no-op (overlapping stores)
    a = qsketch.q_build(_rows(spark, ROWS_A), k=K)
    again = qsketch.q_merge(a, a, k=K)
    assert sorted((r.h, r.v) for r in again.collect()) == _sketch_py(ROWS_A)
    with pytest.raises(ValueError):
        qsketch.q_merge(k=K)


def test_grouped_build_quantiles_and_rollup(spark):
    """Per-group sketches match the per-group replica; grouped quantile
    estimates use the same rank formula; q_merge_grouped rolls fine
    groups into coarse ones; [] group roll-up equals the global build."""
    rows = [
        (g, i, float((i * 13 + ord(g)) % 50))
        for g in ("x", "y", "z")
        for i in range(g != "z" and 30 or 3)
    ]
    df = spark.createDataFrame(
        [(g, f"{g}:{i}", v) for g, i, v in rows], "g string, id string, v double"
    )
    sk = qsketch.q_build_grouped(df, ["g"], "v", "id", k=K)
    by_g = {}
    for g, i, v in rows:
        by_g.setdefault(g, []).append((f"{g}:{i}", v))
    got = {}
    for r in sk.collect():
        got.setdefault(r.g, []).append((r.h, r.v))
    assert {g: sorted(v) for g, v in got.items()} == {
        g: _sketch_py(v, k=K) for g, v in by_g.items()
    }
    # unsaturated group "z": grouped quantiles are exact for it
    med = {
        r.g: r.est_value
        for r in qsketch.q_quantiles_grouped(sk, ["g"], [0.5], k=K).collect()
    }
    assert med["z"] == _quant_py([v for _, v in by_g["z"]], 500_000)
    # roll-up across all groups == the global sketch (ids globally unique)
    rolled = qsketch.q_merge_grouped(sk, [], k=K)
    whole = qsketch.q_build(
        df.select(F.col("id"), F.col("v")), "v", "id", k=K
    )
    assert sorted((r.h, r.v) for r in rolled.collect()) == sorted(
        (r.h, r.v) for r in whole.collect()
    )
    with pytest.raises(ValueError):
        qsketch.q_build_grouped(df, [], "v", "id", k=K)
    with pytest.raises(ValueError):
        qsketch.q_quantiles_grouped(sk, [], [0.5], k=K)


def test_cdf_micro_matches_replica(spark):
    sk = qsketch.q_build(_rows(spark, ROWS_SMALL), k=K)
    got = {
        r.x: (r.n_sample, r.rank_micro)
        for r in qsketch.q_cdf_micro(sk, [0.5, 1.0, 2.5, 99.0]).collect()
    }
    vals = [3.0, 1.0, 2.0]
    for x, (n, rm) in got.items():
        le = sum(1 for v in vals if v <= x)
        assert (n, rm) == (len(vals), (le * qsketch.MICRO) // len(vals))
    with pytest.raises(ValueError):
        qsketch.q_cdf_micro(sk, [])


def test_grouped_cdf_matches_replica(spark):
    rows = [("a", i, float(i)) for i in range(1, 5)] + [
        ("b", 100 + i, float(i * 10)) for i in range(1, 4)
    ]
    df = spark.createDataFrame(rows, "g string, id bigint, v double")
    sk = qsketch.q_build_grouped(df, ["g"], "v", "id", k=K)
    got = {
        (r.g, r.x): (r.n_sample, r.rank_micro)
        for r in qsketch.q_cdf_micro_grouped(sk, ["g"], [2.0, 25.0]).collect()
    }
    pops = {"a": [1.0, 2.0, 3.0, 4.0], "b": [10.0, 20.0, 30.0]}
    for (g, x), (n, rm) in got.items():
        le = sum(1 for v in pops[g] if v <= x)
        assert (n, rm) == (len(pops[g]), (le * qsketch.MICRO) // len(pops[g]))
    with pytest.raises(ValueError):
        qsketch.q_cdf_micro_grouped(sk, [], [1.0])
    with pytest.raises(ValueError):
        qsketch.q_cdf_micro_grouped(sk, ["g"], [])


def test_saturated_median_lands_in_the_rank_band(spark):
    """Accuracy, not just mechanics: k=256 over a 40k-value population —
    the estimated median's TRUE rank must sit within the documented 3σ
    rank band (3*sqrt(0.25/k) ≈ 9.4%)."""
    n, k = 40_000, 256
    df = spark.range(n).select(
        F.col("id").alias("id"),
        ((F.col("id") * 7919) % n).cast("double").alias("v"),
    )
    sk = qsketch.q_build(df, "v", "id", k=k)
    row = qsketch.q_quantiles(sk, [0.5], k=k).collect()[0]
    assert row.n_sample == k
    # v is a permutation of 0..n-1, so true rank of value x is (x+1)/n
    true_rank = (row.est_value + 1) / n
    band = 3 * math.sqrt(0.25 / k)
    assert abs(true_rank - 0.5) <= band, (true_rank, band)


def test_build_plan_is_takeordered_no_global_sort(spark):
    """The build must be TakeOrderedAndProject — a global Sort+Exchange
    over the corpus would be the exact cost the sketch exists to avoid."""
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v")
    )
    plan = (
        qsketch.q_build(df, "v", "id", k=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_empty_sketch_yields_empty_results_even_under_ansi(spark):
    """The ANSI-mode trap: element_at([], 1) and a 0/0 rank division
    both THROW on a vanilla (ANSI-on) session — an empty sketch must
    short-circuit to zero rows instead, on quantiles and CDF alike."""
    empty = spark.createDataFrame([], "h long, v double")
    old = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        assert qsketch.q_quantiles(empty, [0.5], k=K).collect() == []
        assert qsketch.q_cdf_micro(empty, [1.0]).collect() == []
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_prefilter_contract(spark):
    """A prefilter >= the true kth hash yields the IDENTICAL sketch; a
    bound that cuts real minima surfaces as an unsaturated n_sample
    (the loud-failure half of the contract)."""
    df = _rows(spark, [(i, float(i % 7)) for i in range(200)])
    full = qsketch.q_build(df, k=K)
    got = sorted((r.h, r.v) for r in full.collect())
    kth = got[-1][0]
    pre = qsketch.q_build(df, k=K, prefilter=kth + 1)
    assert sorted((r.h, r.v) for r in pre.collect()) == got
    # a too-tight bound cuts minima -> unsaturated sample is visible
    cut = qsketch.q_build(df, k=K, prefilter=got[2][0])
    row = qsketch.q_quantiles(cut, [0.5], k=K).collect()[0]
    assert row.n_sample < K


def test_randomized_grouped_differential(spark):
    """60 seeded random populations (varied sizes, duplicate values,
    per-case NULL ids and values) sketched in ONE Spark job via the
    grouped path, each compared row-for-row and quantile-for-quantile
    against the pure Python replica — the grouped-KMV/CM discipline."""
    import random

    rng = random.Random(0x95E7C4)
    cases = {}
    rows = []
    for c in range(60):
        n = rng.randint(0, 30)
        pop = [
            (f"{c}:{i}", float(rng.randint(-5, 20)) / 2) for i in range(n)
        ]
        cases[c] = pop
        rows.extend((c, rid, v) for rid, v in pop)
        rows.append((c, None, 1.0))  # NULL id is excluded
        rows.append((c, f"{c}:nullv", None))  # NULL value is excluded
    df = spark.createDataFrame(rows, "cid int, id string, v double")
    sk = qsketch.q_build_grouped(df, ["cid"], "v", "id", k=K)
    got = {}
    for r in sk.collect():
        got.setdefault(r.cid, []).append((r.h, r.v))
    for c, pop in cases.items():
        assert sorted(got.get(c, [])) == _sketch_py(pop, k=K), c
    qs = qsketch.q_quantiles_grouped(sk, ["cid"], [0.25, 0.5, 0.9], k=K)
    est = {(r.cid, r.p_micro): (r.n_sample, r.est_value) for r in qs.collect()}
    for c, pop in cases.items():
        sample = [v for _, v in _sketch_py(pop, k=K)]
        if not sample:
            assert not any(cid == c for cid, _ in est)
            continue
        for pm in (250_000, 500_000, 900_000):
            assert est[(c, pm)] == (len(sample), _quant_py(sample, pm)), (
                c,
                pm,
            )


def test_range_boundaries_balance_and_assignment(spark):
    """The layout lever: boundaries from a k=256 sketch over 40k rows
    split the population into 8 ranges each within the documented rank
    band of 1/8; assignment is shuffle-free Column math; the
    unsaturated regime yields EXACT quantile boundaries."""
    n, k, n_ranges = 40_000, 256, 8
    df = spark.range(n).select(
        F.col("id"), ((F.col("id") * 7919) % n).cast("double").alias("v")
    )
    sk = qsketch.q_build(df, "v", "id", k=k)
    brows = qsketch.q_range_boundaries(sk, n_ranges, k=k).collect()
    assert sorted(r.boundary_no for r in brows) == list(range(1, n_ranges))
    bounds = [r.value for r in sorted(brows, key=lambda r: r.boundary_no)]
    assert bounds == sorted(bounds)
    assigned = qsketch.assign_range_ids(df, "v", bounds)
    sizes = {
        r.range_id: r.cnt
        for r in assigned.groupBy("range_id").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    assert set(sizes) == set(range(n_ranges))
    band = 3 * math.sqrt(0.25 / k)  # rank band per boundary
    for rid, cnt in sizes.items():
        assert abs(cnt / n - 1 / n_ranges) <= 2 * band, (rid, cnt)
    # NULL values carry no rank
    with_null = spark.createDataFrame([(1, None)], "id bigint, v double")
    assert (
        qsketch.assign_range_ids(with_null, "v", bounds).collect()[0].range_id
        is None
    )
    # unsaturated: boundaries are exact discrete quantiles
    small = _rows(spark, [(i, float(i)) for i in range(1, 9)])
    sk_small = qsketch.q_build(small, k=16)
    got = {
        r.boundary_no: r.value
        for r in qsketch.q_range_boundaries(sk_small, 4, k=16).collect()
    }
    assert got == {1: 2.0, 2: 4.0, 3: 6.0}
    with pytest.raises(ValueError):
        qsketch.q_range_boundaries(sk_small, 1, k=16)
    with pytest.raises(ValueError):
        qsketch.assign_range_ids(small, "v", [])


# --- the r12 catalog gate (REGISTERED in plans/catalog_r12.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry — the catalog_r11 pattern) ----------------------

from advanced_elb_logs_etl_spark.plans.catalog_r12 import (  # noqa: E402
    QS_GATE_BOUNDS as GATE_BOUNDS,  # noqa: F401  (band documentation)
    QS_GATE_K as GATE_K,
    QS_GATE_PROBS as GATE_PROBS,
    QSKETCH_ORACLE as QSKETCH_ORACLE_QUEUED_R14,
    q_quantile_sketch_report,
)


# The range-layout gate is REGISTERED in plans/catalog_r13.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry (the catalog_r12 pattern).
from advanced_elb_logs_etl_spark.plans.catalog_r13 import (  # noqa: E402
    LAYOUT_RANGES,
    QLAYOUT_ORACLE as QLAYOUT_ORACLE_QUEUED_R17,
    q_quantile_range_layout,
)


def test_queued_layout_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the registered r13 layout entry
    at sf0.01 through the pandas fetch path: 8 ranges, every range
    non-empty and within the sketch's rank band of ideal."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_quantile_range_layout(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(
        tuple(str(x) for x in r) for r in spd.itertuples(index=False)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    dpd = con.execute(QLAYOUT_ORACLE_QUEUED_R17).df()
    assert sorted(dpd.columns) == scols
    drows = sorted(
        tuple(str(x) for x in r) for r in dpd[scols].itertuples(index=False)
    )
    assert srows == drows
    assert len(srows) == LAYOUT_RANGES
    total = sum(r.n_rows for r in spd.itertuples(index=False))
    band = 3 * math.sqrt(0.25 / GATE_K) + 1.0 / LAYOUT_RANGES / 4
    for r in spd.itertuples(index=False):
        assert abs(r.n_rows / total - 1 / LAYOUT_RANGES) <= band, tuple(r)


def test_queued_catalog_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the registered r12 entry at
    sf0.01:
    sorted-column value comparison through the pandas fetch path (the
    driver-equivalent form, per the r10 postmortem)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_quantile_sketch_report(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(tuple(str(x) for x in r) for r in spd.itertuples(index=False))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    dpd = con.execute(QSKETCH_ORACLE_QUEUED_R14).df()
    assert sorted(dpd.columns) == scols
    drows = sorted(
        tuple(str(x) for x in r)
        for r in dpd[scols].itertuples(index=False)
    )
    assert srows == drows
    assert len(srows) == len(GATE_PROBS)
    # the gate exercises the SATURATED regime and the band actually holds
    for r in spd.itertuples(index=False):
        assert r.n_sample == GATE_K
        assert bool(r.within_bound), (r.p_micro, r.exact_rank_micro)
