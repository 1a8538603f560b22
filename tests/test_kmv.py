"""KMV/theta distinct sketch (operators/kmv.py): pure-Python replica
differentials, the exact-under-k regime, the saturated estimator, exact
mergeability, the prefilter contract, and the DuckDB twin rehearsal for
the queued r11 catalog gate (`kmv_distinct_setops`) — validated here so
registration is a freeze-compliant pre-rehearsed move."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import kmv

K = 8  # small k so the saturated regime is cheap to exercise


def _h_py(s: str) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def _kmv_py(keys, k=K):
    return sorted({_h_py(k_) for k_ in keys if k_ is not None})[:k]


def _est_py(hashes, k=K):
    if len(hashes) < k:
        return len(hashes)
    return int(math.floor(float((k - 1) << 60) / float(hashes[k - 1])))


def _rows(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


KEYS_A = [f"user{i}" for i in range(40)] + ["user3", "user7"] * 5
KEYS_B = [f"user{i}" for i in range(20, 70)]
KEYS_SMALL = ["a", "b", "c", None, "a"]


def test_build_matches_python_minima(spark):
    got = [r.h for r in kmv.kmv_build(_rows(spark, KEYS_A), k=K).collect()]
    assert sorted(got) == _kmv_py(KEYS_A)
    # duplicates and NULLs are ignored (COUNT DISTINCT semantics)
    small = [r.h for r in kmv.kmv_build(_rows(spark, KEYS_SMALL), k=K).collect()]
    assert sorted(small) == _kmv_py(KEYS_SMALL)
    with pytest.raises(ValueError):
        kmv.kmv_build(_rows(spark, KEYS_SMALL), k=1)


def test_estimate_exact_under_k_and_saturated(spark):
    # under k distinct hashes the count is EXACT
    sk = kmv.kmv_build(_rows(spark, KEYS_SMALL), k=K)
    row = kmv.kmv_estimate(sk, k=K).collect()[0]
    assert (row.n_hashes, row.est_distinct) == (3, 3)
    # saturated: matches the replica formula bit-for-bit, and lands in a
    # sane multiplicative band around truth (k=8 is a coarse sketch)
    sk_a = kmv.kmv_build(_rows(spark, KEYS_A), k=K)
    row = kmv.kmv_estimate(sk_a, k=K).collect()[0]
    replica = _kmv_py(KEYS_A)
    assert row.n_hashes == K and row.kth_hash == replica[K - 1]
    assert row.est_distinct == _est_py(replica)
    truth = len(set(KEYS_A))
    assert truth / 4 <= row.est_distinct <= truth * 4


def test_union_equals_build_of_concatenation(spark):
    merged = kmv.kmv_union(
        kmv.kmv_build(_rows(spark, KEYS_A), k=K),
        kmv.kmv_build(_rows(spark, KEYS_B), k=K),
        k=K,
    )
    whole = kmv.kmv_build(_rows(spark, KEYS_A + KEYS_B), k=K)
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in whole.collect()
    )
    with pytest.raises(ValueError):
        kmv.kmv_union(k=K)


def test_intersect_estimate_replica_and_exact_regime(spark):
    a = kmv.kmv_build(_rows(spark, KEYS_A), k=K)
    b = kmv.kmv_build(_rows(spark, KEYS_B), k=K)
    row = kmv.kmv_intersect_estimate(a, b, k=K).collect()[0]
    ra, rb = _kmv_py(KEYS_A), _kmv_py(KEYS_B)
    theta = min(ra[K - 1] if len(ra) >= K else kmv.M,
                rb[K - 1] if len(rb) >= K else kmv.M)
    common = len({h for h in ra if h < theta} & {h for h in rb if h < theta})
    assert (row.n_common, row.theta) == (common, theta)
    want = (
        common
        if theta >= kmv.M
        else int(math.floor(float(common) * float(kmv.M) / float(theta)))
    )
    assert row.est_intersect == want
    # both unsaturated -> the estimate IS the exact intersection count
    sa = kmv.kmv_build(_rows(spark, ["a", "b", "c"]), k=K)
    sb = kmv.kmv_build(_rows(spark, ["b", "c", "d"]), k=K)
    row = kmv.kmv_intersect_estimate(sa, sb, k=K).collect()[0]
    assert (row.theta, row.est_intersect) == (kmv.M, 2)


def test_difference_estimate_replica_and_exact_regime(spark):
    """A-NOT-B completes the theta set algebra: replica-exact in the
    saturated regime, EXACT when both sketches are unsaturated, and the
    three estimates compose (|A| ~ |A∩B| + |A\\B| under one theta)."""
    a = kmv.kmv_build(_rows(spark, KEYS_A), k=K)
    b = kmv.kmv_build(_rows(spark, KEYS_B), k=K)
    row = kmv.kmv_difference_estimate(a, b, k=K).collect()[0]
    ra, rb = _kmv_py(KEYS_A), _kmv_py(KEYS_B)
    theta = min(ra[K - 1] if len(ra) >= K else kmv.M,
                rb[K - 1] if len(rb) >= K else kmv.M)
    only = len({h for h in ra if h < theta} - set(rb))
    assert (row.n_only, row.theta) == (only, theta)
    want = (
        only
        if theta >= kmv.M
        else int(math.floor(float(only) * float(kmv.M) / float(theta)))
    )
    assert row.est_difference == want
    # under one theta the sample partitions: common + only = |a below theta|
    common = kmv.kmv_intersect_estimate(a, b, k=K).collect()[0].n_common
    below = len([h for h in ra if h < theta])
    assert common + only == below
    # both unsaturated -> the estimate IS the exact difference count
    sa = kmv.kmv_build(_rows(spark, ["a", "b", "c"]), k=K)
    sb = kmv.kmv_build(_rows(spark, ["b", "c", "d"]), k=K)
    row = kmv.kmv_difference_estimate(sa, sb, k=K).collect()[0]
    assert (row.theta, row.est_difference) == (kmv.M, 1)
    # and the empty difference is zero
    row = kmv.kmv_difference_estimate(sa, sa, k=K).collect()[0]
    assert row.est_difference == 0


def test_sliding_estimate_matches_window_rebuilds(spark):
    """The trailing-window operator: every window's estimate must equal
    kmv_estimate of a fresh build over the window's concatenated keys
    (mergeable summaries, window = re-minimized union); window=1
    degenerates to the grouped per-bucket estimates; exact under k."""
    hours = {
        10: [f"u{i}" for i in range(20)],
        11: [f"u{i}" for i in range(10, 35)],
        # hour 12 empty (absent)
        13: [f"v{i}" for i in range(6)],
        14: [f"u{i}" for i in range(30, 50)] + ["u1"],
    }
    rows = [(hr, key) for hr, keys in hours.items() for key in keys]
    df = spark.createDataFrame(rows, "hr bigint, key string")
    sk = kmv.kmv_build_grouped(df, ["hr"], "key", k=K)
    for win in (1, 3):
        got = {
            r.hr: (r.n_hashes, r.kth_hash, r.est_distinct)
            for r in kmv.kmv_sliding_estimate(sk, "hr", win, k=K).collect()
        }
        assert set(got) == set(hours)
        for hr in hours:
            member_keys = [
                key
                for h2 in range(hr - win + 1, hr + 1)
                for key in hours.get(h2, [])
            ]
            want = kmv.kmv_estimate(
                kmv.kmv_build(_rows(spark, member_keys), k=K), k=K
            ).collect()[0]
            assert got[hr] == (
                want.n_hashes,
                want.kth_hash,
                want.est_distinct,
            ), (win, hr)
    # hour 13 with window=1: exact count of its 6 distinct keys
    got1 = {
        r.hr: r.est_distinct
        for r in kmv.kmv_sliding_estimate(sk, "hr", 1, k=K).collect()
    }
    assert got1[13] == 6
    with pytest.raises(ValueError):
        kmv.kmv_sliding_estimate(sk, "hr", 0, k=K)


def test_pairwise_intersect_matches_per_pair_estimates(spark):
    """The overlap-matrix operator: for every requested (g1, g2) pair
    the grouped form must produce EXACTLY kmv_intersect_estimate's
    numbers from single-group sketches; zero-overlap pairs emit 0; a
    pair naming an absent group is dropped (inner-join semantics)."""
    groups = {
        "mon": [f"u{i}" for i in range(30)],
        "tue": [f"u{i}" for i in range(15, 45)],
        "wed": [f"w{i}" for i in range(20)],  # disjoint from mon
    }
    rows = [(g, key) for g, keys in groups.items() for key in keys]
    df = spark.createDataFrame(rows, "g string, key string")
    sk = kmv.kmv_build_grouped(df, ["g"], "key", k=K)
    pairs = spark.createDataFrame(
        [("mon", "tue"), ("mon", "wed"), ("tue", "ghost")],
        "g1 string, g2 string",
    )
    got = {
        (r.g1, r.g2): (r.n_common, r.theta, r.est_intersect)
        for r in kmv.kmv_pairwise_intersect(sk, "g", pairs, k=K).collect()
    }
    assert set(got) == {("mon", "tue"), ("mon", "wed")}  # ghost dropped
    for g1, g2 in got:
        a = kmv.kmv_build(_rows(spark, groups[g1]), k=K)
        b = kmv.kmv_build(_rows(spark, groups[g2]), k=K)
        want = kmv.kmv_intersect_estimate(a, b, k=K).collect()[0]
        assert got[(g1, g2)] == (
            want.n_common,
            want.theta,
            want.est_intersect,
        ), (g1, g2)
    assert got[("mon", "wed")][0] == 0  # disjoint: zero common hashes


def test_prefilter_contract(spark):
    """A prefilter >= the true kth hash yields the identical sketch; a
    too-small one surfaces as a LOUD in-plan failure through
    kmv_estimate(expect_saturated=True), never a skewed estimate."""
    replica = _kmv_py(KEYS_A)
    full = kmv.kmv_build(_rows(spark, KEYS_A), k=K)
    pre = kmv.kmv_build(
        _rows(spark, KEYS_A), k=K, prefilter=replica[K - 1] + 1
    )
    assert sorted(r.h for r in pre.collect()) == sorted(
        r.h for r in full.collect()
    )
    bad = kmv.kmv_build(_rows(spark, KEYS_A), k=K, prefilter=replica[2])
    with pytest.raises(Exception, match="prefilter may have cut"):
        kmv.kmv_estimate(bad, k=K, expect_saturated=True).collect()
    # the expect_saturated guard passes (and changes nothing) when the
    # sketch is genuinely saturated
    row = kmv.kmv_estimate(full, k=K, expect_saturated=True).collect()[0]
    assert row.n_hashes == K


# --- the r11 catalog gate (REGISTERED in plans/catalog_r11.py; the
# rehearsal below imports the registered body + oracle so it exercises
# the exact catalog entry — the catalog_r10/cmsketch pattern) ----------
# Distinct-user set operations across two event segments at k=64:
# saturated at sf0.01 (150 distinct users/type > 64), exact at sf0.001.
# Every output column is BIGINT (the r10 float policy: integer-only
# registered surfaces where the information permits).

from advanced_elb_logs_etl_spark.plans.catalog_r11 import (  # noqa: E402
    GATE_K,
    KMV_SETOPS_ORACLE as KMV_ORACLE_QUEUED_R11,
    q_kmv_distinct_setops,
)


def test_queued_catalog_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the queued r11 entry at sf0.01:
    sorted-column value comparison under the full-precision oracle_sim
    normalization (all-integer surface, so this is exact)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_kmv_distinct_setops(spark, sf)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(x) for x in r) for r in sdf.select(*scols).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    d = con.execute(KMV_ORACLE_QUEUED_R11)
    cols = [c[0] for c in d.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    drows = sorted(tuple(str(r[i]) for i in idx) for r in d.fetchall())
    assert sorted(cols) == scols
    assert srows == drows
    assert len(srows) == 1
    # the gate actually exercises the SATURATED regime at sf0.01
    row = {c: v for c, v in zip(sorted(cols), drows[0])}
    assert int(row["exact_a"]) > GATE_K


# --- the r12 catalog gate (REGISTERED in plans/catalog_r12.py as
# `kmv_retention_matrix`; the rehearsal imports the registered body +
# oracle so it exercises the exact catalog entry).  The streamed form
# (below) and the sliding-window gate stay here until their window
# rounds (r13/r14 queue). ---------------------------------------------

from advanced_elb_logs_etl_spark.plans.catalog_r12 import (  # noqa: E402
    _DAY_US,
    KMV_RETENTION_ORACLE as KMV_RETENTION_ORACLE_QUEUED_R15,
    RET_K,
    q_kmv_retention_matrix,
)


# The streamed retention matrix and the sliding-window gate are
# REGISTERED in plans/catalog_r13.py; the rehearsals import the
# registered bodies + oracles so they exercise the exact catalog
# entries (the catalog_r12 pattern).
from advanced_elb_logs_etl_spark.plans.catalog_r13 import (  # noqa: E402
    KMV_SLIDING_ORACLE as KMV_SLIDING_ORACLE_QUEUED_R17,
    q_kmv_sliding_distinct,
    q_stream_kmv_retention_matrix,
)


def test_queued_sliding_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the registered r13 entry at
    sf0.01 through the pandas fetch path: 30 trailing-window estimates,
    every window saturated."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_kmv_sliding_distinct(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(
        tuple(str(x) for x in r) for r in spd.itertuples(index=False)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    dpd = con.execute(KMV_SLIDING_ORACLE_QUEUED_R17).df()
    assert sorted(dpd.columns) == scols
    drows = sorted(
        tuple(str(x) for x in r) for r in dpd[scols].itertuples(index=False)
    )
    assert srows == drows
    assert len(srows) == 30
    assert all(r.n_hashes == RET_K for r in spd.itertuples(index=False))


def test_queued_stream_retention_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the queued r16 entry at sf0.01
    through the pandas fetch path: the streamed store must reproduce
    the batch twin's 29 pairs exactly (slicing invariance end-to-end,
    real micro-batch engine)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_stream_kmv_retention_matrix(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(
        tuple(str(x) for x in r) for r in spd.itertuples(index=False)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    dpd = con.execute(KMV_RETENTION_ORACLE_QUEUED_R15).df()
    drows = sorted(
        tuple(str(x) for x in r) for r in dpd[scols].itertuples(index=False)
    )
    assert sorted(dpd.columns) == scols
    assert srows == drows
    assert len(srows) == 29


def test_queued_retention_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the queued r15 entry at sf0.01
    through the pandas fetch path (driver-equivalent, r10 postmortem):
    29 consecutive-day pairs, every sketch saturated."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_kmv_retention_matrix(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(
        tuple(str(x) for x in r) for r in spd.itertuples(index=False)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    dpd = con.execute(KMV_RETENTION_ORACLE_QUEUED_R15).df()
    assert sorted(dpd.columns) == scols
    drows = sorted(
        tuple(str(x) for x in r) for r in dpd[scols].itertuples(index=False)
    )
    assert srows == drows
    assert len(srows) == 29
    # every pair exercises the SATURATED estimator (theta < 2^60) and
    # the estimates sit in a sane band around the true overlap (~115)
    assert all(int(r.theta) < kmv.M for r in spd.itertuples(index=False))
    for r in spd.itertuples(index=False):
        assert 115 / 3 <= r.est_returning <= 115 * 3, tuple(r)


def test_prefilter_bounds_shuffle_records_measured(spark):
    """The production theta-trick claim, MEASURED from executed-plan
    SQLMetrics (the test_plan_quality discipline): an unfiltered build
    shuffles the per-partition distinct hash set, while a prefiltered
    build (prior epoch's theta) shuffles at most ~k rows per map
    partition — and produces the identical sketch."""
    from test_plan_quality import _executed_metric_sum
    from pyspark.sql import functions as F

    keys = spark.range(100_000).select(
        (F.col("id") % 10_000).cast("string").alias("key")
    )
    full = kmv.kmv_build(keys, k=K)
    got = full.collect()
    shuffled_full = _executed_metric_sum(
        full, "Exchange", "shuffleRecordsWritten"
    )
    kth = max(r.h for r in got)
    pre = kmv.kmv_build(keys, k=K, prefilter=kth + 1)
    got_pre = pre.collect()
    shuffled_pre = _executed_metric_sum(
        pre, "Exchange", "shuffleRecordsWritten"
    )
    assert sorted(r.h for r in got_pre) == sorted(r.h for r in got)
    # unfiltered: the distinct set (10k hashes) moves; prefiltered: only
    # hashes below theta survive the scan-side filter — orders less
    assert shuffled_full >= 9_000, shuffled_full
    n_parts = keys.rdd.getNumPartitions()
    assert 0 < shuffled_pre <= K * max(n_parts, 1) + 16, (
        shuffled_pre,
        n_parts,
    )


def test_grouped_build_estimate_and_rollup(spark):
    """Per-group sketches match the per-group python replica; grouped
    estimates use the same integer-exact estimator; and the roll-up
    (kmv_merge_grouped under a coarser grouping) equals a direct build
    at that grouping — the union-across-hours contract."""
    rows = [
        ("d1", "h1", u) for u in [f"a{i}" for i in range(30)]
    ] + [
        ("d1", "h2", u) for u in [f"b{i}" for i in range(5)]
    ] + [
        ("d2", "h1", u) for u in [f"a{i}" for i in range(10, 50)]
    ]
    df = spark.createDataFrame(rows, "day string, hour string, key string")
    sk = kmv.kmv_build_grouped(df, ["day", "hour"], k=K)
    got = {}
    for r in sk.collect():
        got.setdefault((r.day, r.hour), []).append(r.h)
    want = {
        ("d1", "h1"): _kmv_py([f"a{i}" for i in range(30)]),
        ("d1", "h2"): _kmv_py([f"b{i}" for i in range(5)]),
        ("d2", "h1"): _kmv_py([f"a{i}" for i in range(10, 50)]),
    }
    assert {g: sorted(v) for g, v in got.items()} == want
    # grouped estimates: exact under k, replica formula at k
    est = {
        (r.day, r.hour): (r.n_hashes, r.est_distinct)
        for r in kmv.kmv_estimate_grouped(sk, ["day", "hour"], k=K).collect()
    }
    assert est[("d1", "h2")] == (5, 5)
    assert est[("d1", "h1")] == (K, _est_py(want[("d1", "h1")]))
    # roll-up to per-day == direct build at per-day grouping
    rolled = kmv.kmv_merge_grouped(sk, ["day"], k=K)
    direct = kmv.kmv_build_grouped(df, ["day"], k=K)
    assert sorted(map(tuple, rolled.collect())) == sorted(
        map(tuple, direct.collect())
    )
    with pytest.raises(ValueError):
        kmv.kmv_build_grouped(df, ["day"], k=1)


def test_grouped_guards_and_global_rollup(spark):
    """Empty group_cols must not silently become a single-partition
    global window (r10 self-review): build raises, merge falls through
    to the TakeOrdered union form and equals the global build."""
    df = spark.createDataFrame(
        [("g", f"x{i}") for i in range(20)], "g string, key string"
    )
    with pytest.raises(ValueError, match="use kmv_build"):
        kmv.kmv_build_grouped(df, [], k=K)
    sk = kmv.kmv_build_grouped(df, ["g"], k=K)
    rolled = kmv.kmv_merge_grouped(sk, [], k=K)
    direct = kmv.kmv_build(df, k=K)
    assert sorted(r.h for r in rolled.collect()) == sorted(
        r.h for r in direct.collect()
    )


def test_randomized_grouped_differential(spark):
    """60 seeded random multisets (varied sizes, duplicate densities,
    unicode keys) sketched in ONE Spark job via the grouped path, each
    compared hash-for-hash and estimate-for-estimate against the pure
    Python replica — the randomized-differential pattern of the
    streaming store tests."""
    import random

    rng = random.Random(0xC0FFEE)
    alphabet = ["alpha", "beta", "γάμμα", "δ", "e-mail@x", "tab\tkey", "0"]
    cases = {}
    rows = []
    for c in range(60):
        n = rng.randint(0, 40)
        dom = rng.randint(1, 12)
        keys = [
            f"{rng.choice(alphabet)}#{rng.randint(0, dom)}" for _ in range(n)
        ]
        cases[c] = keys
        rows.extend((c, k_) for k_ in keys)
        rows.append((c, None))  # every case carries a NULL to ignore
    df = spark.createDataFrame(rows, "cid int, key string")
    sk = kmv.kmv_build_grouped(df, ["cid"], k=K)
    got_hashes = {}
    for r in sk.collect():
        got_hashes.setdefault(r.cid, []).append(r.h)
    est = {
        r.cid: (r.n_hashes, r.est_distinct)
        for r in kmv.kmv_estimate_grouped(sk, ["cid"], k=K).collect()
    }
    for c, keys in cases.items():
        replica = _kmv_py(keys)
        assert sorted(got_hashes.get(c, [])) == replica, c
        if replica:
            assert est[c] == (len(replica), _est_py(replica)), c
        else:
            assert c not in est  # empty case: no sketch rows, no estimate
