"""Count-Min sketch (operators/cmsketch.py): pure-Python cell-level
differential, the one-sided estimate guarantee, exact mergeability,
weighted builds, and the DuckDB twin rehearsal for the queued r10
catalog gate (`cm_point_frequency`) — validated here so registration is
a freeze-compliant pre-rehearsed move, never a never-checked entry."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import cmsketch as cm

W, D = 64, 4  # small geometry so fixture collisions actually occur


def _h60_py(s: str, seed: int) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


def _cm_py(keys, width=W, depth=D, weights=None):
    cells: dict[tuple[int, int], int] = {}
    for i, k in enumerate(keys):
        w = 1 if weights is None else weights[i]
        for r in range(depth):
            b = _h60_py(k, r) % width
            cells[(r, b)] = cells.get((r, b), 0) + w
    return cells


def _est_py(cells, key, width=W, depth=D):
    return min(cells.get((r, _h60_py(key, r) % width), 0) for r in range(depth))


KEYS = list("aaabbbcdde") * 3 + ["boilerplate"] * 7 + list("xyz")


def _rows(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_build_matches_python_cell_for_cell(spark):
    got = {
        (r.row, r.bucket): r.cnt
        for r in cm.cm_build(_rows(spark, KEYS), width=W, depth=D).collect()
    }
    assert got == _cm_py(KEYS)


def test_estimate_is_one_sided_and_matches_replica(spark):
    sk = cm.cm_build(_rows(spark, KEYS), width=W, depth=D)
    probe_keys = sorted(set(KEYS)) + ["absent1", "absent2"]
    got = {
        r.key: r.est
        for r in cm.cm_estimate(
            sk, _rows(spark, probe_keys), width=W, depth=D
        ).collect()
    }
    cells = _cm_py(KEYS)
    true = {k: KEYS.count(k) for k in probe_keys}
    n = len(KEYS)
    for k in probe_keys:
        assert got[k] == _est_py(cells, k), k  # deterministic replica
        assert true[k] <= got[k] <= true[k] + n, k  # one-sided, bounded


def test_merge_equals_single_build(spark):
    a, b = KEYS[:11], KEYS[11:]
    merged = cm.cm_merge(
        cm.cm_build(_rows(spark, a), width=W, depth=D),
        cm.cm_build(_rows(spark, b), width=W, depth=D),
    )
    whole = cm.cm_build(_rows(spark, KEYS), width=W, depth=D)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_weighted_build(spark):
    df = spark.createDataFrame(
        [("a", 3), ("b", 2), ("a", 1)], "key string, n long"
    )
    got = {
        (r.row, r.bucket): r.cnt
        for r in cm.cm_build(df, width=W, depth=D, weight_col="n").collect()
    }
    assert got == _cm_py(["a", "b", "a"], weights=[3, 2, 1])


def test_null_keys_dropped_and_geometry_guard(spark):
    df = spark.createDataFrame([("a",), (None,)], "key string")
    total = (
        cm.cm_build(df, width=W, depth=D).agg(F.sum("cnt")).collect()[0][0]
    )
    assert total == D  # one key, D cells
    with pytest.raises(ValueError):
        cm.cm_build(df, width=0)


# --- the registered r10 catalog gate, rehearsed against DuckDB -----------
# The registration bodies moved to plans/catalog_r10.py in round 10 (the
# mechanical move promised here in r9); the rehearsal below now imports
# and exercises the EXACT registered entry.

from advanced_elb_logs_etl_spark.plans.catalog_r10 import (  # noqa: E402
    _CM_ORACLE as CM_ORACLE_QUEUED_R10,
    _CM_PROBE_TERMS as CM_PROBE_TERMS,
    q_cm_point_frequency,
)


def test_queued_catalog_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the queued r10 entry at sf0.01:
    sorted-column value comparison, the oracle_sim normalization."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_cm_point_frequency(spark, sf)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(x) for x in r) for r in sdf.select(*scols).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    d = con.execute(CM_ORACLE_QUEUED_R10)
    cols = [c[0] for c in d.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    drows = sorted(tuple(str(r[i]) for i in idx) for r in d.fetchall())
    assert sorted(cols) == scols
    assert srows == drows
    assert len(srows) == len(CM_PROBE_TERMS)


def test_weight_guards(spark):
    """The overestimate-only contract's weight preconditions (r9
    self-review): fractional dtypes rejected driver-side; NULL and
    negative weights fail the job loudly instead of silently
    undercounting."""
    frac = spark.createDataFrame([("a", 1.5)], "key string, n double")
    with pytest.raises(ValueError, match="integral"):
        cm.cm_build(frac, weight_col="n")
    from py4j.protocol import Py4JJavaError

    bad_null = spark.createDataFrame(
        [("a", 2), ("b", None)], "key string, n long"
    )
    with pytest.raises(Exception) as ei:
        cm.cm_build(bad_null, width=W, depth=D, weight_col="n").collect()
    assert "weight" in str(ei.value) or "ASSERT" in str(ei.value).upper()
    bad_neg = spark.createDataFrame([("a", -1)], "key string, n long")
    with pytest.raises(Exception) as ei:
        cm.cm_build(bad_neg, width=W, depth=D, weight_col="n").collect()
    assert "weight" in str(ei.value) or "ASSERT" in str(ei.value).upper()


def test_leftover_cm_w_column_is_ignored_when_unweighted(spark):
    """A caller frame that happens to carry a _cm_w column must NOT be
    silently treated as weighted (r9 self-review): unweighted builds
    count 1 per row regardless of ambient column names."""
    df = spark.createDataFrame([("a", 99), ("a", 99)], "key string, _cm_w long")
    total = cm.cm_build(df, width=W, depth=D).agg(F.sum("cnt")).collect()[0][0]
    assert total == 2 * D  # two rows x D cells, weight 1 each


def test_geometry_guard_catches_larger_sketch(spark):
    """ADVICE r10: probing a sketch built at a LARGER geometry fails
    loudly (cells outside the probe's depth x width) instead of
    returning garbage; the guard never false-positives on the correct
    geometry and can be opted out on pinned-geometry hot paths."""
    sk = cm.cm_build(_rows(spark, KEYS), width=W, depth=D)
    probes = _rows(spark, ["a", "b"])
    # correct geometry: guarded estimates equal the unguarded ones
    ok = {
        r.key: r.est
        for r in cm.cm_estimate(sk, probes, width=W, depth=D).collect()
    }
    raw = {
        r.key: r.est
        for r in cm.cm_estimate(
            sk, probes, width=W, depth=D, check_geometry=False
        ).collect()
    }
    assert ok == raw
    # probe at a smaller geometry: the guard fires inside the job
    with pytest.raises(Exception, match="geometry mismatch"):
        cm.cm_estimate(sk, probes, width=W // 4, depth=D).collect()
    with pytest.raises(Exception, match="geometry mismatch"):
        cm.cm_estimate(sk, probes, width=W, depth=1).collect()
    # opt-out skips the check (documented caller-owned geometry)
    cm.cm_estimate(
        sk, probes, width=W // 4, depth=D, check_geometry=False
    ).collect()


# --- cm_join_size: the inner-product join-size estimate -------------------


def _joinsize_py(keys_a, keys_b, width=W, depth=D):
    ca, cb = _cm_py(keys_a, width, depth), _cm_py(keys_b, width, depth)
    qs = []
    for r in range(depth):
        qs.append(
            sum(
                v * cb.get((rr, bb), 0)
                for (rr, bb), v in ca.items()
                if rr == r
            )
        )
    return min(qs)


def test_join_size_matches_replica_and_one_sided(spark):
    """Deterministic replica differential at a collision-heavy geometry,
    plus the inherited one-sided contract: true <= est (Cormode &
    Muthukrishnan 2005 §4.2 — each per-row inner product = true join
    size + non-negative collision cross terms)."""
    keys_b = list("abccc") * 4 + ["boilerplate"] * 2 + list("pqr")
    sa = cm.cm_build(_rows(spark, KEYS), width=W, depth=D)
    sb = cm.cm_build(_rows(spark, keys_b), width=W, depth=D)
    got = cm.cm_join_size(sa, sb, width=W, depth=D).collect()[0].est_join_size
    assert got == _joinsize_py(KEYS, keys_b)
    true_join = sum(
        KEYS.count(k) * keys_b.count(k) for k in set(KEYS) & set(keys_b)
    )
    assert got >= true_join
    # symmetric (inner products commute)
    assert (
        cm.cm_join_size(sb, sa, width=W, depth=D).collect()[0].est_join_size
        == got
    )


def test_join_size_exact_when_collision_free(spark):
    """At a width far above the key cardinality the estimate is EXACT
    (no colliding cross terms in any row), and disjoint key sets
    estimate zero."""
    a = _rows(spark, ["k1", "k1", "k2", "k3"])
    b = _rows(spark, ["k2", "k2", "k3", "zz"])
    est = cm.cm_join_size(
        cm.cm_build(a, width=4096, depth=D),
        cm.cm_build(b, width=4096, depth=D),
        width=4096,
        depth=D,
    ).collect()[0].est_join_size
    assert est == 1 * 0 + 1 * 2 + 1 * 1  # k2: 1x2, k3: 1x1
    disj = cm.cm_join_size(
        cm.cm_build(_rows(spark, ["a", "b"]), width=4096, depth=D),
        cm.cm_build(_rows(spark, ["c", "d"]), width=4096, depth=D),
        width=4096,
        depth=D,
    ).collect()[0].est_join_size
    assert disj == 0


def test_join_size_empty_side_is_zero_and_guard_fires(spark):
    """An empty sketch (no cells) gives est 0 via the depth-densified
    min; the geometry guard rejects a larger-geometry operand the same
    way cm_estimate's does."""
    empty = cm.cm_build(
        _rows(spark, ["x"]).filter("key IS NULL"), width=W, depth=D
    )
    full = cm.cm_build(_rows(spark, KEYS), width=W, depth=D)
    assert (
        cm.cm_join_size(empty, full, width=W, depth=D)
        .collect()[0]
        .est_join_size
        == 0
    )
    big = cm.cm_build(_rows(spark, KEYS), width=W * 8, depth=D)
    with pytest.raises(Exception) as ei:
        cm.cm_join_size(full, big, width=W, depth=D).collect()
    assert "geometry" in str(ei.value).lower() or "ASSERT" in str(
        ei.value
    ).upper()


def test_join_size_respects_merge(spark):
    """Sketch of (A1 ++ A2) == merged sketches, so the join-size
    estimate computed from shard sketches equals the single-build one —
    the per-day-trend use case costs nothing extra."""
    a1, a2 = KEYS[:10], KEYS[10:]
    b = list("abcde") * 3
    sb = cm.cm_build(_rows(spark, b), width=W, depth=D)
    merged = cm.cm_merge(
        cm.cm_build(_rows(spark, a1), width=W, depth=D),
        cm.cm_build(_rows(spark, a2), width=W, depth=D),
    )
    whole = cm.cm_build(_rows(spark, KEYS), width=W, depth=D)
    est_m = cm.cm_join_size(merged, sb, width=W, depth=D).collect()[0]
    est_w = cm.cm_join_size(whole, sb, width=W, depth=D).collect()[0]
    assert tuple(est_m) == tuple(est_w)


# --- the r12 catalog gate (REGISTERED in plans/catalog_r12.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry).  Join-size estimate for orders JOIN customer ON
# custkey at the default 1024x4 geometry, beside the exact join count
# (bounded-gate pattern).  All-BIGINT + BOOLEAN surface; DuckDB sums
# cast ::BIGINT (the r10 HUGEINT postmortem — enforced by the standing
# type gate). ---------------------------------------------------------

from advanced_elb_logs_etl_spark.plans.catalog_r12 import (  # noqa: E402
    CM_JOINSIZE_ORACLE as CM_JOINSIZE_ORACLE_QUEUED_R13,
    q_cm_join_size,
)


def test_queued_joinsize_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the registered r12 entry at
    sf0.01 (all-integer surface, exact compare through the pandas-
    equivalent string normalization)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_cm_join_size(spark, sf)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(x) for x in r) for r in sdf.select(*scols).collect()
    )
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    d = con.execute(CM_JOINSIZE_ORACLE_QUEUED_R13)
    cols = [c[0] for c in d.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    drows = sorted(tuple(str(r[i]) for i in idx) for r in d.fetchall())
    assert sorted(cols) == scols
    assert srows == drows
    assert len(srows) == 1
    row = dict(zip(sorted(cols), drows[0]))
    # the gate exercises a real overestimate regime (1.5k keys over
    # 1024 buckets collide) while staying within the CM error bound
    assert int(row["est_join_size"]) >= int(row["exact_join_size"]) > 0


# --- grouped Count-Min: per-group sketches + roll-up -----------------------


def _grows(spark, rows):
    return spark.createDataFrame(rows, "g string, key string")


def test_grouped_build_matches_python_per_group(spark):
    """Per-group cells match the per-group Python replica; NULL keys are
    dropped; empty group_cols is rejected (the kmv_build_grouped
    contract)."""
    rows = (
        [("g1", k) for k in KEYS[:12]]
        + [("g2", k) for k in KEYS[12:]]
        + [("g1", None)]
    )
    got = {}
    for r in cm.cm_build_grouped(
        _grows(spark, rows), ["g"], width=W, depth=D
    ).collect():
        got.setdefault(r.g, {})[(r.row, r.bucket)] = r.cnt
    assert got["g1"] == _cm_py(KEYS[:12])
    assert got["g2"] == _cm_py(KEYS[12:])
    with pytest.raises(ValueError, match="use cm_build"):
        cm.cm_build_grouped(_grows(spark, rows), [], width=W, depth=D)
    with pytest.raises(ValueError):
        cm.cm_build_grouped(_grows(spark, rows), ["g"], width=0, depth=D)


def test_grouped_rollup_equals_direct_build(spark):
    """cm_merge_grouped under a coarser grouping == a direct grouped
    build at that grouping (cells are plain sums — the mergeable-
    summaries contract); [] rolls up to the global cm_build."""
    rows = [
        ("d1", "h1", k) for k in KEYS[:10]
    ] + [
        ("d1", "h2", k) for k in KEYS[10:20]
    ] + [
        ("d2", "h1", k) for k in KEYS[20:]
    ]
    df = spark.createDataFrame(rows, "day string, hour string, key string")
    fine = cm.cm_build_grouped(df, ["day", "hour"], width=W, depth=D)
    rolled = cm.cm_merge_grouped(fine, ["day"])
    direct = cm.cm_build_grouped(df, ["day"], width=W, depth=D)
    assert sorted(map(tuple, rolled.collect())) == sorted(
        map(tuple, direct.collect())
    )
    glob = cm.cm_merge_grouped(fine, [])
    whole = cm.cm_build(
        df.select("key"), width=W, depth=D
    )
    assert sorted(map(tuple, glob.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_grouped_estimate_matches_replica_everywhere(spark):
    """Every (group, probe) estimate equals the per-group Python
    replica — including keys absent from a group (0 + collision noise,
    one-sided like the global form)."""
    rows = [("g1", k) for k in KEYS[:12]] + [("g2", k) for k in KEYS[12:]]
    cells = cm.cm_build_grouped(_grows(spark, rows), ["g"], width=W, depth=D)
    probe_keys = sorted(set(KEYS)) + ["absent1"]
    got = {
        (r.g, r.key): r.est
        for r in cm.cm_estimate_grouped(
            cells, _rows(spark, probe_keys), ["g"], width=W, depth=D
        ).collect()
    }
    replicas = {"g1": _cm_py(KEYS[:12]), "g2": _cm_py(KEYS[12:])}
    truths = {"g1": KEYS[:12], "g2": KEYS[12:]}
    assert len(got) == 2 * len(probe_keys)  # full group x probe grid
    for g, cells_py in replicas.items():
        for k in probe_keys:
            assert got[(g, k)] == _est_py(cells_py, k), (g, k)
            assert got[(g, k)] >= truths[g].count(k), (g, k)
    with pytest.raises(ValueError, match="use cm_estimate"):
        cm.cm_estimate_grouped(cells, _rows(spark, probe_keys), [], width=W)


def test_grouped_weighted_build_and_guards(spark):
    """Weighted grouped builds carry the same integral/non-negative
    contract as cm_build."""
    df = spark.createDataFrame(
        [("g1", "a", 3), ("g1", "a", 2), ("g2", "a", 7)],
        "g string, key string, n long",
    )
    got = {}
    for r in cm.cm_build_grouped(
        df, ["g"], width=W, depth=D, weight_col="n"
    ).collect():
        got.setdefault(r.g, {})[(r.row, r.bucket)] = r.cnt
    assert got["g1"] == _cm_py(["a"], weights=[5])
    assert got["g2"] == _cm_py(["a"], weights=[7])
    frac = spark.createDataFrame([("g", "a", 1.5)], "g string, key string, n double")
    with pytest.raises(ValueError, match="integral"):
        cm.cm_build_grouped(frac, ["g"], weight_col="n")


# --- property-based differential (the test_property_parity pattern) -------


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_key = st.sampled_from(
    ["a", "b", "c", "dd", "ee", "boiler", "plate", "x1", "x2", "γ"]
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(_key, min_size=0, max_size=40),
    st.lists(_key, min_size=0, max_size=40),
)
def test_join_size_property_replica_and_one_sided(spark, keys_a, keys_b):
    """Random multisets over a collision-prone alphabet: the Spark
    estimate equals the pure-Python replica bit-for-bit and never
    undercounts the true join size (the §4.2 one-sided contract),
    including empty sides."""
    sa = cm.cm_build(_rows(spark, keys_a), width=W, depth=D)
    sb = cm.cm_build(_rows(spark, keys_b), width=W, depth=D)
    got = (
        cm.cm_join_size(sa, sb, width=W, depth=D).collect()[0].est_join_size
    )
    assert got == _joinsize_py(keys_a, keys_b)
    true_join = sum(
        keys_a.count(k) * keys_b.count(k) for k in set(keys_a) & set(keys_b)
    )
    assert got >= true_join


def test_randomized_grouped_differential(spark):
    """60 seeded random multisets (varied sizes, duplicate densities,
    unicode keys, per-case NULLs) sketched in ONE Spark job via the
    grouped path, each compared cell-for-cell and estimate-for-estimate
    against the pure Python replica — the grouped-KMV discipline."""
    import random

    rng = random.Random(0xC011)
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
    cells = cm.cm_build_grouped(df, ["cid"], width=W, depth=D)
    got = {}
    for r in cells.collect():
        got.setdefault(r.cid, {})[(r.row, r.bucket)] = r.cnt
    probe_keys = sorted({k for ks in cases.values() for k in ks})[:20] + [
        "absent"
    ]
    est = {
        (r.cid, r.key): r.est
        for r in cm.cm_estimate_grouped(
            cells, _rows(spark, probe_keys), ["cid"], width=W, depth=D
        ).collect()
    }
    n_nonempty = 0
    for c, keys in cases.items():
        replica = _cm_py(keys)
        assert got.get(c, {}) == replica, c
        if not keys:
            continue  # empty case: no cells, no estimate rows
        n_nonempty += 1
        for k in probe_keys:
            assert est[(c, k)] == _est_py(replica, k), (c, k)
            assert est[(c, k)] >= keys.count(k), (c, k)
    assert n_nonempty > 40  # the generator actually produced real cases
