"""Unit + plan tests for the warehouse-ops wave: Bloom pre-join, table
profiling, reconciliation diff, SCD2 intervals, trend regression, PageRank.

The oracle-parity test covers the catalog queries end-to-end; these tests pin
the operator-level contracts (result identity, determinism, plan shape) on
hand-built frames where the expected answer is checkable by eye.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import bloom, graph, warehouse


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# Bloom pre-join
# ---------------------------------------------------------------------------


def test_bloom_semi_join_result_identical(spark):
    """bloom_semi_join must equal the plain left_semi join on arbitrary data:
    the bitmap may only remove provable non-members."""
    probe = spark.range(0, 5000).select((F.col("id") % 1100).alias("k"), "id")
    build = spark.range(0, 200).select((F.col("id") * 7 % 900).alias("bk"))
    got = sorted(
        (r["k"], r["id"])
        for r in bloom.bloom_semi_join(
            probe, build, "k", "bk", bypass_below_rows=None
        ).collect()
    )
    want = sorted(
        (r["k"], r["id"])
        for r in probe.join(
            build.select(F.col("bk").alias("__b")).distinct(),
            F.col("k") == F.col("__b"),
            "left_semi",
        ).collect()
    )
    assert got == want and len(got) > 0


def test_bloom_filter_has_no_false_negatives(spark):
    """Every build-side key must pass the probe predicate built from the
    build side's own bitmap (the no-false-negative property)."""
    build = spark.range(0, 3000).select((F.col("id") * 31 + 7).alias("bk"))
    lanes = bloom.build_bloom_lanes(build, "bk", m_bits=1 << 14)
    missed = build.filter(
        ~bloom.bloom_might_contain(F.col("bk"), lanes)
    ).count()
    assert missed == 0


def test_bloom_prunes_before_exchange(spark):
    """The bitmap predicate must sit in the probe side's scan stage (a Filter
    with the xxhash64 probe math BELOW the join), and the pre-filter adds no
    extra join: exactly one join in the plan."""
    probe = spark.range(0, 1000).select((F.col("id") % 50).alias("k"))
    build = spark.range(0, 10).select(F.col("id").alias("bk"))
    plan = _plan(bloom.bloom_semi_join(probe, build, "k", "bk", bypass_below_rows=None))
    assert "xxhash64" in plan  # literal-bitmap probe evaluated as a Filter
    n_joins = sum(plan.count(j) for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"))
    assert n_joins == 1, plan[:3000]


def test_bloom_bypass_below_breakeven(spark):
    """A build side under the bypass threshold must skip the bitmap entirely
    (no xxhash64 probe math in the plan — it IS the plain semi join) while
    returning the identical result."""
    probe = spark.range(0, 5000).select((F.col("id") % 1100).alias("k"), "id")
    build = spark.range(0, 200).select((F.col("id") * 7 % 900).alias("bk"))
    df = bloom.bloom_semi_join(probe, build, "k", "bk")  # default guard on
    assert "xxhash64" not in _plan(df)
    got = sorted((r["k"], r["id"]) for r in df.collect())
    want = sorted(
        (r["k"], r["id"])
        for r in bloom.bloom_semi_join(
            probe, build, "k", "bk", bypass_below_rows=None
        ).collect()
    )
    assert got == want and len(got) > 0


def test_bloom_known_build_rows_skips_probe_job(spark):
    """Passing build_rows keeps the call fully lazy: no count() job at
    construction time, and the stated cardinality decides the bypass the
    same way the probe would."""
    probe = spark.range(0, 5000).select((F.col("id") % 1100).alias("k"), "id")
    build = spark.range(0, 200).select((F.col("id") * 7 % 900).alias("bk"))
    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    df = bloom.bloom_semi_join(probe, build, "k", "bk", build_rows=200)
    after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert len(after) == len(before), "construction ran a Spark job"
    assert "xxhash64" not in _plan(df)  # 200 <= threshold -> bypassed
    # a stated cardinality ABOVE the threshold forces the bitmap path
    df2 = bloom.bloom_semi_join(
        probe, build, "k", "bk", bypass_below_rows=100, build_rows=101
    )
    assert "xxhash64" in _plan(df2)
    assert sorted(r["k"] for r in df.collect()) == sorted(r["k"] for r in df2.collect())


# ---------------------------------------------------------------------------
# profile_table
# ---------------------------------------------------------------------------


def test_profile_table_values(spark):
    df = spark.createDataFrame(
        [(1, "aa", 2.0), (2, "bbbb", None), (2, None, 8.0)],
        "k int, s string, v double",
    )
    rows = {r["col_name"]: r for r in warehouse.profile_table(df).collect()}
    assert rows["k"]["n_rows"] == 3 and rows["k"]["n_nulls"] == 0
    assert rows["k"]["n_distinct"] == 2
    assert rows["k"]["min_num"] == 1.0 and rows["k"]["max_num"] == 2.0
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["avg_len"] == 3.0
    assert rows["v"]["n_nulls"] == 1 and rows["v"]["max_num"] == 8.0
    assert rows["s"]["min_num"] is None  # strings have no numeric min


def test_profile_table_single_aggregation(spark):
    """The profile is ONE aggregation pass: no join, no second scan."""
    df = spark.createDataFrame([(1, "a")], "k int, s string")
    plan = _plan(warehouse.profile_table(df))
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# table_diff
# ---------------------------------------------------------------------------


def test_table_diff_statuses(spark):
    left = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)], "k int, a string, b double"
    )
    right = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 99.0), (4, "w", 40.0)], "k int, a string, b double"
    )
    got = {
        r["status"]: r["cnt"]
        for r in warehouse.table_diff(left, right, "k", ["a", "b"]).collect()
    }
    assert got == {"added": 1, "removed": 1, "changed": 1, "unchanged": 1}


def test_table_diff_null_safe(spark):
    """NULL == NULL must count as unchanged (null-safe compare), and
    NULL vs value as changed."""
    left = spark.createDataFrame([(1, None), (2, None)], "k int, a string")
    right = spark.createDataFrame([(1, None), (2, "v")], "k int, a string")
    got = {
        r["status"]: r["cnt"]
        for r in warehouse.table_diff(left, right, "k", ["a"]).collect()
    }
    assert got == {"changed": 1, "unchanged": 1}


# ---------------------------------------------------------------------------
# scd2_intervals
# ---------------------------------------------------------------------------


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_scd2_merges_consecutive_same_value(spark):
    ch = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01T00:00:00"), "A", 1),
            ("k1", _ts("2024-01-02T00:00:00"), "A", 2),  # no change -> merged
            ("k1", _ts("2024-01-03T00:00:00"), "B", 3),
            ("k1", _ts("2024-01-04T00:00:00"), "A", 4),  # back to A = NEW version
        ],
        "k string, ts timestamp, attr string, tb int",
    )
    out = warehouse.scd2_intervals(ch, "k", "ts", "attr", "tb").orderBy("version_nr")
    rows = out.collect()
    assert [r["attr"] for r in rows] == ["A", "B", "A"]
    assert [r["version_nr"] for r in rows] == [1, 2, 3]
    assert rows[0]["valid_to"] == rows[1]["valid_from"]
    assert rows[1]["valid_to"] == rows[2]["valid_from"]
    assert [r["is_current"] for r in rows] == [False, False, True]


def test_scd2_tiebreak_is_deterministic(spark):
    """Colliding timestamps order by the tiebreak column — the r1-ADVICE
    session-tie lesson. tb decides that 'B' (tb=2) is the later event."""
    t0 = _ts("2024-01-01T00:00:00")
    ch = spark.createDataFrame(
        [("k", t0, "B", 2), ("k", t0, "A", 1)],
        "k string, ts timestamp, attr string, tb int",
    )
    rows = (
        warehouse.scd2_intervals(ch, "k", "ts", "attr", "tb")
        .orderBy("version_nr")
        .collect()
    )
    assert [r["attr"] for r in rows] == ["A", "B"]
    assert rows[1]["is_current"]


def test_scd2_single_exchange(spark):
    """Both window passes must share ONE (key, ts, tiebreak) Exchange+Sort."""
    ch = spark.createDataFrame(
        [("k", _ts("2024-01-01T00:00:00"), "A", 1)],
        "k string, ts timestamp, attr string, tb int",
    )
    plan = _plan(warehouse.scd2_intervals(ch, "k", "ts", "attr", "tb"))
    n = sum(1 for l in plan.splitlines() if "Exchange hashpartitioning" in l)
    assert n == 1, plan[:3000]


# ---------------------------------------------------------------------------
# per_key_trend
# ---------------------------------------------------------------------------


def test_per_key_trend_exact_line(spark):
    """Points on y = 3x + 5 must regress to exactly that line with r2 = 1."""
    df = spark.createDataFrame(
        [("g", float(x), 3.0 * x + 5.0) for x in range(10)]
        + [("tiny", 0.0, 0.0), ("tiny", 1.0, 1.0)],  # < min_points, dropped
        "g string, x double, y double",
    )
    rows = warehouse.per_key_trend(
        df, ["g"], F.col("x"), F.col("y"), min_points=3
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["g"] == "g" and r["n_points"] == 10
    assert abs(r["slope"] - 3.0) < 1e-9
    assert abs(r["intercept"] - 5.0) < 1e-9
    assert abs(r["r2"] - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------


def test_pagerank_symmetric_pair(spark):
    """A 2-node cycle is symmetric: both nodes keep rank 0.5 forever."""
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    rows = {r["node"]: r["rank"] for r in graph.pagerank(e, iterations=4).collect()}
    assert abs(rows["a"] - 0.5) < 1e-6 and abs(rows["b"] - 0.5) < 1e-6


def test_pagerank_mass_conserved_and_ordering(spark):
    """With no dangling nodes total rank mass stays ~1, and the hub of a star
    graph (everything links to h, h links back) outranks every leaf."""
    leaves = [f"l{i}" for i in range(6)]
    edges = [("h", l) for l in leaves] + [(l, "h") for l in leaves]
    e = spark.createDataFrame(edges, "src string, dst string")
    rows = {r["node"]: r["rank"] for r in graph.pagerank(e, iterations=5).collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-5
    assert all(rows["h"] > rows[l] for l in leaves)


def _py_pagerank(edges, iterations, damping=0.85):
    """Reference implementation: synchronous PageRank with uniform dangling-
    mass redistribution, same per-round 1e-8 snap as the operator."""
    out = {}
    for s, d in edges:
        out.setdefault(s, set()).add(d)
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    ranks = {v: round(1.0 / n, 8) for v in nodes}
    for _ in range(iterations):
        dmass = round(sum(ranks[v] for v in nodes if v not in out), 8)
        incoming = {v: 0.0 for v in nodes}
        for s, dsts in out.items():
            share = ranks[s] / len(dsts)
            for d in dsts:
                incoming[d] += share
        ranks = {
            v: round((1 - damping) / n + damping * (incoming[v] + dmass / n), 8)
            for v in nodes
        }
    return ranks


def test_pagerank_dangling_nodes_match_python_oracle(spark):
    """A graph WITH dangling nodes (c and e have no out-edges) must match the
    standard redistribute-dangling-mass formulation, and total mass must stay
    ~1 (without redistribution it would leak to ~1-d*D each round)."""
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a"), ("d", "e")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in graph.pagerank(e, iterations=6).collect()}
    want = _py_pagerank(edges, iterations=6)
    assert set(got) == set(want)
    assert all(abs(got[v] - want[v]) < 1e-6 for v in want), (got, want)
    assert abs(sum(got.values()) - 1.0) < 1e-5


def test_pagerank_tol_converges_and_matches_fixed_k(spark):
    """tol mode must stop at a fixpoint: running MORE fixed iterations from
    the same start changes nothing beyond tol, and the tol result agrees with
    a long fixed-K run."""
    leaves = [f"l{i}" for i in range(4)]
    edges = [("h", l) for l in leaves] + [(l, "h") for l in leaves] + [("h", "sink")]
    e = spark.createDataFrame(edges, "src string, dst string")
    tol_rows = {r["node"]: r["rank"] for r in graph.pagerank(e, tol=1e-7).collect()}
    fixed_rows = {r["node"]: r["rank"] for r in graph.pagerank(e, iterations=40).collect()}
    assert all(abs(tol_rows[v] - fixed_rows[v]) < 1e-5 for v in fixed_rows)
    assert abs(sum(tol_rows.values()) - 1.0) < 1e-4
