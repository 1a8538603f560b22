"""Bipartite butterfly census (operators/graph.butterfly_stats):
closed-form cases, a pure-Python replica differential, side-selection
invariance, and the DuckDB twin rehearsal for the queued r12 gate
(`butterfly_census`) — the freeze discipline's pre-rehearsal."""

from __future__ import annotations

from itertools import combinations

import pytest

from advanced_elb_logs_etl_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "l bigint, r bigint")


def _butterflies_py(pairs):
    right_of = {}
    for l, r in set(pairs):
        right_of.setdefault(l, set()).add(r)
    total = 0
    for l1, l2 in combinations(sorted(right_of), 2):
        w = len(right_of[l1] & right_of[l2])
        total += w * (w - 1) // 2
    return total


def test_closed_form_complete_bipartite(spark):
    # K(2,2) is exactly one butterfly; K(3,2) has C(3,2)*C(2,2) = 3
    k22 = [(l, r) for l in (1, 2) for r in (10, 20)]
    got = graph.butterfly_stats(_edges(spark, k22)).collect()[0]
    assert (got.n_left, got.n_right, got.n_edges, got.n_butterflies) == (
        2, 2, 4, 1,
    )
    k32 = [(l, r) for l in (1, 2, 3) for r in (10, 20)]
    got = graph.butterfly_stats(_edges(spark, k32)).collect()[0]
    assert got.n_butterflies == 3
    # a path (no 4-cycle) has none
    path = [(1, 10), (2, 10), (2, 20), (3, 20)]
    got = graph.butterfly_stats(_edges(spark, path)).collect()[0]
    assert got.n_butterflies == 0
    with pytest.raises(ValueError):
        graph.butterfly_stats(_edges(spark, path), through="up")


def test_replica_differential_and_side_invariance(spark):
    # deterministic pseudo-random bipartite graph, duplicate edges in
    # the input exercise the caller-side distinct contract
    pairs = [((i * 7) % 13, (i * 11) % 9 + 100) for i in range(160)]
    df = _edges(spark, pairs).distinct()
    want = _butterflies_py(pairs)
    left = graph.butterfly_stats(df, through="left").collect()[0]
    right = graph.butterfly_stats(df, through="right").collect()[0]
    auto = graph.butterfly_stats(df).collect()[0]
    assert left.n_butterflies == right.n_butterflies == want
    assert auto.n_butterflies == want
    # wedge/pair counts differ by side; the invariant is the 4-cycles
    assert (left.n_left, left.n_right) == (right.n_left, right.n_right)


# --- the r11 catalog gate (REGISTERED in plans/catalog_r11.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry).  Registered a round early: VERDICT r10 item 5
# widened the stash drain to four slots. --------------------------------

from advanced_elb_logs_etl_spark.plans.catalog_r11 import (  # noqa: E402
    BUTTERFLY_ORACLE as BUTTERFLY_ORACLE_QUEUED_R12,
    q_butterfly_census,
)


def test_queued_catalog_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the queued r12 entry at
    sf0.01 (all-integer surface, exact compare)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_butterfly_census(spark, sf)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(x) for x in r) for r in sdf.select(*scols).collect()
    )
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    d = con.execute(BUTTERFLY_ORACLE_QUEUED_R12)
    cols = [c[0] for c in d.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    drows = sorted(tuple(str(r[i]) for i in idx) for r in d.fetchall())
    assert sorted(cols) == scols
    assert srows == drows
    assert len(srows) == 1
    # a real graph: the census actually counted something
    row = dict(zip(sorted(cols), drows[0]))
    assert int(row["n_butterflies"]) > 0


def test_plan_has_no_global_sort_and_keeps_the_hint(spark):
    """Stash-time plan pin (the test_plan_quality discipline): the
    census is joins + hash aggs — no global Sort anywhere, and the
    wedge self-join must not fall into a cartesian."""
    e = _edges(spark, [(l, r) for l in range(6) for r in (1, 2)])
    plan = (
        graph.butterfly_stats(e, through="right")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "TakeOrdered" not in plan  # nothing orders anything


def test_empty_graph_reports_zeros(spark):
    """An empty edge list (and a graph with no co-neighbor pairs)
    reports integer zeros, never NULL aggregates (r10 self-review:
    matches the SQL twin's coalesce)."""
    got = graph.butterfly_stats(
        _edges(spark, []).filter("l IS NOT NULL"), through="left"
    ).collect()[0]
    assert tuple(got) == (0, 0, 0, 0, 0, 0)
