"""k-core decomposition (operators/graph.k_core): closed-form cases,
a randomized pure-Python peeling replica differential, determinism,
guards, and the DuckDB twin rehearsal for the queued r14 catalog gate
(`kcore_copurchase_report`) — the freeze discipline's pre-rehearsal."""

from __future__ import annotations

import random

import pytest

from advanced_elb_logs_etl_spark.operators import graph


def _kcore_py(edge_list, k):
    """Reference peeling: repeatedly drop nodes with degree < k."""
    edges = {tuple(sorted(e)) for e in edge_list}
    while True:
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {e for e in edges if e[0] in keep and e[1] in keep}
        if nxt == edges:
            return edges
        edges = nxt


def _edges(spark, edge_list):
    return spark.createDataFrame(edge_list, "u long, v long")


def test_clique_plus_pendant_chain(spark):
    """The capability degree-thresholding cannot provide: the chain
    nodes have degree >= 1 but peel CASCADES — only the clique survives
    k=3."""
    edge_list = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edge_list += [(4, 10), (10, 11), (11, 12)]
    got = sorted(
        (r.u, r.v) for r in graph.k_core(_edges(spark, edge_list), 3).collect()
    )
    assert got == sorted(_kcore_py(edge_list, 3))
    assert len(got) == 10  # exactly the 5-clique


def test_cascade_to_empty(spark):
    """A tree has no 2-core: every peel round exposes new leaves until
    nothing remains (the avalanche regime)."""
    edge_list = [(i, i + 1) for i in range(30)]  # a path
    got = graph.k_core(_edges(spark, edge_list), 2).collect()
    assert got == []


def test_randomized_differential_vs_python_replica(spark):
    """12 seeded random graphs x the k sweep — the Spark peel matches
    the reference fixpoint edge-for-edge."""
    rng = random.Random(0xC03E)
    for case in range(12):
        n = rng.randint(6, 26)
        m = rng.randint(n, min(4 * n, n * (n - 1) // 2))
        seen = set()
        while len(seen) < m:
            u, v = rng.randrange(n), rng.randrange(n)
            if u != v:
                seen.add((min(u, v), max(u, v)))
        edge_list = sorted(seen)
        k = rng.randint(2, 5)
        got = sorted(
            (r.u, r.v)
            for r in graph.k_core(_edges(spark, edge_list), k).collect()
        )
        assert got == sorted(_kcore_py(edge_list, k)), (case, k)


def test_max_rounds_bounds_the_peel(spark):
    """With max_rounds=1 only the first peel layer is removed; the
    pendant chain's interior survives one round."""
    edge_list = [(0, 1), (1, 2), (2, 3)]
    one = sorted(
        (r.u, r.v)
        for r in graph.k_core(
            _edges(spark, edge_list), 2, max_rounds=1
        ).collect()
    )
    # round 1 drops nodes 0 and 3 (degree 1); edge (1,2) survives it
    assert one == [(1, 2)]
    # the fixpoint is empty
    assert graph.k_core(_edges(spark, edge_list), 2).collect() == []


def test_deterministic_and_guards(spark):
    edge_list = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    df = _edges(spark, edge_list)
    a = sorted(tuple(r) for r in graph.k_core(df, 3).collect())
    b = sorted(tuple(r) for r in graph.k_core(df, 3).collect())
    assert a == b == sorted(edge_list)
    with pytest.raises(ValueError):
        graph.k_core(df, 0)
    with pytest.raises(ValueError):
        graph.k_core(df, 2, max_rounds=0)


# --- the r14 catalog gate (REGISTERED in plans/catalog_r14.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry — the catalog_r13 pattern) -----------------------

from advanced_elb_logs_etl_spark.plans.catalog_r14 import (  # noqa: E402
    KCORE_KS,
    KCORE_ORACLE as KCORE_ORACLE_QUEUED_R14,
    KCORE_ROUNDS,
    q_kcore_copurchase_report,
)


def test_queued_kcore_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the registered r14 entry at
    sf0.01 through the pandas fetch path (12 unrolled peel rounds x 3 k
    values over the co-purchase edge twin)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_kcore_copurchase_report(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(
        tuple(str(x) for x in r) for r in spd.itertuples(index=False)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
    )
    dpd = con.execute(KCORE_ORACLE_QUEUED_R14).df()
    assert sorted(dpd.columns) == scols
    drows = sorted(
        tuple(str(x) for x in r) for r in dpd[scols].itertuples(index=False)
    )
    assert srows == drows
    # the gate spans the transition: a trimmed core, a deep-peel core,
    # and the avalanche-to-empty row
    by_k = {
        int(r.k): (int(r.n_core_nodes), int(r.n_core_edges))
        for r in spd.itertuples(index=False)
    }
    assert by_k[70][0] > by_k[80][0] > 0
    assert by_k[85] == (0, 0)


def test_queued_kcore_rounds_reach_fixpoint_at_sf001(spark):
    """KCORE_ROUNDS is only honest if every k converges within it — a
    deeper run must produce identical cores (confluence + fixpoint)."""
    from advanced_elb_logs_etl_spark.plans.catalog import _t

    li = _t(spark, "/root/testdata/sf0.01", "lineitem")
    edges = graph.co_occurrence_edges(
        li, "l_orderkey", "l_partkey"
    ).localCheckpoint(eager=True)
    for k in KCORE_KS:
        a = graph.k_core(edges, k, max_rounds=KCORE_ROUNDS).count()
        b = graph.k_core(edges, k, max_rounds=KCORE_ROUNDS + 6).count()
        assert a == b, k
