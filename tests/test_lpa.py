"""Label-propagation communities (operators/graph.py lpa_communities):
pure-Python synchronous replica differentials (including a seeded
random-graph sweep), the communities-vs-components distinction on a
bridged-cliques graph, and guards."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from advanced_elb_logs_etl_spark.operators import graph


def _lpa_py(edge_list, rounds):
    """The same deterministic synchronous rule: most frequent neighbor
    label, ties to the smallest label."""
    nbrs = {}
    for u, v in edge_list:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    labels = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n, ns in nbrs.items():
            c = Counter(labels[m] for m in ns)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    return labels


def _edges(spark, edge_list):
    return spark.createDataFrame(edge_list, "u bigint, v bigint")


def _clique(base, n):
    return [(base + i, base + j) for i in range(n) for j in range(i + 1, n)]


def test_bridged_cliques_two_communities_one_component(spark):
    """The capability CC cannot provide: a bridge edge makes ONE
    component, but LPA keeps the two cliques as distinct communities."""
    edge_list = _clique(0, 5) + _clique(10, 5) + [(4, 10)]
    got = {
        r.node: r.label
        for r in graph.lpa_communities(_edges(spark, edge_list), rounds=5).collect()
    }
    assert got == _lpa_py(edge_list, 5)
    comms = {}
    for n, l in got.items():
        comms.setdefault(l, set()).add(n)
    assert set(map(frozenset, comms.values())) == {
        frozenset(range(0, 5)),
        frozenset(range(10, 15)),
    }
    # while min-label CC merges everything into one component
    from advanced_elb_logs_etl_spark.operators.cc import (
        alternating_components,
    )

    pairs = spark.createDataFrame(edge_list, "id_a bigint, id_b bigint")
    cc = alternating_components(pairs, "id_a", "id_b")
    assert {r.component for r in cc.collect()} == {0}


def test_randomized_differential_vs_python_replica(spark):
    """12 seeded random graphs (varied density, multiple rounds) — the
    Spark fold matches the synchronous replica node-for-node, including
    graphs where deterministic LPA oscillates (same rule, same rounds,
    same answer)."""
    rng = random.Random(0x1A9A)
    for case in range(12):
        n = rng.randint(4, 24)
        m = rng.randint(n - 1, min(3 * n, n * (n - 1) // 2))
        seen = set()
        while len(seen) < m:
            u, v = rng.randrange(n), rng.randrange(n)
            if u != v:
                seen.add((min(u, v), max(u, v)))
        edge_list = sorted(seen)
        rounds = rng.randint(1, 6)
        got = {
            r.node: r.label
            for r in graph.lpa_communities(
                _edges(spark, edge_list), rounds=rounds
            ).collect()
        }
        assert got == _lpa_py(edge_list, rounds), (case, rounds)


def test_rounds_guard(spark):
    with pytest.raises(ValueError):
        graph.lpa_communities(_edges(spark, [(1, 2)]), rounds=0)


# --- the r13 catalog gate (REGISTERED in plans/catalog_r13.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry — the catalog_r12 pattern) -----------------------

from advanced_elb_logs_etl_spark.plans.catalog_r13 import (  # noqa: E402
    LPA_ORACLE as LPA_ORACLE_QUEUED_R16,
    q_lpa_copurchase_communities,
)


def test_queued_lpa_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the registered r13 entry at
    sf0.01 through the pandas fetch path (3 unrolled LPA rounds over the
    co-purchase edge twin)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_lpa_copurchase_communities(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(
        tuple(str(x) for x in r) for r in spd.itertuples(index=False)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
    )
    dpd = con.execute(LPA_ORACLE_QUEUED_R16).df()
    assert sorted(dpd.columns) == scols
    drows = sorted(
        tuple(str(x) for x in r) for r in dpd[scols].itertuples(index=False)
    )
    assert srows == drows
    # the gate carries structure: more than one community, none global
    sizes = [r.n_nodes for r in spd.itertuples(index=False)]
    assert len(sizes) > 1 and max(sizes) < sum(sizes)


def test_string_node_ids_supported(spark):
    """The tie-break is type-agnostic (min_by over (-cnt, label), ADVICE
    r11): a string-id edge frame — accepted by _mirror and the other
    graph operators — must propagate labels with ties broken by the
    SMALLEST label string, exactly like the numeric form."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y")],
        "u string, v string",
    )
    got = {
        r.node: r.label for r in graph.lpa_communities(edges, rounds=3).collect()
    }
    # the triangle converges to its smallest label; the 2-cycle
    # oscillates deterministically (the documented bipartite behavior —
    # after 3 synchronous swaps each holds the other's label)
    assert got["a"] == got["b"] == got["c"] == "a"
    assert (got["x"], got["y"]) == ("y", "x")
