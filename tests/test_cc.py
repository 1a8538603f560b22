"""Alternating large/small-star connected components (operators/cc.py):
labeling parity vs dedup.neardup_components (the drop-in claim), the
round-count advantage on a long chain (the reason the operator exists),
a DuckDB recursive-CTE twin rehearsal (the r9 catalog template), and a
seeded random-graph differential.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators.cc import alternating_components
from advanced_elb_logs_etl_spark.operators.dedup import neardup_components


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "id_a long, id_b long"
    )


def _labels(df):
    return {r.doc_id: r.component for r in df.collect()}


def _python_cc(pairs):
    """Ground truth: min reachable id per node (union-find)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


CASES = {
    # union of small cliques — the near-dup shape both operators serve
    "cliques": [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (20, 21)],
    # one chain — the shape neardup_components degrades on
    "chain": [(i, i + 1) for i in range(1, 40)],
    # self-pair-only node + a normal edge: 99 must survive labeled 99
    "self_pairs": [(99, 99), (1, 2)],
    # reversed/duplicated/self edges mixed in
    "messy": [(5, 3), (3, 5), (7, 7), (3, 1), (8, 9), (9, 8), (2, 1)],
    # two components whose id ranges interleave
    "interleaved": [(1, 4), (4, 7), (2, 5), (5, 8)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_labeling_parity_vs_neardup_components(spark, name):
    """Identical (doc_id, component) labeling on every graph shape —
    the drop-in-replacement contract of the cc.py docstring."""
    pairs = CASES[name]
    df = _pairs_df(spark, pairs)
    alt = _labels(alternating_components(df))
    base = _labels(neardup_components(df, max_iterations=100))
    truth = _python_cc(pairs)
    assert alt == base == truth


def test_chain_round_advantage(spark):
    """On a 120-link chain the alternating algorithm must converge well
    inside its default 30-round budget (observed O(log n)); min-label
    propagation needs ~diameter rounds and provably cannot finish in
    an equal budget. This is the operator's reason to exist."""
    pairs = [(i, i + 1) for i in range(1, 121)]
    df = _pairs_df(spark, pairs)

    labels = _labels(alternating_components(df))  # default 30 rounds
    assert labels == {i: 1 for i in range(1, 122)}

    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_components(df, max_iterations=30)


def test_random_graph_differential(spark):
    """Seeded sparse random graph: parity with union-find ground truth
    (many components of mixed shapes)."""
    rng = random.Random(80)
    nodes = list(range(1, 201))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    df = _pairs_df(spark, pairs)
    assert _labels(alternating_components(df)) == _python_cc(pairs)


# Recursive-CTE oracle twin — the exact template the r9 catalog window
# will register alongside `alternating_components` (same closure the
# neardup_components rows-only gate upgrades to; rehearsed here so the
# registration ships pre-validated, the rules.py convention).
CC_ORACLE_TEMPLATE = """
WITH RECURSIVE
raw AS ({pairs_sql}),
nodes AS (SELECT id_a AS doc_id FROM raw UNION SELECT id_b FROM raw),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM raw WHERE id_a != id_b
  UNION SELECT id_b, id_a FROM raw WHERE id_a != id_b
),
reach(doc_id, label) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.doc_id
)
SELECT doc_id, min(label) AS component FROM reach GROUP BY doc_id
"""


def test_duckdb_twin_rehearsal(spark):
    pairs = CASES["messy"] + CASES["interleaved"] + [(50, 60), (60, 70)]
    df = _pairs_df(spark, pairs)
    got = _labels(alternating_components(df))

    pairs_sql = " UNION ALL ".join(
        f"SELECT {a} AS id_a, {b} AS id_b" for a, b in pairs
    )
    want = {
        int(r[0]): int(r[1])
        for r in duckdb.sql(
            CC_ORACLE_TEMPLATE.format(pairs_sql=pairs_sql)
        ).fetchall()
    }
    assert got == want


def test_empty_pair_list(spark):
    """Zero edges: both operators return an empty labeling frame rather
    than erroring (the dedup-pipeline no-duplicates case)."""
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert alternating_components(df).collect() == []
    assert neardup_components(df).collect() == []
