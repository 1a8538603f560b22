"""Sorted-neighborhood blocking (operators/linkage.
sorted_neighborhood_pairs — Hernandez & Stolfo 1995 merge/purge):
closed-form pair sets, a pure-Python replica differential across
range-partition boundaries, determinism under ties, guards, and the
DuckDB twin rehearsal for the queued r14 catalog gate
(`sorted_neighborhood_linkage`) — the freeze discipline's
pre-rehearsal."""

from __future__ import annotations

import random

import pytest

from advanced_elb_logs_etl_spark.operators import linkage


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, key long")


def _expected(rows, window):
    order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
    out = set()
    for d in range(1, window):
        out |= set(zip(order, order[d:]))
    return out


def test_closed_form_window_pairs(spark):
    rows = [(i, (i * 37) % 100) for i in range(20)]
    got = {
        (r.id1, r.id2)
        for r in linkage.sorted_neighborhood_pairs(
            _df(spark, rows), "id", ["key"], window=3
        ).collect()
    }
    assert got == _expected(rows, 3)
    assert len(got) == 19 + 18


def test_replica_differential_across_partition_boundaries(spark):
    """300 rows through num_ranges=8 partitions: pairs that straddle a
    range boundary must still be emitted (the two-phase global rank is
    what makes that work); ranks and gaps checked value-for-value."""
    rng = random.Random(0x50F7)
    rows = [(i, rng.randrange(50)) for i in range(300)]  # heavy ties
    out = linkage.sorted_neighborhood_pairs(
        _df(spark, rows), "id", ["key"], window=5, num_ranges=8
    ).collect()
    got = {(r.id1, r.id2): (r.rank1, r.rank2, r.rank_gap) for r in out}
    order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
    rank = {i: p + 1 for p, i in enumerate(order)}
    expect = {}
    for d in range(1, 5):
        for a, b in zip(order, order[d:]):
            expect[(a, b)] = (rank[a], rank[b], d)
    assert got == expect


def test_deterministic_under_ties_and_guards(spark):
    rows = [(i, 7) for i in range(10)]  # ALL ties: order = id order
    df = _df(spark, rows)
    a = sorted(
        (r.id1, r.id2)
        for r in linkage.sorted_neighborhood_pairs(
            df, "id", ["key"], window=2
        ).collect()
    )
    assert a == [(i, i + 1) for i in range(9)]
    with pytest.raises(ValueError):
        linkage.sorted_neighborhood_pairs(df, "id", ["key"], window=1)
    with pytest.raises(ValueError):
        linkage.sorted_neighborhood_pairs(df, "id", [], window=3)


# --- the r14 catalog gate (REGISTERED in plans/catalog_r14.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry — the catalog_r13 pattern) -----------------------

from advanced_elb_logs_etl_spark.plans.catalog_r14 import (  # noqa: E402
    SNM_ORACLE as SNM_ORACLE_QUEUED_R14,
    q_sorted_neighborhood_linkage,
)


def test_queued_snm_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the registered r14 entry at
    sf0.01 through the pandas fetch path (the rank order is total on
    both engines: bal_cents + custkey tiebreak)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_sorted_neighborhood_linkage(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(
        tuple(str(x) for x in r) for r in spd.itertuples(index=False)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf}/customer.parquet')"
    )
    dpd = con.execute(SNM_ORACLE_QUEUED_R14).df()
    assert sorted(dpd.columns) == scols
    drows = sorted(
        tuple(str(x) for x in r) for r in dpd[scols].itertuples(index=False)
    )
    assert srows == drows
    by_dec = {r.decision: int(r.n_pairs) for r in spd.itertuples(index=False)}
    # all three decision classes carry pairs, and the candidate count is
    # exactly (n-1)+(n-2)+(n-3) for n=1500 (linear, never quadratic)
    assert set(by_dec) == {"link", "possible", "non_link"}
    assert sum(by_dec.values()) == 1499 + 1498 + 1497
