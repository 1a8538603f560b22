"""Neyman stratified-sample allocation (operators/sampling.py):
closed-form cases, the exact-total invariant, the degenerate-total
fallback, a Python replica differential, and the DuckDB twin rehearsal
for the r12 gate (`neyman_allocation_report`, registered in
plans/catalog_r12.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import sampling as sp

N = 100


def _frame(spark, rows):
    return spark.createDataFrame(rows, "stratum string, value double")


def test_closed_form_and_total_invariant(spark):
    # stratum a: 10 rows sd=0 (constant); b: 10 rows with spread ->
    # Neyman sends EVERYTHING to b; proportional splits 50/50
    rows = [("a", 5.0)] * 10 + [("b", float(v)) for v in range(10)]
    got = {
        r.stratum: r
        for r in sp.neyman_allocation(_frame(spark, rows), "stratum", "value", N).collect()
    }
    assert got["a"].alloc_neyman == 0
    assert got["b"].alloc_neyman == N
    assert got["a"].alloc_proportional == got["b"].alloc_proportional == N // 2
    assert got["a"].sd_micro == 0 and got["b"].sd_micro > 0
    for model in ("alloc_neyman", "alloc_proportional"):
        assert sum(getattr(r, model) for r in got.values()) == N


def test_degenerate_total_falls_back_to_proportional(spark):
    # all strata constant-valued (sd 0 everywhere) -> proportional
    rows = [("a", 1.0)] * 30 + [("b", 2.0)] * 10
    got = {
        r.stratum: r
        for r in sp.neyman_allocation(_frame(spark, rows), "stratum", "value", N).collect()
    }
    assert got["a"].alloc_neyman == 75 and got["b"].alloc_neyman == 25
    # single-row strata (sd NULL) coalesce to weight 0, never NULL
    one = sp.neyman_allocation(
        _frame(spark, [("x", 1.0), ("y", 2.0)]), "stratum", "value", 10
    ).collect()
    assert sum(r.alloc_neyman for r in one) == 10
    with pytest.raises(ValueError):
        sp.neyman_allocation(_frame(spark, rows), "stratum", "value", -1)


def test_replica_differential_largest_remainder(spark):
    import math
    import random

    rng = random.Random(0x4E11)
    rows = []
    for s in "abcdefg":
        base = rng.uniform(0, 50)
        spread = rng.uniform(0, 20)
        for _ in range(rng.randint(2, 60)):
            rows.append((s, base + rng.uniform(-spread, spread)))
    got = {
        r.stratum: (r.n_rows, r.sd_micro, r.alloc_neyman, r.alloc_proportional)
        for r in sp.neyman_allocation(_frame(spark, rows), "stratum", "value", N).collect()
    }

    # replica: same snap ladder, same integer largest-remainder
    def sd6(vals):
        n = len(vals)
        if n < 2:
            return None
        mu = sum(vals) / n
        var = sum((v - mu) ** 2 for v in vals) / (n - 1)
        return round(math.sqrt(var), 6)

    per = {}
    for s in set(r[0] for r in rows):
        vals = [v for t, v in rows if t == s]
        sd = sd6(vals)
        per[s] = [len(vals), 0 if sd is None else round(sd * 1e6)]

    def allocate(weights):
        tot = sum(weights.values())
        if tot <= 0:
            weights = {s: per[s][0] for s in weights}
            tot = sum(weights.values())
        base = {s: (N * w) // tot for s, w in weights.items()}
        rem = {s: N * w - base[s] * tot for s, w in weights.items()}
        left = N - sum(base.values())
        for i, s in enumerate(
            sorted(weights, key=lambda s: (-rem[s], s))
        ):
            if i < left:
                base[s] += 1
        return base

    ney = allocate({s: n * sdm for s, (n, sdm) in per.items()})
    prop = allocate({s: n for s, (n, _) in per.items()})
    for s, (n_rows, sdm) in per.items():
        # sd_micro may differ from the float replica by 1 ulp at the
        # 6-decimal boundary; everything downstream must still agree,
        # so compare sd loosely and the ALLOCATIONS exactly
        assert abs(got[s][1] - sdm) <= 1, s
        assert got[s][0] == n_rows
    assert {s: v[2] for s, v in got.items()} == ney
    assert {s: v[3] for s, v in got.items()} == prop


# --- the r12 catalog gate (REGISTERED in plans/catalog_r12.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry).  Allocation of a 1000-row stratified sample
# over events by event_type; all-integer surface. --------------------

from advanced_elb_logs_etl_spark.plans.catalog_r12 import (  # noqa: E402
    NEYMAN_N as GATE_N,
    NEYMAN_ORACLE as NEYMAN_ORACLE_QUEUED_R13,
    q_neyman_allocation_report,
)


def test_queued_catalog_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the registered r12 entry at
    sf0.01 (all-integer surface, exact compare)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_neyman_allocation_report(spark, sf)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(x) for x in r) for r in sdf.select(*scols).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    d = con.execute(NEYMAN_ORACLE_QUEUED_R13)
    cols = [c[0] for c in d.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    drows = sorted(tuple(str(r[i]) for i in idx) for r in d.fetchall())
    assert sorted(cols) == scols
    assert srows == drows
    assert len(srows) == 5  # five event types
    # the allocations are a real split summing to exactly N
    rows = [dict(zip(sorted(cols), r)) for r in drows]
    assert sum(int(r["alloc_neyman"]) for r in rows) == GATE_N


def test_apportionment_never_rescans_the_corpus(spark):
    """The per-stratum aggregate is pinned before the scalar-combine
    fan-out: left lazy, the four scalar totals x two passes replayed
    the corpus agg 64 times in the static plan (round-12 plan audit).
    The physical plan downstream of the pin must not scan the input."""
    import io
    from contextlib import redirect_stdout

    rows = [("a", float(v)) for v in range(20)] + [("b", 1.0)] * 10
    df = _frame(spark, rows)
    out = sp.neyman_allocation(df, "stratum", "value", 50)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    # the pinned frame appears as a checkpointed scan; the ORIGINAL
    # input lineage (LocalTableScan / parquet scan) must be absent
    plan = buf.getvalue()
    assert "LocalTableScan" not in plan
    assert "Scan parquet" not in plan
