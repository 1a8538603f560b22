"""Fellegi-Sunter record linkage (operators/linkage.py): weight math,
scoring/classification semantics, NULL-as-disagreement, a pure-Python
replica differential, and the DuckDB twin rehearsal for the r12 gate
(`record_linkage_topk`, registered in plans/catalog_r12.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import linkage
from advanced_elb_logs_etl_spark.plans.catalog_r12 import (
    LINKAGE_FIELDS as FIELDS,
    LINKAGE_LOWER as LOWER,
    LINKAGE_UPPER as UPPER,
)


def test_weight_math_and_guards():
    w_a, w_d = linkage.fs_weight_micro(0.9, 0.2)
    assert w_a == round(math.log(4.5) * 1e6)
    assert w_d == round(math.log(0.1 / 0.8) * 1e6)
    for m, u in [(0.2, 0.9), (0.5, 0.5), (1.0, 0.1), (0.9, 0.0)]:
        with pytest.raises(ValueError):
            linkage.fs_weight_micro(m, u)


def test_scoring_classification_and_null_rule(spark):
    rows = [
        (1, 2, True, True, True),     # all agree -> link
        (3, 4, False, False, False),  # all disagree -> non_link
        (5, 6, True, None, True),     # NULL counts as disagreement
    ]
    df = spark.createDataFrame(
        rows, "id1 long, id2 long, f_segment boolean, f_balance boolean,"
        " f_bal_sign boolean"
    )
    got = {
        (r.id1, r.id2): r
        for r in linkage.score_pairs(df, FIELDS, UPPER, LOWER).collect()
    }
    ws = {f: linkage.fs_weight_micro(*mu) for f, mu in FIELDS.items()}
    all_agree = sum(w[0] for w in ws.values())
    all_dis = sum(w[1] for w in ws.values())
    assert got[(1, 2)].score_micro == all_agree
    assert got[(1, 2)].decision == "link"
    assert got[(3, 4)].score_micro == all_dis
    assert got[(3, 4)].decision == "non_link"
    mixed = ws["f_segment"][0] + ws["f_balance"][1] + ws["f_bal_sign"][0]
    assert got[(5, 6)].score_micro == mixed
    assert got[(5, 6)].n_agree == 2
    with pytest.raises(ValueError):
        linkage.score_pairs(df, {}, UPPER, LOWER)
    with pytest.raises(ValueError):
        linkage.score_pairs(df, FIELDS, LOWER - 1, LOWER)


def test_randomized_replica_differential(spark):
    import random

    rng = random.Random(0x11A6E)
    rows = [
        (
            i,
            i + 1000,
            rng.choice([True, False, None]),
            rng.choice([True, False, None]),
            rng.choice([True, False]),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "id1 long, id2 long, f_segment boolean, f_balance boolean,"
        " f_bal_sign boolean"
    )
    got = {
        r.id1: (r.score_micro, r.n_agree, r.decision)
        for r in linkage.score_pairs(df, FIELDS, UPPER, LOWER).collect()
    }
    ws = {f: linkage.fs_weight_micro(*mu) for f, mu in FIELDS.items()}
    for i, _, fs, fb, fg in rows:
        s, n = 0, 0
        for f, hit in zip(("f_segment", "f_balance", "f_bal_sign"), (fs, fb, fg)):
            if hit:
                s += ws[f][0]
                n += 1
            else:
                s += ws[f][1]
        dec = "link" if s >= UPPER else ("non_link" if s < LOWER else "possible")
        assert got[i] == (s, n, dec), i


# --- the r12 catalog gate (REGISTERED in plans/catalog_r12.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry — the catalog_r11 pattern).  Nation-blocked
# customer pairs scored over three agreement fields; top-200 by
# (score, ids).  Integer surface (decision is a deterministic string
# enum). -----------------------------------------------------------

from advanced_elb_logs_etl_spark.plans.catalog_r12 import (  # noqa: E402
    _LINK_K as _K,
    LINKAGE_ORACLE as LINKAGE_ORACLE_QUEUED_R13,
    q_record_linkage_topk,
)


def test_queued_catalog_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the registered r12 entry at
    sf0.01 (integer-exact scores; the k-th boundary is a deterministic
    integer+id order, so the selected SET is identical)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_record_linkage_topk(spark, sf)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(x) for x in r) for r in sdf.select(*scols).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf}/customer.parquet')"
    )
    d = con.execute(LINKAGE_ORACLE_QUEUED_R13)
    cols = [c[0] for c in d.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    drows = sorted(tuple(str(r[i]) for i in idx) for r in d.fetchall())
    assert sorted(cols) == scols
    assert srows == drows
    assert len(srows) == _K
