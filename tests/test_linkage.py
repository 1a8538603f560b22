"""Fellegi-Sunter record linkage (operators/linkage.py): weight math,
scoring/classification semantics, NULL-as-disagreement, a pure-Python
replica differential, and the DuckDB twin rehearsal for the queued r13
gate (`record_linkage_topk`)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import linkage

FIELDS = {
    "f_segment": (0.9, 0.2),
    "f_balance": (0.85, 0.05),
    "f_bal_sign": (0.95, 0.5),
}
UPPER = 3_000_000
LOWER = 0


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


# --- the queued r13 catalog gate, rehearsed against DuckDB ----------------
# Nation-blocked customer pairs scored over three agreement fields;
# top-200 by (score, ids).  Integer + boolean-free surface (decision is
# a deterministic string enum).

_WS = {f: linkage.fs_weight_micro(*mu) for f, mu in FIELDS.items()}
_K = 200

LINKAGE_ORACLE_QUEUED_R13 = f"""
WITH c AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
), pairs AS (
  SELECT a.c_custkey AS id1, b.c_custkey AS id2,
         (a.c_mktsegment = b.c_mktsegment) AS f_segment,
         (abs(a.bal_cents - b.bal_cents) <= 500) AS f_balance,
         ((a.bal_cents >= 0) = (b.bal_cents >= 0)) AS f_bal_sign
  FROM c a JOIN c b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
), scored AS (
  SELECT id1, id2,
    (CASE WHEN coalesce(f_segment, FALSE) THEN {_WS['f_segment'][0]} ELSE {_WS['f_segment'][1]} END
     + CASE WHEN coalesce(f_balance, FALSE) THEN {_WS['f_balance'][0]} ELSE {_WS['f_balance'][1]} END
     + CASE WHEN coalesce(f_bal_sign, FALSE) THEN {_WS['f_bal_sign'][0]} ELSE {_WS['f_bal_sign'][1]} END
    )::BIGINT AS score_micro,
    (CASE WHEN coalesce(f_segment, FALSE) THEN 1 ELSE 0 END
     + CASE WHEN coalesce(f_balance, FALSE) THEN 1 ELSE 0 END
     + CASE WHEN coalesce(f_bal_sign, FALSE) THEN 1 ELSE 0 END
    )::INT AS n_agree
  FROM pairs
)
SELECT id1, id2, score_micro, n_agree,
       CASE WHEN score_micro >= {UPPER} THEN 'link'
            WHEN score_micro < {LOWER} THEN 'non_link'
            ELSE 'possible' END AS decision
FROM scored
ORDER BY score_micro DESC, id1, id2
LIMIT {_K}
"""


def q_record_linkage_topk(spark, sf_dir):
    """The queued r13 registration body: Fellegi-Sunter scoring of
    nation-blocked customer pairs, top-200 by exact integer score."""
    from advanced_elb_logs_etl_spark.sources.testdata import load_table

    pairs = linkage.customer_block_pairs(
        load_table(spark, sf_dir, "customer")
    )
    scored = linkage.score_pairs(pairs, FIELDS, UPPER, LOWER)
    return (
        scored.select("id1", "id2", "score_micro", "n_agree", "decision")
        .orderBy(F.col("score_micro").desc(), "id1", "id2")
        .limit(_K)
    )


def test_queued_catalog_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the queued r13 entry at
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
