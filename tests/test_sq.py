"""Scalar quantization (operators/sq.py — uniform per-dimension int8
codes + asymmetric dequantized search): closed-form code/bound cases,
a pure-Python replica differential, guards, and the DuckDB twin
rehearsal for the queued r14 catalog gate (`sq_adc_topk`) — the freeze
discipline's pre-rehearsal.  Unlike PQ (k-means codebooks force a
bounded-recall gate) every SQ stage is exact integer math, so the full
search surface is value-exact twinnable."""

from __future__ import annotations

import random

import pytest

from advanced_elb_logs_etl_spark.operators import sq
from advanced_elb_logs_etl_spark.operators.pq import snap_micro_py


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _codes_py(vecs, lo, hi, levels=256):
    out = {}
    for vid, v in vecs:
        m = [snap_micro_py(float(x)) for x in v]
        out[vid] = [
            min(
                levels - 1,
                max(0, ((m[i] - lo[i]) * (levels - 1)) // max(hi[i] - lo[i], 1)),
            )
            for i in range(len(m))
        ]
    return out


def test_bounds_codes_and_clamps(spark):
    rows = [(0, [0.0, -1.0]), (1, [0.5, 0.0]), (2, [1.0, 1.0])]
    df = _emb(spark, rows)
    lo, hi = sq.sq_train_bounds(df, dim=2)
    assert lo == [0, -1_000_000] and hi == [1_000_000, 1_000_000]
    got = {
        r.vec_id: list(r.code) for r in sq.sq_encode(df, lo, hi).collect()
    }
    # corpus min -> 0, corpus max -> levels-1, midpoint -> floor(255/2)
    assert got[0] == [0, 0]
    assert got[2] == [255, 255]
    assert got[1] == [127, 127]


def test_constant_dimension_codes_zero(spark):
    rows = [(0, [0.25, 3.0]), (1, [0.25, -3.0])]
    df = _emb(spark, rows)
    lo, hi = sq.sq_train_bounds(df, dim=2)
    assert lo[0] == hi[0] == 250_000
    got = {
        r.vec_id: list(r.code) for r in sq.sq_encode(df, lo, hi).collect()
    }
    assert got[0][0] == got[1][0] == 0  # hi == lo -> code 0, no div-by-0
    # dequantize reproduces the constant dimension exactly
    deq = {
        r.vec_id: list(r.deq)
        for r in sq.sq_dequantize(
            sq.sq_encode(df, lo, hi), lo, hi
        ).collect()
    }
    assert deq[0][0] == deq[1][0] == 250_000


def test_randomized_replica_differential(spark):
    rng = random.Random(0x5108)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    df = _emb(spark, rows)
    lo, hi = sq.sq_train_bounds(df, dim=8)
    got = {
        r.vec_id: list(r.code) for r in sq.sq_encode(df, lo, hi).collect()
    }
    assert got == _codes_py(rows, lo, hi)
    # reconstruction error is within one quantization step per dim
    deq = {
        r.vec_id: list(r.deq)
        for r in sq.sq_dequantize(
            sq.sq_encode(df, lo, hi), lo, hi
        ).collect()
    }
    for vid, v in rows:
        m = [snap_micro_py(float(x)) for x in v]
        for i in range(8):
            step = max((hi[i] - lo[i]) // 255, 1)
            assert abs(deq[vid][i] - m[i]) <= step + 1, (vid, i)


def test_guards(spark):
    df = _emb(spark, [(0, [0.0, 1.0])])
    with pytest.raises(ValueError):
        sq.sq_train_bounds(df, dim=0)
    with pytest.raises(ValueError):
        sq.sq_train_bounds(df, dim=3)  # corpus is 2-dim
    lo, hi = sq.sq_train_bounds(df, dim=2)
    with pytest.raises(ValueError):
        sq.sq_encode(df, lo, hi, levels=1)
    with pytest.raises(ValueError):
        sq.sq_adc_topk(sq.sq_encode(df, lo, hi), lo, hi, [], k=5)
    with pytest.raises(ValueError):
        sq.sq_adc_topk(
            sq.sq_encode(df, lo, hi), lo, hi, [(0, [0, 0])], k=0
        )


def test_encode_dimension_mismatch_raises(spark):
    """A vector longer (or shorter) than the trained bounds must fail
    LOUDLY at encode time, not silently emit NULL codes for the
    out-of-bounds dimensions (ADVICE r13)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    df2 = _emb(spark, [(0, [0.0, 1.0])])
    lo, hi = sq.sq_train_bounds(df2, dim=2)
    bad_long = _emb(spark, [(1, [0.0, 1.0, 2.0])])
    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        sq.sq_encode(bad_long, lo, hi).collect()
    bad_short = _emb(spark, [(2, [0.5])])
    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        sq.sq_encode(bad_short, lo, hi).collect()
    # the happy path is untouched: exact codes for a matching vector
    ok = {r.vec_id: list(r.code) for r in sq.sq_encode(df2, lo, hi).collect()}
    assert ok[0] == [0, 0]


# --- the r14 catalog gate (REGISTERED in plans/catalog_r14.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry — the catalog_r13 pattern) -----------------------

from advanced_elb_logs_etl_spark.plans.catalog_r14 import (  # noqa: E402
    SQ_DIM,
    SQ_NQ,
    SQ_ORACLE as SQ_ORACLE_QUEUED_R14,
    SQ_TOPK,
    q_sq_adc_topk,
)


def test_queued_sq_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the registered r14 entry at
    sf0.01 through the pandas fetch path, plus the recall lane: the SQ top-10
    must recover the exact micro-L2 top-10."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_sq_adc_topk(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(
        tuple(str(x) for x in r) for r in spd.itertuples(index=False)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    dpd = con.execute(SQ_ORACLE_QUEUED_R14).df()
    assert sorted(dpd.columns) == scols
    drows = sorted(
        tuple(str(x) for x in r) for r in dpd[scols].itertuples(index=False)
    )
    assert srows == drows
    assert len(srows) == SQ_NQ * SQ_TOPK
    # recall lane: exact micro-L2 ground truth from the same view
    exact = con.execute(f"""
        WITH snapped AS MATERIALIZED (
          SELECT vec_id,
                 list_transform(embedding, x -> round(x::DOUBLE * 1e6)::BIGINT) AS m
          FROM embeddings
        ), q AS (SELECT vec_id AS q_id, m AS qm FROM snapped WHERE vec_id < {SQ_NQ})
        SELECT q_id, neighbor_id FROM (
          SELECT q.q_id, s.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.q_id ORDER BY
                   list_sum(list_transform(generate_series(1, {SQ_DIM}),
                     i -> (s.m[i] - q.qm[i]) * (s.m[i] - q.qm[i]))),
                   s.vec_id) AS rnk
          FROM q, snapped s WHERE s.vec_id != q.q_id
        ) WHERE rnk <= {SQ_TOPK}
    """).fetchall()
    truth = {}
    for q_id, nb in exact:
        truth.setdefault(q_id, set()).add(nb)
    hits = sum(
        1
        for r in spd.itertuples(index=False)
        if int(r.neighbor_id) in truth[int(r.q_id)]
    )
    assert hits / (SQ_NQ * SQ_TOPK) >= 0.9  # 1.0 observed at sf0.01
