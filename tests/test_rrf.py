"""Reciprocal-rank fusion (operators/retrieval.rrf_fuse): closed-form
cases, absent-lane semantics, guards, a pure-Python replica
differential, and the DuckDB twin rehearsal for the queued catalog gate
(`rrf_hybrid_retrieval` — BM25 lexical ranks fused with embedding
cosine ranks) — the freeze discipline's pre-rehearsal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import retrieval, similarity

K0 = 60


def _lane(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank long")


def test_closed_form_two_lanes(spark):
    a = _lane(spark, [(1, 1), (2, 2), (3, 3)])
    b = _lane(spark, [(2, 1), (4, 2)])
    got = {
        r.doc_id: (r.rank_a, r.rank_b, r.rrf_micro)
        for r in retrieval.rrf_fuse(
            {"a": a, "b": b}, k0=K0, k=10
        ).collect()
    }
    m = 1_000_000
    assert got[1] == (1, None, m // 61)
    assert got[2] == (2, 1, m // 62 + m // 61)
    assert got[3] == (3, None, m // 63)
    assert got[4] == (None, 2, m // 62)
    # doc 2 (in both lanes) outranks every single-lane doc
    assert got[2][2] == max(v[2] for v in got.values())


def test_topk_ties_and_guards(spark):
    a = _lane(spark, [(5, 1), (9, 2)])
    b = _lane(spark, [(9, 1), (5, 2)])
    # symmetric ranks -> equal scores -> ties broken by id
    rows = retrieval.rrf_fuse({"a": a, "b": b}, k0=K0, k=1).collect()
    assert [r.doc_id for r in rows] == [5]
    with pytest.raises(ValueError):
        retrieval.rrf_fuse({}, k0=K0)
    with pytest.raises(ValueError):
        retrieval.rrf_fuse({"a": a}, k0=0)


def test_k_guard_and_duplicate_lane_ids_keep_best_rank(spark):
    """ADVICE r12: k must be validated, and a duplicate id within one
    lane must keep its BEST (smallest) rank instead of fanning out
    through the full-outer joins and double-counting."""
    a = _lane(spark, [(1, 3), (1, 1), (2, 2)])  # doc 1 twice in lane a
    b = _lane(spark, [(1, 1)])
    with pytest.raises(ValueError):
        retrieval.rrf_fuse({"a": a}, k0=K0, k=0)
    got = {
        r.doc_id: (r.rank_a, r.rank_b, r.rrf_micro)
        for r in retrieval.rrf_fuse({"a": a, "b": b}, k0=K0, k=10).collect()
    }
    m = 1_000_000
    # exactly ONE output row per doc; doc 1 contributes rank 1 (not 3,
    # and not both)
    assert got[1] == (1, 1, 2 * (m // 61))
    assert got[2] == (2, None, m // 62)


def test_replica_differential_three_lanes(spark):
    import random

    rng = random.Random(0x44F)
    lanes = {}
    py = {}
    for name in ("x", "y", "z"):
        ids = rng.sample(range(50), 20)
        lanes[name] = _lane(spark, [(d, i + 1) for i, d in enumerate(ids)])
        py[name] = {d: i + 1 for i, d in enumerate(ids)}
    got = {
        r.doc_id: r.rrf_micro
        for r in retrieval.rrf_fuse(lanes, k0=K0, k=100).collect()
    }
    exp = {}
    for name, ranks in py.items():
        for d, rk in ranks.items():
            exp[d] = exp.get(d, 0) + 1_000_000 // (K0 + rk)
    assert got == exp


# --- the r13 catalog gate (REGISTERED in plans/catalog_r13.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry — the catalog_r12 pattern) -----------------------

from advanced_elb_logs_etl_spark.plans.catalog_r13 import (  # noqa: E402
    RRF_GATE_K as GATE_K,
    RRF_ORACLE,
    q_rrf_hybrid_retrieval,
)


def _build_oracle() -> str:
    return RRF_ORACLE


def test_queued_catalog_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal at sf0.01 through the pandas fetch
    path.  The fused SET is deterministic: scores are exact integers,
    ties break by id, and the 50th/51st boundary is an integer-order
    cut on both engines."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_rrf_hybrid_retrieval(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(
        tuple(str(x) for x in r) for r in spd.itertuples(index=False)
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    dpd = con.execute(_build_oracle()).df()
    assert sorted(dpd.columns) == scols
    drows = sorted(
        tuple(str(x) for x in r) for r in dpd[scols].itertuples(index=False)
    )
    assert srows == drows
    assert len(srows) == GATE_K
    # both lanes carry signal: the fused top-50 contains docs ranked by
    # each arm (non-null lane ranks on both sides)
    assert spd["rank_bm25"].notna().sum() > 0
    assert spd["rank_cosine"].notna().sum() > 0
