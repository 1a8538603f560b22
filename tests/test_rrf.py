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


# --- the queued catalog gate, rehearsed against DuckDB --------------------
# Hybrid retrieval: BM25 top-100 for four query terms fused with the
# cosine top-100 neighbors of query vector 0 (documents and embeddings
# share the 0..499 id space).  All-integer surface except the NULLable
# lane ranks (BIGINT).

GATE_TERMS = ["join", "vector", "checkpoint", "gardenpath"]
GATE_N = 100  # per-lane depth
GATE_K = 50  # fused output
GATE_QVEC = 0


def q_rrf_hybrid_retrieval(spark, sf_dir):
    """Queued gate: reciprocal-rank fusion of the lexical (BM25) and
    semantic (embedding cosine) retrieval arms — the standard hybrid
    search combiner, rank-only across the lane boundary.

    Scale: lane A is bm25_topk (filtered explode + bounded aggs +
    TakeOrdered); lane B is brute_force_topk with ONE broadcast query
    vector (corpus never shuffles; the IVF/LSH variants swap in for
    larger query sets); the fusion itself is full-outer joins over two
    100-row frames + TakeOrdered(50).  The BM25 rank window is over the
    100-row TakeOrdered output — bounded by construction
    (GLOBAL_WINDOW_ALLOW's benford class; note at registration)."""
    from advanced_elb_logs_etl_spark.plans.catalog import _t
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    bm = retrieval.bm25_topk(docs, GATE_TERMS, k=GATE_N)
    bm_ranked = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score_micro").desc(), "doc_id"))
        .cast("long")
        .alias("rank"),
    )
    cos = similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") == GATE_QVEC), k=GATE_N
    )
    cos_ranked = cos.select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("long").alias("rank"),
    )
    return retrieval.rrf_fuse(
        {"bm25": bm_ranked, "cosine": cos_ranked},
        id_col="doc_id",
        k0=K0,
        k=GATE_K,
    )


RRF_ORACLE_QUEUED = None  # built lazily (imports catalog_llm's _cos)


def _build_oracle() -> str:
    from advanced_elb_logs_etl_spark.plans.catalog_llm import _cos

    terms = ", ".join(f"('{t}')" for t in sorted(set(GATE_TERMS)))
    return rf"""
WITH q AS (SELECT * FROM (VALUES {terms}) AS v(term)),
tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
), stats AS (
  SELECT doc_id, len(toks) AS dl, t.term, count(*)::BIGINT AS tf
  FROM tok, UNNEST(toks) AS u(tk) JOIN q t ON u.tk = t.term
  GROUP BY doc_id, len(toks), t.term
), corpus AS (
  SELECT count(*) AS n_docs, sum(len(toks)) AS dl_sum FROM tok
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM stats GROUP BY term
), idf AS (
  SELECT term, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf
  FROM dfreq, corpus
), contrib AS (
  SELECT s.doc_id,
         round(i.idf * (s.tf * (1.2 + 1))
               / (s.tf + 1.2 * (1.0 - 0.75 + 0.75 * s.dl
                                 / (c.dl_sum::DOUBLE / c.n_docs)))
               * 1e6)::BIGINT AS c_micro
  FROM stats s JOIN idf i USING (term), corpus c
), bm_scored AS (
  SELECT doc_id, sum(c_micro)::BIGINT AS score_micro
  FROM contrib GROUP BY doc_id
), bm_ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rank_bm25
  FROM bm_scored ORDER BY score_micro DESC, doc_id LIMIT {GATE_N}
), qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = {GATE_QVEC}),
cos_scored AS (
  SELECT v.vec_id AS doc_id, {_cos('q.q_vec', 'v.embedding')} AS cosine
  FROM qv q, embeddings v WHERE v.vec_id != {GATE_QVEC}
), cos_ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cosine DESC, doc_id) AS rank_cosine
  FROM cos_scored ORDER BY cosine DESC, doc_id LIMIT {GATE_N}
), fused AS (
  SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
         b.rank_bm25::BIGINT AS rank_bm25,
         c.rank_cosine::BIGINT AS rank_cosine,
         (coalesce(1000000 // (60 + b.rank_bm25), 0)
          + coalesce(1000000 // (60 + c.rank_cosine), 0))::BIGINT
           AS rrf_micro
  FROM bm_ranked b FULL OUTER JOIN cos_ranked c ON b.doc_id = c.doc_id
)
SELECT doc_id, rank_bm25, rank_cosine, rrf_micro
FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT {GATE_K}
"""


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
