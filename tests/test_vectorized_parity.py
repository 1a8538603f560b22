"""Bitwise parity between the two physical forms of the similarity kernels
(operators/similarity.py): the Column-expression left folds (interpreted,
SQL-shaped) and the Arrow/NumPy pandas_udf kernels (the default scale path).

The kernels claim BIT-identical results — same IEEE-754 operation sequence
per row — so these tests compare raw float bit patterns via struct.pack, not
a tolerance. Any future "optimization" that reorders the accumulation (BLAS
dot, np.sum pairwise summation) fails here loudly instead of silently
breaking the DuckDB value-hash oracle.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import similarity
from advanced_elb_logs_etl_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def _bits(x: float | None) -> bytes | None:
    return None if x is None else struct.pack("<d", x)


def _pairs(emb):
    a = emb.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("vb"))
    # consecutive-id pairs: cheap, deterministic, covers the corpus
    return a.join(b, F.col("ida") + 1 == F.col("idb"))


def test_dot_and_cosine_bitwise_equal(spark, emb):
    rows = (
        _pairs(emb.filter(F.col("vec_id") < 250))
        .select(
            similarity.dot(F.col("va"), F.col("vb")).alias("d_fold"),
            similarity.dot_v(F.col("va"), F.col("vb")).alias("d_vec"),
            similarity.cosine(F.col("va"), F.col("vb")).alias("c_fold"),
            similarity.cosine_v(F.col("va"), F.col("vb")).alias("c_vec"),
            similarity.norm2(F.col("va")).alias("n_fold"),
            similarity.norm_v(F.col("va")).alias("n_vec"),
        )
        .collect()
    )
    assert len(rows) >= 100
    for r in rows:
        assert _bits(r.d_fold) == _bits(r.d_vec), (r.d_fold, r.d_vec)
        assert _bits(r.c_fold) == _bits(r.c_vec), (r.c_fold, r.c_vec)
        assert _bits(r.n_fold) == _bits(r.n_vec), (r.n_fold, r.n_vec)


def test_dot_v_null_propagation(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0], [3.0, 4.0]), (2, None, [1.0, 1.0]), (3, [1.0, 1.0], None)],
        "id long, a array<double>, b array<double>",
    )
    rows = {r.id: r for r in df.select(
        "id",
        similarity.dot_v(F.col("a"), F.col("b")).alias("d"),
        similarity.norm_v(F.col("a")).alias("n"),
    ).collect()}
    assert rows[1].d == 11.0
    assert rows[2].d is None and rows[2].n is None
    assert rows[3].d is None and rows[3].n is not None


def test_rp_signatures_bitwise_equal(spark, emb):
    sub = emb.filter(F.col("vec_id") < 300)
    fold = {r.vec_id: r.rp_sig for r in similarity.rp_signatures(sub, vectorized=False).collect()}
    vec = {r.vec_id: r.rp_sig for r in similarity.rp_signatures(sub, vectorized=True).collect()}
    assert fold == vec and len(fold) >= 100


def test_topk_operators_identical_across_paths(spark, emb):
    q = emb.filter(F.col("vec_id") < 4)

    def key(df):
        return sorted(
            (r.q_id, r.neighbor_id, _bits(r.cosine_raw), r.rank) for r in df.collect()
        )

    assert key(similarity.brute_force_topk(emb, q, k=5, vectorized=True)) == key(
        similarity.brute_force_topk(emb, q, k=5, vectorized=False)
    )
    assert key(similarity.rp_lsh_topk(emb, q, k=5, vectorized=True)) == key(
        similarity.rp_lsh_topk(emb, q, k=5, vectorized=False)
    )


def test_blocked_neardup_subset_of_allpairs(spark, emb):
    """Cluster blocking may only MISS pairs, never invent or change one —
    and values must be bit-identical where both forms report a pair.
    overlap=3 assignment is the recall knob: measured 0.80 on this corpus
    (vs 0.29 at overlap=1 — the >=0.4 pairs are only moderately similar,
    so single-assignment quantization splits many of them)."""
    cents = emb.filter(F.col("vec_id") < 16)
    allp = {
        (r.id_a, r.id_b): _bits(r.cosine_raw)
        for r in similarity.embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    blocked = {
        (r.id_a, r.id_b): _bits(r.cosine_raw)
        for r in similarity.embedding_neardup_blocked(
            emb, cents, threshold=0.4, overlap=3
        ).collect()
    }
    assert blocked, "blocked form should find near-dup pairs"
    assert set(blocked) <= set(allp)
    for k, v in blocked.items():
        assert allp[k] == v
    recall = len(blocked) / len(allp)
    assert recall >= 0.7, f"blocked recall {recall:.2f}"


def test_assign_clusters_identical_across_paths(spark, emb):
    """The collected-centroid kernel assignment must reproduce the
    join+window reference plan exactly, for hard and overlap assignment."""
    cents = emb.filter(F.col("vec_id") < 16)
    for m in (1, 3):
        a = sorted(
            (r.vec_id, r.cluster)
            for r in similarity.assign_clusters(emb, cents, m=m, vectorized=True).collect()
        )
        b = sorted(
            (r.vec_id, r.cluster)
            for r in similarity.assign_clusters(emb, cents, m=m, vectorized=False).collect()
        )
        assert a == b and len(a) >= 400 * m
