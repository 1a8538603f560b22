"""Product quantization (operators/pq.py): exact-integer differential of
subvectors, k-means training, encoding, and the ADC scan against a pure
Python replica; recall sanity vs exact micro-int L2 on the real
embeddings table; determinism of the whole pipeline."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import pq
from advanced_elb_logs_etl_spark.sources.testdata import load_table

from conftest import SF_SMALL

DIM, M, K = 64, 8, 4
W = DIM // M


def _snap_py(x: float) -> int:
    prod = float(x) * 1_000_000.0  # same IEEE product the Column computes
    return int(Decimal(prod).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _subs_py(vec):
    s = [_snap_py(x) for x in vec]
    return [s[m * W : (m + 1) * W] for m in range(M)]


def _train_py(vecs: dict[int, list[float]], iters: int = 2):
    subs = {vid: _subs_py(v) for vid, v in vecs.items()}
    seed_ids = sorted(subs)[:K]
    cb = [[list(subs[vid][m]) for vid in seed_ids] for m in range(M)]
    for _ in range(iters):
        sums: dict[tuple[int, int], list] = {}
        counts: dict[tuple[int, int], int] = {}
        for vid in subs:
            for m in range(M):
                best = min(
                    range(K),
                    key=lambda c: (
                        sum((a - b) * (a - b) for a, b in zip(subs[vid][m], cb[m][c])),
                        c,
                    ),
                )
                key = (m, best)
                acc = sums.setdefault(key, [0] * W)
                for i, a in enumerate(subs[vid][m]):
                    acc[i] += a
                counts[key] = counts.get(key, 0) + 1
        new_cb = [[list(cb[m][c]) for c in range(K)] for m in range(M)]
        for (m, c), acc in sums.items():
            n = counts[(m, c)]
            new_cb[m][c] = [pq._round_half_away(s, n) for s in acc]
        cb = new_cb
    return cb, subs


def _encode_py(subs, cb):
    return {
        vid: [
            min(
                range(K),
                key=lambda c: (
                    sum((a - b) * (a - b) for a, b in zip(sv[m], cb[m][c])),
                    c,
                ),
            )
            for m in range(M)
        ]
        for vid, sv in subs.items()
    }


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings").limit(120).persist()


@pytest.fixture(scope="module")
def emb_py(emb):
    return {r.vec_id: list(r.embedding) for r in emb.collect()}


def test_subvector_rows_match_python(spark, emb, emb_py):
    rows = pq.subvector_rows(emb, M, DIM).collect()
    got: dict[int, dict[int, list]] = {}
    for r in rows:
        got.setdefault(r.vec_id, {})[r.m] = list(r.sub)
    assert set(got) == set(emb_py)
    for vid, v in emb_py.items():
        want = _subs_py(v)
        assert [got[vid][m] for m in range(M)] == want, vid


def test_training_and_encoding_match_python(spark, emb, emb_py):
    cb = pq.train_codebooks(emb, M, K, DIM, iters=2)
    cb_py, subs = _train_py(emb_py, iters=2)
    assert cb == cb_py, "codebooks must be integer-identical to the replica"
    codes = {r.vec_id: list(r.codes) for r in pq.pq_encode(emb, cb, DIM).collect()}
    assert codes == _encode_py(subs, cb_py)


def test_adc_topk_matches_python_and_is_deterministic(spark, emb, emb_py):
    cb = pq.train_codebooks(emb, M, K, DIM, iters=1)
    codes_df = pq.pq_encode(emb, cb, DIM).persist()
    _, subs = _train_py(emb_py, iters=0)
    codes_py = _encode_py(subs, cb)
    qid = sorted(emb_py)[0]
    q = emb_py[qid]
    got = pq.adc_topk(codes_df, cb, query=q, k=7).collect()
    # python replica of the ADC scan
    q_micro = [pq.snap_micro_py(x) for x in q]
    luts = [
        [
            sum((a - b) * (a - b) for a, b in zip(q_micro[m * W : (m + 1) * W], cent))
            for cent in cb[m]
        ]
        for m in range(M)
    ]
    dists = {
        vid: sum(luts[m][codes_py[vid][m]] for m in range(M)) for vid in codes_py
    }
    want = sorted(dists.items(), key=lambda t: (t[1], t[0]))[:7]
    assert [(r.vec_id, r.adc_dist) for r in got] == want
    assert [r.rank for r in got] == list(range(1, 8))
    again = pq.adc_topk(codes_df, cb, query=q, k=7).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]
    codes_df.unpersist()


def test_adc_recall_vs_exact_l2(spark, emb, emb_py):
    """Compressed-domain distances must still place most true neighbors in
    the ADC top-k — recall@10 >= 0.4 against exact micro-int L2 (PQ with
    M=8/K=4 on 64-dim is a coarse 16-bit code; the bar is deliberately
    conservative and the assert is on a deterministic value)."""
    cb = pq.train_codebooks(emb, M, K, DIM, iters=2)
    codes_df = pq.pq_encode(emb, cb, DIM)
    qid = sorted(emb_py)[3]
    q = emb_py[qid]
    q_micro = [pq.snap_micro_py(x) for x in q]
    exact = sorted(
        (
            (
                sum(
                    (a - b) * (a - b)
                    for a, b in zip(q_micro, [_snap_py(x) for x in v])
                ),
                vid,
            )
            for vid, v in emb_py.items()
            if vid != qid
        ),
    )[:10]
    true_ids = {vid for _, vid in exact}
    got = {
        r.vec_id
        for r in pq.adc_topk(codes_df, cb, query=q, k=11).collect()
        if r.vec_id != qid
    }
    recall = len(true_ids & got) / 10
    assert recall >= 0.4, recall


def test_dim_divisibility_guard(spark, emb):
    with pytest.raises(ValueError):
        pq.subvector_rows(emb, 7, DIM)
