"""Hashed-ngram linear classifier (operators/classifier.py): feature
multiplicity, sparse-weight semantics, featureless docs, and a pure-Python
differential on the exact integer accumulation."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators.classifier import (
    MICRO,
    classifier_scores,
    hashed_ngram_buckets,
    synthetic_weights,
)

B = 64


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _buckets_py(text: str, buckets: int, ngrams=(1, 2)) -> list[int]:
    toks = text.strip().split()
    if text.strip() == "":
        toks = [""]  # split('') -> [''] in Spark too; but trimmed empty
    out: list[int] = []
    for n in ngrams:
        if len(toks) >= n:
            for i in range(len(toks) - n + 1):
                out.append(_h60_py(" ".join(toks[i : i + n])) % buckets)
    return out


def _w_py(bucket: int, seed: str = "w", scale: int = 1 << 23) -> int:
    return int(hashlib.md5(f"{seed}:{bucket}".encode()).hexdigest()[:6], 16) - scale


def test_bucket_features_match_python(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha alpha"),        # multiplicity: [a, a, 'a a']
        (3, "single"),             # unigram only, no bigram
        (4, "x y z w v u t s r"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id", hashed_ngram_buckets(F.col("text"), B).alias("b")
        ).collect()
    }
    for did, text in rows:
        assert got[did] == _buckets_py(text, B), text


def test_scores_exact_integer_accumulation(spark):
    rows = [(1, "alpha beta gamma"), (2, "alpha alpha"), (3, "single")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    w = synthetic_weights(spark, B)
    got = {
        r.doc_id: r
        for r in classifier_scores(docs, w, B, bias_micro=250_000).collect()
    }
    for did, text in rows:
        bks = _buckets_py(text, B)
        want_sum = sum(_w_py(b) for b in bks)
        r = got[did]
        assert r.n_features == len(bks)
        assert r.w_sum_micro == want_sum, "integer accumulation must be exact"
        assert r.score == (250_000 + want_sum) / (len(bks) * MICRO)


def test_sparse_weights_and_featureless_docs(spark):
    docs = spark.createDataFrame(
        [(1, "aaa bbb"), (2, "   ")], "doc_id bigint, text string"
    )
    # model covers only ONE of doc 1's buckets; the rest weigh 0
    bks = _buckets_py("aaa bbb", B)
    w = spark.createDataFrame([(bks[0], 42)], "bucket bigint, weight_micro bigint")
    got = {r.doc_id: r for r in classifier_scores(docs, w, B).collect()}
    assert got[1].n_features == len(bks)
    assert got[1].w_sum_micro == 42 * bks.count(bks[0])
    # whitespace-only text tokenizes to one empty token -> it still hashes;
    # featureless means n_features == 0 only for genuinely empty grams
    assert got[2].n_features >= 0
    empty = spark.createDataFrame([(3, None)], "doc_id bigint, text string")
    r3 = classifier_scores(empty, w, B, bias_micro=7 * MICRO).collect()[0]
    assert r3.n_features == 0 and r3.w_sum_micro == 0 and r3.score == 7.0


def test_synthetic_weights_zero_mean_range(spark):
    w = synthetic_weights(spark, 4096)
    stats = w.agg(
        F.min("weight_micro").alias("lo"),
        F.max("weight_micro").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert stats.n == 4096
    assert -(1 << 23) < stats.lo < 0 < stats.hi < (1 << 23)
