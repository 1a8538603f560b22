"""Ground-truth tests for the round-2 text/curation additions: Gopher-style
repetition stats, TF-IDF top terms, PII redaction, and deterministic
hash-based sampling/splitting (value-level parity with DuckDB lives in
test_oracle_parity.py; these pin hand-computed semantics and invariants)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import redaction, sampling, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------


def test_repetition_stats_hand_computed(spark):
    # "a b a b a": 5 tokens, 2 distinct, top token 'a' x3;
    # bigrams: [a b, b a, a b, b a] -> 4 bigrams, top count 2.
    out = text.repetition_stats(_docs(spark, [(1, "a b a b a")])).collect()[0]
    assert out.n_tokens == 5
    assert out.n_distinct_tokens == 2
    assert out.dup_token_ratio == pytest.approx(3 / 5)
    assert out.top_token_ratio == pytest.approx(3 / 5)
    assert out.top_bigram_ratio == pytest.approx(2 / 4)
    assert not out.passes_repetition_gate


def test_repetition_stats_all_unique_passes(spark):
    out = text.repetition_stats(_docs(spark, [(1, "q w e r t y u i o p")])).collect()[0]
    assert out.dup_token_ratio == 0.0
    assert out.top_bigram_ratio == pytest.approx(1 / 9)  # 9 bigrams, all unique
    # gate: dup 0 <= 0.30 but top_bigram 0.111 > 0.08 -> fails on bigram term
    assert not out.passes_repetition_gate
    long_unique = " ".join(f"tok{i}" for i in range(30))
    out2 = text.repetition_stats(_docs(spark, [(2, long_unique)])).collect()[0]
    assert out2.passes_repetition_gate


def test_repetition_stats_single_token_doc(spark):
    # one token -> no bigrams; left join must coalesce ratio to 0, not drop
    out = text.repetition_stats(_docs(spark, [(1, "solo")])).collect()
    assert len(out) == 1
    assert out[0].n_tokens == 1
    assert out[0].top_bigram_ratio == 0.0


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------


def test_tfidf_prefers_group_exclusive_terms(spark):
    rows = [
        (1, "apple apple banana", "g1"),
        (2, "banana cherry", "g2"),
        (3, "banana date", "g3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = text.tfidf_top_terms(df, group_col="source", k=2)
    top_g1 = [r.term for r in out.filter(F.col("source") == "g1").orderBy("rank").collect()]
    # 'apple' (tf=2, exclusive, idf=ln 3) must outrank 'banana' (idf=0).
    assert top_g1[0] == "apple"
    row = out.filter((F.col("source") == "g1") & (F.col("term") == "apple")).collect()[0]
    assert row.tfidf == pytest.approx(2 * math.log(3.0), abs=1e-6)
    # banana appears in every group -> idf 0 -> tfidf 0 everywhere
    assert all(
        r.tfidf == 0.0 for r in out.filter(F.col("term") == "banana").collect()
    )


def test_tfidf_rank_is_dense_per_group_and_capped(spark):
    rows = [(i, f"w{i} w{i} shared", f"g{i % 2}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = text.tfidf_top_terms(df, group_col="source", k=3)
    for g in ("g0", "g1"):
        ranks = sorted(r.rank for r in out.filter(F.col("source") == g).collect())
        assert ranks == [1, 2, 3]


# ---------------------------------------------------------------------------
# redact_pii
# ---------------------------------------------------------------------------


def test_redact_pii_counts_and_replaces(spark):
    t = (
        "mail a@b.io and c.d+tag@ex-ample.org call 555-123-4567 "
        "from 192.168.1.250 or 10.0.0.1"
    )
    out = redaction.redact_pii(_docs(spark, [(1, t)])).collect()[0]
    assert out.n_emails == 2
    assert out.n_phones == 1
    assert out.n_ipv4 == 2
    assert out.redacted_text == (
        "mail <EMAIL> and <EMAIL> call <PHONE> from <IP> or <IP>"
    )


def test_redact_pii_email_consumed_before_ip_and_phone(spark):
    # digits+dots inside an email must not double-match as IP after the
    # email pass replaced them
    out = redaction.redact_pii(_docs(spark, [(1, "x 1.2.3.4@mail.com y")])).collect()[0]
    assert out.n_emails == 1
    assert out.redacted_text == "x <EMAIL> y"


def test_redact_pii_clean_text_untouched(spark):
    t = "no pii here just words and the number 12345"
    out = redaction.redact_pii(_docs(spark, [(1, t)])).collect()[0]
    assert (out.n_emails, out.n_phones, out.n_ipv4) == (0, 0, 0)
    assert out.redacted_text == t


# ---------------------------------------------------------------------------
# sampling / splitting
# ---------------------------------------------------------------------------


def test_split_is_deterministic_and_row_local(spark):
    df1 = _docs(spark, [(i, "x") for i in range(500)])
    df2 = _docs(spark, [(i, "x") for i in range(250)])  # subset corpus
    s1 = {r.doc_id: r.split for r in sampling.assign_split(df1).collect()}
    s2 = {r.doc_id: r.split for r in sampling.assign_split(df2).collect()}
    # growing the corpus never reassigns an existing record
    assert all(s1[i] == s2[i] for i in range(250))
    # and fractions land near the targets
    n_train = sum(1 for v in s1.values() if v == "train")
    assert 0.7 < n_train / 500 < 0.9


def test_stratified_sample_rate_zero_and_one(spark):
    df = _docs(spark, [(i, "x") for i in range(200)])
    assert sampling.stratified_sample(df, F.lit(1.0)).count() == 200
    assert sampling.stratified_sample(df, F.lit(0.0)).count() == 0
    kept = sampling.stratified_sample(df, F.lit(0.5)).count()
    assert 60 <= kept <= 140  # loose binomial bound, deterministic value


def test_sample_and_split_hashes_are_independent(spark):
    # same doc set, different seeds -> decisions must differ somewhere
    df = _docs(spark, [(i, "x") for i in range(300)])
    split_train = {
        r.doc_id for r in sampling.assign_split(df, train=0.5, val=0.0).collect()
        if r.split == "train"
    }
    sampled = {
        r.doc_id for r in sampling.stratified_sample(df, F.lit(0.5)).collect()
    }
    assert split_train != sampled
