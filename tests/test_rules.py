"""Gopher/C4 rule-filter battery (operators/rules.py): hand-computed
fixtures per named rule, a pure-Python differential over the documents
table, and null-text semantics."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators.rules import (
    GOPHER_STOPWORDS,
    rule_filter_battery,
)

_GOOD = (
    "The quick brown fox jumps over the lazy dog and then runs far away "
    "to have a rest with many other animals that live nearby in peace. "
    "It was a good day. Everyone agreed! What could be better? "
    + " ".join(f"word{i}" for i in range(40))
    + " And the final sentence ends properly."
)


def _rows():
    return [
        (1, _GOOD),                                  # passes everything
        (2, "short text"),                           # fails word_count
        (3, " ".join(["x"] * 60)),                   # mean_word_len < 3, no stopwords
        (4, _GOOD + " " + "#" * 40),                 # symbol ratio blown
        (5, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"),  # all bullets
        (6, _GOOD.replace("day.", "day...") + "\nfirst line...\nsecond line..."),
        (7, " ".join(["12345"] * 80)),               # alpha fraction 0
        (8, _GOOD + " { code marker"),               # c4 curly brace
        (9, _GOOD + " Lorem Ipsum filler"),          # c4 lorem ipsum
        (10, None),                                  # null text
    ]


def test_named_rule_fixtures(spark):
    df = spark.createDataFrame(_rows(), "doc_id bigint, text string")
    got = {r.doc_id: r for r in rule_filter_battery(df).collect()}

    assert got[1].gopher_pass and got[1].c4_pass
    assert not got[2].word_count_ok and not got[2].gopher_pass
    assert not got[3].mean_word_len_ok and not got[3].stopwords_ok
    assert got[4].word_count_ok and not got[4].symbol_ratio_ok
    assert not got[5].bullet_lines_ok
    assert not got[7].alpha_words_ok
    # c4: structural markers fail c4_pass but do not touch gopher flags
    assert got[8].gopher_pass and not got[8].no_curly_brace and not got[8].c4_pass
    assert got[9].gopher_pass and not got[9].no_lorem_ipsum and not got[9].c4_pass
    # null text: every boolean False, n_sentences 0
    r10 = got[10]
    assert not r10.gopher_pass and not r10.c4_pass and r10.n_sentences == 0
    assert not r10.word_count_ok and not r10.no_curly_brace


def test_ellipsis_line_rule(spark):
    # >30% of lines ending in '...' fails; the GOOD doc as one line passes
    bad = "\n".join(["plain line", "trailing one...", "another one..."])
    df = spark.createDataFrame(
        [(1, bad), (2, _GOOD)], "doc_id bigint, text string"
    )
    got = {r.doc_id: r for r in rule_filter_battery(df).collect()}
    assert not got[1].ellipsis_lines_ok
    assert got[2].ellipsis_lines_ok


def _gopher_py(text: str) -> dict:
    toks = re.split(r"\s+", text.strip()) if text.strip() else [""]
    n = len(toks)
    mean_len = sum(len(t) for t in toks) / n if n else 0.0
    n_hash = text.count("#")
    n_ell = len(text.split("...")) - 1
    lines = text.split("\n")
    n_bullet = sum(1 for l in lines if re.match(r"^\s*[-*•●]", l))
    n_ell_end = sum(1 for l in lines if re.search(r"\.\.\.\s*$", l))
    n_alpha = sum(1 for t in toks if re.search("[A-Za-z]", t))
    n_stop = len({t.lower() for t in toks} & set(GOPHER_STOPWORDS))
    return {
        "word_count_ok": 50 <= n <= 100_000,
        "mean_word_len_ok": 3.0 <= mean_len <= 10.0,
        "symbol_ratio_ok": (n_hash + n_ell) / n <= 0.1 if n else False,
        "bullet_lines_ok": n_bullet / len(lines) <= 0.9,
        "ellipsis_lines_ok": n_ell_end / len(lines) <= 0.3,
        "alpha_words_ok": n_alpha / n >= 0.8 if n else False,
        "stopwords_ok": n_stop >= 2,
    }


def test_differential_on_documents_table(spark):
    from conftest import SF_SMALL
    from advanced_elb_logs_etl_spark.sources.testdata import load_table

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    got = {r.doc_id: r for r in rule_filter_battery(docs).collect()}
    rows = {r.doc_id: r.text for r in docs.collect()}
    assert len(got) == len(rows) > 0
    for did, text in rows.items():
        want = _gopher_py(text)
        for k, v in want.items():
            assert bool(got[did][k]) == bool(v), (did, k, text[:60])


def test_differential_on_random_texts(spark):
    """Seeded generative differential: random whitespace/punctuation/
    bullet/newline soup vs the pure-Python rule evaluation — catches
    tokenization-boundary disagreements the curated fixtures miss."""
    import random

    rng = random.Random(99)
    words = ["the", "fox", "x", "12", "#", "a#b", "...", "word...", "-", "*",
             "be", "to", "Lorem", "ipsum", "end.", "quo?", "it!", "{x}", "longishword"]
    texts = []
    for i in range(120):
        n = rng.randint(1, 120)
        toks = [rng.choice(words) for _ in range(n)]
        s = ""
        for t in toks:
            s += t + (rng.choice(["\n", " "]) if rng.random() < 0.15 else " ")
        texts.append((i, s.strip()))
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    got = {r.doc_id: r for r in rule_filter_battery(df).collect()}
    for did, text in texts:
        want = _gopher_py(text)
        for k, v in want.items():
            assert bool(got[did][k]) == bool(v), (did, k, text[:60])
