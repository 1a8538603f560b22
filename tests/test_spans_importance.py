"""Unit tests for the round-6 span-dedup and DSIR importance operators.

The catalog oracle parity test (test_oracle_parity.py) checks the two
gate queries value-for-value against DuckDB; here the operators' own
semantics are pinned: a pure-Python differential for span removal, the
keep-first invariant, interval-merge edge cases, and DSIR's scoring
properties (target docs outrank off-target, exact-integer determinism).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import importance, spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# span dedup
# ---------------------------------------------------------------------------

BOILER = "one two three four five six seven eight"  # exactly width=8 tokens


def test_duplicate_spans_flags_all_but_first(spark):
    df = _docs(
        spark,
        [
            (1, f"alpha beta {BOILER} gamma"),
            (2, f"delta {BOILER} epsilon zeta"),
            (3, "unrelated words with no repeats at all here"),
        ],
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_windows)
        for r in spans.duplicate_spans(df, width=8, min_count=2).collect()
    }
    # doc 1 holds the first occurrence (doc_id 1 < 2) -> exempt; doc 2's
    # copy starts at token 2 (after 'delta') and spans 8 tokens.
    assert got == {(2, 2, 9, 1)}


def test_duplicate_spans_merges_overlap_and_adjacency(spark):
    # Two docs share a 10-token run -> doc 2 gets windows at pos 2,3,4
    # (three overlapping 8-windows) merged into ONE [2, 11] span.
    run = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    df = _docs(spark, [(1, f"{run} x y"), (2, f"pre {run} post")])
    got = [
        (r.doc_id, r.span_start, r.span_end, r.span_windows)
        for r in spans.duplicate_spans(df, width=8, min_count=2).collect()
    ]
    assert got == [(2, 2, 11, 3)]


def test_remove_duplicate_spans_differential(spark):
    """Pure-Python reference: flag every >=min_count window except the
    globally first (doc, pos); drop tokens covered by any flagged
    window; compare reconstructed text."""
    rows = [
        (1, f"alpha beta {BOILER}"),
        (2, f"{BOILER} tail words here"),
        (3, f"mid {BOILER} and {BOILER}"),
        (4, "no duplicated content in this document at all"),
    ]
    width = 8

    # reference implementation
    wins: dict[str, list[tuple[int, int]]] = {}
    toks_by_doc = {d: t.split() for d, t in rows}
    for d, toks in sorted(toks_by_doc.items()):
        for p in range(len(toks) - width + 1):
            g = " ".join(toks[p : p + width])
            wins.setdefault(g, []).append((d, p + 1))
    expect = {}
    for d, toks in toks_by_doc.items():
        drop = set()
        for g, occ in wins.items():
            if len(occ) < 2:
                continue
            for i, (dd, pp) in enumerate(sorted(occ)):
                if i == 0:
                    continue
                if dd == d:
                    drop.update(range(pp, pp + width))
        expect[d] = " ".join(
            t for i, t in enumerate(toks, start=1) if i not in drop
        )

    out = {
        r.doc_id: (r.dedup_text, r.removed_tokens)
        for r in spans.remove_duplicate_spans(_docs(spark, rows), width=width).collect()
    }
    assert set(out) == set(expect)
    for d, (text, removed) in out.items():
        assert text == expect[d], f"doc {d}"
        assert removed == len(toks_by_doc[d]) - len(expect[d].split())


def test_short_docs_produce_no_windows(spark):
    df = _docs(spark, [(1, "too short"), (2, "too short")])
    assert spans.duplicate_spans(df, width=8).count() == 0
    out = spans.remove_duplicate_spans(df, width=8).collect()
    assert {r.dedup_text for r in out} == {"too short"}
    assert all(r.removed_tokens == 0 for r in out)


def test_within_doc_repeats_are_flagged(spark):
    # The SAME doc repeating a passage: second copy removed, first kept.
    df = _docs(spark, [(7, f"{BOILER} bridge {BOILER}")])
    got = [
        (r.span_start, r.span_end)
        for r in spans.duplicate_spans(df, width=8, min_count=2).collect()
    ]
    assert got == [(10, 17)]


# ---------------------------------------------------------------------------
# DSIR importance
# ---------------------------------------------------------------------------


def test_importance_ranks_target_like_docs_first(spark):
    target_text = "spark shuffle partition broadcast join codegen"
    off_text = "grape melon peach apricot plum cherry"
    df = _docs(
        spark,
        [(i, target_text) for i in range(5)]
        + [(i + 10, off_text) for i in range(5)],
    )
    target = df.filter(F.col("doc_id") < 5)
    w = {
        r.doc_id: r.weight_micro
        for r in importance.importance_weights(df, target).collect()
    }
    assert min(w[i] for i in range(5)) > max(w[i + 10] for i in range(5))


def test_importance_weights_deterministic_integers(spark):
    df = _docs(spark, [(i, f"word{i % 3} word{i % 5} filler text") for i in range(20)])
    target = df.filter(F.col("doc_id") % 4 == 0)
    a = sorted(map(tuple, importance.importance_weights(df, target).collect()))
    b = sorted(map(tuple, importance.importance_weights(df, target).collect()))
    assert a == b
    assert all(isinstance(t[2], int) for t in a)  # exact micro-nat sums


def test_select_top_k_tie_break_by_doc_id(spark):
    df = _docs(spark, [(i, "same text for everyone") for i in range(10)])
    target = df.filter(F.col("doc_id") < 3)
    got = [r.doc_id for r in importance.select_top_k(df, target, 4).collect()]
    assert got == [0, 1, 2, 3]  # equal weights -> smallest ids


def test_gumbel_resample_deterministic_and_k_sized(spark):
    df = _docs(spark, [(i, f"tok{i % 7} tok{i % 11} body words") for i in range(30)])
    target = df.filter(F.col("doc_id") % 3 == 0)
    a = [r.doc_id for r in importance.gumbel_resample(df, target, 5).collect()]
    b = [r.doc_id for r in importance.gumbel_resample(df, target, 5).collect()]
    assert a == b and len(a) == 5


def test_bucket_log_ratio_zero_when_target_equals_raw(spark):
    # target == raw corpus -> every ratio is exactly 0 micro-nats.
    df = _docs(spark, [(i, f"alpha beta gamma{i % 2}") for i in range(8)])
    rows = importance.hashed_feature_rows(df)
    ratios = importance.bucket_log_ratios(rows, rows).collect()
    assert ratios and all(r.lr_micro == 0 for r in ratios)
