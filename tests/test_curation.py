"""Unit tests for corpus-curation operators (operators/curation.py):
decontamination edge cases, greedy packing semantics, Unicode
normalization. The value-hash parity against DuckDB lives in
test_oracle_parity.py (decontaminate_corpus / pack_sequences_greedy /
normalize_text_nfc)."""

from __future__ import annotations

import unicodedata

from advanced_elb_logs_etl_spark.operators import curation


def test_decontaminate_known_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),   # 7 shingles
            (2, "completely different words here now folks"),     # clean
            (3, "tiny doc"),                                      # < 3 tokens
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        # shares 'the quick brown', 'quick brown fox', 'brown fox jumps'
        [(100, "prefix the quick brown fox jumps suffix")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r for r in curation.decontaminate(corpus, benchmark, n=3).collect()
    }
    assert out[1].n_shingles == 7
    assert out[1].n_contaminated == 3
    assert out[1].is_contaminated  # 3/7 >= 0.2
    assert out[2].n_contaminated == 0 and not out[2].is_contaminated
    assert out[3].n_shingles == 0 and out[3].contamination_ratio == 0.0
    assert not out[3].is_contaminated


def test_decontaminate_default_long_grams(spark):
    """Default width is DECONTAM_N=8: a copied 8-token span flags, but a
    doc sharing every 3-gram-but-no-8-gram stays clean (the chance-collision
    robustness 3-grams lack)."""
    span = "one two three four five six seven eight"
    corpus = spark.createDataFrame(
        [
            (1, f"{span} tail"),               # contains the copied 8-gram
            (2, "one two three nine one two three ten one two three"),
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, f"head {span} more one two three")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curation.decontaminate(corpus, benchmark).collect()}
    assert out[1].is_contaminated and out[1].n_contaminated >= 1
    assert out[2].n_contaminated == 0 and not out[2].is_contaminated


def test_decontaminate_plan_shape(spark):
    """Benchmark hash set broadcast; no cartesian product anywhere."""
    corpus = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    bench = spark.createDataFrame([(2, "b c d e")], "doc_id long, text string")
    plan = (
        curation.decontaminate(corpus, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pack_sequences_greedy_semantics(spark):
    docs = spark.createDataFrame(
        [
            # group g: 60+60 fit (120 <= 128), 30 opens pack 1, 200 oversized
            # alone in pack 2, then 10 opens pack 3
            ("g", 1, 60), ("g", 2, 60), ("g", 3, 30), ("g", 4, 200), ("g", 5, 10),
            # group h packs independently
            ("h", 1, 128), ("h", 2, 1),
        ],
        "group_key string, doc_id long, n_tokens long",
    )
    out = {(r.group_key, r.doc_id): (r.pack_id, r.pack_key)
           for r in curation.pack_sequences(docs, budget=128).collect()}
    assert out[("g", 1)] == (0, "g-0")
    assert out[("g", 2)] == (0, "g-0")
    assert out[("g", 3)] == (1, "g-1")
    assert out[("g", 4)] == (2, "g-2")   # oversized doc: its own pack
    assert out[("g", 5)] == (3, "g-3")   # oversized pack closes immediately
    assert out[("h", 1)] == (0, "h-0")   # exact fit
    assert out[("h", 2)] == (1, "h-1")


def test_pack_sequences_order_independent_of_input(spark):
    """Packing walks doc_id order inside each group regardless of the
    input row order or partitioning."""
    rows = [("g", i, 50) for i in range(10)]
    a = curation.pack_sequences(
        spark.createDataFrame(rows, "group_key string, doc_id long, n_tokens long")
        .repartition(4),
        budget=128,
    ).collect()
    b = curation.pack_sequences(
        spark.createDataFrame(list(reversed(rows)),
                              "group_key string, doc_id long, n_tokens long"),
        budget=128,
    ).collect()
    assert sorted([tuple(r) for r in a]) == sorted([tuple(r) for r in b])
    packed = {r.doc_id: r.pack_id for r in a}
    assert packed == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 3, 8: 4, 9: 4}


def test_normalize_text_unicode(spark):
    decomposed = "Cafe\u0301  du   Monde"       # e + combining acute, ws runs
    composed = unicodedata.normalize("NFC", decomposed)
    assert composed != decomposed               # sanity: NFC changes bytes
    df = spark.createDataFrame(
        [(1, decomposed), (2, "  A\tB\nC  "), (3, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.norm_text for r in curation.normalize_text(df).collect()}
    assert out[1] == "caf\u00e9 du monde"            # composed + casefolded + collapsed
    assert out[2] == "a b c"
    assert out[3] is None


def test_pack_sequences_null_token_count_degrades(spark):
    """A null token count (null text upstream) rides in the current pack
    at zero cost instead of killing the stage."""
    docs = spark.createDataFrame(
        [("g", 1, 60), ("g", 2, None), ("g", 3, 60)],
        "group_key string, doc_id long, n_tokens long",
    )
    out = {r.doc_id: r.pack_id for r in curation.pack_sequences(docs, budget=100).collect()}
    assert out[1] == 0 and out[2] == 0  # null doc joins doc 1's pack
    assert out[3] == 1                  # 60 + 60 > 100 -> new pack
