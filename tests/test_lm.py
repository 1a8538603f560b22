"""Stupid-backoff bigram LM perplexity scorer (operators/lm.py): transition
extraction, the three-way backoff resolution, vocabulary pruning, and a full
DuckDB twin differential (the r9 catalog-entry rehearsal — value-exact
integer micro-nat sums on both engines)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import lm

REF_ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "a cat and a dog sat"),
    (4, "the cat sat"),
]
RAW_ROWS = [
    (10, "the cat sat on the mat"),   # pure reference-like
    (11, "the dog sat"),              # short, all bigrams seen
    (12, "zx qv plorp"),              # pure OOV garbage
    (13, "the cat flew over zz"),     # mixed: bigram + backoff + unk
    (14, "   "),                      # whitespace -> one ('<s>','') unk hop
    (15, None),                       # null -> scored like empty (ADVICE r7)
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _transitions_py(text: str | None) -> list[tuple[str, str]]:
    text = text or ""
    padded = [lm.BOS] + text.strip().split()
    if text.strip() == "":
        padded = [lm.BOS, ""]
    return list(zip(padded, padded[1:]))


def test_transition_rows_match_python(spark):
    df = _docs(spark, REF_ROWS + RAW_ROWS)
    got: dict[int, list] = {}
    for r in lm.transition_rows(df).collect():
        got.setdefault(r.doc_id, []).append((r.prev, r.cur))
    for did, text in REF_ROWS + RAW_ROWS:
        assert sorted(got[did]) == sorted(_transitions_py(text)), text


#: The r9 oracle twin: {ref} / {raw} are filled with VALUES lists so the
#: same template later binds to documents-table filters in the catalog.
_NLL_TWIN = """
WITH ref AS (SELECT * FROM (VALUES {ref}) AS v(doc_id, text)),
raw AS (SELECT * FROM (VALUES {raw}) AS v(doc_id, text)),
pad_ref AS (
  SELECT doc_id,
         list_prepend('<s>', regexp_split_to_array(trim(coalesce(text, '')), '\\s+')) AS p
  FROM ref
), t_ref AS (
  SELECT doc_id, p[i] AS prev, p[i + 1] AS cur
  FROM pad_ref, UNNEST(generate_series(1, len(p) - 1)) AS u(i)
), wc AS (
  SELECT cur, count(*) AS wc FROM t_ref GROUP BY cur
), n_tot AS (SELECT count(*) AS n FROM t_ref
), vocab AS (SELECT cur, wc FROM wc ORDER BY wc DESC, cur LIMIT {top_v}
), v_size AS (SELECT count(*) AS v FROM vocab
), word AS (
  SELECT cur,
         round((ln(0.4 * (wc + 0.5)) - ln(n + 0.5 * (v + 1))) * 1e6)::BIGINT
           AS bo_micro
  FROM vocab, n_tot, v_size
), ctx AS (
  SELECT prev, count(*) AS cc FROM t_ref GROUP BY prev
), bcnt AS (
  SELECT prev, cur, count(*) AS bc FROM t_ref GROUP BY prev, cur
), vocab_prev AS (
  SELECT cur AS prev FROM vocab UNION SELECT '<s>'
), bigram AS (
  SELECT b.prev, b.cur,
         round((ln(b.bc) - ln(c.cc)) * 1e6)::BIGINT AS lp_micro
  FROM bcnt b
  JOIN vocab_prev vp ON b.prev = vp.prev
  JOIN vocab v ON b.cur = v.cur
  JOIN ctx c ON b.prev = c.prev
), floor_t AS (
  SELECT round((ln(0.4 * 0.5) - ln(n + 0.5 * (v + 1))) * 1e6)::BIGINT
           AS unk_micro
  FROM n_tot, v_size
), pad_raw AS (
  SELECT doc_id,
         list_prepend('<s>', regexp_split_to_array(trim(coalesce(text, '')), '\\s+')) AS p
  FROM raw
), t_raw AS (
  SELECT doc_id, p[i] AS prev, p[i + 1] AS cur
  FROM pad_raw, UNNEST(generate_series(1, len(p) - 1)) AS u(i)
), scored AS (
  SELECT t.doc_id,
         coalesce(bg.lp_micro, w.bo_micro, f.unk_micro) AS s
  FROM t_raw t
  LEFT JOIN bigram bg USING (prev, cur)
  LEFT JOIN word w USING (cur)
  CROSS JOIN floor_t f
)
SELECT doc_id, count(*) AS n_transitions, -sum(s) AS nll_micro,
       (-sum(s))::DOUBLE / count(*)::DOUBLE / 1e6 AS avg_nll
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def _values(rows):
    return ", ".join(
        "({}, NULL)".format(did)
        if text is None
        else "({}, '{}')".format(did, text.replace("'", "''"))
        for did, text in rows
    )


@pytest.mark.parametrize("top_v", [65_536, 4])
def test_doc_nll_matches_duckdb_twin(spark, top_v):
    """Value-exact differential at both the unpruned and the pruned
    vocabulary: identical integer nll sums, transition counts, and the
    IEEE-identical average."""
    model = lm.train_bigram_lm(_docs(spark, REF_ROWS), top_v=top_v)
    got = {
        r.doc_id: r
        for r in lm.doc_nll(_docs(spark, RAW_ROWS), model).collect()
    }
    want = duckdb.sql(
        _NLL_TWIN.format(ref=_values(REF_ROWS), raw=_values(RAW_ROWS), top_v=top_v)
    ).fetchall()
    assert len(want) == len(got) == len(RAW_ROWS)
    for did, n_tr, nll, avg in want:
        r = got[did]
        assert r.n_transitions == n_tr, did
        assert r.nll_micro == nll, f"doc {did}: integer NLL must be exact"
        assert r.avg_nll == avg, did


def test_backoff_ordering_and_floor(spark):
    """Reference-like text scores lower NLL than OOV garbage; the pure-OOV
    doc's score is exactly n_transitions * unk floor."""
    model = lm.train_bigram_lm(_docs(spark, REF_ROWS))
    got = {r.doc_id: r for r in lm.doc_nll(_docs(spark, RAW_ROWS), model).collect()}
    assert got[10].avg_nll < got[12].avg_nll
    assert got[11].avg_nll < got[12].avg_nll
    unk = model["floor"].collect()[0].unk_micro
    # doc 12: '<s>'->'zx' has a known context (BOS) but unseen bigram and
    # OOV words throughout -> every transition resolves to the unk floor.
    assert got[12].nll_micro == -3 * unk


def test_pruned_vocab_routes_tail_words_to_floor(spark):
    """With top_v=1 only the most frequent word ('the', wc=6) stays in
    vocab: every non-'the' transition scores via the floor, 'the' via its
    backoff or its BOS bigram."""
    model = lm.train_bigram_lm(_docs(spark, REF_ROWS), top_v=1)
    words = model["word"].collect()
    assert [w.cur for w in words] == ["the"]
    # Kept bigrams need BOTH ends in vocab (BOS always a legal context):
    # 'on the' is pruned (prev 'on' is out-of-vocab), '<s> the' survives.
    bigs = {(b.prev, b.cur) for b in model["bigram"].collect()}
    assert bigs == {("<s>", "the")}


def test_select_most_fluent_deterministic_topk(spark):
    model = lm.train_bigram_lm(_docs(spark, REF_ROWS))
    a = lm.select_most_fluent(_docs(spark, RAW_ROWS), model, 3).collect()
    b = lm.select_most_fluent(_docs(spark, RAW_ROWS), model, 3).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert len(a) == 3
    avgs = [r.avg_nll for r in a]
    assert avgs == sorted(avgs)
    assert a[0].doc_id in (10, 11)  # the reference-like docs lead


def test_top_v_guard(spark):
    with pytest.raises(ValueError):
        lm.train_bigram_lm(_docs(spark, REF_ROWS), top_v=0)


def test_injected_transitions_equal_inline(spark):
    """The transitions= injection knob (one materialized frame shared by
    training's four aggs + scoring, instead of ~5 corpus explodes) must
    be value-invisible: injected == inline for the model tables AND the
    scored output — the hashed=/assigned= knob contract."""
    docs = _docs(spark, RAW_ROWS)
    inline_model = lm.train_bigram_lm(docs, top_v=8)
    inline_out = lm.select_most_fluent(docs, inline_model, 5).collect()

    trans = lm.transition_rows(docs).localCheckpoint(eager=True)
    inj_model = lm.train_bigram_lm(docs, top_v=8, transitions=trans)
    inj_out = lm.select_most_fluent(
        docs, inj_model, 5, transitions=trans
    ).collect()

    for key in ("bigram", "word", "floor"):
        assert sorted(map(tuple, inline_model[key].collect())) == sorted(
            map(tuple, inj_model[key].collect())
        ), key
    assert [tuple(r) for r in inline_out] == [tuple(r) for r in inj_out]
