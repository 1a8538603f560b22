"""BM25 retrieval (operators/retrieval.py): pure-Python differential on
the exact integer contributions, scan-once stats shape, absent-term and
tie semantics, and a DuckDB twin differential (the catalog rehearsal)."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from advanced_elb_logs_etl_spark.operators import retrieval

DOCS = [
    (1, "spark join shuffle join spark spark"),
    (2, "the cat sat on the mat"),
    (3, "spark streaming state store checkpoint"),
    (4, "join order optimization and join hints"),
    (5, "completely unrelated text about gardening"),
    (6, ""),
]
QUERY = ["spark", "join", "missingterm"]
K1, B = 1.2, 0.75


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def _toks(text: str) -> list[str]:
    return text.strip().split() if text.strip() else [""]


def _round_micro(x: float) -> int:
    return int(
        Decimal(x * 1_000_000.0).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def _bm25_py():
    terms = sorted(set(QUERY))
    n = len(DOCS)
    dls = {d: len(_toks(t)) for d, t in DOCS}
    dl_sum = sum(dls.values())
    tf = {}
    for d, t in DOCS:
        for w in _toks(t):
            if w in terms:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    dfreq = {}
    for (d, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    out = {}
    for (d, w), f in tf.items():
        idf = math.log(1.0 + (n - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
        denom = f + K1 * (1.0 - B + B * dls[d] / (dl_sum / n))
        c = idf * (f * (K1 + 1)) / denom
        hits, s = out.get(d, (0, 0))
        out[d] = (hits + 1, s + _round_micro(c))
    return out


def test_bm25_matches_python_differential(spark):
    got = {
        r.doc_id: (r.n_hit_terms, r.score_micro)
        for r in retrieval.bm25_topk(_docs(spark), QUERY, k=10).collect()
    }
    want = _bm25_py()
    assert got == want


def test_bm25_topk_semantics(spark):
    rows = retrieval.bm25_topk(_docs(spark), QUERY, k=2).collect()
    assert len(rows) == 2
    # doc 1 (3x spark + 2x join... actually 3 spark, 1 join) should beat
    # single-hit docs; no-hit docs (2, 5, 6) never appear at any k
    all_rows = retrieval.bm25_topk(_docs(spark), QUERY, k=10).collect()
    assert {r.doc_id for r in all_rows} == {1, 3, 4}
    scores = [r.score_micro for r in all_rows]
    assert scores == sorted(scores, reverse=True)
    assert all_rows[0].doc_id == 1
    for r in all_rows:
        assert r.score == r.score_micro / 1e6


def test_bm25_duplicate_query_terms_are_set_semantics(spark):
    a = retrieval.bm25_topk(_docs(spark), ["spark", "spark", "join"], k=10).collect()
    b = retrieval.bm25_topk(_docs(spark), ["join", "spark"], k=10).collect()
    assert [(r.doc_id, r.score_micro) for r in a] == [
        (r.doc_id, r.score_micro) for r in b
    ]


_TWIN = """
WITH docs AS (SELECT * FROM (VALUES {vals}) AS v(doc_id, text)),
q AS (SELECT * FROM (VALUES {terms}) AS v(term)),
tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM docs
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
         round(i.idf * (s.tf * ({k1} + 1))
               / (s.tf + {k1} * (1.0 - {b} + {b} * s.dl
                                 / (c.dl_sum::DOUBLE / c.n_docs)))
               * 1e6)::BIGINT AS c_micro
  FROM stats s JOIN idf i USING (term), corpus c
)
SELECT doc_id, count(*) AS n_hit_terms, sum(c_micro) AS score_micro
FROM contrib GROUP BY doc_id ORDER BY score_micro DESC, doc_id
"""


def test_bm25_matches_duckdb_twin(spark):
    vals = ", ".join(f"({d}, '{t}')" for d, t in DOCS)
    terms = ", ".join(f"('{t}')" for t in sorted(set(QUERY)))
    want = duckdb.sql(_TWIN.format(vals=vals, terms=terms, k1=K1, b=B)).fetchall()
    got = [
        (r.doc_id, r.n_hit_terms, r.score_micro)
        for r in retrieval.bm25_topk(_docs(spark), QUERY, k=10).collect()
    ]
    assert got == [tuple(w) for w in want]


def test_bm25_empty_query_and_shared_corpus_stats(spark):
    docs = _docs(spark)
    empty = retrieval.bm25_topk(docs, [], k=5)
    assert empty.collect() == []
    assert empty.columns == ["doc_id", "n_hit_terms", "score_micro", "score"]
    # precomputed corpus stats must not change a single value
    cs = retrieval.corpus_length_stats(docs)
    a = retrieval.bm25_topk(docs, QUERY, k=10).collect()
    b = retrieval.bm25_topk(docs, QUERY, k=10, corpus_stats=cs).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
