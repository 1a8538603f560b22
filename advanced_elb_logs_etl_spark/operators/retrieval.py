"""BM25 keyword retrieval over the document corpus.

The Okapi BM25 ranking function (Robertson & Zaragoza 2009, "The
Probabilistic Relevance Framework: BM25 and Beyond", Found. Trends IR),
in the Lucene/at-scale formulation:

    score(d, q) = sum over query terms t of
        idf(t) * tf(t,d) * (k1 + 1) / (tf(t,d) + k1 * (1 - b + b * |d|/avgdl))
    idf(t) = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

A training-data pipeline uses this as its lexical retrieval arm: finding
the corpus documents most relevant to a benchmark prompt (contamination
auditing), to a target-domain description (data selection), or to a user
query (RAG indexing) — complementary to the embedding ANN path
(similarity.py) and the group-level TF-IDF profile (text.py).

Cross-engine exactness: idf is computed once per QUERY TERM (<= |q| rows)
and the full per-(doc, term) contribution — a fixed-shape scalar
expression over exact integer tf/dl/df counts — is snapped to integer
micro-units before the per-document sum, so document scores are exact
integer sums (the repo's standard discipline: float ops happen a bounded
number of times on identical operands in an identical tree shape; the
order-varying aggregation runs on integers).

Scale shape (100 TB): the per-query work is one token explode filtered
to the query's terms — a broadcast IN-list the scan pushes down to a
tiny fraction of the token stream — then one (doc, term) hash agg, one
broadcast join against the <= |q|-row idf table, one per-doc agg, and
TakeOrdered(k).  Matching documents carry their length in the same
projection as the explode; the corpus-wide scalars (N, avgdl) need one
additional NARROW pass (scan -> size -> 1-row agg) because absent
documents still shape avgdl — a production index computes that pair
once per corpus and passes it in (the ``corpus_stats`` parameter), so
the per-query cost is the filtered explode alone.  avgdl and N attach
as 1-row broadcast scalar stitches.  No collect, no unbounded state.

Reference-parity note: the reference pipeline has no retrieval operator;
this extends the curation/search surface alongside similarity.py (ANN)
and curation.decontaminate (n-gram overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import tokens

__all__ = ["doc_term_stats", "corpus_length_stats", "bm25_topk", "rrf_fuse"]

#: Integer contribution scale: micro-units.
_SCALE = 1_000_000


def doc_term_stats(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, dl, term, tf) for the query's terms only — tf omits rows for
    absent terms (they contribute 0 to BM25), dl is the FULL token length
    of the document, computed in the same projection as the explode so the
    corpus is scanned once.

    SQL twin: toks CTE, dl = len(toks), UNNEST(toks) filtered with
    term IN (...), GROUP BY doc_id, dl, term."""
    toks = tokens(F.col(text_col))
    ex = df.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    ).filter(F.col("term").isin(query_terms))
    return ex.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def corpus_length_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """1-row (n_docs, dl_sum) corpus statistics — compute once per corpus
    (persist or collect-free reuse) and pass to ``bm25_topk`` for every
    query against it."""
    return df.select(F.size(tokens(F.col(text_col))).alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("dl_sum")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus_stats: DataFrame | None = None,
) -> DataFrame:
    """(id, n_hit_terms, score_micro, score): the k highest-BM25 documents
    for the bag of query terms, ties by id (TakeOrdered, never a global
    sort).  score = score_micro / 1e6 for readability; ranking and the
    catalog hash ride the exact integer.

    Duplicate query terms are deduplicated (set semantics, the standard
    bag-of-words form); documents matching no term are absent (score 0).

    ``corpus_stats``: optional precomputed 1-row (n_docs, dl_sum) frame —
    pass it when scoring many queries against one corpus so the
    corpus-wide length pass runs once, not per query.
    """
    terms = sorted(set(query_terms))
    if not terms:
        return df.sparkSession.createDataFrame(
            [],
            f"{id_col} bigint, n_hit_terms bigint, score_micro bigint, "
            "score double",
        )
    stats = doc_term_stats(df, terms, id_col, text_col)
    # Corpus scalars: N (all docs) and avgdl over ALL documents — exact
    # integer inputs; avgdl itself stays a (sum, count) integer pair so
    # the per-row division happens inside the snapped contribution.
    if corpus_stats is None:
        toks_len = df.select(F.size(tokens(F.col(text_col))).alias("dl"))
        corpus = toks_len.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("dl_sum"),
        )
    else:
        corpus = corpus_stats.select("n_docs", "dl_sum")
    # Document frequency per query term (<= |q| rows after the agg).
    dfreq = stats.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )
    idf = dfreq.crossJoin(F.broadcast(corpus)).select(
        "term",
        "df",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    k1_l, b_l = F.lit(float(k1)), F.lit(float(b))
    contrib = (
        stats.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(corpus.select("dl_sum", F.col("n_docs").alias("nd"))))
        .select(
            id_col,
            F.round(
                F.col("idf")
                * (F.col("tf") * (k1_l + 1))
                / (
                    F.col("tf")
                    + k1_l
                    * (
                        F.lit(1.0)
                        - b_l
                        + b_l
                        * F.col("dl")
                        / (F.col("dl_sum").cast("double") / F.col("nd"))
                    )
                )
                * _SCALE,
                0,
            )
            .cast("long")
            .alias("c_micro"),
        )
    )
    scored = contrib.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hit_terms"),
        F.sum("c_micro").alias("score_micro"),
    )
    top = scored.orderBy(F.col("score_micro").desc(), F.col(id_col)).limit(k)
    return top.withColumn(
        "score", F.col("score_micro").cast("double") / F.lit(float(_SCALE))
    )


def rrf_fuse(
    lanes: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009,
    "Reciprocal rank fusion outperforms Condorcet and individual rank
    learning methods", SIGIR) of N ranked result lists:

        rrf(d) = sum over lanes L containing d of 1 / (k0 + rank_L(d))

    The standard hybrid-retrieval combiner: BM25's lexical ranks fused
    with the embedding ANN ranks, no score calibration needed — only
    ranks cross the lane boundary, so lanes with incomparable score
    scales (integer micro BM25 vs float cosine) fuse cleanly.

    ``lanes`` maps lane name -> a ranked frame with (id_col, rank_col);
    ranks must be 1-based and unique per lane (row_number output).  A
    duplicate id within one lane keeps its BEST (smallest) rank — the
    per-lane min-agg below makes the full-outer-join fan-out (which
    would double-count contributions) impossible by construction rather
    than a documented hazard.
    Output: (id_col, rank_<name> per lane, rrf_micro) — the fused score
    in integer micro-units (floor(1e6 / (k0 + rank)) per lane, summed),
    top-k by (rrf_micro DESC, id).  Integer end-to-end, so the result
    is value-exact twinnable; a doc absent from a lane contributes 0
    and keeps a NULL rank for that lane.

    Scale shape (100 TB): each lane is already a top-N bounded frame
    (TakeOrdered output) — the fusion is full-outer joins and Column
    math over <= sum(N_i) rows, then TakeOrdered(k).  The heavy lifting
    (and its scale story) lives inside the lanes."""
    if not lanes:
        raise ValueError("lanes must be non-empty")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    joined: DataFrame | None = None
    for name, df in lanes.items():
        d = (
            df.select(
                F.col(id_col),
                F.col(rank_col).cast("long").alias(f"rank_{name}"),
            )
            # lanes are bounded top-N frames, so this agg is k-row work
            .groupBy(id_col)
            .agg(F.min(f"rank_{name}").alias(f"rank_{name}"))
        )
        joined = d if joined is None else joined.join(
            d, id_col, "full_outer"
        )
    score = None
    for name in lanes:
        contrib = F.coalesce(
            F.floor(
                F.lit(_SCALE) / (F.lit(k0) + F.col(f"rank_{name}"))
            ),
            F.lit(0),
        )
        score = contrib if score is None else score + contrib
    return (
        joined.select(
            id_col,
            *[F.col(f"rank_{name}") for name in lanes],
            score.cast("long").alias("rrf_micro"),
        )
        .orderBy(F.col("rrf_micro").desc(), id_col)
        .limit(k)
    )
