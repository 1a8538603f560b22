"""N-gram language-model perplexity scoring for corpus filtering.

Distributed form of the CCNet-style quality filter (Wenzek et al. 2020,
arXiv:1911.00359): train a small n-gram language model on a trusted
reference corpus, score every raw document by its average per-token
negative log-likelihood under that model, and keep the most fluent
("head") documents.  The model here is a bigram LM with stupid backoff
(Brants et al. 2007, "Large Language Models in Machine Translation"):

    S(w | w_prev) = c(w_prev, w) / c(w_prev)        if c(w_prev, w) > 0
                  = 0.4 * S(w)                       otherwise
    S(w)          = (c(w) + a) / (N + a * (V + 1))   add-alpha unigram

Stupid backoff is the published web-scale choice precisely because its
statistics are plain counts — mergeable, exact, and computable in one
aggregation pass per order, unlike Kneser-Ney's discount bookkeeping.

Cross-engine exactness (the repo's DSIR discipline, importance.py): every
log-probability is computed ONCE PER MODEL ROW on exact integer count
pairs and snapped to integer MICRO-NATS (round(lp * 1e6) as BIGINT)
before any per-document use, so document scores are exact integer sums —
accumulation-order independent and hash-stable against a DuckDB twin.
The only per-document float op is the final avg = nll_micro /
n_transitions, a single IEEE division on an identical integer pair.

Scale shape (100 TB raw corpus, ~GB reference corpus):
  - training: one transition explode over the REFERENCE corpus, three
    hash aggregations (context counts, word counts, bigram counts), all
    V- or V^2-bounded after top-V vocabulary pruning; no driver loops.
  - scoring: one narrow transition explode over the raw corpus, one hash
    join against the V^2-bounded bigram table (broadcast when it fits;
    AQE decides), one broadcast join against the V-row word table, one
    1-row scalar stitch for the unknown-word floor, one per-document
    aggregation.  No collect anywhere.

Reference-parity note: the reference pipeline
(advanced_elb_logs_etl.py) has no LM scorer; this extends the curation
surface (text.quality_score -> rules.rule_filter_battery ->
classifier.classifier_scores -> lm.doc_nll) with the standard
perplexity stage of public training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import tokens

__all__ = [
    "transition_rows",
    "train_bigram_lm",
    "doc_nll",
    "select_most_fluent",
]

#: Sentence/document start marker (one per document).
BOS = "<s>"

#: Stupid-backoff discount.
BACKOFF = 0.4

#: Add-alpha smoothing for the unigram distribution.
ALPHA = 0.5

#: Integer log-prob scale: micro-nats.
_SCALE = 1_000_000


def transition_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, prev, cur) bigram transitions WITH multiplicity, one row per
    token of every document, with a BOS marker so the first real token is
    conditioned on document start.  Empty/whitespace — and NULL — text
    still emits its single (BOS, '') transition (null coalesces to ''
    first, so no document silently drops out of the scored output —
    ADVICE r7), deterministic in both engines, scored through the
    unknown-word floor.

    SQL twin (DuckDB), with toks = regexp_split_to_array(trim(
    coalesce(text, '')), '\\s+') and padded = list_prepend('<s>', toks):
      SELECT doc_id, padded[i] AS prev, padded[i+1] AS cur
      FROM t, UNNEST(generate_series(1, len(padded)-1)) AS u(i)
    """
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))

    def _body(tk):  # bound-variable trick: evaluate `tokens` once per row
        padded = F.concat(F.array(F.lit(BOS)), tk)
        return F.transform(
            F.sequence(F.lit(1), F.size(padded) - 1),
            lambda i: F.struct(
                F.element_at(padded, i).alias("prev"),
                F.element_at(padded, i + 1).alias("cur"),
            ),
        )

    trans = F.transform(F.array(toks), _body).getItem(0)
    return df.select(F.col(id_col), F.explode(trans).alias("t")).select(
        id_col, F.col("t.prev").alias("prev"), F.col("t.cur").alias("cur")
    )


def train_bigram_lm(
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_v: int = 65_536,
    alpha: float = ALPHA,
    backoff: float = BACKOFF,
    transitions: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Train the stupid-backoff bigram LM on a reference corpus.

    Returns three frames (a model is DATA, kept distributed until the
    scoring join):
      - "bigram": (prev, cur, lp_micro) — round(ln(c12 / c_ctx) * 1e6)
        for every bigram whose BOTH ends survive vocabulary pruning
        (prev may also be BOS).  V^2-bounded.
      - "word": (cur, bo_micro) — round(ln(backoff * S(w)) * 1e6) for
        the top_v most frequent words (ties broken by token text — the
        pruning boundary is deterministic).  V-bounded.
      - "floor": 1 row (unk_micro, vocab_size) — the unknown-word score
        round(ln(backoff * alpha / (N + alpha*(V+1))) * 1e6), attached to
        scoring via a broadcast scalar stitch.

    All counts come from the SAME transition frame, so the model is
    self-consistent: c_ctx(prev) counts transitions out of prev (BOS
    context = number of documents), c(w) and N count predicted tokens.

    ``transitions``: optional precomputed/persisted transition_rows
    frame (the hashed=/assigned= injection convention).  The lazy
    transition plan feeds FOUR aggregations here (wc, n_tot, ctx, bc)
    plus scoring in doc_nll, and Spark recomputes lazy subtrees per
    consumer — injecting one materialized frame turns ~5 corpus
    tokenize+explode passes into 1 (the r6 no-CSE rule applied to the
    LM lane).  Value-identical by construction; injected == inline is
    pytest-pinned.

    SQL twin sketch (DuckDB): the transition CTE above, three GROUP BYs,
    a vocab CTE `ORDER BY wc DESC, cur LIMIT top_v`, then
    round(ln(...) * 1e6)::BIGINT per model row.
    """
    if top_v < 1:
        raise ValueError(f"top_v must be >= 1, got {top_v}")
    trans = (
        transitions
        if transitions is not None
        else transition_rows(target_df, id_col, text_col)
    )
    # Vocabulary: top_v predicted words by count, deterministic tie-break.
    # orderBy().limit() compiles to TakeOrdered (never a global sort or a
    # single-partition window) — the count table is vocabulary-bounded.
    wc = trans.groupBy("cur").agg(F.count(F.lit(1)).alias("wc"))
    vocab = wc.orderBy(F.col("wc").desc(), F.col("cur")).limit(top_v)
    n_tot = trans.agg(F.count(F.lit(1)).alias("n_tot"))
    v_size = vocab.agg(F.count(F.lit(1)).alias("v_size"))

    a = F.lit(float(alpha))
    bo = F.lit(float(backoff))
    # Word table: backoff score ln(backoff * (c+a)/(N + a*(V+1))).
    word = (
        vocab.crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(v_size))
        .select(
            "cur",
            F.round(
                (F.log(bo * (F.col("wc") + a))
                 - F.log(F.col("n_tot") + a * (F.col("v_size") + 1)))
                * _SCALE,
                0,
            ).cast("long").alias("bo_micro"),
        )
    )
    # Context counts over ALL transitions; bigrams pruned to vocab ends
    # (BOS is always a legal context).
    ctx = trans.groupBy("prev").agg(F.count(F.lit(1)).alias("cc"))
    bos_row = target_df.sparkSession.range(1).select(F.lit(BOS).alias("prev"))
    in_vocab_prev = (
        vocab.select(F.col("cur").alias("prev")).union(bos_row).distinct()
    )
    bc = trans.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("bc"))
    bigram = (
        bc.join(in_vocab_prev, "prev")
        .join(vocab.select("cur"), "cur")
        .join(ctx, "prev")
        .select(
            "prev",
            "cur",
            F.round(
                (F.log(F.col("bc").cast("double"))
                 - F.log(F.col("cc").cast("double"))) * _SCALE,
                0,
            ).cast("long").alias("lp_micro"),
        )
    )
    floor = (
        n_tot.crossJoin(F.broadcast(v_size))
        .select(
            F.round(
                (F.log(bo * a)
                 - F.log(F.col("n_tot") + a * (F.col("v_size") + 1)))
                * _SCALE,
                0,
            ).cast("long").alias("unk_micro"),
            F.col("v_size").alias("vocab_size"),
        )
    )
    return {"bigram": bigram, "word": word, "floor": floor}


def doc_nll(
    df: DataFrame,
    model: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    transitions: DataFrame | None = None,
) -> DataFrame:
    """(id, n_transitions, nll_micro, avg_nll): per-document negative
    log-likelihood under the stupid-backoff model.  Every input document
    appears in the output: empty, whitespace, and NULL text all score
    through the single (BOS, '') unknown-word hop (transition_rows
    coalesces null to '' — no silent drops).  nll_micro is the
    exact integer sum of per-transition scores; avg_nll = nll_micro /
    n_transitions / 1e6 (one IEEE division on an identical integer pair —
    monotone with perplexity exp(avg_nll), which is deliberately NOT
    materialized: exp per document would be a transcendental evaluated
    once per row on both engines, outside the exactness discipline).

    Per-transition score resolution (coalesce order = backoff order):
    bigram hit -> lp_micro; vocab word -> bo_micro; else -> unk floor.

    SQL twin: the transition CTE, LEFT JOIN bigram USING (prev, cur),
    LEFT JOIN word USING (cur), CROSS JOIN floor,
    sum(coalesce(lp_micro, bo_micro, unk_micro)).
    """
    trans = (
        transitions
        if transitions is not None
        else transition_rows(df, id_col, text_col)
    )
    scored = (
        trans.join(model["bigram"], ["prev", "cur"], "left")
        .join(F.broadcast(model["word"]), ["cur"], "left")
        .crossJoin(F.broadcast(model["floor"].select("unk_micro")))
        .select(
            id_col,
            F.coalesce(
                F.col("lp_micro"), F.col("bo_micro"), F.col("unk_micro")
            ).alias("score_micro"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        (-F.sum("score_micro")).alias("nll_micro"),
        (
            (-F.sum("score_micro")).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(float(_SCALE))
        ).alias("avg_nll"),
    )


def select_most_fluent(
    df: DataFrame,
    model: dict[str, DataFrame],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    transitions: DataFrame | None = None,
) -> DataFrame:
    """The k most reference-like documents: lowest average NLL, ties by
    (nll_micro, id) so ranking is pure-integer deterministic.
    orderBy().limit() compiles to TakeOrdered — per-partition top-k plus
    a k-row merge, never a global sort shuffle."""
    nll = doc_nll(df, model, id_col, text_col, transitions=transitions)
    # avg ordering via integer cross-multiplication would overflow on
    # pathological lengths; avg_nll is the SAME IEEE quotient in both
    # engines, so ordering on it is deterministic, with integer tie-breaks.
    return nll.orderBy(
        F.col("avg_nll").asc(), F.col("nll_micro").asc(), F.col(id_col)
    ).limit(k)
