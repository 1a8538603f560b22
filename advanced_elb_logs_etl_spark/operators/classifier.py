"""Hashed-ngram linear quality classifier — the fastText-style scorer
(Joulin et al. 2016, arXiv:1607.01759 — public method) every large-scale
corpus pipeline runs after the heuristic gates: word n-grams hashed into
a fixed bucket space, a linear weight per bucket, per-document score =
bias + mean feature weight.

The curation surface already has heuristic quality gates
(operators/text.py quality_score); this is the TRAINED-MODEL shape —
the weight table is the model, swappable without changing the plan.

Determinism/scale contract (same discipline as DSIR,
operators/importance.py):

- weights are INTEGER-SNAPPED (micro-units, bigint) so the per-document
  accumulation is exact integer math in any engine — the ONLY floating
  operation is the final single division, which is IEEE-exact for a
  given (bigint, bigint) pair, so scores are bit-identical to the SQL
  twin (plans/catalog_r7.py);
- the feature pass is the shared evaluate-once n-gram kernel
  (functions/hashing.ngram_fold) + one h60 per gram — pure Column
  exprs, whole-stage codegen, no UDF;
- the model join is a BROADCAST left join on the bucket id (the weight
  table is bucket-bounded — B rows, independent of corpus size), then
  ONE hash aggregation per document.  At 100 TB: one narrow
  explode->broadcast-join->agg pass, shuffling only (doc, partial sum)
  rows; no skew risk beyond the doc key itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60, ngram_fold, tokens

__all__ = [
    "hashed_ngram_buckets",
    "synthetic_weights",
    "classifier_scores",
]

#: Score scale: weights are micro-units (1e-6) of the real-valued model.
MICRO = 1_000_000


def hashed_ngram_buckets(
    text: Column, buckets: int, ngrams: tuple[int, ...] = (1, 2)
) -> Column:
    """Array of feature-bucket ids for a text column: word n-grams (with
    multiplicity, position order — the fastText bag) hashed into
    ``buckets`` via the shared 60-bit md5 hash.  n-gram sizes beyond the
    token count contribute nothing (ngram_fold's <n guard).

    SQL twin (per n, then list_concat):
    list_transform(<ngram_fold twin>, g ->
      ('0x' || substr(md5(g), 1, 15))::BIGINT % <buckets>)
    (h60 is < 2^60 and buckets is positive, so % and pmod agree.)
    """
    toks = tokens(text)
    grams = F.concat(*[ngram_fold(toks, n) for n in ngrams])
    return F.transform(grams, lambda g: F.pmod(h60(g), F.lit(buckets)))


def synthetic_weights(
    spark, buckets: int, seed: str = "w", scale: int = 1 << 23
) -> DataFrame:
    """A deterministic stand-in model: weight_micro(bucket) = the first 6
    md5 hex digits of '<seed>:<bucket>' minus 2^23 — zero-mean integers
    in (-2^23, 2^23), i.e. weights in about (-8.4, 8.4).  Stands in for a
    trained fastText model exactly like the multimodal md5 features stand
    in for a decoder: the PLUMBING (hash, join, agg, ranking) is what is
    under test, and the SQL twin reproduces every weight.

    SQL twin: ('0x' || substr(md5('<seed>:' || bucket), 1, 6))::BIGINT
              - <scale>
    """
    return spark.range(buckets).select(
        F.col("id").alias("bucket"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{seed}:"), F.col("id").cast("string"))),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            - F.lit(scale)
        ).alias("weight_micro"),
    )


def classifier_scores(
    docs: DataFrame,
    weights: DataFrame,
    buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngrams: tuple[int, ...] = (1, 2),
    bias_micro: int = 0,
    feat_rows: DataFrame | None = None,
) -> DataFrame:
    """Score every document with a hashed-ngram linear model.

    ``weights`` is the model: (bucket bigint, weight_micro bigint), at
    most ``buckets`` rows; buckets absent from the table weigh 0 (the
    sparse-model convention).  Pass ``feat_rows`` (an (id, bucket)
    frame, e.g. a persisted importance.hashed_feature_rows — identical
    features for the default (1, 2) grams) to share one exploded feature
    pass with other consumers (DSIR, vocabulary stats); it must have been
    built with the SAME buckets/ngrams.  Output per document:

    - ``n_features``: n-gram count (with multiplicity; 0 for empty text),
    - ``w_sum_micro``: exact integer sum of feature weights,
    - ``score``: bias + mean feature weight =
      (bias_micro + w_sum_micro) / (n_features * 1e6), the fastText
      decision value; documents with no features score the bias alone.

    Physical plan: explode the bucket array (one evaluate-once kernel
    pass), LEFT broadcast-join the B-bounded weight table, hash-aggregate
    per doc, then one left join back to ``docs`` so featureless docs
    survive with n_features = 0.  No UDF, no window, one doc-keyed
    shuffle."""
    feats = (
        feat_rows.select(F.col(id_col), "bucket")
        if feat_rows is not None
        else docs.select(
            F.col(id_col),
            F.explode(hashed_ngram_buckets(F.col(text_col), buckets, ngrams)).alias(
                "bucket"
            ),
        )
    )
    per_doc = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum(F.coalesce(F.col("weight_micro"), F.lit(0))).alias("w_sum_micro"),
        )
    )
    bias = F.lit(int(bias_micro)).cast("long")
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_features"), F.lit(0)).cast("long").alias("n_features"),
            F.coalesce(F.col("w_sum_micro"), F.lit(0)).cast("long").alias("w_sum_micro"),
            F.when(
                F.coalesce(F.col("n_features"), F.lit(0)) > 0,
                (bias + F.col("w_sum_micro")).cast("double")
                / (F.col("n_features") * MICRO).cast("double"),
            )
            .otherwise((bias / F.lit(MICRO)).cast("double"))
            .alias("score"),
        )
    )
