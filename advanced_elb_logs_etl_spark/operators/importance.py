"""Data-selection importance weighting (DSIR-style).

Distributed form of Data Selection with Importance Resampling (Xie et
al., NeurIPS 2023): score every raw document by the log-likelihood ratio
of its hashed bag-of-ngrams features under a target-domain unigram model
vs the raw-corpus unigram model, then select top-k (or Gumbel-resample)
toward the target distribution.  The feature space is unigrams+bigrams
hashed into a small fixed bucket count, so both "models" are one
B-row count vector each — the classic trick that makes the method run in
two aggregation passes over any corpus size.

Cross-engine exactness: per-bucket log ratios are snapped to integer
MICRO-NATS (round(lr * 1e6) as BIGINT) before the per-document sum, so
document scores are exact integer sums — independent of accumulation
order, hash-stable against the DuckDB oracle, and monotonic for
ranking.  The only floating step (two ln calls per bucket on identical
rational inputs) happens once per bucket, not per token.

Scale shape (100 TB): feature extraction is the shared narrow n-gram
kernel (functions.hashing.ngram_fold); the raw and target distributions
are ONE hash aggregation each with B-bounded output (B=256 default —
executor-trivial, map-side combine does almost all the work); the
per-bucket ratio table is broadcast (B rows); scoring is a broadcast
join + one per-document hash aggregation.  Total: two small aggs + one
doc-keyed shuffle, no driver loops, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60, ngram_fold, tokens

#: Hashed feature-space size. DSIR uses 10k buckets on web-scale corpora;
#: 256 keeps the synthetic vocabulary (~30 words) from spreading one word
#: per bucket while still exercising the full pipeline shape.
BUCKETS = 256

#: Add-alpha smoothing for the two unigram models.
ALPHA = 1.0

#: Integer score scale: micro-nats.
_SCALE = 1_000_000


def hashed_feature_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = BUCKETS,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """(id, [keep_cols...,] bucket) with multiplicity: unigrams + bigrams
    hashed into `buckets` via the md5-once h60 kernel (bag-of-ngrams, the
    DSIR feature map).  `keep_cols` carries extra per-doc columns through
    (e.g. the domain label, so one persisted frame can serve as both the
    raw and the filtered target side).

    SQL twin: UNNEST(list_concat(toks, bigrams)) with
    bucket = ('0x' || substr(md5(g), 1, 15))::BIGINT % buckets."""
    extra = [F.col(c) for c in (keep_cols or [])]
    toks = tokens(F.col(text_col))
    grams = F.concat(toks, ngram_fold(toks, 2))
    return df.select(F.col(id_col), *extra, F.explode(grams).alias("gram")).select(
        F.col(id_col), *extra, (h60(F.col("gram")) % F.lit(buckets)).alias("bucket")
    )


def bucket_log_ratios(
    raw_rows: DataFrame,
    target_rows: DataFrame,
    buckets: int = BUCKETS,
    alpha: float = ALPHA,
) -> DataFrame:
    """(bucket, lr_micro): smoothed log p_target(bucket) - log p_raw(bucket)
    in integer micro-nats, for every bucket present in the raw corpus.

    Buckets absent from the raw rows can never be scored (no document
    emits them), so the raw side left-joins the target counts.  The two
    scalar totals attach via 1-row cross joins (scalar-aggregate join on
    a B-row frame — broadcast, trivially)."""
    rc = raw_rows.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    tc = target_rows.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    joined = rc.join(tc, "bucket", "left").select(
        "bucket", "rc", F.coalesce(F.col("tc"), F.lit(0)).alias("tc")
    )
    r_tot = raw_rows.agg(F.count(F.lit(1)).alias("r_tot"))
    t_tot = target_rows.agg(F.count(F.lit(1)).alias("t_tot"))
    a, ab = F.lit(float(alpha)), F.lit(float(alpha) * buckets)
    lr = F.log((F.col("tc") + a) / (F.col("t_tot") + ab)) - F.log(
        (F.col("rc") + a) / (F.col("r_tot") + ab)
    )
    return (
        joined.crossJoin(F.broadcast(r_tot))
        .crossJoin(F.broadcast(t_tot))
        .select("bucket", F.round(lr * _SCALE, 0).cast("long").alias("lr_micro"))
    )


def importance_weights(
    df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = BUCKETS,
    alpha: float = ALPHA,
    raw_rows: DataFrame | None = None,
    target_rows: DataFrame | None = None,
) -> DataFrame:
    """(id, n_features, weight_micro): per-document DSIR importance score
    in micro-nats — the exact-integer sum of its features' bucket log
    ratios.  Positive = looks more like the target domain than the raw
    corpus.

    Pass (persisted) `raw_rows`/`target_rows` feature frames to share the
    tokenize+hash pass across the model-count aggregations and the
    scoring join (the partial aggs defeat ReuseExchange, so the explode
    otherwise runs once per consumer)."""
    if raw_rows is None:
        raw_rows = hashed_feature_rows(df, id_col, text_col, buckets)
    if target_rows is None:
        target_rows = hashed_feature_rows(target_df, id_col, text_col, buckets)
    ratios = bucket_log_ratios(raw_rows, target_rows, buckets, alpha)
    return (
        raw_rows.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("lr_micro").alias("weight_micro"),
        )
    )


def select_top_k(
    df: DataFrame,
    target_df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = BUCKETS,
    alpha: float = ALPHA,
    raw_rows: DataFrame | None = None,
    target_rows: DataFrame | None = None,
) -> DataFrame:
    """The k documents most target-like by importance weight, ties broken
    by id — deterministic on any cluster.  orderBy().limit() compiles to
    TakeOrdered (per-partition top-k, then a k-row merge on the driver
    scheduler side — never a global sort shuffle)."""
    w = importance_weights(
        df, target_df, id_col, text_col, buckets, alpha, raw_rows, target_rows
    )
    return w.orderBy(F.col("weight_micro").desc(), F.col(id_col)).limit(k)


def gumbel_resample(
    df: DataFrame,
    target_df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = BUCKETS,
    alpha: float = ALPHA,
    seed: int = 303,
) -> DataFrame:
    """DSIR's sampling form: draw k docs WITHOUT replacement with
    probability proportional to exp(weight) via the Gumbel-top-k trick,
    deterministic through the md5 hash-uniform (same device as
    operators/sampling.py — reruns and retries pick identical docs).

    score = weight (nats) + Gumbel(0,1) noise; top-k by score."""
    from .sampling import hash_uniform

    w = importance_weights(df, target_df, id_col, text_col, buckets, alpha)
    u = hash_uniform(F.col(id_col), seed)
    gumbel = -F.log(-F.log(u))
    score = F.col("weight_micro").cast("double") / F.lit(float(_SCALE)) + gumbel
    return (
        w.withColumn("gumbel_score", score)
        .orderBy(F.col("gumbel_score").desc(), F.col(id_col))
        .limit(k)
    )
