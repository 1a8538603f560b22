"""Round-6 catalog wave: substring-span dedup and DSIR importance
selection — the two canonical training-data operations the corpus
surface still lacked.

- `substring_dedup_spans` (operators/spans.py): suffix-array-style
  repeated-substring dedup at token-window granularity (Lee et al. 2022)
  — duplicated 8-token windows corpus-wide, keep-first exemption,
  interval-merged maximal spans per document.
- `dsir_importance_topk` (operators/importance.py): Data Selection with
  Importance Resampling (Xie et al. 2023) — hashed-ngram log-likelihood
  ratio scoring against a target domain, exact-integer micro-nat scores,
  deterministic top-k.

Same contract as plans.catalog: value-exact DuckDB twins.  Span dedup is
pure integer output; DSIR's one floating step (two ln per bucket) is
snapped to integer micro-nats per BUCKET before the per-doc sum, so the
hashed values are exact integer sums on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import importance, spans
from .catalog import _t, register

# ---------------------------------------------------------------------------
# Shared persisted feature frames (same FIFO-evicting convention as
# catalog_llm._hashed_docs): both round-6 queries feed one narrow exploded
# frame into multiple aggregations whose partial-agg exchanges defeat
# Spark's ReuseExchange, so without the persist the tokenize+hash explode
# executes once per consumer (measured 4 vs 1 Generate nodes for spans,
# 10 for DSIR at sf0.1).  At 100 TB the same knob applies with
# MEMORY_AND_DISK — the frames are 8-byte-column rows, ~24 B/token.
# ---------------------------------------------------------------------------

_R6_CACHE: dict[tuple, object] = {}
_R6_CACHE_MAX = 4


def _cached(spark: SparkSession, sf_dir: str, kind: str, build):
    key = (id(spark.sparkContext), sf_dir, kind)
    if key not in _R6_CACHE:
        while len(_R6_CACHE) >= _R6_CACHE_MAX:
            oldest = next(iter(_R6_CACHE))
            old = _R6_CACHE.pop(oldest)
            try:
                old.unpersist()
            except Exception:
                pass  # stopped context; nothing to release
        frame = build().persist()
        _R6_CACHE[key] = frame
    return _R6_CACHE[key]


def clear_r6_cache() -> None:
    """Unpersist and drop the round-6 shared feature frames (bench
    isolation hook, mirroring catalog_llm.clear_hashed_cache)."""
    while _R6_CACHE:
        _, frame = _R6_CACHE.popitem()
        try:
            frame.unpersist()
        except Exception:
            pass  # stopped context; nothing to release

# ---------------------------------------------------------------------------
# substring_dedup_spans — repeated-substring spans, keep-first policy
# ---------------------------------------------------------------------------

# h60 twin: first 15 md5 hex digits as BIGINT (functions/hashing.py).
_H60 = "('0x' || substr(md5({g}), 1, 15))::BIGINT"

_SPANS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
), win AS (
  SELECT doc_id, i AS pos,
         {_H60.format(g="list_aggregate(list_slice(toks, i, i + 7), 'string_agg', ' ')")} AS h
  FROM tok, UNNEST(CASE WHEN len(toks) >= 8
                        THEN generate_series(1, len(toks) - 7) ELSE [] END) AS t(i)
), flagged AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
         count(*)    OVER (PARTITION BY h) AS occ
  FROM win
), dup AS (
  SELECT doc_id, pos, pos + 7 AS e FROM flagged WHERE occ >= 2 AND rn > 1
), merged AS (
  SELECT doc_id, pos, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM dup
), grp AS (
  SELECT doc_id, pos, e,
         sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS span_grp
  FROM merged
)
SELECT doc_id,
       min(pos)::BIGINT AS span_start,
       max(e)::BIGINT   AS span_end,
       count(*)::BIGINT AS span_windows
FROM grp GROUP BY doc_id, span_grp
"""


@register("substring_dedup_spans", _SPANS_ORACLE)
def q_substring_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-duplicated 8-token spans per document (keep-first policy):
    every window occurring >= 2 times corpus-wide is flagged except its
    globally first occurrence; flagged windows interval-merge into
    maximal (span_start, span_end) token ranges.

    Scale shape: narrow n-gram+h60 map -> ONE count shuffle (first
    occurrence rides the same agg as min(struct)) -> hash join back ->
    per-DOCUMENT gaps-and-islands window.  No global sort, no driver."""
    docs = _t(spark, sf_dir, "documents")
    rows = _cached(
        spark, sf_dir, "span_rows",
        lambda: spans.window_hash_rows(docs, "doc_id", "text", width=8),
    )
    return spans.duplicate_spans(
        docs, "doc_id", "text", width=8, min_count=2, keep_first=True, rows=rows
    )


# ---------------------------------------------------------------------------
# dsir_importance_topk — hashed-ngram importance scores toward a target
# ---------------------------------------------------------------------------

#: The target domain for the gate query: documents from source 'src0'
#: (the deterministic stand-in for "high-quality target corpus").
_TARGET = "src0"
_K = 50
_B = importance.BUCKETS

_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, source, g
  FROM tok, UNNEST(list_concat(
         toks,
         CASE WHEN len(toks) >= 2 THEN list_transform(
           generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1])
         ELSE [] END)) AS t(g)
), feat AS (
  SELECT doc_id, source, {_H60.format(g="g")} % {_B} AS bucket FROM grams
), rc AS (
  SELECT bucket, count(*) AS rc FROM feat GROUP BY bucket
), tc AS (
  SELECT bucket, count(*) AS tc FROM feat WHERE source = '{_TARGET}' GROUP BY bucket
), tot AS (
  SELECT count(*) AS r_tot,
         count(*) FILTER (WHERE source = '{_TARGET}') AS t_tot
  FROM feat
), ratio AS (
  SELECT rc.bucket,
         round((ln((coalesce(tc.tc, 0) + 1.0) / (tot.t_tot + {_B}.0))
              - ln((rc.rc + 1.0) / (tot.r_tot + {_B}.0))) * 1e6)::BIGINT AS lr_micro
  FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tot
)
SELECT doc_id,
       count(*)::BIGINT      AS n_features,
       sum(lr_micro)::BIGINT AS weight_micro
FROM feat JOIN ratio USING (bucket)
GROUP BY doc_id
ORDER BY weight_micro DESC, doc_id
LIMIT {_K}
"""


@register("dsir_importance_topk", _DSIR_ORACLE)
def q_dsir_importance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: the 50 documents scoring most target-like under
    hashed unigram+bigram log-likelihood ratios (target = source 'src0',
    raw = whole corpus).  Scores are exact integer micro-nat sums —
    accumulation-order-proof and hash-checked value-for-value.

    Scale shape: two B-bounded hash aggs (the two "models"), a broadcast
    B-row ratio join, one per-doc agg, TakeOrdered top-k.  One persisted
    feature frame (with the source label kept) serves as both the raw
    corpus and, filtered, the target side."""
    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == _TARGET)
    feat = _cached(
        spark, sf_dir, "dsir_rows",
        lambda: importance.hashed_feature_rows(docs, keep_cols=["source"]),
    )
    raw_rows = feat.select("doc_id", "bucket")
    target_rows = feat.filter(F.col("source") == _TARGET).select("doc_id", "bucket")
    return importance.select_top_k(
        docs, target, _K, "doc_id", "text",
        raw_rows=raw_rows, target_rows=target_rows,
    )
