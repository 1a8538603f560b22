"""Round-7 catalog wave: SemDeDup semantic dedup and the hashed-ngram
linear classifier scorer — the two training-data operators the VERDICT r6
review named as the remaining canonical surface.

- `semantic_dedup_corpus` (operators/similarity.semantic_dedup): SemDeDup
  (Abbas et al. 2023) — embedding-cluster blocking, within-cluster cosine
  duplicate groups, keep the farthest-from-centroid exemplar.  Every step
  is deterministic (pinned assignment, left-fold cosines, min-label
  components), so even this approximate method is VALUE-exact against a
  recursive-CTE SQL twin.
- `classifier_score_topk` (operators/classifier): fastText-style hashed
  unigram+bigram linear scorer with integer-snapped (micro-unit) weights;
  per-document sums are exact integers, the single final division is
  IEEE-exact on identical integer pairs, so scores hash-match bit-for-bit.

Same contract as plans.catalog: value-exact DuckDB twins, scale notes on
every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import classifier, importance, similarity
from .catalog import _t, register
from .catalog_llm import _cos
from .catalog_r6 import _cached

# ---------------------------------------------------------------------------
# semantic_dedup_corpus — SemDeDup over the embeddings table
# ---------------------------------------------------------------------------

#: Seed centroids (the same untrained coarse quantizer the blocked
#: near-dup entry uses — refined centroids are avg()-based and ulp-unsafe
#: for value contracts, similarity.refine_centroids docstring).
_SEM_SEEDS = 16
_SEM_THRESHOLD = 0.4

_SEM_ORACLE = f"""
WITH RECURSIVE
c AS (SELECT vec_id AS centroid_id, embedding AS centroid
      FROM embeddings WHERE vec_id < {_SEM_SEEDS}),
v AS (SELECT vec_id, embedding FROM embeddings),
scored AS (
  SELECT v.vec_id, v.embedding, c.centroid_id,
         {_cos('v.embedding', 'c.centroid')} AS sim
  FROM v CROSS JOIN c
),
assigned AS (
  SELECT vec_id, embedding, centroid_id AS cluster, sim AS cent_sim FROM (
    SELECT vec_id, embedding, centroid_id, sim,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, centroid_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE {_cos('a.embedding', 'b.embedding')} >= {_SEM_THRESHOLD}
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (SELECT a AS vec_id, least(a, min(b)) AS component FROM reach GROUP BY a),
victims AS (
  SELECT vec_id FROM (
    SELECT g.vec_id,
           row_number() OVER (PARTITION BY g.component
                              ORDER BY s.cent_sim ASC, g.vec_id) AS rn
    FROM comp g JOIN assigned s USING (vec_id)
  ) WHERE rn > 1
)
SELECT a.vec_id, a.cluster::BIGINT AS cluster, a.cent_sim
FROM assigned a
WHERE a.vec_id NOT IN (SELECT vec_id FROM victims)
"""


@register("semantic_dedup_corpus", _SEM_ORACLE)
def q_semantic_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the full embeddings table: 16 seed centroids, hard
    assignment, within-cluster cosine >= 0.4 duplicate groups, keep the
    farthest-from-centroid exemplar per group (the paper's rule).

    Scale shape: centroid broadcast + one narrow assignment pass,
    CLUSTER-EQUI candidate self-join (no cross join — plan-linted),
    min-label CC over only the above-threshold pairs, one window per
    duplicate component, one anti-join.  The SQL twin reproduces the
    assignment, the pair blocking, the transitive closure (recursive
    CTE), and the exemplar window — value-exact including the cent_sim
    doubles (left-fold dot products)."""
    emb = _t(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") < _SEM_SEEDS)
    kept = similarity.semantic_dedup(
        emb, seeds, threshold=_SEM_THRESHOLD, keep="farthest"
    )
    return kept.select("vec_id", F.col("cluster").cast("long"), "cent_sim")


# ---------------------------------------------------------------------------
# classifier_score_topk — hashed-ngram linear scorer
# ---------------------------------------------------------------------------

_CLS_B = importance.BUCKETS  # shares DSIR's feature space -> shared frame
_CLS_BIAS = 250_000
_CLS_K = 50
_CLS_SCALE = 1 << 23

_CLS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, g
  FROM tok, UNNEST(list_concat(
         toks,
         CASE WHEN len(toks) >= 2 THEN list_transform(
           generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1])
         ELSE [] END)) AS t(g)
), feat AS (
  SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT % {_CLS_B} AS bucket
  FROM grams
), w AS (
  SELECT b AS bucket,
         ('0x' || substr(md5('w:' || b::VARCHAR), 1, 6))::BIGINT - {_CLS_SCALE}
           AS weight_micro
  FROM (SELECT unnest(generate_series(0, {_CLS_B - 1})) AS b)
), agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_features,
         sum(coalesce(weight_micro, 0))::BIGINT AS w_sum_micro
  FROM feat LEFT JOIN w USING (bucket) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_features, 0)::BIGINT AS n_features,
       coalesce(a.w_sum_micro, 0)::BIGINT AS w_sum_micro,
       CASE WHEN coalesce(a.n_features, 0) > 0
            THEN ({_CLS_BIAS} + a.w_sum_micro)::DOUBLE
                 / (a.n_features * 1000000)::DOUBLE
            ELSE {_CLS_BIAS}::DOUBLE / 1000000::DOUBLE END AS score
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY score DESC, doc_id
LIMIT {_CLS_K}
"""


@register("classifier_score_topk", _CLS_ORACLE)
def q_classifier_score_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 50 documents scoring highest under the hashed-ngram linear
    model (deterministic synthetic weights standing in for a trained
    fastText classifier — the PLUMBING is under test, like the
    multimodal md5 features).

    Scale shape: the feature pass is the SAME persisted exploded frame
    DSIR uses (identical (1,2)-gram x B=256 bucketing — one md5 pass
    serves both queries), the B-row model broadcasts, one per-doc hash
    agg, then orderBy().limit() compiles to TakeOrdered (per-partition
    top-k + a k-row driver merge; no global window, no full sort)."""
    docs = _t(spark, sf_dir, "documents")
    feat = _cached(
        spark, sf_dir, "dsir_rows",
        lambda: importance.hashed_feature_rows(docs, keep_cols=["source"]),
    )
    weights = classifier.synthetic_weights(spark, _CLS_B)
    scores = classifier.classifier_scores(
        docs, weights, _CLS_B, bias_micro=_CLS_BIAS, feat_rows=feat
    )
    return scores.orderBy(F.col("score").desc(), F.col("doc_id")).limit(_CLS_K)


# ---------------------------------------------------------------------------
# The rule-filter battery queued here through r7 registered in its r8
# window slot: see plans/catalog_r8.py (`gopher_rules_battery`), which
# carries the oracle twin validated in the r7 session.
# ---------------------------------------------------------------------------
