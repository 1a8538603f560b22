"""Round-13 catalog wave: the stash drains to ZERO — all eight remaining
built-but-unregistered gates enter the driver window in one move (the
r12 8-wide precedent went 8/8 green first try; VERDICT r12 item 1 asked
for exactly this drain).  Every entry shipped WITH tests and
pre-rehearsed DuckDB twins in earlier sessions (the r11/r12 freeze
discipline); this module is the mechanical registration those test-file
comments promised, and the tests now import the REGISTERED bodies from
here so the rehearsals exercise the exact catalog entries.

- `lpa_copurchase_communities` (operators/graph.py lpa_communities):
  deterministic synchronous label propagation (Raghavan et al. 2007)
  over the co-purchase part graph — the communities-not-components lane
  (a bridge edge merges components but not communities).  Fixed round
  count keeps the fold SQL-unrollable, so the twin is exact.
- `stream_kmv_retention_matrix` (streaming/kmvstream.py +
  operators/kmv.py): the kmv_retention_matrix composition computed from
  the STREAMED per-day minima — 3 real micro-batches into the grouped
  cumulative store, then kmv_pairwise_intersect over the final state.
  The per-group k-minima fold is slicing-invariant, so the batch
  retention oracle covers every replay geometry.
- `kmv_sliding_distinct` (operators/kmv.py kmv_sliding_estimate):
  trailing-3-day unique-user estimates per day from per-day KMV
  sketches (Bar-Yossef et al. 2002) — the sliding-window distinct that
  exact COUNT(DISTINCT) can only answer by re-scanning window-times the
  data.
- `quantile_range_layout` (operators/qsketch.py q_range_boundaries +
  assign_range_ids): 8-range layout boundaries from the k=256
  bottom-k-by-hash sample (Cohen & Kaplan 2007) with the ACTUAL
  per-range counts as in-record balance evidence.
- `bloom_dedup_report` + `stream_bloom_dedup` (operators/bloom.py dedup
  lane + streaming/bloomstream.py): order-exact approximate first-seen
  dedup (Broder & Mitzenmacher 2004) — state bounded by m_bits FOREVER,
  no false negatives by construction; batch gate carries the exact-lane
  fp accounting (gate-only — production is the bloom lane alone), the
  streaming gate is a real 3-batch replay.
- `rrf_hybrid_retrieval` (operators/retrieval.rrf_fuse): reciprocal-
  rank fusion (Cormack, Clarke & Buettcher 2009) of the BM25 lexical
  lane with the embedding-cosine lane — integer micro RRF, rank-only
  across the lane boundary.
- `entity_resolution_report` (operators/linkage.resolve_entities): the
  Fellegi-Sunter pipeline tail — link pairs -> min-label transitive
  closure -> canonical entities, reported as an entity-size histogram.

Same contract as plans.catalog: value-exact DuckDB twins, scale notes
on every query docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import bloom, graph, kmv, linkage, qsketch, retrieval, similarity
from ..streaming import bloomstream as bst
from ..streaming import kmvstream as kms
from .catalog import _t, _us, register, register_production
from .catalog_llm import _cos
from .catalog_r12 import _DAY_US, KMV_RETENTION_ORACLE, LINKAGE_FIELDS, QS_GATE_K, RET_K, _LINK_WS

# ---------------------------------------------------------------------------
# lpa_copurchase_communities
# ---------------------------------------------------------------------------

#: Fixed synchronous round count — keeps the fold SQL-unrollable so the
#: twin is exact (no convergence nondeterminism).
LPA_GATE_ROUNDS = 3

_LPA_ROUND_SQL = """
lab{r} AS (
  SELECT node, label FROM (
    SELECT e.u AS node, l.label, count(*) AS cnt,
           row_number() OVER (
             PARTITION BY e.u ORDER BY count(*) DESC, l.label ASC
           ) AS rn
    FROM und e JOIN lab{p} l ON l.node = e.v
    GROUP BY e.u, l.label
  ) WHERE rn = 1
)"""

# Pre-rehearsed hash-green at sf0.01 in the r11 session
# (tests/test_lpa.py keeps the rehearsal and imports this body).
LPA_ORACLE = (
    "WITH pairs AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i"
    " FROM lineitem),\n"
    "ok AS (SELECT g FROM pairs GROUP BY g HAVING count(*) <= 64),\n"
    "ed AS (\n"
    "  SELECT DISTINCT a.i AS u, b.i AS v\n"
    "  FROM pairs a JOIN pairs b ON a.g = b.g AND a.i < b.i\n"
    "  WHERE a.g IN (SELECT g FROM ok)\n"
    "),\n"
    "und AS (SELECT u, v FROM ed UNION ALL SELECT v, u AS v FROM ed),\n"
    "lab0 AS (SELECT DISTINCT u AS node, u AS label FROM und),"
    + ",".join(
        _LPA_ROUND_SQL.format(r=i + 1, p=i) for i in range(LPA_GATE_ROUNDS)
    )
    + f"""
SELECT label, count(*)::BIGINT AS n_nodes
FROM lab{LPA_GATE_ROUNDS} GROUP BY label
"""
)


@register("lpa_copurchase_communities", LPA_ORACLE)
def q_lpa_copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community-size distribution of the co-purchase part graph after 3
    deterministic LPA rounds — the domains/topics lane components cannot
    see (a bridge edge merges components but not communities).

    Scale: per round two node-keyed shuffles over the mirrored edges
    (the pagerank budget; the edge side of the label join is
    pre-partitioned once at setup — see lpa_communities); the report is
    one hash agg on the final one-row-per-node label frame.  The edge
    frame is the SHARED persisted co-purchase frame of the graph
    catalog wave (catalog_graph._copurchase_edges) — identical values
    to the previous inline co_occurrence_edges build, one build per
    session instead of one per query."""
    from .catalog_graph import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir)
    labels = graph.lpa_communities(edges, rounds=LPA_GATE_ROUNDS)
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# stream_kmv_retention_matrix
# ---------------------------------------------------------------------------


@register("stream_kmv_retention_matrix", KMV_RETENTION_ORACLE)
def q_stream_kmv_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kmv_retention_matrix composition computed from STREAMED
    per-day minima — events replayed through THREE real micro-batches
    into the grouped cumulative store, then kmv_pairwise_intersect over
    the final state.  The per-group k-minima fold is slicing-invariant,
    so the batch retention oracle covers every replay geometry (equality
    pinned independently in tests/test_streaming_kmv.py).

    Scale: per batch one grouped distinct agg + per-day top-k window
    over THAT BATCH's rows; history is never re-scanned, state is k rows
    per day; the matrix is k-row joins afterwards."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    keyed = ev.select(
        F.col("event_id").alias("order_key"),
        (_us(F.col("ts")) / F.lit(_DAY_US)).cast("long").alias("day_no"),
        F.col("user_id").cast("string").alias("key"),
    )
    sk = kms.replay_kmv_grouped(
        spark, keyed, ["day_no"], "day_no long", "key", k=RET_K,
        num_batches=3, order_col="order_key",
    ).localCheckpoint(eager=True)
    days = sk.select("day_no").distinct()
    pairs = (
        days.select(
            F.col("day_no").alias("g1"),
            (F.col("day_no") + F.lit(1)).alias("g2"),
        )
        .join(days.select(F.col("day_no").alias("g2")), "g2")
        .select("g1", "g2")
    )
    out = kmv.kmv_pairwise_intersect(sk, "day_no", pairs, k=RET_K)
    return out.select(
        F.col("g1").alias("day1"),
        F.col("g2").alias("day2"),
        "n_common",
        "theta",
        F.col("est_intersect").alias("est_returning"),
    ).orderBy("day1")


# ---------------------------------------------------------------------------
# kmv_sliding_distinct
# ---------------------------------------------------------------------------

SLIDE_WIN = 3

KMV_SLIDING_ORACLE = f"""
WITH keyed AS (
  SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS day_no,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
), sk AS (
  SELECT day_no, h FROM (
    SELECT day_no, h,
           row_number() OVER (PARTITION BY day_no ORDER BY h) AS rn
    FROM keyed
  ) WHERE rn <= {RET_K}
), expanded AS (
  SELECT DISTINCT s.day_no + t.range AS day_no, s.h
  FROM sk s, range(0, {SLIDE_WIN}) t
  WHERE s.day_no + t.range IN (SELECT day_no FROM sk)
), topk AS (
  SELECT day_no, h FROM (
    SELECT day_no, h,
           row_number() OVER (PARTITION BY day_no ORDER BY h) AS rn
    FROM expanded
  ) WHERE rn <= {RET_K}
)
SELECT day_no::BIGINT AS day_no, count(*)::BIGINT AS n_hashes,
       max(h) AS kth_hash,
       CASE WHEN count(*) < {RET_K} THEN count(*)
            ELSE CAST(floor({float((RET_K - 1) << 60)!r}
                            / CAST(max(h) AS DOUBLE)) AS BIGINT)
       END AS est_distinct
FROM topk GROUP BY day_no
"""


@register("kmv_sliding_distinct", KMV_SLIDING_ORACLE)
def q_kmv_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-3-day unique-user estimates per day from the per-day KMV
    sketches — the sliding-window distinct no exact per-day
    COUNT(DISTINCT) can answer without re-scanning window-times the
    data.  ~130 users/day at sf0.01 against k=64 saturates every window,
    so the estimator arithmetic carries the hash on all 30 output days.

    Scale: one grouped build over the corpus (localCheckpointed — the
    window expansion references it once but the build lineage is
    corpus-sized), then sketch-row-bounded expansion (rows x window) and
    the grouped estimator."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    keyed = ev.select(
        (_us(F.col("ts")) / F.lit(_DAY_US)).cast("long").alias("day_no"),
        F.col("user_id").cast("string").alias("key"),
    )
    sk = kmv.kmv_build_grouped(
        keyed, ["day_no"], "key", k=RET_K
    ).localCheckpoint(eager=True)
    return kmv.kmv_sliding_estimate(sk, "day_no", SLIDE_WIN, k=RET_K).orderBy(
        "day_no"
    )


# ---------------------------------------------------------------------------
# quantile_range_layout
# ---------------------------------------------------------------------------

LAYOUT_RANGES = 8

QLAYOUT_ORACLE = f"""
WITH pop AS (
  SELECT o_totalprice AS v,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
), sk AS (
  SELECT h, v FROM pop ORDER BY h, v LIMIT {QS_GATE_K}
), agg AS (
  SELECT list_sort(list(v)) AS vs, count(*)::BIGINT AS n_sample FROM sk
), bounds AS (
  SELECT vs[CAST(greatest(1, (t.range * {qsketch.MICRO // LAYOUT_RANGES}
                              * n_sample + {qsketch.MICRO - 1})
                             // {qsketch.MICRO}) AS INT)] AS bv
  FROM agg, range(1, {LAYOUT_RANGES}) t
)
SELECT (SELECT count(*) FROM bounds b WHERE b.bv <= p.v)::BIGINT AS range_id,
       count(*)::BIGINT AS n_rows
FROM pop p GROUP BY 1
"""


@register("quantile_range_layout", QLAYOUT_ORACLE)
def q_quantile_range_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The range-layout lever with a driver row: boundaries for 8
    near-equal ranges of o_totalprice from the k=256 sketch, then the
    ACTUAL per-range row counts from one corpus pass (the in-record
    balance evidence; at 100 TB you'd feed range_id to a partitioned
    write).  Output (range_id, n_rows) — all-integer surface.

    Scale: one TakeOrdered build, a 7-value driver-side boundary collect
    (bounded protocol collect, the model-collect discipline), and one
    hash agg over the assigned corpus — no global sort anywhere."""
    orders = _t(spark, sf_dir, "orders")
    pop = orders.filter(
        F.col("o_orderkey").isNotNull() & F.col("o_totalprice").isNotNull()
    ).select(F.col("o_totalprice").alias("v"))
    sk = qsketch.q_build(orders, "o_totalprice", "o_orderkey", k=QS_GATE_K)
    bounds = [
        r.value
        for r in qsketch.q_range_boundaries(
            sk, LAYOUT_RANGES, k=QS_GATE_K
        ).collect()
    ]
    return (
        qsketch.assign_range_ids(pop, "v", bounds)
        .groupBy("range_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.col("range_id").cast("long").alias("range_id"), "n_rows")
        .orderBy("range_id")
    )


# ---------------------------------------------------------------------------
# bloom_dedup_report + stream_bloom_dedup
# ---------------------------------------------------------------------------

#: Gate geometry: 1024 bits x 4 hashes against ~150 distinct user keys
#: (~44% fill at sf0.01) — a real (but bounded) false-positive regime so
#: the fp accounting columns carry signal.  All-BIGINT surface.
BLOOM_GATE_K = 4
BLOOM_GATE_M = 1024

BLOOM_REPORT_ORACLE = f"""
WITH base AS (
  SELECT event_id AS o, CAST(user_id AS VARCHAR) AS key
  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL
), bits AS (
  SELECT o, key,
         ('0x' || substr(md5(i || ':' || key), 1, 15))::BIGINT % {BLOOM_GATE_M}
           AS bit
  FROM base, (SELECT UNNEST(generate_series(0, {BLOOM_GATE_K - 1})) AS i)
), first_set AS (
  SELECT bit, min(o) AS t_first FROM bits GROUP BY bit
), flags AS (
  SELECT b.o, b.key, max(f.t_first) < b.o AS bloom_dup
  FROM bits b JOIN first_set f USING (bit)
  GROUP BY b.o, b.key
), exact AS (
  SELECT o, key, min(o) OVER (PARTITION BY key) < o AS exact_dup
  FROM base
), joined AS (
  SELECT fl.bloom_dup, e.exact_dup
  FROM flags fl JOIN exact e ON fl.o = e.o AND fl.key = e.key
), agg AS (
  SELECT count(*)::BIGINT AS n_items,
         count(*) FILTER (bloom_dup)::BIGINT AS n_bloom_dup,
         count(*) FILTER (exact_dup)::BIGINT AS n_exact_dup,
         count(*) FILTER (bloom_dup AND NOT exact_dup)::BIGINT
           AS n_false_pos,
         count(*) FILTER (NOT bloom_dup AND exact_dup)::BIGINT
           AS n_false_neg
  FROM joined
)
SELECT n_items, n_bloom_dup, n_exact_dup, n_false_pos, n_false_neg,
       (n_false_pos * 1000000) // (n_items - n_exact_dup)
         AS fp_per_million
FROM agg
"""


@register("bloom_dedup_report", BLOOM_REPORT_ORACLE)
def q_bloom_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row bloom-vs-exact dedup accuracy report over the events
    stream (key = user_id, order = event_id) — order-exact approximate
    first-seen dedup with the exact-lane fp accounting riding the row;
    n_false_neg must read 0 (no false negatives by construction).

    Scale: the bloom lane is explode -> bounded agg -> broadcast ->
    item agg (one corpus-keyed shuffle); the exact lane windows the
    full corpus by key — gate-only instrumentation (production runs the
    bloom lane alone; see the registered production form and
    stream_bloom_dedup for the bounded-state streaming form)."""
    return bloom.bloom_dedup_report(
        _t(spark, sf_dir, "events"), "user_id", "event_id",
        k=BLOOM_GATE_K, m_bits=BLOOM_GATE_M,
    )


@register_production("bloom_dedup_report")
def q_bloom_dedup_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production form: the bloom lane ALONE — flags + totals, no
    exact-lane window over the corpus (keying the full corpus by key is
    the cost the operator exists to avoid; the gate keeps it as
    accuracy instrumentation)."""
    flags = bloom.bloom_first_seen_flags(
        _t(spark, sf_dir, "events"), "user_id", "event_id",
        k=BLOOM_GATE_K, m_bits=BLOOM_GATE_M,
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.count_if("bloom_dup").alias("n_bloom_dup"),
        F.count_if(~F.col("bloom_dup")).alias("n_bloom_new"),
    )


STREAM_BLOOM_ORACLE = f"""
WITH base AS (
  SELECT event_id AS o, CAST(user_id AS VARCHAR) AS key
  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL
), bits AS (
  SELECT o, key,
         ('0x' || substr(md5(i || ':' || key), 1, 15))::BIGINT % {BLOOM_GATE_M}
           AS bit
  FROM base, (SELECT UNNEST(generate_series(0, {BLOOM_GATE_K - 1})) AS i)
), first_set AS (
  SELECT bit, min(o) AS t_first FROM bits GROUP BY bit
), flags AS (
  SELECT b.o, max(f.t_first) < b.o AS bloom_dup
  FROM bits b JOIN first_set f USING (bit)
  GROUP BY b.o, b.key
)
SELECT count(*)::BIGINT AS n_items,
       count(*) FILTER (bloom_dup)::BIGINT AS n_bloom_dup,
       count(*) FILTER (NOT bloom_dup)::BIGINT AS n_bloom_new
FROM flags
"""


@register("stream_bloom_dedup", STREAM_BLOOM_ORACLE)
def q_stream_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events replayed through THREE real micro-batches of the
    bounded-state streaming dedup; output = the global totals (the
    per-item flags are slicing-invariant under order-aligned batches,
    so the batch SQL twin covers the replay).

    Scale: state is <= m_bits (bit, t_first) rows for the life of the
    stream — the seen-key set is never kept; per batch one bounded agg
    + one broadcast + one batch-keyed agg."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    summaries = bst.replay_bloom(
        spark, ev, "user_id", "event_id",
        k=BLOOM_GATE_K, m_bits=BLOOM_GATE_M, num_batches=3,
    )
    return summaries.agg(
        F.sum("n_items").alias("n_items"),
        F.sum("n_bloom_dup").alias("n_bloom_dup"),
        (F.sum("n_items") - F.sum("n_bloom_dup")).alias("n_bloom_new"),
    )


# ---------------------------------------------------------------------------
# rrf_hybrid_retrieval
# ---------------------------------------------------------------------------

#: Hybrid retrieval gate: BM25 top-100 for four query terms fused with
#: the cosine top-100 neighbors of query vector 0 (documents and
#: embeddings share the 0..499 id space).  All-integer surface except
#: the NULLable lane ranks (BIGINT).
RRF_GATE_TERMS = ["join", "vector", "checkpoint", "gardenpath"]
RRF_GATE_N = 100  # per-lane depth
RRF_GATE_K = 50  # fused output
RRF_GATE_QVEC = 0
RRF_K0 = 60

_RRF_TERMS_SQL = ", ".join(f"('{t}')" for t in sorted(set(RRF_GATE_TERMS)))

RRF_ORACLE = rf"""
WITH q AS (SELECT * FROM (VALUES {_RRF_TERMS_SQL}) AS v(term)),
tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
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
         round(i.idf * (s.tf * (1.2 + 1))
               / (s.tf + 1.2 * (1.0 - 0.75 + 0.75 * s.dl
                                 / (c.dl_sum::DOUBLE / c.n_docs)))
               * 1e6)::BIGINT AS c_micro
  FROM stats s JOIN idf i USING (term), corpus c
), bm_scored AS (
  SELECT doc_id, sum(c_micro)::BIGINT AS score_micro
  FROM contrib GROUP BY doc_id
), bm_ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rank_bm25
  FROM bm_scored ORDER BY score_micro DESC, doc_id LIMIT {RRF_GATE_N}
), qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = {RRF_GATE_QVEC}),
cos_scored AS (
  SELECT v.vec_id AS doc_id, {_cos('q.q_vec', 'v.embedding')} AS cosine
  FROM qv q, embeddings v WHERE v.vec_id != {RRF_GATE_QVEC}
), cos_ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cosine DESC, doc_id) AS rank_cosine
  FROM cos_scored ORDER BY cosine DESC, doc_id LIMIT {RRF_GATE_N}
), fused AS (
  SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
         b.rank_bm25::BIGINT AS rank_bm25,
         c.rank_cosine::BIGINT AS rank_cosine,
         (coalesce(1000000 // ({RRF_K0} + b.rank_bm25), 0)
          + coalesce(1000000 // ({RRF_K0} + c.rank_cosine), 0))::BIGINT
           AS rrf_micro
  FROM bm_ranked b FULL OUTER JOIN cos_ranked c ON b.doc_id = c.doc_id
)
SELECT doc_id, rank_bm25, rank_cosine, rrf_micro
FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT {RRF_GATE_K}
"""


@register("rrf_hybrid_retrieval", RRF_ORACLE)
def q_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the lexical (BM25) and semantic
    (embedding cosine) retrieval arms — the standard hybrid search
    combiner, rank-only across the lane boundary.  The fused SET is
    deterministic: scores are exact integers, ties break by id, and the
    50th/51st boundary is an integer-order cut on both engines.

    Scale: lane A is bm25_topk (filtered explode + bounded aggs +
    TakeOrdered); lane B is brute_force_topk with ONE broadcast query
    vector (corpus never shuffles; the IVF/LSH variants swap in for
    larger query sets); the fusion itself is full-outer joins over two
    100-row frames + TakeOrdered(50).  The BM25 rank window is over the
    100-row TakeOrdered output — bounded by construction
    (GLOBAL_WINDOW_ALLOW's benford class)."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    bm = retrieval.bm25_topk(docs, RRF_GATE_TERMS, k=RRF_GATE_N)
    bm_ranked = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score_micro").desc(), "doc_id"))
        .cast("long")
        .alias("rank"),
    )
    cos = similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") == RRF_GATE_QVEC), k=RRF_GATE_N
    )
    cos_ranked = cos.select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("long").alias("rank"),
    )
    return retrieval.rrf_fuse(
        {"bm25": bm_ranked, "cosine": cos_ranked},
        id_col="doc_id",
        k0=RRF_K0,
        k=RRF_GATE_K,
    )


# ---------------------------------------------------------------------------
# entity_resolution_report
# ---------------------------------------------------------------------------

#: Nation-blocked customer pairs scored with the registered linkage
#: field model, linked at a looser gate threshold (1.3M micro — admits
#: the balance+sign agreement class, so the closure carries real
#: multi-hop chains: sizes 1-4 at sf0.01).  All-BIGINT surface.
ENTITY_THRESHOLD = 1_300_000

ENTITY_ORACLE = f"""
WITH RECURSIVE c AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
), rawpairs AS (
  SELECT a.c_custkey AS id1, b.c_custkey AS id2,
         (a.c_mktsegment = b.c_mktsegment) AS f_segment,
         (abs(a.bal_cents - b.bal_cents) <= 500) AS f_balance,
         ((a.bal_cents >= 0) = (b.bal_cents >= 0)) AS f_bal_sign
  FROM c a JOIN c b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
), links AS (
  SELECT id1, id2 FROM rawpairs
  WHERE (CASE WHEN coalesce(f_segment, FALSE) THEN {_LINK_WS['f_segment'][0]} ELSE {_LINK_WS['f_segment'][1]} END
     + CASE WHEN coalesce(f_balance, FALSE) THEN {_LINK_WS['f_balance'][0]} ELSE {_LINK_WS['f_balance'][1]} END
     + CASE WHEN coalesce(f_bal_sign, FALSE) THEN {_LINK_WS['f_bal_sign'][0]} ELSE {_LINK_WS['f_bal_sign'][1]} END
    ) >= {ENTITY_THRESHOLD}
), edges AS (
  SELECT id1 AS a, id2 AS b FROM links
  UNION
  SELECT id2, id1 FROM links
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), comp AS (
  SELECT a AS id, least(a, min(b)) AS entity FROM reach GROUP BY a
), assigned AS (
  SELECT c_custkey AS id, coalesce(p.entity, c_custkey) AS entity_id
  FROM customer LEFT JOIN comp p ON c_custkey = p.id
), sizes AS (
  SELECT entity_id, count(*)::BIGINT AS entity_size
  FROM assigned GROUP BY entity_id
)
SELECT entity_size, count(*)::BIGINT AS n_entities,
       sum(entity_size)::BIGINT AS n_records
FROM sizes GROUP BY entity_size ORDER BY entity_size
"""


@register("entity_resolution_report", ENTITY_ORACLE)
def q_entity_resolution_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Fellegi-Sunter pipeline tail — link pairs above the threshold
    collapse into canonical entities (transitive closure), reported as
    (entity_size, n_entities, n_records).

    Scale: one blocked self-join + Column scoring (the linkage lane's
    documented shape), then min-label components over ONLY the link
    edges (a tiny fraction of pairs) and one broadcast-backfill join +
    two hash aggs.  The histogram is |distinct sizes| rows."""
    cust = _t(spark, sf_dir, "customer")
    pairs = linkage.customer_block_pairs(cust)
    scored = linkage.score_pairs(pairs, LINKAGE_FIELDS, ENTITY_THRESHOLD, 0)
    resolved = linkage.resolve_entities(
        cust.select("c_custkey"), scored, "c_custkey"
    )
    sizes = resolved.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("entity_size")
    )
    return (
        sizes.groupBy("entity_size")
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.sum("entity_size").alias("n_records"),
        )
        .orderBy("entity_size")
    )
