"""Leakage-safe split (operators/dedup.leakage_safe_split): near-dup
clusters never straddle train/val/test.  Hand-built cluster cases, the
no-straddle invariant on the real corpus, a pure-Python split-math
replica, and the DuckDB twin rehearsal for the queued r13 catalog gate
(`leakage_safe_split_report`) — the freeze discipline's pre-rehearsal."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import dedup, sampling

_TRAIN, _VAL = 0.8, 0.1


def _split_py(component: int) -> str:
    h = int(
        hashlib.md5(f"{sampling.SPLIT_SEED}:{component}".encode()).hexdigest()[
            :15
        ],
        16,
    )
    u = h / float(1 << 60)
    if u < _TRAIN:
        return "train"
    if u < _TRAIN + _VAL:
        return "val"
    return "test"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_clusters_share_a_split_and_singletons_hash_alone(spark):
    """Two exact-duplicate clusters + two singletons: cluster members get
    the min-id component's split (both engines' component convention);
    singletons split by their own id — identical to assign_split."""
    dup_a = "the quick brown fox jumps over the lazy dog again and again"
    dup_b = "completely different text about spark shuffles and partitions"
    rows = [
        (1, dup_a),
        (2, dup_a),
        (7, dup_b),
        (9, dup_b),
        (20, "a lonely singleton document with its own unique words here"),
        (31, "another solitary text that matches nothing else in the set"),
    ]
    out = {
        r.doc_id: (r.component, r.split)
        for r in dedup.leakage_safe_split(_docs(spark, rows)).collect()
    }
    assert out[1] == (1, _split_py(1))
    assert out[2] == (1, _split_py(1))  # follows cluster min id 1
    assert out[7] == (7, _split_py(7))
    assert out[9] == (7, _split_py(7))
    assert out[20] == (20, _split_py(20))
    assert out[31] == (31, _split_py(31))


def test_no_pair_straddles_splits_on_the_real_corpus(spark):
    """The operator's whole point, pinned on real data: every verified
    near-dup pair ends up with both endpoints in ONE split."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = dedup.minhash_neardup_pairs(docs).localCheckpoint(eager=True)
    assert pairs.count() > 0  # the corpus actually has near-dups
    assigned = dedup.leakage_safe_split(docs, pairs=pairs)
    xa = assigned.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    xb = assigned.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    straddlers = (
        pairs.join(xa, "id_a")
        .join(xb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddlers == 0
    # ... and every document got exactly one assignment
    assert assigned.count() == docs.count()


# --- the queued r13 catalog gate, rehearsed against DuckDB ----------------
# Per-split corpus accounting + the leakage audit lane (must read 0).
# Reuses catalog_llm's pair CTE so the twin's cluster definition is the
# EXACT one already driver-green in neardup_components/dedup_corpus.
# All-BIGINT + VARCHAR surface.

from advanced_elb_logs_etl_spark.plans.catalog_llm import (  # noqa: E402
    _PAIRS_CTE,
    _hashed_docs,
)

LEAKAGE_SPLIT_ORACLE_QUEUED_R13 = f"""
WITH RECURSIVE {_PAIRS_CTE},
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a
),
assigned AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
labeled AS (
  SELECT doc_id, component,
         CASE WHEN u < {_TRAIN!r}::DOUBLE THEN 'train'
              WHEN u < {_TRAIN + _VAL!r}::DOUBLE THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id, component,
               ('0x' || substr(md5('{sampling.SPLIT_SEED}:' || component::VARCHAR), 1, 15))::BIGINT
                 / {float(1 << 60)!r} AS u
        FROM assigned)
),
per_split AS (
  SELECT split, count(*)::BIGINT AS n_docs,
         count(DISTINCT component)::BIGINT AS n_components
  FROM labeled GROUP BY split
),
leak AS (
  SELECT count(*)::BIGINT AS n_cross_split_pairs
  FROM dup_pairs p JOIN labeled x ON p.id_a = x.doc_id
                   JOIN labeled y ON p.id_b = y.doc_id
  WHERE x.split <> y.split
)
SELECT split, n_docs, n_components, n_cross_split_pairs
FROM per_split, leak
"""


def q_leakage_safe_split(spark, sf_dir):
    """The queued r13 registration body: per-split document/cluster
    counts of the leakage-safe split, with the cross-split near-dup
    pair count riding every row as the in-record leakage proof (0 by
    construction — the audit lane is gate-only instrumentation; at
    100 TB production callers keep only the assignment).

    Scale notes: the pair pipeline is localCheckpointed so the split
    and the audit read verified pairs once; the assignment frame is
    localCheckpointed because the audit joins it twice (gate-only —
    the operator itself materializes nothing)."""
    from advanced_elb_logs_etl_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_neardup_pairs(
        docs, hashed=_hashed_docs(spark, sf_dir)
    ).localCheckpoint(eager=True)
    assigned = dedup.leakage_safe_split(docs, pairs=pairs).localCheckpoint(
        eager=True
    )
    per_split = assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("component").alias("n_components"),
    )
    xa = assigned.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    xb = assigned.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    leak = (
        pairs.join(xa, "id_a")
        .join(xb, "id_b")
        .agg(
            F.count(
                F.when(F.col("split_a") != F.col("split_b"), F.lit(1))
            ).alias("n_cross_split_pairs")
        )
    )
    return per_split.crossJoin(F.broadcast(leak)).select(
        "split", "n_docs", "n_components", "n_cross_split_pairs"
    )


def test_queued_catalog_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the queued r13 entry at sf0.01
    (integer/varchar surface, exact compare)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_leakage_safe_split(spark, sf)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(x) for x in r) for r in sdf.select(*scols).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    d = con.execute(LEAKAGE_SPLIT_ORACLE_QUEUED_R13)
    cols = [c[0] for c in d.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    drows = sorted(tuple(str(r[i]) for i in idx) for r in d.fetchall())
    assert sorted(cols) == scols
    assert srows == drows
    assert len(srows) == 3  # all three splits populated at sf0.01
    # the leakage audit lane reads zero on every row
    leak_col = sorted(cols).index("n_cross_split_pairs")
    assert all(r[leak_col] == "0" for r in drows)
