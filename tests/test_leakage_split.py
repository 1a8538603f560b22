"""Leakage-safe split (operators/dedup.leakage_safe_split): near-dup
clusters never straddle train/val/test.  Hand-built cluster cases, the
no-straddle invariant on the real corpus, a pure-Python split-math
replica, and the DuckDB twin rehearsal for the r12 catalog gate
(`leakage_safe_split_report`, registered in plans/catalog_r12.py)."""

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


# --- the r12 catalog gate (REGISTERED in plans/catalog_r12.py as
# `leakage_safe_split_report`; the rehearsal imports the registered
# body + oracle so it exercises the exact catalog entry).  Per-split
# corpus accounting + the leakage audit lane (must read 0).  The twin
# reuses catalog_llm's pair CTE so its cluster definition is the EXACT
# one already driver-green in neardup_components/dedup_corpus. --------

from advanced_elb_logs_etl_spark.plans.catalog_r12 import (  # noqa: E402
    LEAKAGE_SPLIT_ORACLE as LEAKAGE_SPLIT_ORACLE_QUEUED_R13,
    q_leakage_safe_split_report as q_leakage_safe_split,
)


def test_queued_catalog_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the registered r12 entry at
    sf0.01 (integer/varchar surface, exact compare)."""
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
