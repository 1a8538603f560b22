"""SemDeDup semantic dedup (operators/similarity.semantic_dedup): planted
within-cluster duplicate groups, the paper's farthest-from-centroid
exemplar rule, the min_id rule, and the documented cross-cluster miss."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators.similarity import semantic_dedup

# Two well-separated clusters along axes 0 and 1 (4-dim space).
# Cluster A (centroid e0): ids 10, 11, 12 pairwise near-identical (a dup
# group); 13 unrelated direction inside the cluster.
# Cluster B (centroid e1): ids 20, 21 a dup pair; 22 standalone.
_VECS = [
    (10, [1.00, 0.02, 0.00, 0.00]),
    (11, [1.00, 0.03, 0.00, 0.00]),
    (12, [1.00, 0.04, 0.01, 0.00]),
    (13, [0.70, 0.00, 0.71, 0.00]),   # same cluster, below threshold vs 10-12
    (20, [0.02, 1.00, 0.00, 0.00]),
    (21, [0.03, 1.00, 0.00, 0.00]),
    (22, [0.00, 0.70, 0.00, 0.71]),
]
_CENTROIDS = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]


def _frames(spark):
    v = spark.createDataFrame(_VECS, "vec_id bigint, embedding array<double>")
    c = spark.createDataFrame(_CENTROIDS, "vec_id bigint, embedding array<double>")
    return v, c


@pytest.mark.parametrize("vectorized", [True, False])
def test_semantic_dedup_keeps_farthest_exemplar(spark, vectorized):
    v, c = _frames(spark)
    kept = semantic_dedup(v, c, threshold=0.999, vectorized=vectorized)
    rows = {r.vec_id: r for r in kept.collect()}
    # group {10,11,12}: exemplar = LOWEST cosine to centroid e0 = the one
    # with the largest off-axis component = 12; group {20,21}: 21.
    assert sorted(rows) == [12, 13, 21, 22]
    assert rows[12].cluster == 0 and rows[21].cluster == 1
    assert set(kept.columns) == {"vec_id", "embedding", "cluster", "cent_sim"}
    # survivors carry their true centroid similarity
    assert rows[13].cent_sim < rows[12].cent_sim < 1.0


def test_semantic_dedup_min_id_rule(spark):
    v, c = _frames(spark)
    kept = semantic_dedup(v, c, threshold=0.999, keep="min_id")
    assert sorted(r.vec_id for r in kept.collect()) == [10, 13, 20, 22]
    with pytest.raises(ValueError, match="keep rule"):
        semantic_dedup(v, c, keep="median")


def test_semantic_dedup_misses_cross_cluster_pairs(spark):
    """A duplicate pair split across clusters survives intact — the
    paper's own blocking trade, documented in the docstring."""
    vecs = [
        (1, [1.0, 0.9, 0.0, 0.0]),   # assigned to cluster 0 (cos to e0 wins)
        (2, [0.9, 1.0, 0.0, 0.0]),   # assigned to cluster 1 — near-dup of 1
        (3, [1.0, 0.0, 0.0, 0.0]),
    ]
    v = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    c = spark.createDataFrame(_CENTROIDS, "vec_id bigint, embedding array<double>")
    kept = semantic_dedup(v, c, threshold=0.95)
    assert sorted(r.vec_id for r in kept.collect()) == [1, 2, 3]


def test_semantic_dedup_no_pairs_is_identity(spark):
    v, c = _frames(spark)
    kept = semantic_dedup(v, c, threshold=1.0000001)
    assert sorted(r.vec_id for r in kept.collect()) == sorted(t[0] for t in _VECS)


def test_max_cluster_cap_exempts_oversized_cluster(spark):
    """The degenerate-blocking safety valve: with max_cluster below
    cluster A's size (4 members), A emits no pairs and ALL its members
    survive — including the {10,11,12} dup group — while cluster B
    (2 members, under the cap) still dedups normally. The kept-set
    contract: the cap can only ADD survivors, never remove one."""
    v, c = _frames(spark)
    kept = semantic_dedup(v, c, threshold=0.999, max_cluster=3)
    assert sorted(r.vec_id for r in kept.collect()) == [10, 11, 12, 13, 21, 22]
    # cap above every cluster size == no cap
    kept_wide = semantic_dedup(v, c, threshold=0.999, max_cluster=1000)
    uncapped = semantic_dedup(v, c, threshold=0.999)
    assert sorted(r.vec_id for r in kept_wide.collect()) == sorted(
        r.vec_id for r in uncapped.collect()
    )


def test_exemplar_agg_equals_window_form(spark):
    """The r8 exemplar rewrite (min over a lexicographic struct, nulls
    as +inf) must pick exactly the row the old window form
    (cent_sim ASC NULLS LAST, doc_id ASC -> row 1) picked — pinned on a
    seeded random frame with ties, null cent_sims, and an all-null
    component."""
    import random

    from pyspark.sql import Window

    rng = random.Random(88)
    rows = []
    for comp in range(20):
        for _ in range(rng.randint(1, 8)):
            sim = rng.choice([None, round(rng.uniform(-1, 1), 2),
                              round(rng.uniform(-1, 1), 2), 0.5])
            rows.append((rng.randrange(10_000), comp, sim))
    rows += [(10001, 99, None), (10002, 99, None)]  # all-null component
    df = spark.createDataFrame(
        rows, "doc_id long, component long, cent_sim double"
    ).dropDuplicates(["doc_id"])

    w = Window.partitionBy("component").orderBy(
        F.col("cent_sim").asc_nulls_last(), F.col("doc_id")
    )
    from pyspark.sql.functions import row_number
    want = {
        r.component: r.doc_id
        for r in df.withColumn("_rn", row_number().over(w))
        .filter(F.col("_rn") == 1)
        .collect()
    }
    _ord = F.struct(
        F.coalesce(F.col("cent_sim"), F.lit(float("inf"))).alias("s"),
        F.col("doc_id").alias("i"),
    )
    got = {
        r.component: r["_ex"].i
        for r in df.groupBy("component").agg(F.min(_ord).alias("_ex")).collect()
    }
    assert got == want
