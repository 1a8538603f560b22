"""Sketch / candidate-pruning catalog wave: exact heavy hitters with
partition-local pruning (value-exact — pruning admits no false negatives),
the DataSketches HLL shard-and-merge rollup (approximate by design:
rows-only driver check, error pinned by pytest), and the exact F2
frequency-moment battery. Operators in operators/sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches
from .catalog import _t, register, register_production

# ---------------------------------------------------------------------------
# heavy_hitters_exact — candidate-pruned exact frequent users
# ---------------------------------------------------------------------------

_HH_ORACLE = """
SELECT user_id, count(*)::BIGINT AS cnt
FROM events GROUP BY user_id HAVING count(*) > 60
ORDER BY cnt DESC, user_id
"""


@register("heavy_hitters_exact", _HH_ORACLE)
def q_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with more than 60 events — computed by the two-pass
    candidate-pruned plan (per-partition pre-agg -> pigeonhole filter ->
    semi join -> exact count). The answer is exact, so the oracle is the
    plain HAVING form; the pruning is the 100 TB move (shuffle candidates,
    not the full key cardinality)."""
    ev = _t(spark, sf_dir, "events")
    return sketches.exact_heavy_hitters(ev, ["user_id"], threshold=60).orderBy(
        F.desc("cnt"), "user_id"
    )


# ---------------------------------------------------------------------------
# hll_shard_union — mergeable distinct-count rollup (rows-only by design)
# ---------------------------------------------------------------------------


_HLL_UNION_ORACLE = """
SELECT count(DISTINCT user_id)::BIGINT AS n_exact,
       TRUE AS within_bound
FROM events
"""


@register("hll_shard_union", _HLL_UNION_ORACLE)
def q_hll_shard_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users estimated by building one DataSketches HLL sketch
    per event_type shard and unioning the sketches — the stored-rollup
    pattern.

    The estimate itself is engine-specific, so the hash covers the ERROR
    BOUND (VERDICT r5 item 8): ``within_bound`` asserts the merged-sketch
    estimate lands within 5% of the exact distinct count (lg_k=12 →
    rsd ≈ 1.6%, so 5% is a 3-sigma envelope), and the exact count is
    hash-covered directly. The 1-row×1-row crossJoin stitches the two
    scalar frames (plan-lint allowlisted). tests/test_sketches.py keeps
    the tighter relative-error pin."""
    ev = _t(spark, sf_dir, "events")
    sk = sketches.hll_partitioned_sketches(ev, "event_type", "user_id", lg_k=12)
    est = sketches.hll_merge_estimate(sk)
    exact = ev.agg(F.count_distinct("user_id").alias("n_exact"))
    return est.crossJoin(exact).select(
        "n_exact",
        (
            F.abs(F.col("estimate") - F.col("n_exact")).cast("double")
            <= F.lit(0.05) * F.col("n_exact").cast("double")
        ).alias("within_bound"),
    )


@register_production("hll_shard_union")
def q_hll_shard_union_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production form: the sharded-sketch build + merge estimate alone —
    no exact count_distinct lane (that is the gate's adjudication pass;
    the decomposition policy of VERDICT r7 item 3)."""
    ev = _t(spark, sf_dir, "events")
    sk = sketches.hll_partitioned_sketches(ev, "event_type", "user_id", lg_k=12)
    return sketches.hll_merge_estimate(sk)


# ---------------------------------------------------------------------------
# f2_moment_users — exact frequency-moment battery
# ---------------------------------------------------------------------------

_F2_ORACLE = """
SELECT CAST(sum(c * c) AS BIGINT) AS f2,
       CAST(sum(c) AS BIGINT) AS n,
       count(*)::BIGINT AS n_distinct,
       CAST(max(c) AS BIGINT) AS max_freq
FROM (SELECT count(*) AS c FROM events GROUP BY user_id)
"""


@register("f2_moment_users", _F2_ORACLE)
def q_f2_moment_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact second frequency moment of the user activity distribution —
    the self-join-size / skew statistic that decides whether a key needs
    salting before a join. One hash agg + a 1-row re-agg."""
    ev = _t(spark, sf_dir, "events")
    return sketches.f2_moment(ev, ["user_id"])
