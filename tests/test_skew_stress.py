"""Hot-key skew stress tests (SCALE.md's mitigation story, enforced).

A planted 100:1 hot key goes through (a) salted_agg — result must be
IDENTICAL to the plain groupBy, (b) the W1-W7 session/rolling window block
— results for the hot key must stay exactly correct (windows cannot be
salted; one partition owns the key by definition), and (c) an AQE skew
join — Spark's adaptive skew-split must actually kick in (``skew=true`` in
the final adaptive SortMergeJoin), which is the runtime backstop the 100 TB
design leans on for joins we don't hand-salt.
"""

from __future__ import annotations

from contextlib import contextmanager
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators.sessions import add_session_features
from advanced_elb_logs_etl_spark.operators.skew import salted_agg

#: 100:1 planted skew — one key owns 100x the rows of each cold key.
HOT_ROWS = 20_000
COLD_KEYS = 50
COLD_ROWS = 200


def _skewed_events(spark):
    """HOT_ROWS rows for key 'hot' + COLD_ROWS rows for each of COLD_KEYS
    cold keys, with per-row ids so window results are checkable exactly."""
    base = datetime(2025, 1, 1, tzinfo=timezone.utc)
    hot = spark.range(HOT_ROWS).select(
        F.lit("hot").alias("key"),
        F.col("id").alias("seq"),
        (F.lit(base) + F.make_interval(secs=F.col("id") * 10)).alias("time"),
        (F.col("id") % 97).cast("double").alias("val"),
    )
    cold = spark.range(COLD_KEYS * COLD_ROWS).select(
        F.concat(F.lit("c"), (F.col("id") % COLD_KEYS).cast("string")).alias("key"),
        F.col("id").alias("seq"),
        (F.lit(base) + F.make_interval(secs=(F.col("id") / COLD_KEYS).cast("long") * 10)).alias(
            "time"
        ),
        (F.col("id") % 53).cast("double").alias("val"),
    )
    return hot.unionByName(cold)


def test_salted_agg_identical_under_100x_skew(spark):
    ev = _skewed_events(spark)
    salted = salted_agg(
        ev,
        keys=["key"],
        aggs={"n": ("val", "count"), "s": ("val", "sum"),
              "lo": ("val", "min"), "hi": ("val", "max")},
        num_salts=16,
        salt_source="seq",
    )
    plain = ev.groupBy("key").agg(
        F.count("val").alias("n"), F.sum("val").alias("s"),
        F.min("val").alias("lo"), F.max("val").alias("hi"),
    )
    got = {r.key: (r.n, r.s, r.lo, r.hi) for r in salted.collect()}
    want = {r.key: (r.n, r.s, r.lo, r.hi) for r in plain.collect()}
    assert got == want
    assert got["hot"][0] == HOT_ROWS


def test_window_block_exact_under_100x_skew(spark):
    """W1-W7 with the hot key: every lag/session/rolling value for the hot
    key is exactly derivable (10 s spacing, 30 min gap -> one session; the
    left-open 5-min frame holds min(seq, 29) prior rows + current)."""
    ev = _skewed_events(spark).withColumnRenamed("key", "client_ip")
    out = add_session_features(
        ev, key="client_ip", ts="time", proc_time_col="val", request_col="seq",
        order_tiebreak="seq",
    )
    hot = (
        out.filter(F.col("client_ip") == "hot")
        .select("seq", "new_session", "session_id", "rolling_5min_req_count")
        .collect()
    )
    assert len(hot) == HOT_ROWS
    for r in hot:
        assert r.new_session == (r.seq == 0)
        assert r.session_id == "1-hot"
        # left-open (t-300s, t] with 10 s spacing: rows seq-29..seq
        assert r.rolling_5min_req_count == min(r.seq, 29) + 1


@contextmanager
def _confs(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    try:
        for k, v in kv.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_split_kicks_in(spark):
    """A shuffle join whose build input is dominated by one hot key must be
    rewritten by AQE's skew handling (OptimizeSkewedJoin) — the final
    adaptive plan marks the SortMergeJoin with ``skew=true``. Thresholds are
    lowered to make the 100:1 plant cross them at test scale; at production
    defaults (256 MB) the same rewrite covers a 100 TB hot key."""
    # payload must be (a) needed AFTER the join, or column pruning strips it
    # from the shuffle, and (b) incompressible, or the size estimator sees
    # ~0 bytes: 512 hex chars of per-row sha2 material.
    fact = _skewed_events(spark).withColumn(
        "payload",
        F.concat(*[F.sha2(F.concat(F.col("seq").cast("string"), F.lit(i)), 256)
                   for i in range(8)]),
    )
    dim = spark.range(COLD_KEYS + 1).select(
        F.when(F.col("id") == 0, "hot")
        .otherwise(F.concat(F.lit("c"), (F.col("id") - 1).cast("string")))
        .alias("key"),
        F.col("id").alias("dim_attr"),
    )
    with _confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        # NOTE: the downstream aggregate must NOT require the join key's
        # hash distribution (e.g. groupBy("key")) — OptimizeSkewedJoin
        # rightly refuses to split a partition another operator depends on.
        # A global aggregate keeps the join output distribution-free.
        joined = fact.join(dim, "key").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dim_attr").alias("s"),
            F.sum(F.length("payload")).alias("b"),
        )
        row = joined.collect()[0]
        # AQE finalizes the plan only after execution
        plan = joined._jdf.queryExecution().executedPlan().toString()
    n_total = HOT_ROWS + COLD_KEYS * COLD_ROWS
    assert row.n == n_total
    # dim_attr: 0 for 'hot', i+1 for cold key c<i>
    assert row.s == COLD_ROWS * sum(range(1, COLD_KEYS + 1))
    assert row.b == n_total * 8 * 64
    assert "skew=true" in plan, f"AQE skew-split did not trigger:\n{plan[:2000]}"


def test_salted_agg_rejects_non_mergeable(spark):
    ev = _skewed_events(spark)
    with pytest.raises(ValueError):
        salted_agg(ev, keys=["key"], aggs={"m": ("val", "avg")})
