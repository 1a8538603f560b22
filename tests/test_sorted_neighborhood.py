"""Sorted-neighborhood blocking (operators/linkage.
sorted_neighborhood_pairs — Hernandez & Stolfo 1995 merge/purge):
closed-form pair sets, a pure-Python replica differential across
range-partition boundaries, determinism under ties, guards, and the
DuckDB twin rehearsal for the queued r14 catalog gate
(`sorted_neighborhood_linkage`) — the freeze discipline's
pre-rehearsal."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import linkage
from advanced_elb_logs_etl_spark.plans.catalog_r12 import (
    LINKAGE_FIELDS,
    _LINK_WS,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, key long")


def _expected(rows, window):
    order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
    out = set()
    for d in range(1, window):
        out |= set(zip(order, order[d:]))
    return out


def test_closed_form_window_pairs(spark):
    rows = [(i, (i * 37) % 100) for i in range(20)]
    got = {
        (r.id1, r.id2)
        for r in linkage.sorted_neighborhood_pairs(
            _df(spark, rows), "id", ["key"], window=3
        ).collect()
    }
    assert got == _expected(rows, 3)
    assert len(got) == 19 + 18


def test_replica_differential_across_partition_boundaries(spark):
    """300 rows through num_ranges=8 partitions: pairs that straddle a
    range boundary must still be emitted (the two-phase global rank is
    what makes that work); ranks and gaps checked value-for-value."""
    rng = random.Random(0x50F7)
    rows = [(i, rng.randrange(50)) for i in range(300)]  # heavy ties
    out = linkage.sorted_neighborhood_pairs(
        _df(spark, rows), "id", ["key"], window=5, num_ranges=8
    ).collect()
    got = {(r.id1, r.id2): (r.rank1, r.rank2, r.rank_gap) for r in out}
    order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
    rank = {i: p + 1 for p, i in enumerate(order)}
    expect = {}
    for d in range(1, 5):
        for a, b in zip(order, order[d:]):
            expect[(a, b)] = (rank[a], rank[b], d)
    assert got == expect


def test_deterministic_under_ties_and_guards(spark):
    rows = [(i, 7) for i in range(10)]  # ALL ties: order = id order
    df = _df(spark, rows)
    a = sorted(
        (r.id1, r.id2)
        for r in linkage.sorted_neighborhood_pairs(
            df, "id", ["key"], window=2
        ).collect()
    )
    assert a == [(i, i + 1) for i in range(9)]
    with pytest.raises(ValueError):
        linkage.sorted_neighborhood_pairs(df, "id", ["key"], window=1)
    with pytest.raises(ValueError):
        linkage.sorted_neighborhood_pairs(df, "id", [], window=3)


# --- queued r14 gate: sorted_neighborhood_linkage (pre-rehearsed, the
# freeze discipline — body + oracle live here until registration) -----

SNM_WINDOW = 4
SNM_UPPER = 3_000_000
SNM_LOWER = 0


def q_sorted_neighborhood_linkage(spark, sf_dir):
    """Queued r14 gate: the SECOND classic blocking strategy beside
    equi-key blocking (record_linkage_topk's nation blocks) — customers
    sorted by exact balance cents, every pair within 4 positions scored
    with the registered Fellegi-Sunter field model, reported as
    (decision, n_pairs, sum_score_micro).  At sf0.01 all three decision
    classes are populated (201 link / 1493 possible / 2800 non_link).

    Scale: the global rank is the two-phase range-partitioned scan (no
    single-partition data window — the offsets window runs over the
    num_ranges-row counts frame, the benford class); pair generation is
    one rank equi-join, linear in n for fixed window; payload joins are
    two broadcasts of the narrow attribute frame onto the (window-1)*n
    pair frame; scoring is codegen Column math; the report is one 3-row
    hash agg."""
    from advanced_elb_logs_etl_spark.plans.catalog import _t

    cust = _t(spark, sf_dir, "customer")
    c = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    pairs = linkage.sorted_neighborhood_pairs(
        c, "c_custkey", ["bal_cents"], window=SNM_WINDOW
    )
    a = c.select(
        F.col("c_custkey").alias("id1"),
        F.col("c_mktsegment").alias("seg1"),
        F.col("bal_cents").alias("bal1"),
    )
    b = c.select(
        F.col("c_custkey").alias("id2"),
        F.col("c_mktsegment").alias("seg2"),
        F.col("bal_cents").alias("bal2"),
    )
    feat = (
        pairs.join(F.broadcast(a), "id1")
        .join(F.broadcast(b), "id2")
        .select(
            "id1",
            "id2",
            (F.col("seg1") == F.col("seg2")).alias("f_segment"),
            (F.abs(F.col("bal1") - F.col("bal2")) <= 500).alias("f_balance"),
            ((F.col("bal1") >= 0) == (F.col("bal2") >= 0)).alias(
                "f_bal_sign"
            ),
        )
    )
    scored = linkage.score_pairs(feat, LINKAGE_FIELDS, SNM_UPPER, SNM_LOWER)
    return (
        scored.groupBy("decision")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("score_micro").alias("sum_score_micro"),
        )
        .orderBy("decision")
    )


SNM_ORACLE_QUEUED_R14 = f"""
WITH c AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
), ranked AS (
  SELECT c_custkey, c_mktsegment, bal_cents,
         row_number() OVER (ORDER BY bal_cents, c_custkey) AS rnk
  FROM c
), feat AS (
  SELECT (a.c_mktsegment = b.c_mktsegment) AS f_segment,
         (abs(a.bal_cents - b.bal_cents) <= 500) AS f_balance,
         ((a.bal_cents >= 0) = (b.bal_cents >= 0)) AS f_bal_sign
  FROM ranked a JOIN ranked b
    ON b.rnk - a.rnk BETWEEN 1 AND {SNM_WINDOW - 1}
), scored AS (
  SELECT (CASE WHEN coalesce(f_segment, FALSE) THEN {_LINK_WS['f_segment'][0]} ELSE {_LINK_WS['f_segment'][1]} END
     + CASE WHEN coalesce(f_balance, FALSE) THEN {_LINK_WS['f_balance'][0]} ELSE {_LINK_WS['f_balance'][1]} END
     + CASE WHEN coalesce(f_bal_sign, FALSE) THEN {_LINK_WS['f_bal_sign'][0]} ELSE {_LINK_WS['f_bal_sign'][1]} END
    ) AS score_micro
  FROM feat
)
SELECT CASE WHEN score_micro >= {SNM_UPPER} THEN 'link'
            WHEN score_micro < {SNM_LOWER} THEN 'non_link'
            ELSE 'possible' END AS decision,
       count(*)::BIGINT AS n_pairs,
       sum(score_micro)::BIGINT AS sum_score_micro
FROM scored GROUP BY 1 ORDER BY 1
"""


def test_queued_snm_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the queued r14 entry at sf0.01
    through the pandas fetch path (the rank order is total on both
    engines: bal_cents + custkey tiebreak)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_sorted_neighborhood_linkage(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(
        tuple(str(x) for x in r) for r in spd.itertuples(index=False)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf}/customer.parquet')"
    )
    dpd = con.execute(SNM_ORACLE_QUEUED_R14).df()
    assert sorted(dpd.columns) == scols
    drows = sorted(
        tuple(str(x) for x in r) for r in dpd[scols].itertuples(index=False)
    )
    assert srows == drows
    by_dec = {r.decision: int(r.n_pairs) for r in spd.itertuples(index=False)}
    # all three decision classes carry pairs, and the candidate count is
    # exactly (n-1)+(n-2)+(n-3) for n=1500 (linear, never quadratic)
    assert set(by_dec) == {"link", "possible", "non_link"}
    assert sum(by_dec.values()) == 1499 + 1498 + 1497
