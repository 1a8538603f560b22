"""Sequential pattern mining (operators/seqmine.py — GSP/PrefixSpan
support counting for gappy length-2/3 subsequences): hand-checked
existence semantics, once-per-user support, repeated-type patterns,
guards, and the DuckDB twin rehearsal for the queued r15 catalog gate
(`frequent_subsequences_report`) — the freeze discipline's
pre-rehearsal (body + oracle live here until registration)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import seqmine


def _events(spark, rows):
    # (user_id, ts_offset_seconds, event_id, event_type)
    return spark.createDataFrame(
        [(u, float(ts), e, t) for (u, ts, e, t) in rows],
        "user_id long, ts double, event_id long, event_type string",
    ).select(
        "user_id",
        F.timestamp_seconds(F.col("ts")).alias("ts"),
        "event_id",
        "event_type",
    )


def _support(df):
    return {
        (r.pattern, r.length): r.support for r in df.collect()
    }


def test_gappy_vs_contiguous_and_once_per_user(spark):
    # user 1: a x b  -> a>b supported DESPITE the gap (x between);
    # user 2: a b a b -> a>b counted ONCE though two occurrence pairs;
    # user 3: b a    -> a>b NOT supported (wrong order)
    ev = _events(
        spark,
        [
            (1, 1, 1, "a"), (1, 2, 2, "x"), (1, 3, 3, "b"),
            (2, 1, 4, "a"), (2, 2, 5, "b"), (2, 3, 6, "a"), (2, 4, 7, "b"),
            (3, 1, 8, "b"), (3, 2, 9, "a"),
        ],
    )
    got = _support(seqmine.frequent_subsequences(ev))
    assert got[("a>b", 2)] == 2
    assert ("b>a", 2) in got and got[("b>a", 2)] == 2  # users 2 and 3
    # contiguity is NOT required but order IS: user 3 has no a-then-b
    assert got.get(("a>x", 2), 0) == 1  # only user 1 has x at all


def test_repeated_type_needs_two_occurrences(spark):
    # a>a requires two distinct occurrences of a (min < max)
    ev = _events(
        spark,
        [
            (1, 1, 1, "a"),                     # single a: no a>a
            (2, 1, 2, "a"), (2, 2, 3, "a"),     # double a: a>a once
        ],
    )
    got = _support(seqmine.frequent_subsequences(ev))
    assert got[("a>a", 2)] == 1
    # and the triple needs THREE: neither user has a>a>a
    assert ("a>a>a", 3) not in got
    ev3 = _events(
        spark, [(3, 1, 4, "a"), (3, 2, 5, "a"), (3, 3, 6, "a")]
    )
    got3 = _support(seqmine.frequent_subsequences(ev3))
    assert got3[("a>a>a", 3)] == 1


def test_middle_element_strictly_between(spark):
    # a(1) c(2) b(3): a>b>c must NOT be supported — the only b is AFTER
    # the last c, so no strict a < b < c witness exists
    ev = _events(spark, [(1, 1, 1, "a"), (1, 2, 2, "c"), (1, 3, 3, "b")])
    got = _support(seqmine.frequent_subsequences(ev))
    assert ("a>b>c", 3) not in got
    assert got[("a>c>b", 3)] == 1


def test_tie_break_is_deterministic_and_guards(spark):
    # same ts: event_id breaks the tie, so 10 (a) precedes 11 (b)
    ev = _events(spark, [(1, 1, 10, "a"), (1, 1, 11, "b")])
    got = _support(seqmine.frequent_subsequences(ev))
    assert got[("a>b", 2)] == 1 and ("b>a", 2) not in got
    with pytest.raises(ValueError):
        seqmine.frequent_subsequences(ev, min_support=0)


def test_min_support_filters(spark):
    ev = _events(
        spark,
        [
            (1, 1, 1, "a"), (1, 2, 2, "b"),
            (2, 1, 3, "a"), (2, 2, 4, "b"),
            (3, 1, 5, "b"), (3, 2, 6, "c"),
        ],
    )
    got = _support(seqmine.frequent_subsequences(ev, min_support=2))
    assert got == {("a>b", 2): 2}


# --- queued r15 gate: frequent_subsequences_report (pre-rehearsed, the
# freeze discipline — body + oracle live here until registration) ------

SEQ_MIN_SUPPORT = 1


def q_frequent_subsequences_report(spark, sf_dir):
    """Queued r15 gate: every length-2 and length-3 gappy subsequence
    pattern over the events table with per-user support — the
    GSP/PrefixSpan support-counting core, distinct from
    sequence_top_paths' contiguous-trigram occurrence counting (a
    pattern counts once per user and tolerates arbitrary gaps).

    Scale: one user-keyed window for ord, one hash agg to the
    (user, type) span frame, user-keyed equi-joins bounded by
    |alphabet|^2 (+ occurrences for the middle element), and a final
    agg of <= |alphabet|^3 rows — report rows <= 150 for the 5-type
    alphabet."""
    from advanced_elb_logs_etl_spark.plans.catalog import _t

    ev = _t(spark, sf_dir, "events")
    return seqmine.frequent_subsequences(
        ev, min_support=SEQ_MIN_SUPPORT
    )


SEQ_ORACLE = f"""
WITH occ AS (
  SELECT user_id AS u, event_type AS t,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ord
  FROM events
), span AS (
  SELECT u, t, min(ord) AS lo, max(ord) AS hi FROM occ GROUP BY u, t
), p2 AS (
  SELECT a.t || '>' || b.t AS pattern, CAST(2 AS BIGINT) AS length,
         count(*)::BIGINT AS support
  FROM span a JOIN span b ON a.u = b.u AND a.lo < b.hi
  GROUP BY 1
), trip AS (
  SELECT DISTINCT a.u, a.t AS ta, m.t AS tb, c.t AS tc
  FROM span a
  JOIN occ m ON m.u = a.u AND a.lo < m.ord
  JOIN span c ON c.u = a.u AND m.ord < c.hi
), p3 AS (
  SELECT ta || '>' || tb || '>' || tc AS pattern, CAST(3 AS BIGINT) AS length,
         count(*)::BIGINT AS support
  FROM trip GROUP BY 1
)
SELECT pattern, length, support
FROM (SELECT * FROM p2 UNION ALL SELECT * FROM p3)
WHERE support >= {SEQ_MIN_SUPPORT}
ORDER BY support DESC, pattern
"""


def test_queued_seqmine_gate_matches_duckdb_twin(spark):
    """Driver-protocol rehearsal of the queued r15 entry at sf0.01
    through the pandas fetch path."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_frequent_subsequences_report(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(
        tuple(str(x) for x in r) for r in spd.itertuples(index=False)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    dpd = con.execute(SEQ_ORACLE).df()
    assert sorted(dpd.columns) == scols
    drows = sorted(
        tuple(str(x) for x in r) for r in dpd[scols].itertuples(index=False)
    )
    assert srows == drows
    assert len(srows) > 0
