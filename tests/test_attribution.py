"""Multi-touch attribution (operators/events.attribution_by_channel):
hand-computed model cases, the exact-credit invariant, lookback and
tie-break rules, and the DuckDB twin rehearsal for the queued r12 gate
(`attribution_report`)."""

from __future__ import annotations

import datetime as dt

from advanced_elb_logs_etl_spark.operators import events as ev


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )


def test_models_hand_case(spark):
    rows = [
        # user 1: A then B then conversion -> first=A, last=B, linear 50/50
        (1, 1, "view", _ts(0)),
        (2, 1, "click", _ts(1)),
        (3, 1, "purchase", _ts(2)),
        # user 2: three touches -> linear 333333/333333/333334 (remainder
        # to the LAST touch)
        (4, 2, "view", _ts(0)),
        (5, 2, "view", _ts(1)),
        (6, 2, "click", _ts(2)),
        (7, 2, "purchase", _ts(3)),
    ]
    got = {
        r.channel: r
        for r in ev.attribution_by_channel(_frame(spark, rows)).collect()
    }
    assert got["view"].first_touch_micro == 2_000_000  # both conversions
    assert got["click"].last_touch_micro == 2_000_000
    assert got["view"].last_touch_micro == 0
    assert got["click"].first_touch_micro == 0
    # linear: u1 view 500000 + u2 views 333333*2; click 500000 + 333334
    assert got["view"].linear_micro == 500_000 + 666_666
    assert got["click"].linear_micro == 500_000 + 333_334
    # exact-credit invariant: every model distributes 1e6 per conversion
    for model in ("first_touch_micro", "last_touch_micro", "linear_micro"):
        assert sum(getattr(r, model) for r in got.values()) == 2_000_000


def test_lookback_and_tiebreak(spark):
    rows = [
        # touch outside the 7-day lookback is ignored
        (1, 1, "view", dt.datetime(2023, 12, 1)),
        (2, 1, "click", dt.datetime(2024, 1, 1)),
        (3, 1, "purchase", dt.datetime(2024, 1, 2)),
        # same-timestamp touches: id breaks the tie deterministically
        (10, 2, "view", _ts(0)),
        (11, 2, "click", _ts(0)),
        (12, 2, "purchase", _ts(1)),
        # conversion with NO in-window touch drops out entirely
        (20, 3, "purchase", _ts(5)),
    ]
    got = {
        r.channel: r
        for r in ev.attribution_by_channel(_frame(spark, rows)).collect()
    }
    assert got["view"].n_touches == 1  # the stale view is excluded
    assert got["view"].first_touch_micro == 1_000_000  # id 10 < 11
    assert got["click"].last_touch_micro == 2_000_000  # ids 2 and 11
    total_conv = {r.channel: r.n_conversions_touched for r in got.values()}
    assert total_conv == {"view": 1, "click": 2}


# --- the r11 catalog gate (REGISTERED in plans/catalog_r11.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry).  Registered a round early: VERDICT r10 item 5
# widened the stash drain to four slots.  Windows key on (u, conv_id) —
# the r10 ADVICE hardening — in both the operator and the twin. --------

from advanced_elb_logs_etl_spark.plans.catalog_r11 import (  # noqa: E402
    ATTRIBUTION_ORACLE as ATTRIBUTION_ORACLE_QUEUED_R12,
    q_attribution_report,
)


def test_queued_catalog_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the queued r12 entry at sf0.01
    (all-integer surface, exact compare)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_attribution_report(spark, sf)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(x) for x in r) for r in sdf.select(*scols).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    d = con.execute(ATTRIBUTION_ORACLE_QUEUED_R12)
    cols = [c[0] for c in d.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    drows = sorted(tuple(str(r[i]) for i in idx) for r in d.fetchall())
    assert sorted(cols) == scols
    assert srows == drows
    assert len(srows) >= 2


def test_randomized_replica_differential(spark):
    """A seeded random multi-user event stream (duplicate timestamps,
    out-of-window touches, touchless conversions) attributed in one
    Spark job and compared channel-for-channel against a pure Python
    replica of the three models."""
    import random
    from collections import defaultdict

    rng = random.Random(0xA77B)
    channels = ["view", "click", "error", "signup"]
    rows = []
    eid = 0
    for u in range(40):
        for _ in range(rng.randint(0, 25)):
            eid += 1
            etype = rng.choice(channels + ["purchase", "purchase"])
            rows.append((eid, u, etype, _ts(rng.randint(0, 59))))
    df = _frame(spark, rows)
    got = {
        r.channel: (
            r.n_touches,
            r.n_conversions_touched,
            r.first_touch_micro,
            r.last_touch_micro,
            r.linear_micro,
        )
        for r in ev.attribution_by_channel(df, lookback_days=7).collect()
    }
    # python replica (7-day window never excludes anything here: all
    # events sit inside one hour — the lookback rule has its own test)
    per_user = defaultdict(list)
    for e, u, t, ts in rows:
        per_user[u].append((e, t, ts))
    want = defaultdict(lambda: [0, set(), 0, 0, 0])
    for u, evs in per_user.items():
        convs = [(e, ts) for e, t, ts in evs if t == "purchase"]
        touches = [(e, t, ts) for e, t, ts in evs if t != "purchase"]
        for ce, cts in convs:
            win = sorted(
                (ts, e, t) for e, t, ts in touches if ts < cts
            )
            if not win:
                continue
            n = len(win)
            base, rem = divmod(1_000_000, n)
            for i, (ts, e, t) in enumerate(win):
                w = want[t]
                w[0] += 1
                w[1].add(ce)
                if i == 0:
                    w[2] += 1_000_000
                if i == n - 1:
                    w[3] += 1_000_000
                w[4] += base + (rem if i == n - 1 else 0)
    want_t = {
        t: (v[0], len(v[1]), v[2], v[3], v[4]) for t, v in want.items()
    }
    assert got == want_t


def test_plan_windows_are_per_conversion(spark):
    """Stash-time plan pin: both row_number windows and the count
    window partition by (u, conv_id) — a global (empty-partition)
    window here would single-task the touch-pair frame, and a
    conv_id-only partition would merge same-id conversions from
    different users (r10 ADVICE)."""
    rows = [(1, 1, "view", _ts(0)), (2, 1, "purchase", _ts(1))]
    df = ev.attribution_by_channel(_frame(spark, rows))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan[:2000]
    for spec in specs:
        assert "conv_id" in spec and "u#" in spec, plan[:2000]


def test_shared_event_id_across_users_stays_separate(spark):
    """The r10 ADVICE failure scenario, pinned: two users whose
    conversion events SHARE an event id must attribute independently
    (one touch each -> each touch is both first and last in its own
    window; a conv_id-only window would see n=2 and split credit)."""
    rows = [
        (1, 1, "view", _ts(0)),
        (99, 1, "purchase", _ts(1)),
        (2, 2, "click", _ts(0)),
        (99, 2, "purchase", _ts(1)),  # same event id, different user
    ]
    got = {
        r.channel: r
        for r in ev.attribution_by_channel(_frame(spark, rows)).collect()
    }
    for ch in ("view", "click"):
        assert got[ch].n_conversions_touched == 1
        assert got[ch].first_touch_micro == 1_000_000
        assert got[ch].last_touch_micro == 1_000_000
        assert got[ch].linear_micro == 1_000_000
