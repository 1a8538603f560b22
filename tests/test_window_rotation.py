"""The driver's correctness gate covers the FIRST 50 names queries()
emits — pin the shipped round-9 window so a refactor can't silently
reorder it between the rehearsal and the driver run."""

from __future__ import annotations

from advanced_elb_logs_etl_spark.plans.catalog import CATALOG, FRONT_OF_CATALOG
from advanced_elb_logs_etl_spark.plans import queries, oracle_sql

R9_ADDITIONS = [
    "alternating_components",
    "lm_perplexity_filter",
    "bm25_topk",
    "pq_adc_topk",
    "stream_heavy_hitters",
    "stream_latency_histogram",
]

R9_DISPLACED = [
    "grouping_sets_pricing",
    "set_ops_battery",
    "welch_t_values",
    "rolling_median_value",
    "triangle_count_sampled",
]


def test_r9_window_is_the_rehearsed_50():
    names = list(queries())
    # positions 45-50: the six stash registrations (the r9 drain)
    assert names[44:50] == R9_ADDITIONS
    # the five displaced r5-green entries head the r10 queue
    assert names[50:55] == R9_DISPLACED
    # the window is exactly the documented FRONT head (order included)
    assert names[:50] == [n for n in FRONT_OF_CATALOG if n in CATALOG][:50]
    # displaced entries must NOT appear inside the window
    assert not set(R9_DISPLACED) & set(names[:50])


def test_r10_queue_follows_staleness_order():
    """Positions 51+ are the r10 rotation queue: the five displaced
    r5-green entries first, then the complete r6-green cycle — computed
    from the committed driver records, so a queue that skips a stale
    cycle (the bug this pin was added for) fails mechanically."""
    import json
    import os

    last: dict[str, int] = {}
    for r in range(1, 9):
        path = os.path.join(os.path.dirname(__file__), "..", f"CORRECTNESS_r0{r}.json")
        if not os.path.exists(path):
            continue
        for k, v in json.load(open(path)).items():
            if v.get("hash_match") or (
                v.get("rows_match") and v.get("hash_match") is None
            ):
                last[k] = r
    names = list(queries())
    assert all(last.get(n) == 5 for n in names[50:55]), names[50:55]
    r6green = {n for n in names if n not in set(names[:50]) and last.get(n) == 6}
    assert set(names[55:105]) == r6green
    assert len(r6green) == 50


def test_catalog_is_complete_and_oracled():
    names = list(queries())
    assert len(names) == len(set(names)) == 205
    # zero rows-only checks: every query carries an oracle
    assert set(oracle_sql()) == set(names)
