"""The driver's correctness gate covers the FIRST 50 names queries()
emits — pin the shipped round-11 window so a refactor can't silently
reorder it between the rehearsal and the driver run."""

from __future__ import annotations

import json
import os

from advanced_elb_logs_etl_spark.plans.catalog import CATALOG, FRONT_OF_CATALOG
from advanced_elb_logs_etl_spark.plans import queries, oracle_sql

R11_HEAD = [
    # the two never-green entries, third registration attempt — twins'
    # HUGEINT sums now cast ::BIGINT (the judge-verified r10 root cause)
    "lm_perplexity_filter",
    "bm25_topk",
    # the widened stash drain (VERDICT r10 item 5: four slots): the KMV
    # pair from the reserved r11 slots plus butterfly + attribution
    # pulled forward from the r12 stash
    "kmv_distinct_setops",
    "stream_kmv_distinct",
    "butterfly_census",
    "attribution_report",
]

R11_R6_SLICE = [
    # the nine r6-green entries displaced from the r10 window
    "simhash_signatures",
    "stream_lsh_band_canonical",
    "substring_dedup_spans",
    "text_stats",
    "topk_orders",
    "union_distinct_names",
    "value_outliers_z",
    "volume_shipping_q7",
    "zorder_clustering_preview",
]


def _last_green(max_round: int) -> dict[str, int]:
    last: dict[str, int] = {}
    for r in range(1, max_round + 1):
        path = os.path.join(
            os.path.dirname(__file__), "..", f"CORRECTNESS_r{r:02d}.json"
        )
        if not os.path.exists(path):
            continue
        for k, v in json.load(open(path)).items():
            if v.get("hash_match") or (
                v.get("rows_match") and v.get("hash_match") is None
            ):
                last[k] = r
    return last


def test_r11_window_is_the_rehearsed_50():
    names = list(queries())
    # positions 1-6: the never-green pair, then the four registrations
    assert names[:6] == R11_HEAD
    # positions 7-15: the displaced r6-green entries
    assert names[6:15] == R11_R6_SLICE
    # the window is exactly the documented FRONT head (order included)
    assert names[:50] == [n for n in FRONT_OF_CATALOG if n in CATALOG][:50]


def test_r11_window_follows_staleness_order():
    """The window is computed from the committed driver records: the
    two never-green entries first, the four brand-new registrations
    next, then the r6-green cycle's tail, then only r7-green entries —
    so a queue that skips a stale cycle fails mechanically."""
    last = _last_green(10)
    names = list(queries())
    # lm/bm25 have NO green driver row in any record (r9+r10 reds)
    assert all(n not in last for n in names[:2]), names[:2]
    # the four r11 registrations are brand new (no record at all)
    assert all(n not in last for n in names[2:6]), names[2:6]
    # positions 7-15: r6-green only (the complete remaining r6 cycle)
    assert all(last.get(n) == 6 for n in names[6:15]), [
        (n, last.get(n)) for n in names[6:15] if last.get(n) != 6
    ]
    assert {n for n in names if last.get(n) == 6} == set(names[6:15])
    # positions 16-65: the complete r7-green cycle (first 35 in the
    # window, the 15 leftovers heading the r12 queue)
    r7green = {n for n in names if last.get(n) == 7}
    assert set(names[15:65]) == r7green
    assert len(r7green) == 50
    # positions 66-115: the complete r8-green cycle queued for r12/r13
    r8green = {n for n in names if last.get(n) == 8}
    assert set(names[65:115]) == r8green
    assert len(r8green) == 50


def test_catalog_is_complete_and_oracled():
    names = list(queries())
    assert len(names) == len(set(names)) == 211
    # zero rows-only checks: every query carries an oracle
    assert set(oracle_sql()) == set(names)
