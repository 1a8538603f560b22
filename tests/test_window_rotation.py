"""The driver's correctness gate covers the FIRST 50 names queries()
emits — pin the shipped round-14 window so a refactor can't silently
reorder it between the rehearsal and the driver run."""

from __future__ import annotations

import json
import os

from advanced_elb_logs_etl_spark.plans.catalog import CATALOG, FRONT_OF_CATALOG
from advanced_elb_logs_etl_spark.plans import queries, oracle_sql

R14_HEAD = [
    # the r14 stash drain (VERDICT r13 item 1): the three gates built +
    # twin-rehearsed at sf0.01 AND sf0.1 in the r13 session — all
    # registered in plans/catalog_r14.py
    "kcore_copurchase_report",
    "sorted_neighborhood_linkage",
    "sq_adc_topk",
]

R14_R9_SLICE = [
    # the 29 remaining r9-green entries (CORRECTNESS_r09 record order) —
    # the oldest signal in the catalog after the r13 window refreshed
    # the r8 tail
    "debounce_events_batch",
    "null_semantics_battery",
    "array_hof_battery",
    "impute_battery",
    "variant_extract_stats",
    "sequence_top_paths",
    "event_transition_matrix",
    "event_cooccurrence_lift",
    "time_to_conversion",
    "view_to_purchase_within_hour",
    "cohort_ltv_curve",
    "rfm_segmentation",
    "temperature_mix_sample",
    "auc_mann_whitney",
    "calibration_bins",
    "chi_square_type_bucket",
    "cohens_kappa",
    "correlation_matrix",
    "ewma_control_chart",
    "km_survival",
    "ks_two_sample_values",
    "mutual_information",
    "psi_value_drift",
    "two_proportion_ztest",
    "referential_integrity_audit",
    "alternating_components",
    "pq_adc_topk",
    "stream_heavy_hitters",
    "stream_latency_histogram",
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


def test_r14_window_is_the_rehearsed_50():
    names = list(queries())
    # positions 1-3: the three new registrations (stash drained again)
    assert names[:3] == R14_HEAD
    # positions 4-32: the complete r9-green tail
    assert names[3:32] == R14_R9_SLICE
    # the window is exactly the documented FRONT head (order included)
    assert names[:50] == [n for n in FRONT_OF_CATALOG if n in CATALOG][:50]


def test_r14_window_follows_staleness_order():
    """The window is computed from the committed driver records: the
    three brand-new registrations first, then the complete r9-green
    tail, then only r10-green entries — so a queue that skips a stale
    cycle fails mechanically."""
    last = _last_green(13)
    names = list(queries())
    # the three r14 registrations are brand new (no record at all)
    assert all(n not in last for n in names[:3]), names[:3]
    # positions 4-32: r9-green only — and ALL of them (the complete
    # remaining r9 cycle, so nothing r9-stale survives this window)
    assert all(last.get(n) == 9 for n in names[3:32]), [
        (n, last.get(n)) for n in names[3:32] if last.get(n) != 9
    ]
    assert {n for n in names if last.get(n) == 9} == set(names[3:32])
    # positions 33-80: the complete r10-green cycle (first 18 in the
    # window, the 30 leftovers heading the r15 queue)
    r10green = {n for n in names if last.get(n) == 10}
    assert set(names[32:80]) == r10green
    assert len(r10green) == 48
    # nothing never-green remains anywhere behind the new registrations
    assert all(n in last for n in names[3:])


def test_catalog_is_complete_and_oracled():
    names = list(queries())
    assert len(names) == len(set(names)) == 230
    # zero rows-only checks: every query carries an oracle
    assert set(oracle_sql()) == set(names)
