"""The driver's correctness gate covers the FIRST 50 names queries()
emits — pin the shipped round-13 window so a refactor can't silently
reorder it between the rehearsal and the driver run."""

from __future__ import annotations

import json
import os

from advanced_elb_logs_etl_spark.plans.catalog import CATALOG, FRONT_OF_CATALOG
from advanced_elb_logs_etl_spark.plans import queries, oracle_sql

R13_HEAD = [
    # the stash-to-zero drain (VERDICT r12 item 1): the r13 pair, the
    # r14 pair, the Bloom dedup pair, rrf and entity resolution — all
    # registered in plans/catalog_r13.py
    "lpa_copurchase_communities",
    "stream_kmv_retention_matrix",
    "kmv_sliding_distinct",
    "quantile_range_layout",
    "bloom_dedup_report",
    "stream_bloom_dedup",
    "rrf_hybrid_retrieval",
    "entity_resolution_report",
]

R13_R8_SLICE = [
    # the 23 remaining r8-green entries (CORRECTNESS_r08 record order,
    # entries 28-50) — the oldest signal in the catalog after the r12
    # window refreshed the r7 tail
    "url_query_explode",
    "bitmap_distinct_dates",
    "freq_items_battery",
    "string_agg_sorted",
    "mad_robust_stats",
    "running_distinct_users",
    "regression_battery",
    "date_function_battery",
    "collect_set_sorted",
    "heavy_hitters_exact",
    "f2_moment_users",
    "min_cost_supplier_q2",
    "forecast_revenue_q6",
    "market_share_q8",
    "product_profit_q9",
    "important_value_q11",
    "customer_distribution_q13",
    "top_supplier_q15",
    "disjunctive_revenue_q19",
    "excess_supply_q20",
    "waiting_supplier_q21",
    "global_sales_q22",
    "gopher_rules_battery",
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


def test_r13_window_is_the_rehearsed_50():
    names = list(queries())
    # positions 1-8: the eight new registrations (stash drained to zero)
    assert names[:8] == R13_HEAD
    # positions 9-31: the r8-green leftovers
    assert names[8:31] == R13_R8_SLICE
    # the window is exactly the documented FRONT head (order included)
    assert names[:50] == [n for n in FRONT_OF_CATALOG if n in CATALOG][:50]


def test_r13_window_follows_staleness_order():
    """The window is computed from the committed driver records: the
    eight brand-new registrations first, then the complete r8-green
    tail, then only r9-green entries — so a queue that skips a stale
    cycle fails mechanically."""
    last = _last_green(12)
    names = list(queries())
    # the eight r13 registrations are brand new (no record at all)
    assert all(n not in last for n in names[:8]), names[:8]
    # positions 9-31: r8-green only — and ALL of them (the complete
    # remaining r8 cycle, so nothing r8-stale survives this window)
    assert all(last.get(n) == 8 for n in names[8:31]), [
        (n, last.get(n)) for n in names[8:31] if last.get(n) != 8
    ]
    assert {n for n in names if last.get(n) == 8} == set(names[8:31])
    # positions 32-79: the complete r9-green cycle (first 19 in the
    # window, the 29 leftovers heading the r14 queue)
    r9green = {n for n in names if last.get(n) == 9}
    assert set(names[31:79]) == r9green
    assert len(r9green) == 48
    # nothing never-green remains anywhere behind the new registrations
    assert all(n in last for n in names[8:])


def test_catalog_is_complete_and_oracled():
    names = list(queries())
    assert len(names) == len(set(names)) == 227
    # zero rows-only checks: every query carries an oracle
    assert set(oracle_sql()) == set(names)
