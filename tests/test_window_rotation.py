"""The driver's correctness gate covers the FIRST 50 names queries()
emits — pin the shipped round-8 window so a refactor can't silently
reorder it between the rehearsal and the driver run."""

from __future__ import annotations

from advanced_elb_logs_etl_spark.plans.catalog import CATALOG, FRONT_OF_CATALOG
from advanced_elb_logs_etl_spark.plans import queries, oracle_sql


def test_r8_window_is_the_rehearsed_50():
    names = list(queries())
    # positions 1-2: the two r3-stale displaced twins
    assert names[:2] == ["rank_battery", "grouping_sets_events"]
    # position 50: the reserved-slot addition
    assert names[49] == "gopher_rules_battery"
    # the window is exactly the documented FRONT head (order included)
    assert names[:50] == [n for n in FRONT_OF_CATALOG if n in CATALOG][:50]


def test_catalog_is_complete_and_oracled():
    names = list(queries())
    assert len(names) == len(set(names)) == 199
    # zero rows-only checks: every query carries an oracle
    assert set(oracle_sql()) == set(names)
