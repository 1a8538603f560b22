from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from advanced_elb_logs_etl_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(autouse=True)
def _release_deferred_stat_caches():
    """pin='defer' internal caches (stats.global_cumsum) are caller-owned;
    in the test harness each test is that caller — release after every
    test so the cache-hygiene invariants stay meaningful."""
    yield
    from advanced_elb_logs_etl_spark.operators.stats import (
        release_deferred_caches,
    )

    release_deferred_caches()
