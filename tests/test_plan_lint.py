"""Catalog-wide plan lint as a test: every registered query's executed
plan must be free of cartesian joins, row-at-a-time Python UDFs, and
single-partition data windows — except the exceptions documented (with
reasons) in tools/plan_lint.py's ALLOW maps. A new query that introduces
an anti-pattern fails here, not in review."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")


def test_catalog_plan_lint(spark):
    from plan_lint import lint

    findings, allowed, unused = lint("/root/testdata/sf0.001")
    assert not findings, findings
    # the allowlist must shrink, not accrete: every entry must be exercised
    # by the current catalog (stale entries get pruned, VERDICT r4 item 7)
    assert not unused, unused
    # ... and the report-frame patterns must actually appear
    hit = {name for name, _ in allowed}
    assert "rfm_segmentation" in hit and "referential_integrity_audit" in hit


def test_catalog_outputs_are_scalar_only(spark):
    """The external driver's canonicalizer hashes result VALUES through
    pandas and crashes on array/map/struct cells (the r3 collect_set_sorted
    red row). Every catalog query must emit scalar columns only — emit
    collections as sorted joined strings or exploded rows."""
    from pyspark.sql import types as T

    import __spark_entry__ as e

    offenders = []
    for name, fn in e.queries().items():
        schema = fn(spark, "/root/testdata/sf0.001").schema
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders
