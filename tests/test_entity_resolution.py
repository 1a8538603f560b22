"""Entity resolution (operators/linkage.resolve_entities): hand-built
link graphs (chains, cliques, singletons), determinism, the
no-link-no-merge invariant, and the DuckDB twin rehearsal for the
queued catalog gate (`entity_resolution_report`) — the freeze
discipline's pre-rehearsal."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import linkage
from advanced_elb_logs_etl_spark.plans.catalog_r12 import (
    _LINK_WS,
    LINKAGE_FIELDS,
)


def _records(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "rid long")


def _scored(spark, rows):
    return spark.createDataFrame(
        rows, "id1 long, id2 long, decision string"
    )


def test_chains_cliques_singletons(spark):
    # 1-2-3 chain, 10-11 pair, 20 linked to nothing, 30 only 'possible'
    scored = _scored(
        spark,
        [
            (1, 2, "link"),
            (2, 3, "link"),
            (10, 11, "link"),
            (20, 21, "non_link"),
            (30, 31, "possible"),
        ],
    )
    recs = _records(spark, [1, 2, 3, 10, 11, 20, 21, 30, 31])
    got = {
        r.rid: r.entity_id
        for r in linkage.resolve_entities(recs, scored, "rid").collect()
    }
    assert got[1] == got[2] == got[3] == 1  # transitive chain
    assert got[10] == got[11] == 10
    # non-link / possible decisions never merge
    assert got[20] == 20 and got[21] == 21
    assert got[30] == 30 and got[31] == 31


def test_resolution_is_deterministic_and_schema_stable(spark):
    scored = _scored(spark, [(5, 9, "link"), (9, 7, "link")])
    recs = _records(spark, [5, 7, 9, 100])
    out = linkage.resolve_entities(recs, scored, "rid")
    assert out.columns == ["rid", "entity_id"]
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in out.collect())
    assert a == b == [(5, 5), (7, 5), (9, 5), (100, 100)]


# --- the r13 catalog gate (REGISTERED in plans/catalog_r13.py; the
# rehearsal imports the registered body + oracle so it exercises the
# exact catalog entry — the catalog_r12 pattern) -----------------------

from advanced_elb_logs_etl_spark.plans.catalog_r13 import (  # noqa: E402
    ENTITY_ORACLE as ENTITY_ORACLE_QUEUED,
    q_entity_resolution_report,
)


def test_queued_catalog_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal at sf0.01 through the pandas fetch
    path (all-integer surface; the closure is deterministic on both
    engines)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_entity_resolution_report(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(
        tuple(str(x) for x in r) for r in spd.itertuples(index=False)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf}/customer.parquet')"
    )
    dpd = con.execute(ENTITY_ORACLE_QUEUED).df()
    assert sorted(dpd.columns) == scols
    drows = sorted(
        tuple(str(x) for x in r) for r in dpd[scols].itertuples(index=False)
    )
    assert srows == drows
    # real multi-hop signal: at least one entity larger than a pair, and
    # the records column accounts for every customer exactly once
    by_size = {
        int(r.entity_size): int(r.n_records)
        for r in spd.itertuples(index=False)
    }
    assert max(by_size) >= 3
    assert sum(by_size.values()) == 1500
