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


# --- the queued catalog gate, rehearsed against DuckDB --------------------
# Nation-blocked customer pairs scored with the registered linkage
# field model, linked at a looser gate threshold (1.3M micro — admits
# the balance+sign agreement class, so the closure carries real
# multi-hop chains: sizes 1-4 at sf0.01), resolved, and reported as an
# entity-size histogram.  All-BIGINT surface.

ENTITY_THRESHOLD = 1_300_000


def q_entity_resolution_report(spark, sf_dir):
    """Queued gate: the Fellegi-Sunter pipeline tail — link pairs above
    the threshold collapse into canonical entities (transitive
    closure), reported as (entity_size, n_entities, n_records).

    Scale: one blocked self-join + Column scoring (the linkage lane's
    documented shape), then min-label components over ONLY the link
    edges (a tiny fraction of pairs) and one broadcast-backfill join +
    two hash aggs.  The histogram is |distinct sizes| rows."""
    from advanced_elb_logs_etl_spark.plans.catalog import _t

    cust = _t(spark, sf_dir, "customer")
    pairs = linkage.customer_block_pairs(cust)
    scored = linkage.score_pairs(
        pairs, LINKAGE_FIELDS, ENTITY_THRESHOLD, 0
    )
    resolved = linkage.resolve_entities(
        cust.select("c_custkey"), scored, "c_custkey"
    )
    sizes = resolved.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("entity_size")
    )
    return (
        sizes.groupBy("entity_size")
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.sum("entity_size").alias("n_records"),
        )
        .orderBy("entity_size")
    )


ENTITY_ORACLE_QUEUED = f"""
WITH RECURSIVE c AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
), rawpairs AS (
  SELECT a.c_custkey AS id1, b.c_custkey AS id2,
         (a.c_mktsegment = b.c_mktsegment) AS f_segment,
         (abs(a.bal_cents - b.bal_cents) <= 500) AS f_balance,
         ((a.bal_cents >= 0) = (b.bal_cents >= 0)) AS f_bal_sign
  FROM c a JOIN c b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
), links AS (
  SELECT id1, id2 FROM rawpairs
  WHERE (CASE WHEN coalesce(f_segment, FALSE) THEN {_LINK_WS['f_segment'][0]} ELSE {_LINK_WS['f_segment'][1]} END
     + CASE WHEN coalesce(f_balance, FALSE) THEN {_LINK_WS['f_balance'][0]} ELSE {_LINK_WS['f_balance'][1]} END
     + CASE WHEN coalesce(f_bal_sign, FALSE) THEN {_LINK_WS['f_bal_sign'][0]} ELSE {_LINK_WS['f_bal_sign'][1]} END
    ) >= {ENTITY_THRESHOLD}
), edges AS (
  SELECT id1 AS a, id2 AS b FROM links
  UNION
  SELECT id2, id1 FROM links
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), comp AS (
  SELECT a AS id, least(a, min(b)) AS entity FROM reach GROUP BY a
), assigned AS (
  SELECT c_custkey AS id, coalesce(p.entity, c_custkey) AS entity_id
  FROM customer LEFT JOIN comp p ON c_custkey = p.id
), sizes AS (
  SELECT entity_id, count(*)::BIGINT AS entity_size
  FROM assigned GROUP BY entity_id
)
SELECT entity_size, count(*)::BIGINT AS n_entities,
       sum(entity_size)::BIGINT AS n_records
FROM sizes GROUP BY entity_size ORDER BY entity_size
"""


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
