#!/usr/bin/env python
"""Round-15 k-core experiment harness (VERDICT r14 item 1).

Runs the kcore_copurchase_report shape (3 peels at k=70/80/85 over the
sf0.1 co-purchase graph) under controlled variants of the peel loop and
prints per-variant wall times plus the report values (asserted identical):

  head       — the committed k_core (eager ckpt + separate count, two
               broadcast keep frames per round, pool 3)
  fuse       — localCheckpoint(eager=False) + count() fuses the per-round
               materialization job with the fixpoint-count job
  fuse+rel   — fuse + release superseded round checkpoints via
               session.release_local_checkpoint (storage stays O(1) per
               peel instead of O(rounds))
  fuse+rel+1bc — one shared broadcast keep frame probed by BOTH semi-joins
               (ReuseExchange dedupes the build; join on cur.v == keep.u)
  all+coal   — fuse+rel+1bc plus scale-adaptive survivor coalesce
               (partitions sized from the previous round's edge count,
               target rows/partition = 200k, floor 1)

Usage: python tools/r15_kcore_probe.py [--reps 3] [--pool 3]
       [--variants head,fuse,...]  [--sf /root/testdata/sf0.1]
SPARK_GRAFT_CPUS governs cores as everywhere else.
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from advanced_elb_logs_etl_spark.operators import graph  # noqa: E402
from advanced_elb_logs_etl_spark.operators.graph import _mirror  # noqa: E402
from advanced_elb_logs_etl_spark.session import (  # noqa: E402
    get_spark,
    release_local_checkpoint,
)
from advanced_elb_logs_etl_spark.plans.catalog import _t  # noqa: E402

KS = (70, 80, 85)
ROUNDS = 12


def k_core_variant(
    edges: DataFrame,
    k: int,
    max_rounds: int,
    fuse: bool,
    release: bool,
    one_bc: bool,
    coalesce_target: int,
) -> DataFrame:
    cur = edges.select("u", "v")
    cur_n = cur.count()
    owned = None  # the loop-owned checkpoint we may release
    for _ in range(max_rounds):
        deg = _mirror(cur).groupBy("u").agg(F.count(F.lit(1)).alias("_deg"))
        keep = deg.filter(F.col("_deg") >= F.lit(int(k))).select("u")
        if one_bc:
            kp = keep.select(F.col("u").alias("_keep"))
            nxt = (
                cur.join(F.broadcast(kp), cur["u"] == F.col("_keep"), "left_semi")
                .join(F.broadcast(kp), cur["v"] == F.col("_keep"), "left_semi")
                .select("u", "v")
            )
        else:
            ku = keep.hint("broadcast")
            kv = keep.withColumnRenamed("u", "v").hint("broadcast")
            nxt = (
                cur.join(ku, "u", "left_semi")
                .join(kv, "v", "left_semi")
                .select("u", "v")
            )
        if coalesce_target:
            parts = max(1, (cur_n + coalesce_target - 1) // coalesce_target)
            nxt = nxt.coalesce(parts)
        if fuse:
            nxt = nxt.localCheckpoint(eager=False)
            nxt_n = nxt.count()
        else:
            nxt = nxt.localCheckpoint(eager=True)
            nxt_n = nxt.count()
        if release and owned is not None:
            release_local_checkpoint(owned)
        owned = nxt
        cur = nxt
        if nxt_n == cur_n or nxt_n == 0:
            break
        cur_n = nxt_n
    return cur


def report(edges: DataFrame, pool_width: int, **kw) -> list:
    def _peel(k: int):
        core = k_core_variant(edges, k, ROUNDS, **kw)
        nd = core.select(F.explode(F.array("u", "v")).alias("n"))
        row = nd.agg(
            F.count_distinct("n").alias("nn"),
            (F.count(F.lit(1)) / 2).cast("long").alias("ne"),
        ).collect()[0]
        return (k, row["nn"], row["ne"])

    if pool_width <= 1:
        return [_peel(k) for k in KS]
    with ThreadPoolExecutor(max_workers=pool_width) as pool:
        return list(pool.map(_peel, KS))


VARIANTS = {
    "head": dict(fuse=False, release=False, one_bc=False, coalesce_target=0),
    "fuse": dict(fuse=True, release=False, one_bc=False, coalesce_target=0),
    "fuse+rel": dict(fuse=True, release=True, one_bc=False, coalesce_target=0),
    "fuse+rel+1bc": dict(fuse=True, release=True, one_bc=True, coalesce_target=0),
    "all+coal": dict(
        fuse=True, release=True, one_bc=True, coalesce_target=200_000
    ),
}


def main() -> None:
    args = sys.argv[1:]
    reps, pool_width = 3, 3
    sf_dir = "/root/testdata/sf0.1"
    names = list(VARIANTS)
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--pool":
            pool_width = int(args[i + 1]); i += 2
        elif args[i] == "--variants":
            names = args[i + 1].split(","); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    spark = get_spark(app_name="r15-kcore-probe")
    spark.sparkContext.setLogLevel("ERROR")
    li = _t(spark, sf_dir, "lineitem")
    li.count()  # warm page cache / footers

    def fresh_edges():
        return graph.co_occurrence_edges(
            li, "l_orderkey", "l_partkey", max_group_items=64
        ).localCheckpoint(eager=True)

    # one untimed JIT-warm pass (head shape)
    e0 = fresh_edges()
    vals0 = report(e0, pool_width, **VARIANTS["head"])
    release_local_checkpoint(e0)
    print(f"warm pass values: {vals0}", flush=True)

    results: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for n in names:
            os.system("true")  # no-op spacer
            e = fresh_edges()
            t0 = time.perf_counter()
            vals = report(e, pool_width, **VARIANTS[n])
            dt = time.perf_counter() - t0
            release_local_checkpoint(e)
            assert vals == vals0, f"{n}: values differ: {vals} vs {vals0}"
            results[n].append(round(dt, 2))
            print(f"rep{rep} {n:14s} {dt:6.2f}s  load={os.getloadavg()[0]:.1f}",
                  flush=True)
    print("== summary ==")
    for n in names:
        r = results[n]
        print(f"{n:14s} {r} min={min(r):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
