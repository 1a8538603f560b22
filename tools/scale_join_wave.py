#!/usr/bin/env python
"""Fact-fact join strategy wave (round 9: the 100x point).

r7 found the triangle wedge probe wanted a `shuffle_hash` hint (4.6x);
r8 generalized it on orders x lineitem at 20x (1.4x, gap widening).
This tool adds the next decade so the "advantage widens with scale"
claim has three measured points on one axis: orders(Nx) x lineitem(Nx)
equi-join + revenue agg, SHJ-hinted vs Catalyst's unhinted choice
(SMJ at these sizes), at autosized shuffle partitions.

Usage: python tools/scale_join_wave.py [--sf-dir DIR] [--mults 20,100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mults", default="20,100")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    from pyspark.sql import functions as F

    from advanced_elb_logs_etl_spark.session import (
        autosize_shuffle_partitions,
        get_spark,
    )
    from advanced_elb_logs_etl_spark.sources.testdata import load_table

    spark = get_spark(app_name="join-wave")
    spark.sparkContext.setLogLevel("ERROR")

    o_base = load_table(spark, args.sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    l_base = load_table(spark, args.sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    n_o, n_l = o_base.count(), l_base.count()
    print(f"base: orders {n_o}, lineitem {n_l} ({args.sf_dir})\n")
    print("| mult | orders | lineitem | SHJ-hinted | unhinted (SMJ) | gap |")
    print("|---|---|---|---|---|---|")

    for mult in mults:
        rep = F.broadcast(spark.range(mult).select(F.col("id").alias("_r")))
        orders = (
            o_base.crossJoin(rep)
            .select(
                (F.col("o_orderkey") + F.col("_r") * (n_o * 4)).alias("o_orderkey"),
                "o_orderdate",
            )
            .repartition(64)
            .persist()
        )
        lineitem = (
            l_base.crossJoin(rep)
            .select(
                (F.col("l_orderkey") + F.col("_r") * (n_o * 4)).alias("l_orderkey"),
                "l_extendedprice",
                "l_discount",
            )
            .repartition(64)
            .persist()
        )
        no, nl = orders.count(), lineitem.count()
        autosize_shuffle_partitions(spark, nl * 32)  # ~32B/row shuffled

        def q(hinted: bool):
            o = orders.hint("shuffle_hash") if hinted else orders
            return (
                lineitem.join(o, lineitem.l_orderkey == o.o_orderkey)
                .groupBy(F.year("o_orderdate").alias("y"))
                .agg(
                    F.sum(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).alias("rev")
                )
            )

        # warm both lineages once, then time
        q(True).collect()
        t0 = time.perf_counter(); q(True).collect(); t_shj = time.perf_counter() - t0
        t0 = time.perf_counter(); q(False).collect(); t_smj = time.perf_counter() - t0
        print(
            f"| {mult}x | {no} | {nl} | {t_shj:.1f}s | {t_smj:.1f}s "
            f"| {t_smj / t_shj:.2f}x |"
        )
        orders.unpersist(); lineitem.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
