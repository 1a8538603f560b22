#!/usr/bin/env python
"""Constant-dup-density dedup scaling wave (VERDICT r8 item 7).

The r8 50x LSH wave replicated document TEXTS identically, which
saturates dup density (every doc joins a ~50-member cross-replica
group) — it measured true-pair-volume economics, not corpus growth.
This wave measures the claim that matters at 100 TB: with dup density
held CONSTANT, the shingle+band lanes scale LINEARLY in corpus size.

Device: replica i prefixes every token with ``r{i}_`` (one
regexp_replace), so each replica carries a fresh shingle VOCABULARY —
no shingle, minhash band, or LSH bucket collides across replicas, and
each replica reproduces exactly the base corpus's duplicate structure.
Corpus grows Nx; true pairs, components, and survivors grow exactly Nx.

Stages timed per multiplier (warm JVM, persisted input, count sinks):
  shingle : with_shingle_hashes pass (persist+count)
  pairs   : minhash_neardup_pairs on the persisted hash frame
  cc      : neardup_components over the pairs

Usage: python tools/scale_dedup_linear.py [--sf-dir DIR] [--mults 10,50,200]
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
    ap.add_argument("--mults", default="10,50,200")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    from pyspark.sql import functions as F

    from advanced_elb_logs_etl_spark.operators import dedup
    from advanced_elb_logs_etl_spark.session import (
        autosize_shuffle_partitions,
        get_spark,
    )
    from advanced_elb_logs_etl_spark.sources.testdata import load_table

    spark = get_spark(app_name="dedup-linear")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, args.sf_dir, "documents").select("doc_id", "text")
    n_base = base.count()
    print(f"base corpus: {n_base} docs ({args.sf_dir})\n")
    print("| mult | docs | shingle pass | pairs | pairs wall | components | cc wall | pairs/doc |")
    print("|---|---|---|---|---|---|---|---|")

    rows = []
    for mult in mults:
        corpus = (
            base.crossJoin(
                F.broadcast(spark.range(mult).select(F.col("id").alias("_r")))
            )
            .select(
                (F.col("doc_id") + F.col("_r") * n_base).alias("doc_id"),
                # fresh shingle vocabulary per replica: prefix every token
                F.regexp_replace(
                    F.col("text"), r"(\S+)", F.concat(F.lit("r"), F.col("_r"), F.lit("_$1"))
                ).alias("text"),
            )
            .repartition(64)
            .persist()
        )
        n = corpus.count()
        # size shuffles like a production deployment would (entry-path rule)
        autosize_shuffle_partitions(spark, n * 4096)  # ~4 KB/doc shuffled

        t0 = time.perf_counter()
        hashed = dedup.with_shingle_hashes(corpus).persist()
        hashed.count()
        t_shingle = time.perf_counter() - t0

        t0 = time.perf_counter()
        pairs = dedup.minhash_neardup_pairs(corpus, hashed=hashed).persist()
        n_pairs = pairs.count()
        t_pairs = time.perf_counter() - t0

        t0 = time.perf_counter()
        comps = dedup.neardup_components(pairs)
        n_comp = comps.select("component").distinct().count()
        t_cc = time.perf_counter() - t0

        print(
            f"| {mult}x | {n} | {t_shingle:.1f}s | {n_pairs} | {t_pairs:.1f}s "
            f"| {n_comp} | {t_cc:.1f}s | {n_pairs / n:.3f} |"
        )
        rows.append((mult, n, t_shingle, n_pairs, t_pairs, n_comp, t_cc))
        pairs.unpersist()
        hashed.unpersist()
        corpus.unpersist()

    if len(rows) >= 2:
        lo, hi = rows[0], rows[-1]
        scale = hi[0] / lo[0]
        print(
            f"\n{hi[0]}x vs {lo[0]}x ({scale:.0f}x data): "
            f"shingle {hi[2]/lo[2]:.1f}x, pairs-stage {hi[4]/lo[4]:.1f}x, "
            f"cc {hi[6]/lo[6]:.1f}x wall; pair count {hi[3]/lo[3]:.1f}x "
            f"(linear = {scale:.0f}x); pairs/doc {lo[3]/lo[1]:.3f} -> {hi[3]/hi[1]:.3f} "
            f"(constant = density held)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
