#!/usr/bin/env python
"""ANN index-build amortization measurement (VERDICT r8 item 6).

The r8 50x ANN wave showed the honest small-|Q| economics: with 8
queries, inline index construction loses to the brute scan, and the
operators grew `assigned=` / `corpus_sigs=` injection knobs so
production can build the index once and reuse it.  This tool MEASURES
the claimed amortization: a multi-batch query workload (B batches of 8
queries) against a replicated corpus, three ways —

  brute : brute_force_topk per batch (the O(|Q|*N*d) scan baseline)
  inline: refine_centroids + ivf_topk per batch (index rebuilt per
          batch — what a naive caller does)
  amort : refine_centroids + assign_clusters ONCE, persisted; ivf_topk
          with assigned= injected per batch (the production pattern)

Output: one markdown table row per path, plus the crossover reading,
for SCALE.md.  Usage:

  python tools/scale_ann_amortize.py [--mult 50] [--batches 8] [--sf-dir DIR]
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
    ap.add_argument("--mult", type=int, default=50, help="corpus replication")
    ap.add_argument("--batches", type=int, default=8, help="query batches of 8")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from advanced_elb_logs_etl_spark.operators import similarity
    from advanced_elb_logs_etl_spark.session import get_spark
    from advanced_elb_logs_etl_spark.sources.testdata import load_table

    spark = get_spark(app_name="ann-amortize")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, args.sf_dir, "embeddings")
    n_base = base.count()
    # Replicate with shifted ids (the r8 wave device): same vector cloud,
    # mult x the rows — rank economics, not recall, are under test here.
    corpus = (
        base.crossJoin(F.broadcast(spark.range(args.mult).select(F.col("id").alias("_r"))))
        .select(
            (F.col("vec_id") + F.col("_r") * n_base).alias("vec_id"),
            "embedding",
        )
        .repartition(32)
        .persist()
    )
    n = corpus.count()
    seeds = corpus.filter(F.col("vec_id") < 16)

    # B batches of 8 distinct query vectors each
    batches = [
        corpus.filter(
            (F.col("vec_id") >= b * 8) & (F.col("vec_id") < (b + 1) * 8)
        )
        for b in range(args.batches)
    ]
    # Warm the JVM + corpus cache outside every timed window
    similarity.brute_force_topk(corpus, batches[0], k=5).collect()

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    # --- brute scan per batch -------------------------------------------
    t_brute = [
        timed(lambda q=q: similarity.brute_force_topk(corpus, q, k=5).collect())
        for q in batches
    ]

    # --- inline IVF per batch (index rebuilt every time) -----------------
    def inline(q):
        refined = similarity.refine_centroids(corpus, seeds, iterations=2)
        similarity.ivf_topk(corpus, q, centroids=refined, k=5, nprobe=2).collect()

    t_inline = [timed(lambda q=q: inline(q)) for q in batches]

    # --- amortized: build + persist the index ONCE -----------------------
    t0 = time.perf_counter()
    refined = similarity.refine_centroids(corpus, seeds, iterations=2)
    assigned = similarity.assign_clusters(corpus, refined, m=1).persist()
    assigned.count()  # materialize the index
    t_build = time.perf_counter() - t0
    t_amort = [
        timed(
            lambda q=q: similarity.ivf_topk(
                corpus, q, centroids=refined, k=5, nprobe=2, assigned=assigned
            ).collect()
        )
        for q in batches
    ]

    b = args.batches
    print(f"corpus: {n} vectors ({args.mult}x sf embeddings), "
          f"{b} batches x 8 queries, k=5, nprobe=2/16, warm JVM\n")
    print("| Path | index build | per-batch search (mean) | total (8 batches) |")
    print("|---|---|---|---|")
    print(f"| brute scan | — | {sum(t_brute)/b:.1f}s | {sum(t_brute):.1f}s |")
    print(f"| IVF inline rebuild | per batch | {sum(t_inline)/b:.1f}s | {sum(t_inline):.1f}s |")
    print(f"| IVF amortized (assigned= injected) | {t_build:.1f}s once | "
          f"{sum(t_amort)/b:.1f}s | {t_build + sum(t_amort):.1f}s |")
    tot_brute, tot_amort = sum(t_brute), t_build + sum(t_amort)
    print(f"\namortized vs brute at |Q|={8*b}: {tot_brute/tot_amort:.2f}x "
          f"({'WIN' if tot_amort < tot_brute else 'LOSS'}); "
          f"search-only per batch {sum(t_amort)/b:.2f}s vs brute {sum(t_brute)/b:.2f}s; "
          f"break-even batches ~= {t_build / max(sum(t_brute)/b - sum(t_amort)/b, 1e-9):.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
