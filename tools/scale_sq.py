#!/usr/bin/env python
"""Scale measurement: operators/sq (scalar-quantization train / encode
/ ADC search) at 100x spread — the VERDICT r13 item 5 evidence that the
compression lane's 100 TB story rests on measurement, not
extrapolation past the catalog's sf0.1 corpus.

Corpus: synthetic dim-64 vectors generated with spark.range + column
math (no driver loops, no data files): component (i, j) is a
hash-mixed integer in [-1e6, 1e6) micro-units scaled to a double in
[-1, 1) — deterministic, full-range per dimension, so the trained
(lo, hi) bounds do real work and no dimension degenerates to constant.

Measured stages (each its own wall):
  - train: sq_train_bounds — ONE posexplode + dim-row min/max agg over
    n*dim position rows (map-side combinable to dim rows);
  - encode: sq_encode + eager localCheckpoint — the zero-join codegen
    projection, materialized once so the search branches below re-read
    codes instead of re-encoding per branch (the catalog query's shape,
    where codes come from a table);
  - search: sq_adc_topk with 8 literal queries, k=10 — per query one
    corpus scan section of dequantize + integer sqdist into
    TakeOrdered(k); 80 rows out.

Usage: python tools/scale_sq.py [n_vectors ...]   (default 100k, 10M)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from advanced_elb_logs_etl_spark.operators import sq  # noqa: E402
from advanced_elb_logs_etl_spark.session import get_spark  # noqa: E402

DIM = 64
N_QUERIES = 8
TOPK = 10


def synthetic_vectors(spark, n: int):
    # xxhash64(id, dim) -> micro int in [-1e6, 1e6) -> double in [-1, 1)
    return (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: (
                    F.pmod(
                        F.xxhash64(F.col("id"), i), F.lit(2_000_000)
                    ).cast("double")
                    / F.lit(1_000_000.0)
                    - F.lit(1.0)
                ),
            ).alias("embedding"),
        )
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 10_000_000]
    spark = get_spark(app_name="scale-sq")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        # NOT checkpointed: the synthetic vectors are deterministic
        # codegen (xxhash64), so regenerating per stage is cheaper than
        # pinning n*dim doubles of storage in the single local JVM —
        # only the CODES frame (the index) materializes, as in the
        # catalog gate
        vecs = synthetic_vectors(spark, n)
        n_rows = vecs.count()

        t0 = time.perf_counter()
        lo, hi = sq.sq_train_bounds(vecs, "embedding", DIM)
        t_train = time.perf_counter() - t0

        t0 = time.perf_counter()
        codes = sq.sq_encode(vecs, lo, hi).localCheckpoint(eager=True)
        n_codes = codes.count()
        t_encode = time.perf_counter() - t0
        assert n_codes == n_rows

        qs = [
            (r.vec_id, [round(float(x) * 1_000_000) for x in r.embedding])
            for r in vecs.filter(F.col("vec_id") < N_QUERIES).collect()
        ]
        t0 = time.perf_counter()
        hits = sq.sq_adc_topk(codes, lo, hi, qs, k=TOPK).collect()
        t_search = time.perf_counter() - t0
        assert len(hits) == N_QUERIES * TOPK, len(hits)

        vecs.unpersist()
        codes.unpersist()
        print(
            f"vectors={n_rows} dim={DIM} "
            f"train={t_train:.1f}s ({n_rows * DIM / t_train:,.0f} comps/s) "
            f"encode={t_encode:.1f}s ({n_rows / t_encode:,.0f} vecs/s) "
            f"search[{N_QUERIES}q,k={TOPK}]={t_search:.1f}s "
            f"({n_rows * N_QUERIES / t_search:,.0f} probe-rows/s)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
