"""Streaming MinHash/LSH near-dup surface.

The batch LSH pipeline (operators/dedup.py) computes shingle hashes with
a posexplode + groupBy pass — the codegen-fast BATCH kernel, but a
shuffle, so it cannot run per-row on a stream.  This module provides the
PER-ROW formulation: shingles -> h60 -> minhash signature -> band keys
as pure Column expressions (functions/hashing.py HOF forms), which
attach to a readStream unchanged — no shuffle, no state, identical
values to the batch kernel (both reduce to h60 over the same distinct
shingle set; pinned by the value-exact oracle of the replay query in
plans/catalog_stream2.py).

Streaming near-dup semantics offered:

- ``band_key_rows``: the stateless prefix — (id, band, key) rows ready
  for any downstream stateful policy.
- ``lsh_band_canonical_stream``: per-(band, key) canonical (minimum) doc
  id and member count as a streaming aggregation — the deterministic
  bucket-canonicalization every LSH dedup policy starts from.  State is
  one row per occupied band bucket (4x corpus distinct-band count,
  bounded), keyed exactly like the batch bucket join shuffles.
  Production streams bound it further with a watermark on an event-time
  column (candidates need only collide within the horizon).

A first-seen-wins filter (emit a doc only if none of its band keys was
seen before) is inherently arrival-order dependent — fine in production,
but not value-testable under parallel replay; the min-canonical form is
the order-free equivalent, which is why it is the one under the oracle
gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import minhash_signature, shingle_hashes, shingles
from ..operators.dedup import NUM_BANDS, NUM_HASHES, _band_key

__all__ = ["band_key_rows", "lsh_band_canonical_stream"]


def band_key_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, band, key) LSH band rows via PER-ROW Column expressions —
    attachable to batch and streaming frames alike (no shuffle).  Docs
    with no shingles (fewer than 3 tokens) are dropped: their signature
    is all-null and their band keys would be engine-dependent."""
    hashes = shingle_hashes(shingles(F.col(text_col)))
    sigs = df.select(
        F.col(id_col),
        *minhash_signature(hashes, NUM_HASHES),
        F.size(hashes).alias("_n_sh"),
    ).where(F.col("_n_sh") > 0)
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), _band_key(b).alias("key"))
                    for b in range(NUM_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")


def lsh_band_canonical_stream(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Streaming LSH bucket canonicalization: per (band, key), the minimum
    doc id and the bucket population.  Two docs sharing a canonical row
    are near-dup candidates; the min-id canonical is the same survivor
    rule the batch corpus dedup uses, made order-free so the result is
    deterministic under any replay parallelism."""
    rows = band_key_rows(docs, id_col, text_col)
    return rows.groupBy("band", "key").agg(
        F.min(id_col).alias("canonical_doc"),
        F.count(F.lit(1)).alias("n_docs"),
    )
