"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup: benchmark decontamination, sequence packing, text
normalization.

No reference analog (the reference is an ELB ETL); these extend the LLM-ops
family (operators/dedup.py, text.py) with the same design stance — codegen
Column expressions where Spark can express the semantics, Arrow-batched
Python only where it can't (greedy packing is inherently sequential per
group; Unicode NFC has no Spark builtin).

Scale notes per operator are in the docstrings; every hot path is a narrow
map, a broadcast join, or a key-partitioned aggregation — no all-pairs
forms anywhere in this module.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import dround

#: Default context budget (tokens) for sequence packing.
DEFAULT_PACK_BUDGET = 128

#: Contamination flag threshold: fraction of a doc's distinct shingles that
#: appear anywhere in the benchmark set.
DEFAULT_CONTAMINATION_THRESHOLD = 0.2

#: Shingle width for decontamination. Deliberately LONGER than the 3-gram
#: LSH shingles: short n-grams collide by chance (on this synthetic
#: small-vocabulary corpus, 3-gram benchmark coverage makes the median doc
#: ~40% "contaminated" at sf0.1 — pure noise), so real pipelines test on
#: long spans (GPT-3 used 13-grams). 8 keeps >= 20 shingles for the ~30-80
#: token docs here while making chance collisions negligible.
DECONTAM_N = 8


def benchmark_shingle_hashes(
    benchmark: DataFrame, text_col: str = "text", n: int = DECONTAM_N
) -> DataFrame:
    """The benchmark suite's distinct shingle-hash set — one `h` long column.
    Benchmark suites are dimension-sized (thousands of eval documents), so
    this frame is broadcast by the consumer."""
    from ..functions.hashing import positional_shingle_hash_rows

    # Each doc needs a DISTINCT id: the shingle kernel's lead() window
    # partitions by it, so a shared constant would chain shingles ACROSS
    # document boundaries. Any unique value works — only the hash set is
    # kept, so the ids never influence the output.
    rows = positional_shingle_hash_rows(
        benchmark.select(
            F.monotonically_increasing_id().alias("_bid"), F.col(text_col)
        ),
        "_bid", text_col, n,
    )
    return rows.select("h").distinct()


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DECONTAM_N,
    threshold: float = DEFAULT_CONTAMINATION_THRESHOLD,
) -> DataFrame:
    """Benchmark decontamination by n-gram overlap (the GPT-3/PaLM-style
    train-test leak check): a corpus doc is contaminated when >= `threshold`
    of its distinct n-gram shingles appear anywhere in the benchmark set.
    The default width is DECONTAM_N (long spans — see that constant for why
    3-grams produce chance-collision noise).

    Returns one row per corpus doc: (id, n_shingles, n_contaminated,
    contamination_ratio, is_contaminated). Docs with < n tokens have no
    shingles and are reported clean with ratio 0.0.

    Scale: corpus side is a narrow shingle-hash map (md5 once per shingle,
    8-byte longs downstream) + per-doc distinct; the benchmark hash set is
    broadcast (eval suites are tiny next to a 100 TB corpus), so the only
    shuffles are the (id, h) distinct and the per-id counts — linear in
    corpus shingle volume, no cross join anywhere."""
    from ..functions.hashing import positional_shingle_hash_rows

    corp = (
        positional_shingle_hash_rows(corpus, id_col, text_col, n)
        .select(id_col, "h")
        .distinct()
    )
    bench = benchmark_shingle_hashes(benchmark, text_col=text_col, n=n)
    per_doc = corp.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        corp.join(F.broadcast(bench), "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    ratio = F.when(
        F.col("n_shingles") > 0,
        dround(F.col("n_contaminated").cast("double") / F.col("n_shingles"), 6),
    ).otherwise(F.lit(0.0))
    return (
        corpus.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        )
        .withColumn("contamination_ratio", ratio)
        .withColumn("is_contaminated", F.col("contamination_ratio") >= threshold)
    )


#: Output schema of pack_sequences (input cols + pack assignment).
_PACK_SCHEMA = (
    "group_key string, doc_id long, n_tokens long, pack_id long, pack_key string"
)


def pack_sequences(
    df: DataFrame,
    budget: int = DEFAULT_PACK_BUDGET,
    group_col: str = "group_key",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy contiguous sequence packing: within each group (shard), walk
    docs in `id_col` order and close the current pack when the next doc
    would exceed `budget` tokens; an oversized doc (> budget) gets a pack of
    its own. Output adds (pack_id, pack_key) per doc.

    Greedy packing is inherently sequential — each boundary depends on the
    running remainder — so it cannot be a window cumsum (a fixed-boundary
    `floor(cumsum/budget)` variant overfills packs). It IS embarrassingly
    parallel across groups, which is exactly how production packers run (one
    shard per worker); hence applyInPandas: one Arrow batch per group, a
    tight integer loop inside. Groups are shard-sized by construction, so
    state is bounded; no driver-side collection anywhere."""

    def pack(pdf):
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        packs, acc, cur = [], 0, 0
        for t in pdf[tokens_col]:
            # a null token count (null text upstream) must not kill the
            # stage: treat it as 0 — the doc rides in the current pack
            # without consuming budget, mirroring the sibling operators'
            # degrade-per-row stance
            t = 0 if pd.isna(t) else int(t)
            if acc > 0 and acc + t > budget:
                cur += 1
                acc = 0
            acc += t
            packs.append(cur)
        pdf["pack_id"] = packs
        pdf["pack_key"] = [f"{g}-{p}" for g, p in zip(pdf[group_col], packs)]
        return pdf

    src = df.select(
        F.col(group_col).alias("group_key"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    return src.groupBy("group_key").applyInPandas(pack, _PACK_SCHEMA)


_WS_RE = re.compile(r"\s+")


def _normalize_one(s: str | None) -> str | None:
    if s is None:
        return None
    return _WS_RE.sub(" ", unicodedata.normalize("NFC", s).casefold()).strip()


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """Unicode normalization for dedup/tokenizer front-ends: NFC compose ->
    casefold -> collapse whitespace runs -> trim. Spark has no NFC builtin,
    so this is an Arrow-batched pandas_udf (the justified-Python case); the
    DuckDB twin is trim(regexp_replace(lower(nfc_normalize(x)), ...)).

    NOTE: str.casefold == lower() for the Latin-1 range the test corpus
    uses; full-Unicode casefold vs SQL lower() diverges on e.g. ß — the
    catalog query constrains the differential to the safe range."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def norm(s):
        return s.map(_normalize_one)

    return df.withColumn(out_col, norm(F.col(text_col)))
