"""Line/segment-level corpus curation: inter-document repeated-segment
removal (the RefinedWeb / CCNet "line dedup" step).

Web corpora carry boilerplate repeated across documents (nav bars, cookie
banners, license footers); removing any line that occurs in >= k distinct
documents is a standard curation pass that document-level dedup cannot
express. The operator is parameterized by segment width so it works on
newline-delimited real text (one line = one segment) and on the synthetic
single-line corpus here (fixed-width token windows as pseudo-sentences).

No reference analog (the reference is an ELB ETL); extends the LLM-ops
family. Scale shape: one narrow explode, one hash aggregation on the segment
key, one anti join against the (small — only repeated segments survive the
HAVING) hot-segment set, one key-partitioned reassembly aggregation. No
all-pairs forms; at 100 TB the anti-join build side is bounded by the
boilerplate vocabulary, not the corpus, and AQE broadcasts it when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import tokens

#: Tokens per pseudo-sentence segment when no line delimiter exists.
DEFAULT_SEG_TOKENS = 10

#: A segment repeated in at least this many distinct docs is boilerplate.
DEFAULT_MIN_DOC_FREQ = 2


def segment_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = DEFAULT_SEG_TOKENS,
) -> DataFrame:
    """Explode documents into fixed-width token segments with a 0-based
    per-doc segment index: (id, seg_no, seg).

    The token array is materialized as a column BEFORE the transform lambda
    slices it — interpreted array HOFs get no common-subexpression
    elimination, so slicing the raw split(...) expression inside the lambda
    would re-run the tokenizing regex once per segment (the ngram_array
    pathology; see functions/hashing.shingles).

    SQL twin:
    toks[(s*W+1):(s*W+W)] joined with ' ', s in generate_series(0, (len-1)//W)
    (Spark's sequence(0,-1) yields [0,-1], unlike generate_series — hence the
    explicit empty-array guard)."""
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    t = F.col("_toks")
    last = F.floor((F.size(t) - 1) / seg_tokens).cast("int")
    segs = F.when(
        F.size(t) > 0,
        F.transform(
            F.sequence(F.lit(0), last),
            lambda s: F.array_join(F.slice(t, s * seg_tokens + 1, seg_tokens), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(id_col, F.posexplode(segs).alias("seg_no", "seg"))


def interdoc_segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = DEFAULT_SEG_TOKENS,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
) -> DataFrame:
    """Remove every segment that appears in >= min_doc_freq distinct
    documents, then reassemble each document from its surviving segments in
    original order. Output: (id, text_deduped, n_kept, n_removed) — one row
    per input document; a fully-boilerplate document comes back with empty
    text and n_kept = 0 rather than disappearing (the caller decides whether
    to drop short docs, mirroring C4's separate page-length gate).

    The anti join keys on the segment STRING (what the oracle checks);
    at 100 TB you would key on xxhash64(seg) instead to cut shuffle width —
    same plan shape, collision odds ~n²/2⁶⁴."""
    seg = segment_docs(df, id_col, text_col, seg_tokens)
    hot = (
        seg.groupBy("seg")
        .agg(F.count_distinct(F.col(id_col)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_doc_freq)
        .select("seg")
    )
    kept = seg.join(hot, "seg", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_no", "seg"))),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("text_deduped"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col),
        F.when(F.size(tokens(F.col(text_col))) > 0,
               F.floor((F.size(tokens(F.col(text_col))) - 1) / seg_tokens) + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_n_total"),
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("_n_total") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


#: Token window / stride for overlapping training-chunk generation.
DEFAULT_CHUNK_WIDTH = 50
DEFAULT_CHUNK_STRIDE = 40


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = DEFAULT_CHUNK_WIDTH,
    stride: int = DEFAULT_CHUNK_STRIDE,
) -> DataFrame:
    """Overlapping token-window chunking — the context-length-bounded
    training prep step (stride < width keeps `width - stride` tokens of
    overlap so no span is split across a chunk boundary unseen). Output:
    (id, chunk_no, chunk_text, n_tokens); a doc with <= width tokens yields
    exactly one chunk of itself.

    Chunk count uses INTEGER arithmetic — 1 + (n - width + stride - 1) div
    stride extra chunks when n > width — so Spark and SQL agree without
    float-ceil edge cases. Narrow generate+explode over a materialized token
    array (no re-tokenization per chunk), no shuffle."""
    base = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    n = F.col("_n")
    kmax = F.when(
        n > width,
        F.floor((n - width + (stride - 1)) / stride).cast("int"),
    ).otherwise(F.lit(0))
    t = F.col("_toks")
    s = F.col("_s")
    return (
        base.withColumn("_s", F.explode(F.sequence(F.lit(0), kmax)))
        .select(
            id_col,
            s.cast("long").alias("chunk_no"),
            F.array_join(F.slice(t, s * stride + 1, width), " ").alias("chunk_text"),
            F.least(F.lit(width), n - s * stride).cast("long").alias("n_tokens"),
        )
    )
