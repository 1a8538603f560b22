"""Repeated-substring span deduplication (token-window granularity).

The corpus-level analogue of suffix-array substring dedup (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL 2022):
any `width`-token window occurring at least `min_count` times ACROSS THE
CORPUS is a duplicated span; overlapping/adjacent flagged windows merge
into maximal spans per document; the globally first occurrence of each
window (smallest (doc, pos)) is exempt under the keep-first policy so
one copy of every duplicated passage survives removal.  This is span
dedup INSIDE documents — a different granularity from exact/MinHash doc
dedup (operators/dedup.py) and whole-segment dedup (operators/lines.py):
a document that embeds one boilerplate paragraph inside unique prose is
untouched by those but has exactly that paragraph excised here.

Scale shape (100 TB): tokenize + n-gram is a narrow codegen map
(functions.hashing.ngram_fold — the shared evaluate-once kernel), window
hashes are 8-byte longs from the md5-once h60 kernel.  ONE shuffle
counts window hashes corpus-wide (map-side partial combine; the
first-occurrence pick rides the same aggregate as min(struct)), one
shuffle join flags duplicated windows (AQE handles skewed boilerplate
hashes; the duplicated-hash side is duplication-bounded, typically a
small fraction of windows), and interval merging is a per-document
window — documents are the partition key, so no global ordering, no
driver participation, no cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h60, ngram_fold, tokens

#: Default window width in tokens. Lee et al. use 50 BPE tokens on web
#: corpora; the synthetic documents table is ~30 words/doc, so the
#: proportionate default is 8 (still >3x the MinHash shingle width).
WIDTH = 8


def window_hash_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", width: int = WIDTH
) -> DataFrame:
    """(id, pos, h): one row per `width`-token window, pos 1-based.

    SQL twin: UNNEST(generate_series(1, len(toks)-width+1)) AS pos with
    h = ('0x' || substr(md5(array_to_string(toks[pos:pos+width-1], ' ')), 1, 15))::BIGINT.
    """
    grams = ngram_fold(tokens(F.col(text_col)), width)
    return (
        df.select(F.col(id_col), F.posexplode(grams).alias("pos0", "gram"))
        .select(
            F.col(id_col),
            (F.col("pos0") + 1).cast("long").alias("pos"),
            h60(F.col("gram")).alias("h"),
        )
    )


def duplicate_window_rows(
    rows: DataFrame,
    id_col: str = "doc_id",
    min_count: int = 2,
    keep_first: bool = True,
) -> DataFrame:
    """Window rows flagged as duplicated: hash occurs >= min_count times
    corpus-wide; with keep_first, the globally smallest (id, pos)
    occurrence of each hash is exempt (one copy survives removal).

    The count and the first-occurrence pick share ONE aggregation
    (min over a (id, pos) struct — lexicographic, unique per hash), so
    flagging costs a single shuffle plus the join back.
    """
    per_h = (
        rows.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first"),
        )
        .filter(F.col("occurrences") >= min_count)
    )
    flagged = rows.join(per_h, "h")
    if keep_first:
        flagged = flagged.filter(
            ~(
                (F.col(id_col) == F.col(f"_first.{id_col}"))
                & (F.col("pos") == F.col("_first.pos"))
            )
        )
    return flagged.select(id_col, "pos", "h", "occurrences")


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = WIDTH,
    min_count: int = 2,
    keep_first: bool = True,
    rows: DataFrame | None = None,
) -> DataFrame:
    """Maximal duplicated spans per document: (id, span_start, span_end,
    span_windows), token positions 1-based inclusive.

    Flagged windows [pos, pos+width-1] merge when they overlap OR touch
    (next_start <= prev_end + 1), the standard interval-union rule, via
    the gaps-and-islands window pattern partitioned BY DOCUMENT (never a
    global sort).

    Pass a (persisted) `rows` frame (from window_hash_rows) to share the
    tokenize+hash pass across the count aggregation and the join back —
    the partial agg under the count's exchange defeats Spark's
    ReuseExchange, so without it the explode executes once per consumer
    (same convention as dedup.minhash_signatures' `hashed=`)."""
    if rows is None:
        rows = window_hash_rows(df, id_col, text_col, width)
    flagged = duplicate_window_rows(rows, id_col, min_count, keep_first)
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    spans = (
        flagged.withColumn("end", F.col("pos") + F.lit(width - 1))
        .withColumn(
            "_new",
            F.when(
                prev_end.isNull() | (F.col("pos") > prev_end + 1), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn("_grp", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(id_col, "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("end").alias("span_end"),
            F.count(F.lit(1)).alias("span_windows"),
        )
        .select(id_col, "span_start", "span_end", "span_windows")
    )
    return spans


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = WIDTH,
    min_count: int = 2,
    out_col: str = "dedup_text",
) -> DataFrame:
    """Documents with corpus-duplicated spans excised (keep-first policy:
    the first occurrence of each passage stays).  Adds `out_col` (the
    deduplicated text) and `removed_tokens`; rows with no duplicated
    span pass through with removed_tokens = 0.

    Token filtering is pure Column HOFs over the per-doc span list
    (collect_list is span-count-bounded per doc, never corpus-sized)."""
    spans = (
        duplicate_spans(df, id_col, text_col, width, min_count, keep_first=True)
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
        )
    )
    empty = F.array().cast("array<struct<span_start:bigint,span_end:bigint>>")
    toks = tokens(F.col(text_col))
    indexed = F.transform(
        toks, lambda t, i: F.struct(t.alias("t"), (i + F.lit(1)).cast("long").alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda p: ~F.exists(
            F.col("_spans"),
            lambda sp: (p["i"] >= sp["span_start"]) & (p["i"] <= sp["span_end"]),
        ),
    )
    return (
        df.join(spans, id_col, "left")
        .withColumn("_spans", F.coalesce(F.col("_spans"), empty))
        .withColumn("_kept", kept)
        .withColumn(
            out_col, F.concat_ws(" ", F.transform(F.col("_kept"), lambda p: p["t"]))
        )
        .withColumn(
            "removed_tokens",
            (F.size(toks) - F.size(F.col("_kept"))).cast("long"),
        )
        .drop("_spans", "_kept")
    )
