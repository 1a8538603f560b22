"""Prefix-filtered set-similarity join (AllPairs/PPJoin family): EXACT
shingle-set Jaccard join WITHOUT the all-pairs cross product.

The 100 TB story: a naive Jaccard join is O(n^2) pairs.  Prefix filtering
is the classic exact pruning (Chaudhuri et al. SSJoin; Bayardo et al.
AllPairs; Xiao et al. PPJoin): order every document's set elements by
ascending global document frequency (rarest first), keep only the first
`|s| - ceil(t * |s|) + 1` elements (the "prefix"), and equi-join documents
on SHARED PREFIX ELEMENTS only.  Two sets with Jaccard >= t must share at
least one prefix element under any agreed total element order, so the
candidate set has NO false negatives; rare-first ordering makes prefixes
collide rarely, so the candidate set stays small.  Two further exact
prunes run inside the candidate join:

  * LENGTH filter: J(a,b) >= t  =>  t*|a| <= |b| <= |a|/t.
  * POSITIONAL filter (PPJoin): a shared element at (1-based) prefix
    positions (pa, pb) bounds the overlap by
    O <= min(pa, pb) - 1 + 1 + min(|a|-pa, |b|-pb); the pair survives if
    ANY shared prefix element's bound reaches the required overlap
    alpha = ceil(t/(1+t) * (|a|+|b|)).  The earliest shared element gives
    the weakest (valid) bound, so true pairs always survive.

Exact verification (sorted-array intersection on the full sets) then
removes false positives.  Everything is hash-partitioned equi-join work —
no cartesian, no corpus broadcast.  Join keys and verification arrays use
xxhash64 of the shingle (8-byte longs instead of ~25-byte strings through
every shuffle); exactness is up to 64-bit collisions, the same contract as
the md5-hashed MinHash stack in operators/dedup.py (and empirically exact:
the DuckDB oracle compares STRING-set Jaccard and hash-matches at driver
scale factors).

Sets are 3-gram word shingles (window of 3 consecutive lowercase
whitespace tokens) — the same granularity as the MinHash/SimHash stack;
this operator is the EXACT counterpart used to validate those approximate
near-dup paths, part of the training-data-curation surface the brief
mandates (n-gram Jaccard dedup).  The reference engine (a pandas ELB ETL)
has no set-similarity join; this extends the curation surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "words_array",
    "shingles_from_words",
    "shingle_set",
    "distinct_shingles",
    "prefix_filtered_jaccard_join",
]


def words_array(text: Column) -> Column:
    """Lowercase whitespace tokens, empty strings dropped.
    SQL twin: list_filter(regexp_split_to_array(lower(x), '\\s+'),
    t -> t != '')."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


def shingles_from_words(w: Column, n: int = 3) -> Column:
    """Distinct n-word shingles from an ALREADY-MATERIALIZED word-array
    column.  Keep the word array a real projected attribute: lambda bodies
    of higher-order functions block common-subexpression elimination, so
    inlining the split() here re-tokenizes the document once per shingle
    reference — measured 4x slower on the sf0.1 corpus (11 s -> 2.7 s for
    the exploded spine).

    SQL twin (n=3, 1-based): list_distinct(list_transform(
    generate_series(1, len(w)-2), i -> w[i] || ' ' || w[i+1] || ' ' ||
    w[i+2]))."""
    sh = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)]),
    )
    return F.when(F.size(w) >= n, F.array_distinct(sh))


def shingle_set(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of the lowercase whitespace tokenization.
    Docs with fewer than n words yield NULL (excluded upstream).

    Convenience single-expression form for tests/small frames; hot paths
    should project words_array() first and call shingles_from_words()
    (see that docstring for why)."""
    return shingles_from_words(words_array(text), n)


def distinct_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, tok) exploded distinct-shingle rows — the shared relational
    spine for frequency ordering, prefix extraction, and verification."""
    w = df.select(F.col(id_col).alias("id"), words_array(F.col(text_col)).alias("w"))
    return w.select("id", F.explode(shingles_from_words(F.col("w"), n)).alias("tok"))


def prefix_filtered_jaccard_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    n: int = 3,
    toks: DataFrame | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-set Jaccard >= threshold,
    exactly (up to 64-bit shingle-hash collisions; see module docstring).

    Plan shape (all equi-joins / hash aggs; the only window is
    per-DOCUMENT, so it scales with the corpus — no single-partition
    global sort):

      1. one explode + hash agg for global shingle document frequencies
         (on xxhash64 longs);
      2. per-doc window ordered (df_cnt, h) for prefix positions;
      3. prefix rows self-equi-join on h, with the LENGTH and POSITIONAL
         exact prunes applied inside the join, then a pair group-by;
      4. verify: join candidate pairs to the full sorted hash ARRAYS,
         exact |A intersect B| / |A union B|.

    Jaccard emits as a division of two BIGINTs — bit-identical across
    engines, no rounding needed.

    The exploded shingle spine feeds three plan branches (frequencies,
    prefix rows, verification arrays) — it is persisted so the
    tokenize+explode pass runs once (pass your own `toks` from
    distinct_shingles to own the cache lifecycle; at 100 TB swap the
    persist for a parquet checkpoint of the spine).  When the spine is
    created INTERNALLY, the result is pinned eagerly (localCheckpoint) and
    the spine cache released before returning — repeated calls must not
    leak session-lifetime persisted frames; a caller-supplied `toks` keeps
    the result fully lazy and leaves the cache lifecycle to the caller."""
    owns_toks = toks is None
    if owns_toks:
        toks = distinct_shingles(df, id_col, text_col, n).persist()
    hashed = toks.select("id", F.xxhash64("tok").alias("h"))
    freq = hashed.groupBy("h").agg(F.count("*").alias("df_cnt"))

    # Prefix positions under the global (df_cnt, h) rare-first total order.
    w = Window.partitionBy("id").orderBy("df_cnt", "h")
    pos = (
        hashed.join(freq, "h")
        .select(
            "id",
            "h",
            F.row_number().over(w).alias("pos"),
            F.count("*").over(Window.partitionBy("id")).alias("n"),
        )
        # L = |s| - ceil(t*|s|) + 1 (AllPairs prefix bound for Jaccard)
        .where(F.col("pos") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
    )

    a, b = pos.alias("a"), pos.alias("b")
    na, nb = F.col("a.n"), F.col("b.n")
    pa, pb = F.col("a.pos"), F.col("b.pos")
    alpha = F.ceil(F.lit(threshold / (1.0 + threshold)) * (na + nb))
    cand = (
        a.join(b, F.col("a.h") == F.col("b.h"))
        .where(
            (F.col("a.id") < F.col("b.id"))
            # length filter: t*|a| <= |b| <= |a|/t
            & (nb >= F.ceil(F.lit(threshold) * na))
            & (nb <= F.floor(na / F.lit(threshold)))
            # positional filter: overlap upper bound must reach alpha
            & (F.least(pa, pb) + F.least(na - pa, nb - pb) >= alpha)
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.first(na).alias("n_a"), F.first(nb).alias("n_b"))
    )

    arrays = hashed.groupBy("id").agg(F.sort_array(F.collect_list("h")).alias("hs"))
    verified = (
        cand.join(arrays.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(arrays.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("hs_a", "hs_b")).cast("long").alias("n_common"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    if owns_toks:
        verified = verified.localCheckpoint(eager=True)
        toks.unpersist()
    return verified
