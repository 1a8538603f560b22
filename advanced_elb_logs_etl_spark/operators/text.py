"""Text-analysis operators for LLM training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All pure Column expressions with exact DuckDB oracle twins — at corpus scale
these run as a single narrow projection over the document scan (no shuffle,
no Python)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import tokens
from ..functions.scalars import dround

#: BPE-ish word-piece pattern: letter runs, digit runs, or single symbols —
#: a deterministic stand-in for a real subword tokenizer's pre-tokenizer.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language marker sets for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Word-piece count under BPE_ISH_PATTERN (regexp_extract_all + size)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)).cast("long")


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    """Stopword tokens / tokens (exact count via filter on the token array)."""
    toks = tokens(text)
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.when(F.size(toks) > 0, stop.cast("double") / F.size(toks).cast("double"))


def mean_token_length(text: Column) -> Column:
    """Average token length — integer char count / integer token count."""
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks).cast("double"))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards mid-length docs and
    moderate stopword density, penalizes punctuation soup. Deterministic
    rational arithmetic (same formula in the SQL oracle)."""
    n_tok = token_count(text).cast("double")
    length_term = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    stop_term = F.least((F.coalesce(stopword_ratio(text), F.lit(0.0))) * 4, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    return (length_term + stop_term + punct_term) / F.lit(3.0)


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language over the distinct token set."""
    toks = F.array_distinct(tokens(text))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax language by marker hits; ties broken by language-code order;
    zero hits -> 'und' (undetermined)."""
    scores = lang_scores(text)
    langs = sorted(scores)  # deterministic tie-break
    best = None
    for lang in langs:
        cond = F.lit(True)
        for other in langs:
            if other == lang:
                continue
            # strictly greater than later langs, >= earlier langs
            cond = cond & (
                (scores[lang] > scores[other])
                if other > lang
                else (scores[lang] >= scores[other])
            )
        expr = F.when((scores[lang] > 0) & cond, F.lit(lang))
        best = expr if best is None else F.coalesce(best, expr)
    return F.coalesce(best, F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercased text —
    the standard 'same modulo whitespace/case' document key."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass projection of the full text-analysis battery."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_wordpieces"),
        F.length(t).cast("long").alias("n_chars_computed"),
        dround(punct_ratio(t), 6).alias("punct_ratio"),
        dround(F.coalesce(stopword_ratio(t), F.lit(0.0)), 6).alias("stopword_ratio"),
        dround(mean_token_length(t), 6).alias("mean_token_len"),
        dround(quality_score(t), 6).alias("quality_score"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def ngram_array(text: Column, n: int) -> Column:
    """All word n-grams in position order WITH multiplicity — unlike
    hashing.shingles() (which distincts for set similarity), repetition
    statistics need occurrence counts. Thin wrapper over the shared
    zip_with kernel (functions/hashing.ngram_fold — see there for the SQL
    twin and the CSE-avoidance rationale)."""
    from ..functions.hashing import ngram_fold, tokens as _tokens

    return ngram_fold(_tokens(text), n)


#: Gopher-style repetition gate thresholds (Rae et al. 2021 table A1 uses
#: 0.30 duplicate-line / 0.20 top-2-gram fractions on natural text; these are
#: tuned to the synthetic corpus so the gate is non-trivially populated).
DUP_TOKEN_MAX = 0.30
TOP_BIGRAM_MAX = 0.08


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition statistics: duplicate-token
    fraction, most-frequent-token fraction, most-frequent-bigram fraction,
    and the resulting quality-gate flag.

    Plan shape (scale contract): tokens/bigrams are built in-row (narrow),
    exploded, then counted with TWO hash aggregations each — (doc, term)
    partial-aggregates map-side before the shuffle, so the wire carries
    per-doc-distinct terms, not raw tokens. The per-doc reduce then needs
    only (doc) rows. No windows, no Python; at 100 TB this is the same
    shape as the shingle pass dedup already runs."""
    from ..functions.hashing import tokens as _tokens

    base = df.select(
        F.col(id_col),
        _tokens(F.col(text_col)).alias("toks"),
        ngram_array(F.col(text_col), 2).alias("bigrams"),
    )
    uni = (
        base.select(id_col, F.explode("toks").alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct_tokens"),
            F.max("cnt").cast("long").alias("top_token_count"),
        )
    )
    bi = (
        base.select(id_col, F.explode("bigrams").alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.max("cnt").cast("long").alias("top_bigram_count"),
        )
    )
    n_tok = F.col("n_tokens").cast("double")
    dup_ratio = (F.col("n_tokens") - F.col("n_distinct_tokens")).cast("double") / n_tok
    top_tok_ratio = F.col("top_token_count").cast("double") / n_tok
    top_bg_ratio = F.coalesce(
        F.col("top_bigram_count").cast("double") / F.col("n_bigrams").cast("double"),
        F.lit(0.0),
    )
    return (
        uni.join(bi, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            "n_distinct_tokens",
            dround(dup_ratio, 6).alias("dup_token_ratio"),
            dround(top_tok_ratio, 6).alias("top_token_ratio"),
            dround(top_bg_ratio, 6).alias("top_bigram_ratio"),
        )
        .withColumn(
            "passes_repetition_gate",
            (F.col("dup_token_ratio") <= DUP_TOKEN_MAX)
            & (F.col("top_bigram_ratio") <= TOP_BIGRAM_MAX),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per group by TF-IDF (tf(term, group) x
    ln(n_groups / n_groups_containing_term)).

    Plan shape: explode -> (group, term) hash agg (map-side combine eats the
    token stream) -> term-level doc-frequency agg over the ALREADY-reduced
    tf frame (tiny) -> broadcast both the df frame and the 1-row group count
    back onto tf -> per-group top-k window over |groups| x |vocab| rows.
    Ranking uses the ROUNDED score (then term) so cross-engine libm ulp
    noise in ln() can't flip a rank."""
    ex = df.select(F.col(group_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = ex.groupBy(group_col, "term").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("n_groups_with_term"))
    totals = df.select(F.countDistinct(group_col).alias("n_groups"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "tfidf",
            dround(
                F.col("tf").cast("double")
                * F.log(
                    F.col("n_groups").cast("double")
                    / F.col("n_groups_with_term").cast("double")
                ),
                6,
            ),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(group_col, "term", "tf", "tfidf", "rank")
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (rolling-hash selection, à la MOSS):
    hash every n-gram shingle in position order, slide a w-window over the
    hash sequence, keep each window's minimum — the distinct set of selected
    hashes is the fingerprint. Guarantees any shared run of >= w+n-1 tokens
    contributes a shared fingerprint, at ~1/w the storage of full shingles.

    Shares the positional-shingle kernel (functions/hashing.py); min() over
    a rows-frame; distinct. Returns (id, fingerprint_hash) rows — exploded,
    join-friendly. Trailing windows shorter than `window` are partial in
    this rows-frame; the SQL oracle uses the identical frame, so both
    engines select the same set.
    """
    from pyspark.sql import Window as W

    from ..functions.hashing import positional_shingle_hash_rows

    hashed = positional_shingle_hash_rows(df, id_col, text_col, n)
    w_roll = W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    picked = hashed.select(F.col(id_col), F.min("h").over(w_roll).alias("fp"))
    return picked.distinct().withColumnRenamed("fp", "fingerprint_hash")
