"""Named rule-filter batteries for corpus curation — the Gopher quality
rules (Rae et al. 2021, arXiv:2112.11446 §A1.1) and the C4 cleaning
rules (Raffel et al. 2020, arXiv:1910.10683 §2.2), both public methods
that large-scale training-data pipelines run between the cheap
heuristics (text.quality_score) and the trained scorer
(classifier.classifier_scores).

Unlike the composite quality score, these emit ONE BOOLEAN PER NAMED
RULE plus the conjunction, so a pipeline can audit exactly which rule
removed a document and tune thresholds per-rule — the operational shape
the published pipelines describe.

Everything is pure Column math over one projection (whole-stage codegen,
no UDF, no shuffle): ratios are exact integer-count divisions (single
IEEE op on identical integer pairs — cross-engine deterministic, the
repo's standard float discipline), so the battery is SQL-twinnable
value-for-value.  Intended r8 catalog entry: `gopher_rules_battery`
(reserved-slot queue position; SQL twin sketch in each docstring).

At 100 TB: one narrow projection per document; line-level rules fold
over the split-lines array per row — no explode, no state, output is
input-row-count with ~12 boolean/ratio columns.  Trivially
partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import tokens

__all__ = [
    "gopher_quality_flags",
    "c4_line_stats",
    "rule_filter_battery",
]

#: Gopher §A1.1 stopword-presence list ("must contain >= 2 of").
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

#: Bullet prefixes the bullet-line rule counts (Gopher uses the literal
#: bullet glyph and dash-like starts; fixtures use - and *).
_BULLET_RE = r"^\s*([-*•●])"


def _ratio(num: Column, den: Column) -> Column:
    """Exact-integer ratio with the 0-denominator convention -> 0.0."""
    return F.when(
        den > 0, num.cast("double") / den.cast("double")
    ).otherwise(F.lit(0.0))


def gopher_quality_flags(text: Column) -> dict[str, Column]:
    """The Gopher rule set as named boolean Columns (True = rule PASSES,
    i.e. the document survives that rule):

    - word_count_ok:     50 <= |words| <= 100_000
    - mean_word_len_ok:  3 <= mean word length <= 10
    - symbol_ratio_ok:   (# of '#' or '...' occurrences) / |words| <= 0.1
    - bullet_lines_ok:   fraction of lines starting with a bullet <= 0.9
    - ellipsis_lines_ok: fraction of lines ending with '...' <= 0.3
    - alpha_words_ok:    fraction of words containing >= 1 [A-Za-z] >= 0.8
    - stopwords_ok:      document contains >= 2 distinct Gopher stopwords

    SQL twins (DuckDB), with toks = regexp_split_to_array(trim(text),
    '\\s+') and lines = string_split(text, chr(10)):
      word_count_ok:  len(toks) BETWEEN 50 AND 100000
      mean_word_len_ok: (sum lengths)/len(toks) BETWEEN 3 AND 10
      symbol_ratio_ok: (length(text) - length(replace(text,'#','')))
                       + floor over '...' counts, / len(toks) <= 0.1
      bullet/ellipsis: list_sum(list_transform(lines, l -> CASE WHEN
                       regexp_matches(...) THEN 1 ELSE 0 END)) ratios
      alpha_words_ok:  len(list_filter(toks, t ->
                       regexp_matches(t, '[A-Za-z]'))) / len(toks) >= 0.8
      stopwords_ok:    len(list_intersect(list_transform(toks, t ->
                       lower(t)), [stopwords])) >= 2
    """
    toks = tokens(text)
    n_words = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    mean_len = _ratio(total_len, n_words)
    # symbol occurrences: '#' chars + non-overlapping '...' runs
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ellipsis = F.size(F.split(text, r"\.\.\.")) - 1
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(_BULLET_RE)))
    n_ell_end = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$")))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    return {
        "word_count_ok": (n_words >= 50) & (n_words <= 100_000),
        "mean_word_len_ok": (mean_len >= 3.0) & (mean_len <= 10.0),
        "symbol_ratio_ok": _ratio(n_hash + n_ellipsis, n_words) <= 0.1,
        "bullet_lines_ok": _ratio(n_bullet, n_lines) <= 0.9,
        "ellipsis_lines_ok": _ratio(n_ell_end, n_lines) <= 0.3,
        "alpha_words_ok": _ratio(n_alpha, n_words) >= 0.8,
        "stopwords_ok": n_stop >= 2,
    }


def c4_line_stats(text: Column) -> dict[str, Column]:
    """The C4 document-level cleaning signals as named Columns:

    - n_sentences:        terminal-punctuation-ended lines work at the
                          line granularity here (the C4 paper filters
                          lines, then requires >= 3 sentences; the
                          sentence proxy is '.'/'!'/'?' occurrences)
    - terminal_lines_ok:  fraction of lines ending in .!?" >= 0.5
    - min_sentences_ok:   n_sentences >= 3
    - no_lorem_ipsum:     lowercase text does not contain 'lorem ipsum'
    - no_curly_brace:     text does not contain '{' (code marker)
    """
    low = F.lower(text)
    n_sent = F.length(F.regexp_replace(text, r"[^.!?]", ""))
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    n_terminal = F.size(F.filter(lines, lambda l: l.rlike(r'[.!?"]\s*$')))
    return {
        "n_sentences": n_sent.cast("long"),
        "terminal_lines_ok": _ratio(n_terminal, n_lines) >= 0.5,
        "min_sentences_ok": n_sent >= 3,
        "no_lorem_ipsum": ~low.contains("lorem ipsum"),
        "no_curly_brace": ~text.contains("{"),
    }


def rule_filter_battery(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document rule audit: every Gopher flag, every C4 signal, and
    the two conjunctions (`gopher_pass`, `c4_pass`) in ONE narrow
    projection.  Null text fails every boolean rule (null-safe AND via
    coalesce to False) — a null document is removable, not an error."""
    t = F.col(text_col)
    gopher = gopher_quality_flags(t)
    c4 = c4_line_stats(t)

    def _b(c: Column) -> Column:
        return F.coalesce(c, F.lit(False))

    gopher_cols = {k: _b(v) for k, v in gopher.items()}
    c4_bools = {
        k: _b(v) for k, v in c4.items() if k != "n_sentences"
    }
    gopher_pass = None
    for c in gopher_cols.values():
        gopher_pass = c if gopher_pass is None else (gopher_pass & c)
    c4_pass = None
    for c in c4_bools.values():
        c4_pass = c if c4_pass is None else (c4_pass & c)
    return df.select(
        F.col(id_col),
        *[v.alias(k) for k, v in gopher_cols.items()],
        F.coalesce(c4["n_sentences"], F.lit(0)).alias("n_sentences"),
        *[v.alias(k) for k, v in c4_bools.items()],
        gopher_pass.alias("gopher_pass"),
        c4_pass.alias("c4_pass"),
    )
