"""PII detection and redaction for training-data curation: emails, phone
numbers, and IPv4 addresses found in document text are counted and replaced
with typed placeholder tokens.

Pure Column expressions (regexp_count / regexp_replace) — a single narrow
projection over the corpus scan, no shuffle, no Python. The patterns are
deliberately restricted to constructs whose semantics are identical between
Java regex (Spark) and RE2 (the DuckDB oracle): character classes, bounded
and open counted repetition, non-capturing groups, and \\b word boundaries.

No reference analog (the reference pipeline redacts nothing); this is one of
the LLM-data-pipeline extensions the engine treats as first-class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Conservative email shape: localpart@domain.tld (2+ letter TLD).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

#: North-American-style dashed phone: NNN-NNN-NNNN on word boundaries.
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"

#: Dotted-quad IPv4 (permissive octets — redaction favors recall).
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def redact_text(text: Column) -> Column:
    """Replace every email, then phone, then IPv4 with its placeholder.

    Order matters only in that emails are consumed first so their digit/dot
    substrings can never be re-matched by the later patterns."""
    red = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    red = F.regexp_replace(red, PHONE_RE, PHONE_TOKEN)
    return F.regexp_replace(red, IPV4_RE, IP_TOKEN)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted_text",
) -> DataFrame:
    """Count each PII category in the ORIGINAL text, then append the
    redacted text. Counts are taken pre-redaction so they report what was
    found, not what survived earlier replacement passes."""
    t = F.col(text_col)
    return (
        df.withColumn("n_emails", F.regexp_count(t, F.lit(EMAIL_RE)).cast("long"))
        .withColumn("n_phones", F.regexp_count(t, F.lit(PHONE_RE)).cast("long"))
        .withColumn("n_ipv4", F.regexp_count(t, F.lit(IPV4_RE)).cast("long"))
        .withColumn(out_col, redact_text(t))
    )
