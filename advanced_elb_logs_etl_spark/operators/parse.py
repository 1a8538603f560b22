"""ALB access-log line parser (P1-P9, P11; F1).

Reference: parse_log_entry (/root/reference/advanced_elb_logs_etl.py:77-153)
— row-at-a-time Python: shlex.split + datetime.strptime + urlparse per line.
Here the whole function compiles to ONE Column-expression projection over the
raw text scan: the CSV tokenizer (JVM), try_to_timestamp, and regex/string
builtins all run inside whole-stage codegen. No Python executes per row.

Tokenizer (P1): Spark's CSV parser with space separator and double-quote
quoting is shlex-equivalent for well-formed ALB lines (space-delimited,
quoted multi-token fields, quotes stripped). Known divergences on
non-ALB-shaped adversarial input, each pinned by tests/test_parse.py:
- backslash escapes: shlex(posix) processes them, CSV does not (ALB never
  emits backslashes outside quoted payloads);
- adjacent quoted segments ('a"b"c'): shlex concatenates, CSV does not;
- whitespace RUNS / tabs outside quotes: shlex collapses them, the CSV
  tokenizer would emit an empty token per extra space and silently shift
  every later column binding. Such lines are therefore REJECTED here (the
  `line_ok` gate below): the reference parses them, we drop them — a safe,
  documented divergence (ALB emits exactly one space between fields;
  a whitespace run means a corrupt line, and a misaligned bind would be
  far worse than a drop).

Arity (P2): token count is computed by blanking quoted spans and counting
separators — lines with fewer than 29 tokens are dropped, extras beyond the
29 bound columns are ignored (dict(zip(...)) truncation, reference :82 —
which also drops the modern 30th TID_ field; replicated).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import is_bot, to_float_col
from ..functions import useragent as _ua

#: The 29 positionally-bound raw columns (reference ELB_LOG_COLUMNS :43-49).
ELB_LOG_COLUMNS = [
    "type", "time", "elb", "client_ip_port", "target_ip_port",
    "request_processing_time", "target_processing_time",
    "response_processing_time", "elb_status_code", "target_status_code",
    "received_bytes", "sent_bytes", "request", "user_agent", "ssl_cipher",
    "ssl_protocol", "target_group_arn", "trace_id", "domain_name",
    "chosen_cert_arn", "matched_rule_priority", "request_creation_time",
    "actions_executed", "redirect_url", "error_reason", "target_port_list",
    "target_status_code_list", "classification", "classification_reason",
]

# 29 bound fields + the modern 30th (TID_). Tokens beyond the declared
# schema are DROPPED by PERMISSIVE mode regardless of width, so extra
# headroom buys nothing and each declared column costs parse time
# (~20% at 1M lines going 40 -> 30); c29 itself is never bound.
_MAX_TOKENS = 30
_CSV_SCHEMA = ", ".join(f"c{i} string" for i in range(_MAX_TOKENS))
# Sentinel that can never appear in a log line: keeps quoted-empty fields as
# '' (shlex parity) instead of the CSV default of null.
_CSV_OPTIONS = {"sep": " ", "quote": '"', "nullValue": "\u0001", "mode": "PERMISSIVE"}

_TS_FMT_FRAC = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
_TS_FMT_SEC = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def _blank_quoted(value: Column) -> Column:
    """The line with quoted spans collapsed to 'Q' — the shared basis for
    token counting and the whitespace-run malformation gate."""
    return F.regexp_replace(F.trim(value), '"[^"]*"', "Q")


def token_count(value: Column) -> Column:
    """Number of shlex-style tokens: blank out quoted spans, count separators.
    (Differential-test surface; the parse hot path uses the fused
    ``line_ok`` gate instead — one regex pass rather than replace+split.)"""
    return F.size(F.split(_blank_quoted(value), " "))


#: >= 29 nonempty single-space-separated tokens, no tabs: one anchored linear
#: regex over the blanked line fuses the arity gate (F1) with the
#: whitespace-run rejection — equivalent to `token_count >= 29 AND no
#: run/tab` because with no runs every token is nonempty, and ~2x cheaper
#: than computing them separately (each re-blanked the line).
_LINE_OK_RE = f"^[^ \\t]+( [^ \\t]+){{{len(ELB_LOG_COLUMNS) - 1},}}$"


def line_ok(value: Column) -> Column:
    """Fused malformation gate: arity (>= 29 tokens, module docstring) plus
    whitespace-run/tab rejection, one rlike over the quote-blanked line."""
    return _blank_quoted(value).rlike(_LINE_OK_RE)


def parse_timestamp_utc(raw: Column) -> Column:
    """ALB timestamp parse (P5, reference :86-98): try fractional-seconds
    format then whole-seconds; unparseable -> null (row dropped by caller).
    Produces a UTC instant; Eastern wall-clock presentation is applied at
    the feature/sink layer (functions.scalars.time_to_eastern), never via
    session timezone. Assumes a UTC session (session.apply_runtime_confs)."""
    return F.coalesce(
        F.try_to_timestamp(raw, F.lit(_TS_FMT_FRAC)),
        F.try_to_timestamp(raw, F.lit(_TS_FMT_SEC)),
    )


def timestamp_token_ok(raw: Column) -> Column:
    """Cheap EXACT twin of 'the bound c1 timestamp parses' over the raw
    line, so the row drop can ride the same pushed-down filter as
    ``line_ok`` instead of a post-projection filter (which Catalyst
    rewrites by substituting the whole from_csv expression into the
    predicate — measured from_csv x5 in the physical plan, 2.8 s vs
    0.7 s for the parse at sf0.1).

    The twin locates the CSV field-1 token with bounded string ops
    (never the full CSV parse) and replicates the tokenizer's quote
    handling just enough to be verdict-identical on line_ok-passing
    lines.  Locating field 1 requires knowing where field 0 ENDS, and
    the tokenizer's handling of a quote-corrupted field 0 was pinned
    empirically (univocity via from_csv, PERMISSIVE + STOP_AT_DELIMITER
    defaults; every bullet is a case in
    tests/test_parse.py::test_timestamp_token_twin_matches_csv_verdict):

    - field 0 does not start with a quote: quotes inside it are literal
      and the field ends at the first space -> field 1 is naive token 1;
    - field 0 starts with a quote and the line has NO second quote: the
      open quote consumes the rest of the line, c1 is null -> reject
      (the reference's shlex raises on the same input, :95-97);
    - field 0 starts with a quote and a second quote exists: whether the
      quoting is well-formed ('"h2 x" ...'), closed-then-junk
      ('"h2"x ...'), doubled ('"h2""x" ...'), or immediately re-opened
      ('""h2 ...'), the tokenizer always begins field 1 after the FIRST
      SPACE FOLLOWING THE SECOND QUOTE character; no such space means
      field 0 ate the line -> c1 null -> reject.

    The extracted token then gets the field-level quote treatment:

    - unquoted token: identical to the CSV-bound c1 (the nullValue
      sentinel string fails the parse exactly like the null it becomes);
    - properly quoted token ("X"): strip the boundary quotes. Doubled-
      quote escapes are NOT unescaped, but any content containing a
      quote fails both timestamp formats under either reading;
    - unterminated quote ("X with no closing quote inside the token):
      the CSV field consumes later tokens too, so the bound c1 contains
      a space and can never match either space-free format -> reject,
      same verdict. (line_ok guarantees >= 29 post-blanking tokens, so
      an unterminated quote this late always has trailing tokens to
      swallow — the c1-parses-at-EOL divergence is unreachable.)
    - a token that parses must be timestamp-shaped, hence quote-free and
      space-free, hence byte-identical to c1 -> c1 parses identically.

    tests/test_parse.py::test_timestamp_token_twin_matches_csv_verdict
    pins the equivalence over the adversarial corpus (field-0 x field-1
    shape cross product).
    """
    # Field-1 token when field 0 is unquoted: naive token 1.
    tok1 = F.get(F.split(raw, " ", 3), 1)
    # Field-1 token when field 0 starts with a quote: the token after
    # the first space that follows the SECOND quote char (see docstring).
    starts0 = raw.startswith('"')
    after_open = F.substr(raw, F.lit(2))
    q2 = F.instr(after_open, '"')  # 1-based; 0 = no second quote
    after_q2 = F.substr(after_open, q2 + 1)
    sp = F.instr(after_q2, " ")  # 0 = field 0 consumed the line
    tok_q0 = F.get(F.split(F.substr(after_q2, sp + 1), " ", 2), 0)
    tok = F.when(~starts0, tok1).when((q2 > 0) & (sp > 0), tok_q0)
    # tok is NULL on the reject branches; NULL AND FALSE below is FALSE.
    starts = tok.startswith('"')
    ends = tok.endswith('"') & (F.length(tok) >= 2)
    stripped = F.when(
        starts & ends, F.substring(tok, 2, F.length(tok) - 2)
    ).otherwise(tok)
    partial = starts & ~ends
    return F.coalesce(
        ~partial & parse_timestamp_utc(stripped).isNotNull(), F.lit(False)
    )


def _parse_request(request: Column) -> dict[str, Column]:
    """HTTP request decomposition (P8/P9, reference :111-121).

    'METHOD URL VERSION' -> parts; anything else -> ('Unknown', '', '') with
    null URL components. URL decomposition mirrors urlparse: scheme, LOWERCASED
    hostname, numeric port, path, query. A URL with no '<scheme>://' is all
    path (urlparse('-')-> path='-'), matching the reference's fallback data.
    """
    parts = F.split(request, " ", 3)
    ok = F.size(parts) == 3
    method = F.when(ok, parts.getItem(0)).otherwise(F.lit("Unknown"))
    url = F.when(ok, parts.getItem(1)).otherwise(F.lit(""))
    version = F.when(ok, parts.getItem(2)).otherwise(F.lit(""))

    has_scheme = url.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    protocol = F.when(ok & has_scheme, F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))).when(
        ok, F.lit("")
    )
    # (?:[^/@?#]*@)? skips userinfo — urlparse.hostname is the part after
    # the last '@' in the authority ('http://u:p@host' -> 'host').
    hostname = F.when(
        ok & has_scheme,
        F.lower(F.nullif(
            F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#@]*)", 1),
            F.lit(""),
        )),
    )
    port = F.when(
        ok & has_scheme,
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?[^/:?#@]*:(\d+)", 1),
    ).try_cast("int")
    path = (
        F.when(ok & has_scheme, F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
        .when(ok, F.regexp_replace(url, r"[?#].*$", ""))
    )
    query = F.when(ok, F.regexp_extract(url, r"\?([^#]*)", 1))
    return {
        "http_method": method,
        "full_url": url,
        "http_version": version,
        "protocol": protocol,
        "hostname": hostname,
        "port": port,
        "path": path,
        "query_params": query,
    }


def parse_alb_lines(
    df: DataFrame,
    value_col: str = "value",
    source_col: str = "log_source_file",
    observation=None,
) -> DataFrame:
    """Raw lines -> typed parsed table (the Spark form of parse_log_entry).

    Drop semantics (F1, reference :80-81,:95-97): lines with < 29 tokens and
    lines whose timestamp fails both formats are removed. Output: the 29 raw
    string columns + time (UTC instant) + derived columns, matching
    FIXTURES.md §F2.

    Pass a ``pyspark.sql.Observation`` as ``observation`` to get the
    reference's malformed-line accounting (its per-entry warning log,
    reference :95-97) without a second pass: after any action on the result,
    ``observation.get`` holds ``lines_in`` and ``lines_rejected`` (tokenizer
    arity/whitespace gate), collected by the executors during the SAME scan
    — the distributed replacement for driver-side log counting.
    """
    value = F.trim(F.col(value_col))
    has_source = source_col in df.columns

    # Both drops (tokenizer gate F1 + timestamp gate, reference :80-97)
    # ride ONE pushed-down filter over cheap expressions; the expensive
    # from_csv runs exactly once, in the post-filter projection.  A
    # post-projection `.filter(time.isNotNull())` instead makes Catalyst
    # substitute from_csv+parse into the predicate (and into every later
    # filter) — measured from_csv x5 in the physical plan and a 4x slower
    # parse; timestamp_token_ok is the proven-exact cheap twin.
    gated = df.select(
        *( [F.col(source_col)] if has_source else [] ),
        value.alias("_raw"),
        line_ok(value).alias("_line_ok"),
    )
    if observation is not None:
        gated = gated.observe(
            observation,
            F.count(F.lit(1)).alias("lines_in"),
            F.count_if(~F.col("_line_ok")).alias("lines_rejected"),
        )
    gated = gated.filter(F.col("_line_ok") & timestamp_token_ok(F.col("_raw")))

    tokenized = gated.select(
        *( [F.col(source_col)] if has_source else [] ),
        F.from_csv(F.col("_raw"), _CSV_SCHEMA, _CSV_OPTIONS).alias("_t"),
    )

    raw_cols = [
        F.col(f"_t.c{i}").alias(name) for i, name in enumerate(ELB_LOG_COLUMNS) if name != "time"
    ]
    time_col = parse_timestamp_utc(F.col("_t.c1")).alias("time")

    parsed = tokenized.select(
        time_col,
        *raw_cols,
        *( [F.col(source_col)] if has_source else [F.lit(None).cast("string").alias(source_col)] ),
    )

    req = _parse_request(F.col("request"))
    rpt = to_float_col("request_processing_time")
    tpt = to_float_col("target_processing_time")
    resppt = to_float_col("response_processing_time")

    out = parsed.select(
        "*",
        # P6 — replicates the reference's IPv4-only split(':')[0] (:101);
        # IPv6 addresses are truncated at the first colon there too.
        F.substring_index("client_ip_port", ":", 1).alias("client_ip"),
        *[expr.alias(name) for name, expr in req.items()],
        # P7 — null if ANY component is null ('+' null-propagates).
        F.round((rpt + tpt + resppt) * 1000, 3).alias("total_processing_time_ms"),
    )

    # P10 — user_agents-library parity when the lib is importable (one
    # Arrow-batched UDF call, expanded from a single struct column), else
    # the pure-Column regex classifier (whole-stage codegen, no Python).
    # Checked at call time so tests can exercise the library path with an
    # injected module.
    if _ua.HAVE_UA_LIB:
        out = (
            out.withColumn("_uafam", _ua.make_ua_families_udf()(F.col("user_agent")))
            .withColumn("ua_browser_family", F.col("_uafam.browser_family"))
            .withColumn("ua_os_family", F.col("_uafam.os_family"))
            .drop("_uafam")
        )
    else:
        out = out.withColumn(
            "ua_browser_family", _ua.ua_browser_family(F.col("user_agent"))
        ).withColumn("ua_os_family", _ua.ua_os_family(F.col("user_agent")))
    return out.withColumn("is_bot", is_bot(F.col("user_agent")))
