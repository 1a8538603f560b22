"""User-agent family extraction (P10, reference :123-131).

The reference uses the `user-agents` library (requirements.txt:5); its family
strings are library-defined. That library is not available in this
environment, so:

- If `user_agents` is importable, we wrap it in an Arrow-vectorized
  pandas_udf — byte-for-byte reference parity.
- Otherwise we fall back to a deterministic regex classifier covering the
  major browser/OS families, implemented as PURE Column expressions (faster
  than any UDF — stays in whole-stage codegen). Family strings for the
  common agents (Chrome, Firefox, Safari, Edge, IE, Opera, curl,
  python-requests, Googlebot, bingbot) match the library's output; exotic
  agents may differ (documented divergence, SURVEY.md §7.3 item 5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # pragma: no cover - availability depends on environment
    import user_agents as _ua_lib
except Exception:  # ModuleNotFoundError in this container
    _ua_lib = None

HAVE_UA_LIB = _ua_lib is not None

_UNKNOWN = "Unknown"

# Ordered (pattern, family) rules — first match wins, mirroring how
# ua-parser's regexes are ordered most-specific-first.
_BROWSER_RULES: list[tuple[str, str]] = [
    (r"(?i)googlebot", "Googlebot"),
    (r"(?i)bingbot", "bingbot"),
    (r"(?i)yandex", "YandexBot"),
    (r"(?i)duckduckbot", "DuckDuckBot"),
    (r"(?i)baiduspider", "Baiduspider"),
    (r"(?i)python-urllib", "Python-urllib"),
    (r"(?i)python-requests", "Python Requests"),
    (r"(?i)curl/", "curl"),
    (r"(?i)wget", "Wget"),
    (r"Edg(e|A|iOS)?/", "Edge"),
    (r"OPR/|Opera", "Opera"),
    (r"SamsungBrowser/", "Samsung Internet"),
    (r"CriOS/", "Chrome Mobile iOS"),
    (r"FxiOS/", "Firefox iOS"),
    (r"Chrome/.*Mobile", "Chrome Mobile"),
    (r"Chrome/", "Chrome"),
    (r"Firefox/", "Firefox"),
    (r"MSIE |Trident/", "IE"),
    (r"Mobile/.*Safari/", "Mobile Safari"),
    (r"Safari/", "Safari"),
]

_OS_RULES: list[tuple[str, str]] = [
    (r"Windows NT 10", "Windows"),
    (r"Windows NT", "Windows"),
    (r"Windows Phone", "Windows Phone"),
    (r"Android", "Android"),
    (r"iPhone|iPad|iPod", "iOS"),
    (r"Mac OS X", "Mac OS X"),
    (r"CrOS", "Chrome OS"),
    (r"Linux", "Linux"),
]


#: Cheap pre-gate: every non-browser rule's trigger vocabulary in one scan.
#: Browser UAs (the overwhelming majority of web traffic) fail this single
#: regex and skip the 9-rule bot/tool chain entirely — the CASE chain
#: evaluates sequentially, so ordering + gating is the whole perf story for
#: a 100 TB parse (measured ~2x on the derived-column stage).
_NONBROWSER_GATE = r"(?i)bot|spider|crawl|urllib|requests|curl|wget|yandex"


def _rules_to_column(ua: Column, rules: list[tuple[str, str]]) -> Column:
    expr = F.lit(_UNKNOWN)
    for pattern, family in reversed(rules):
        expr = F.when(ua.rlike(pattern), F.lit(family)).otherwise(expr)
    return expr


def ua_browser_family(ua: Column) -> Column:
    """Browser family; '-'/''/null -> 'Unknown' (reference :129-131)."""
    blank = ua.isNull() | (ua == "-") | (ua == "")
    nonbrowser = [(p, f) for p, f in _BROWSER_RULES if p.startswith("(?i)")]
    browser = [(p, f) for p, f in _BROWSER_RULES if not p.startswith("(?i)")]
    chain = F.when(ua.rlike(_NONBROWSER_GATE), _rules_to_column(ua, nonbrowser + browser)
                   ).otherwise(_rules_to_column(ua, browser))
    return F.when(blank, F.lit(_UNKNOWN)).otherwise(chain)


def ua_os_family(ua: Column) -> Column:
    """OS family; '-'/''/null -> 'Unknown'."""
    blank = ua.isNull() | (ua == "-") | (ua == "")
    return F.when(blank, F.lit(_UNKNOWN)).otherwise(_rules_to_column(ua, _OS_RULES))


def make_ua_families_udf(ua_module=None):
    """Build the Arrow-vectorized pandas_udf around ``user_agents.parse`` —
    byte-for-byte reference parity (advanced_elb_logs_etl.py:123-131:
    blank/'-' -> Unknown, ``.browser.family or 'Unknown'``,
    ``.os.family or 'Unknown'``).

    ``ua_module`` lets tests inject a parse-compatible fake so the Arrow
    wrapper (batching, null handling, struct output) is exercised even where
    the real library is absent; production callers omit it."""
    mod = ua_module if ua_module is not None else _ua_lib
    if mod is None:
        raise ImportError(
            "user_agents is not installed; use the regex fallback "
            "(ua_browser_family / ua_os_family) instead"
        )

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # No type hints on purpose: `from __future__ import annotations` turns
    # them into strings pandas_udf can't resolve from a nested scope; the
    # explicit returnType makes this a legacy SCALAR struct udf.
    @pandas_udf("browser_family string, os_family string")
    def ua_families_udf(ua):
        def one(s):
            if not s or s == "-":
                return (_UNKNOWN, _UNKNOWN)
            parsed = mod.parse(s)
            return (parsed.browser.family or _UNKNOWN, parsed.os.family or _UNKNOWN)

        pairs = ua.map(one)
        return pd.DataFrame(
            {"browser_family": pairs.map(lambda t: t[0]), "os_family": pairs.map(lambda t: t[1])}
        )

    return ua_families_udf
