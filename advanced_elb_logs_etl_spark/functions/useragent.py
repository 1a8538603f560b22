"""User-agent family extraction (P10, reference :123-131).

The reference uses the `user-agents` library (requirements.txt:5); its family
strings are defined by the ua-parser/uap-core project's ordered regex rules
(first match wins, optional ``$1`` family_replacement templates). Neither the
library nor the uap-core ``regexes.yaml`` data file is fetchable in this
offline environment, so:

- If `user_agents` is importable, we wrap it in an Arrow-vectorized
  pandas_udf — byte-for-byte reference parity.
- Otherwise we fall back to a VENDORED, uap-core-STYLE rule table: ordered
  (pattern, family-template) rules written from public knowledge of common
  UA strings and uap-core's documented family outputs, compiled to PURE
  Column expressions (faster than any UDF — the whole chain stays in
  whole-stage codegen). Templates support uap-core's ``$1`` replacement
  (e.g. one rule classifies every ``Yandex<X>Bot`` crawler). The table
  covers the dominant web population — major browsers incl. mobile/webview
  variants, search/social/SEO/AI crawlers, HTTP tooling — and is pinned by
  a golden corpus in tests/test_useragent.py; truly exotic agents may still
  diverge (documented divergence, SURVEY.md §7.3 item 5).
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

# Vendored uap-core-style rule tables. Ordered (pattern, family-template)
# pairs — FIRST match wins, so specific rules (HeadlessChrome, Chromium
# derivatives, iOS ports) precede the generic token they also contain
# (Chrome/Safari). A template containing "$1" substitutes the pattern's
# first capture group, mirroring uap-core's family_replacement.
#
# Split in two: the crawler/tooling table is consulted only behind the
# _NONBROWSER_GATE pre-filter (see below); the browser-UI table runs on
# every row.
_BOT_TOOL_RULES: list[tuple[str, str]] = [
    # search-engine crawlers
    (r"Googlebot-Image", "Googlebot-Image"),
    (r"Googlebot-News", "Googlebot-News"),
    (r"Googlebot-Video", "Googlebot-Video"),
    (r"(?i)googlebot", "Googlebot"),
    (r"Mediapartners-Google", "Mediapartners-Google"),
    (r"AdsBot-Google-Mobile", "AdsBot-Google-Mobile"),
    (r"AdsBot-Google", "AdsBot-Google"),
    (r"APIs-Google", "APIs-Google"),
    (r"Storebot-Google", "Storebot-Google"),
    (r"Google-InspectionTool", "Google-InspectionTool"),
    (r"BingPreview/", "BingPreview"),
    (r"(?i)bingbot", "bingbot"),
    (r"(?i)msnbot", "msnbot"),
    (r"(?i)baiduspider", "Baiduspider"),
    # one $1 rule covers YandexBot, YandexImages, YandexMobileBot, ...
    (r"(Yandex[A-Za-z]*)/\d", "$1"),
    (r"(?i)yandex", "YandexBot"),
    (r"DuckDuckGo-Favicons-Bot", "DuckDuckGo-Favicons-Bot"),
    (r"(?i)duckduckbot", "DuckDuckBot"),
    (r"Applebot", "Applebot"),
    (r"SeznamBot", "SeznamBot"),
    # social / messaging preview fetchers
    (r"Twitterbot", "Twitterbot"),
    (r"Slackbot", "Slackbot"),
    (r"Slack-ImgProxy", "Slack-ImgProxy"),
    (r"LinkedInBot", "LinkedInBot"),
    (r"Discordbot", "Discordbot"),
    (r"TelegramBot", "TelegramBot"),
    (r"facebookexternalhit", "facebookexternalhit"),
    (r"WhatsApp/", "WhatsApp"),
    # SEO / archive / AI-training crawlers
    (r"AhrefsBot", "AhrefsBot"),
    (r"SemrushBot", "SemrushBot"),
    (r"MJ12bot", "MJ12bot"),
    (r"DotBot", "DotBot"),
    (r"PetalBot", "PetalBot"),
    (r"Bytespider", "Bytespider"),
    (r"GPTBot", "GPTBot"),
    (r"ChatGPT-User", "ChatGPT-User"),
    (r"ClaudeBot", "ClaudeBot"),
    (r"CCBot", "CCBot"),
    (r"Amazonbot", "Amazonbot"),
    (r"ia_archiver", "ia_archiver"),
    (r"UptimeRobot", "UptimeRobot"),
    # HTTP tooling / SDKs
    (r"(?i)python-requests", "Python Requests"),
    (r"(?i)python-urllib", "Python-urllib"),
    (r"python-httpx|httpx/", "python-httpx"),
    (r"aiohttp/", "aiohttp"),
    (r"(?i)curl/", "curl"),
    (r"(?i)wget", "Wget"),
    (r"Go-http-client", "Go-http-client"),
    (r"okhttp", "okhttp"),
    (r"^Java/", "Java"),
    (r"Apache-HttpClient", "Apache-HttpClient"),
    (r"libwww-perl", "libwww-perl"),
    (r"PostmanRuntime", "PostmanRuntime"),
    (r"insomnia/", "insomnia"),
    (r"axios/", "axios"),
    (r"node-fetch", "node-fetch"),
    (r"Scrapy/", "Scrapy"),
    (r"PhantomJS", "PhantomJS"),
]

# Browser rules are split in two chains: _RARE_BROWSER_RULES (Chromium
# derivatives, Opera/Edge variants, iOS ports, webview tokens — each
# guaranteed to contain a _RARE_BROWSER_GATE token) run only behind a
# single gate scan; _COMMON_BROWSER_RULES (the Chrome/Firefox/Safari/IE
# population that dominates real traffic) run on every row. A mainstream
# Chrome UA therefore evaluates ~9 regexes instead of ~35. The rare chain
# falls through into the common chain, so ordering semantics are identical
# to one flat first-match-wins list.
_RARE_BROWSER_RULES: list[tuple[str, str]] = [
    # automation / shells that embed a Chrome token
    (r"HeadlessChrome/", "HeadlessChrome"),
    (r"Electron/", "Electron"),
    # Chromium derivatives (all also carry Chrome/ and Safari/)
    (r"YaBrowser/", "Yandex Browser"),
    (r"Whale/", "Whale"),
    (r"Vivaldi/", "Vivaldi"),
    (r"Brave/", "Brave"),
    (r"Maxthon", "Maxthon"),
    (r"Silk/", "Amazon Silk"),
    (r"Puffin/", "Puffin"),
    (r"UCBrowser|UC Browser|UCWEB", "UC Browser"),
    (r"QQBrowser", "QQ Browser"),
    (r"MiuiBrowser/", "MiuiBrowser"),
    (r"HuaweiBrowser/", "HuaweiBrowser"),
    (r"SamsungBrowser/", "Samsung Internet"),
    # Opera family
    (r"Opera Mini", "Opera Mini"),
    (r"Opera Mobi", "Opera Mobile"),
    (r"OPR/", "Opera"),
    (r"Opera", "Opera"),
    # Edge family (EdgA = Android, EdgiOS = iOS, Edg/Edge = desktop)
    (r"EdgiOS/", "Edge Mobile"),
    (r"EdgA/", "Edge Mobile"),
    (r"Edg(e)?/", "Edge"),
    # iOS ports of Chrome/Firefox
    (r"FxiOS/", "Firefox iOS"),
    (r"CriOS/", "Chrome Mobile iOS"),
    # Android WebView's explicit token
    (r"; ?wv\).*Chrome/", "Chrome Mobile WebView"),
    (r"CrMo/", "Chrome Mobile"),
    (r"Chromium/", "Chromium"),
    (r"IEMobile", "IE Mobile"),
]

#: one scan deciding whether the rare chain can match at all — every rule
#: above contains at least one of these tokens (pinned by test)
_RARE_BROWSER_GATE = (
    r"HeadlessChrome|Electron|YaBrowser|Whale|Vivaldi|Brave|Maxthon|Silk/|"
    r"Puffin|UCBrowser|UC Browser|UCWEB|QQBrowser|MiuiBrowser|HuaweiBrowser|"
    r"SamsungBrowser|Opera|OPR/|Edg|FxiOS|CriOS|wv\)|CrMo/|Chromium|IEMobile"
)

_COMMON_BROWSER_RULES: list[tuple[str, str]] = [
    # legacy Android WebView: Version/ + Chrome co-occurrence (Version/ is
    # too common — Safari — to gate on, so this rule stays in the hot chain)
    (r"Version/.*Chrome/", "Chrome Mobile WebView"),
    (r"Chrome/.*Mobile", "Chrome Mobile"),
    (r"Chrome/", "Chrome"),
    # Firefox
    (r"(Mobile|Tablet).*Firefox/", "Firefox Mobile"),
    (r"Firefox/", "Firefox"),
    # IE
    (r"MSIE |Trident/", "IE"),
    # legacy Android stock browser (Version/ + Mobile Safari, no Chrome)
    (r"Android.*Version/.*Mobile Safari/", "Android"),
    # Safari: mobile first; iOS WebKit apps without a Safari token last
    (r"Mobile.*Safari/", "Mobile Safari"),
    (r"(iPhone|iPad|iPod).*AppleWebKit", "Mobile Safari UI/WKWebView"),
    (r"Safari/", "Safari"),
]

#: flat view (rare-first == the gated evaluation order) for tests/tools
_BROWSER_RULES: list[tuple[str, str]] = _RARE_BROWSER_RULES + _COMMON_BROWSER_RULES

_OS_RULES: list[tuple[str, str]] = [
    (r"Windows Phone", "Windows Phone"),
    (r"Windows NT|Win64|Win32|Windows 9[58]", "Windows"),
    (r"CrOS", "Chrome OS"),
    (r"Tizen", "Tizen"),
    (r"KaiOS|KAIOS", "KaiOS"),
    (r"Android", "Android"),
    (r"iPhone|iPad|iPod", "iOS"),
    (r"Mac OS X|Macintosh", "Mac OS X"),
    (r"Ubuntu", "Ubuntu"),
    (r"Fedora", "Fedora"),
    (r"FreeBSD", "FreeBSD"),
    (r"OpenBSD", "OpenBSD"),
    (r"NetBSD", "NetBSD"),
    (r"BlackBerry|BB10", "BlackBerry OS"),
    (r"Symbian|SymbOS|Series60", "Symbian OS"),
    (r"Linux", "Linux"),
]


#: Cheap pre-gate: every bot/tool rule's trigger vocabulary in one scan.
#: Browser UAs (the overwhelming majority of web traffic) fail this single
#: regex and skip the ~60-rule crawler/tooling chain entirely — the CASE
#: chain evaluates sequentially, so ordering + gating is the whole perf
#: story for a 100 TB parse (measured ~2x on the derived-column stage).
#: tests/test_useragent.py pins gate coverage: every golden bot/tool UA
#: must trigger it, or the chain would silently fall through to browsers.
_NONBROWSER_GATE = (
    r"(?i)bot|spider|crawl|slurp|preview|mediapartners|apis-google|"
    r"inspectiontool|facebookexternalhit|whatsapp|python|httpx|aiohttp|"
    r"curl|wget|go-http|okhttp|^java/|httpclient|libwww|postman|insomnia|"
    r"axios|node-fetch|scrapy|phantomjs|slack|yandex|ia_archiver"
)


def _family_expr(ua: Column, pattern: str, template: str) -> Column:
    """One rule's family value — a literal, or the template with ``$1``
    substituted by the pattern's first capture group (uap-core
    family_replacement semantics)."""
    if "$1" in template:
        pre, post = template.split("$1", 1)
        captured = F.regexp_extract(ua, pattern, 1)
        return F.concat(F.lit(pre), captured, F.lit(post))
    return F.lit(template)


def _rules_to_column(
    ua: Column, rules: list[tuple[str, str]], default: Column | None = None
) -> Column:
    expr = F.lit(_UNKNOWN) if default is None else default
    for pattern, family in reversed(rules):
        expr = F.when(ua.rlike(pattern), _family_expr(ua, pattern, family)).otherwise(expr)
    return expr


def ua_browser_family(ua: Column) -> Column:
    """Browser family; '-'/''/null -> 'Unknown' (reference :129-131).

    Two pre-gates keep the per-row regex count low on the 100 TB parse
    path: mainstream browser traffic fails _NONBROWSER_GATE (skipping the
    ~60 crawler/tool rules) and _RARE_BROWSER_GATE (skipping the ~27
    derivative/variant rules), leaving the ~10-rule common chain."""
    blank = ua.isNull() | (ua == "-") | (ua == "")
    common = _rules_to_column(ua, _COMMON_BROWSER_RULES)
    browser = F.when(
        ua.rlike(_RARE_BROWSER_GATE),
        _rules_to_column(ua, _RARE_BROWSER_RULES, default=common),
    ).otherwise(common)
    chain = F.when(
        ua.rlike(_NONBROWSER_GATE),
        _rules_to_column(ua, _BOT_TOOL_RULES, default=browser),
    ).otherwise(browser)
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
