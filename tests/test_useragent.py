"""P10 user-agent parity tests.

The real `user_agents` library is absent in this container, so the library
path is exercised two ways:
- the Arrow pandas_udf wrapper runs against an injected parse-compatible
  FAKE module (batching, blank/'-' handling, `or "Unknown"` fallbacks,
  struct output, parse-path routing all real);
- the regex fallback classifier is pinned against a golden corpus of
  family strings the library (ua-parser/uap-core definitions) is known to
  produce for common agents — the documented-divergence surface is exotic
  agents only.
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.functions import useragent
from advanced_elb_logs_etl_spark.functions.useragent import (
    make_ua_families_udf,
    ua_browser_family,
    ua_os_family,
)
from advanced_elb_logs_etl_spark.operators import parse as parse_mod


def make_fake_ua_module():
    """parse()-compatible stand-in for `user_agents`: deterministic families
    derived from the string, plus an empty-family case to exercise the
    reference's `or "Unknown"` fallback (advanced_elb_logs_etl.py:126-127).
    Built from locals so cloudpickle ships it to executor workers by VALUE
    (a module-level test class would pickle by reference to a module the
    workers can't import)."""

    def parse(s):
        if s.startswith("EMPTYFAM"):
            browser, os_ = "", None
        else:
            browser, os_ = "B:" + s.split("/")[0], "O:" + s.split("/")[-1]
        return SimpleNamespace(
            browser=SimpleNamespace(family=browser), os=SimpleNamespace(family=os_)
        )

    return SimpleNamespace(parse=parse)


def test_udf_wrapper_with_injected_module(spark):
    df = spark.createDataFrame(
        [("Mozilla/5.0",), ("curl/8.1",), ("-",), ("",), (None,), ("EMPTYFAM/1",)],
        "ua string",
    )
    udf = make_ua_families_udf(make_fake_ua_module())
    rows = df.select(udf(F.col("ua")).alias("f")).collect()
    got = [(r.f.browser_family, r.f.os_family) for r in rows]
    assert got == [
        ("B:Mozilla", "O:5.0"),
        ("B:curl", "O:8.1"),
        ("Unknown", "Unknown"),   # '-' sentinel
        ("Unknown", "Unknown"),   # empty
        ("Unknown", "Unknown"),   # null
        ("Unknown", "Unknown"),   # library returned empty/None families
    ]


def test_udf_factory_raises_without_library():
    if useragent.HAVE_UA_LIB:  # pragma: no cover - container has no lib
        pytest.skip("real user_agents present")
    with pytest.raises(ImportError):
        make_ua_families_udf()


def test_parse_routes_through_library_when_present(spark, monkeypatch):
    """With the library importable, parse_alb_lines must emit family columns
    from ONE Arrow-batched UDF call (plan contains ArrowEvalPython exactly
    once) — and the output schema is unchanged vs the regex path."""
    monkeypatch.setattr(useragent, "_ua_lib", make_fake_ua_module())
    monkeypatch.setattr(useragent, "HAVE_UA_LIB", True)
    from test_parse import GOLDEN

    df = spark.createDataFrame([(GOLDEN,)], "value string")
    out = parse_mod.parse_alb_lines(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    r = out.collect()[0]
    assert r.ua_browser_family == "B:Mozilla"
    assert r.is_bot is False  # is_bot stays the reference's substring test
    regex_cols = parse_mod.parse_alb_lines(df).columns
    monkeypatch.setattr(useragent, "HAVE_UA_LIB", False)
    assert parse_mod.parse_alb_lines(df).columns == regex_cols


# (ua, browser_family, os_family) — families as produced by ua-parser's
# uap-core definitions for these canonical strings (the library the
# reference wraps); the regex classifier must agree on all of them.
GOLDEN_FAMILIES = [
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/137.0.0.0 Safari/537.36", "Chrome", "Windows"),
    ("Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",
     "Firefox", "Linux"),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
     "(KHTML, like Gecko) Version/17.0 Safari/605.1.15", "Safari", "Mac OS X"),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91", "Edge", "Windows"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 "
     "(KHTML, like Gecko) Version/17.0 Mobile/15E148 Safari/604.1",
     "Mobile Safari", "iOS"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 "
     "(KHTML, like Gecko) CriOS/120.0.6099.119 Mobile/15E148 Safari/604.1",
     "Chrome Mobile iOS", "iOS"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 "
     "(KHTML, like Gecko) FxiOS/120.0 Mobile/15E148 Safari/605.1.15",
     "Firefox iOS", "iOS"),
    ("Mozilla/5.0 (Linux; Android 14; SM-S918B) AppleWebKit/537.36 (KHTML, like Gecko) "
     "SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36",
     "Samsung Internet", "Android"),
    ("Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/120.0.6099.144 Mobile Safari/537.36", "Chrome Mobile", "Android"),
    ("Mozilla/5.0 (compatible; MSIE 10.0; Windows NT 6.1; Trident/6.0)",
     "IE", "Windows"),
    ("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
     "Googlebot", "Unknown"),
    ("Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)",
     "bingbot", "Unknown"),
    ("curl/8.4.0", "curl", "Unknown"),
    # uap-core OS tokens are case-sensitive: '(linux-gnu)' is NOT 'Linux'
    ("Wget/1.21.3 (linux-gnu)", "Wget", "Unknown"),
    ("python-requests/2.31.0", "Python Requests", "Unknown"),
    ("Python-urllib/3.11", "Python-urllib", "Unknown"),
    # ---- expanded corpus for the vendored uap-core-style rule table ----
    # browsers: Chromium derivatives, Edge/Opera variants, webviews
    ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) "
     "HeadlessChrome/120.0.0.0 Safari/537.36", "HeadlessChrome", "Linux"),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) "
     "MyApp/1.0.0 Chrome/120.0.6099.291 Electron/28.2.0 Safari/537.36",
     "Electron", "Mac OS X"),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/119.0.0.0 YaBrowser/23.11.0.0 Safari/537.36", "Yandex Browser", "Windows"),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/120.0.0.0 Safari/537.36 Vivaldi/6.5", "Vivaldi", "Windows"),
    ("Mozilla/5.0 (Linux; Android 9; KFMAWI) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Silk/120.2.1 like Chrome/120.0.6099.145 Safari/537.36", "Amazon Silk", "Android"),
    ("Mozilla/5.0 (Linux; U; Android 13; en-US) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Version/4.0 Chrome/78.0.3904.108 UCBrowser/13.4.0.1306 Mobile Safari/537.36",
     "UC Browser", "Android"),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/120.0.0.0 Safari/537.36 OPR/106.0.0.0", "Opera", "Windows"),
    ("Opera/9.80 (J2ME/MIDP; Opera Mini/9.80 (S60; SymbOS; Opera Mobi/23.348; U; en) "
     "Presto/2.5.25 Version/10.54", "Opera Mini", "Symbian OS"),
    ("Mozilla/5.0 (Linux; Android 14; Pixel 7) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/120.0.0.0 Mobile Safari/537.36 EdgA/120.0.2210.126", "Edge Mobile", "Android"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 "
     "(KHTML, like Gecko) Version/17.0 EdgiOS/120.2210.126 Mobile/15E148 Safari/605.1.15",
     "Edge Mobile", "iOS"),
    ("Mozilla/5.0 (Linux; Android 14; Pixel 8; wv) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Version/4.0 Chrome/120.0.6099.144 Mobile Safari/537.36",
     "Chrome Mobile WebView", "Android"),
    ("Mozilla/5.0 (Linux; U; Android 4.0.3; en-us; GT-I9100 Build/IML74K) "
     "AppleWebKit/534.30 (KHTML, like Gecko) Version/4.0 Mobile Safari/534.30",
     "Android", "Android"),
    ("Mozilla/5.0 (X11; Ubuntu; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chromium/120.0.0.0 Chrome/120.0.0.0 Safari/537.36", "Chromium", "Ubuntu"),
    ("Mozilla/5.0 (Android 14; Mobile; rv:121.0) Gecko/121.0 Firefox/121.0",
     "Firefox Mobile", "Android"),
    ("Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0) like Gecko",
     "IE", "Windows"),
    ("Mozilla/5.0 (compatible; MSIE 10.0; Windows Phone 8.0; Trident/6.0; IEMobile/10.0; "
     "ARM; Touch; NOKIA; Lumia 920)", "IE Mobile", "Windows Phone"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 "
     "(KHTML, like Gecko) Mobile/15E148", "Mobile Safari UI/WKWebView", "iOS"),
    ("Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/120.0.0.0 Safari/537.36", "Chrome", "Chrome OS"),
    ("Mozilla/5.0 (X11; FreeBSD amd64; rv:120.0) Gecko/20100101 Firefox/120.0",
     "Firefox", "FreeBSD"),
    ("Mozilla/5.0 (Mobile; LYF/F90M; Android; rv:48.0) Gecko/48.0 Firefox/48.0 KAIOS/2.5",
     "Firefox Mobile", "KaiOS"),
    # crawlers: search / social / SEO / AI — incl. the $1-template Yandex rule
    ("Mozilla/5.0 (compatible; YandexBot/3.0; +http://yandex.com/bots)",
     "YandexBot", "Unknown"),
    ("Mozilla/5.0 (compatible; YandexImages/3.0; +http://yandex.com/bots)",
     "YandexImages", "Unknown"),
    ("Mozilla/5.0 (compatible; Applebot/0.1; +http://www.apple.com/go/applebot)",
     "Applebot", "Unknown"),
    ("Googlebot-Image/1.0", "Googlebot-Image", "Unknown"),
    ("facebookexternalhit/1.1 (+http://www.facebook.com/externalhit_uatext.php)",
     "facebookexternalhit", "Unknown"),
    ("Twitterbot/1.0", "Twitterbot", "Unknown"),
    ("Slackbot-LinkExpanding 1.0 (+https://api.slack.com/robots)",
     "Slackbot", "Unknown"),
    ("WhatsApp/2.23.20.0", "WhatsApp", "Unknown"),
    ("Mozilla/5.0 (compatible; AhrefsBot/7.0; +http://ahrefs.com/robot/)",
     "AhrefsBot", "Unknown"),
    ("Mozilla/5.0 (compatible;PetalBot;+https://webmaster.petalsearch.com/site/petalbot)",
     "PetalBot", "Unknown"),
    # bare product token — real Bytespider UAs carry a vendor contact
    # address; kept address-free (classification is token-based) so the
    # leak grep in tools/run_checks.sh stays quiet
    ("Mozilla/5.0 (Linux; Android 5.0) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Mobile Safari/537.36 (compatible; Bytespider)",
     "Bytespider", "Android"),
    ("Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko; compatible; GPTBot/1.0; "
     "+https://openai.com/gptbot)", "GPTBot", "Unknown"),
    # bare product token (the contact-address form classifies identically;
    # kept address-free so secret scanners stay quiet)
    ("Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko; compatible; "
     "ClaudeBot/1.0)", "ClaudeBot", "Unknown"),
    ("CCBot/2.0 (https://commoncrawl.org/faq/)", "CCBot", "Unknown"),
    # HTTP tooling / SDKs
    ("Go-http-client/2.0", "Go-http-client", "Unknown"),
    ("okhttp/4.12.0", "okhttp", "Unknown"),
    ("Java/17.0.9", "Java", "Unknown"),
    ("Apache-HttpClient/4.5.14 (Java/17.0.9)", "Apache-HttpClient", "Unknown"),
    ("PostmanRuntime/7.36.0", "PostmanRuntime", "Unknown"),
    ("axios/1.6.2", "axios", "Unknown"),
    ("node-fetch/1.0 (+https://github.com/bitinn/node-fetch)", "node-fetch", "Unknown"),
    ("Scrapy/2.11.0 (+https://scrapy.org)", "Scrapy", "Unknown"),
]


# Families produced by _BOT_TOOL_RULES for goldens above — each of these UAs
# MUST trigger the pre-gate, or the gated chain would silently fall through
# to the browser rules and misclassify.
_BOT_TOOL_FAMILIES = {
    "Googlebot", "Googlebot-Image", "bingbot", "Baiduspider", "YandexBot",
    "YandexImages", "Applebot", "facebookexternalhit", "Twitterbot",
    "Slackbot", "WhatsApp", "AhrefsBot", "PetalBot", "Bytespider", "GPTBot",
    "ClaudeBot", "CCBot", "curl", "Wget", "Python Requests", "Python-urllib",
    "Go-http-client", "okhttp", "Java", "Apache-HttpClient", "PostmanRuntime",
    "axios", "node-fetch", "Scrapy",
}


def test_nonbrowser_gate_covers_all_bot_tool_goldens():
    import re

    gate = re.compile(useragent._NONBROWSER_GATE)
    for ua, browser, _ in GOLDEN_FAMILIES:
        if browser in _BOT_TOOL_FAMILIES:
            assert gate.search(ua), f"gate misses bot/tool UA: {ua!r}"


def test_rare_browser_gate_covers_all_rare_rule_goldens():
    """Every golden UA whose FIRST matching flat-chain rule is a rare rule
    must trigger _RARE_BROWSER_GATE, or the gated chain would silently
    fall through to the common rules and misclassify. (Family strings
    alone can't decide this — e.g. 'Chrome Mobile' is produced by both a
    rare rule, CrMo/, and a common rule.)"""
    import re

    gate = re.compile(useragent._RARE_BROWSER_GATE)
    n_rare = len(useragent._RARE_BROWSER_RULES)
    covered = 0
    for ua, browser, _ in GOLDEN_FAMILIES:
        if browser in _BOT_TOOL_FAMILIES:
            continue
        for i, (pat, _fam) in enumerate(useragent._BROWSER_RULES):
            if re.search(pat, ua):
                if i < n_rare:  # classified by the gated rare chain
                    assert gate.search(ua), f"rare gate misses UA: {ua!r}"
                    covered += 1
                break
    assert covered >= 8  # the golden corpus exercises the rare chain broadly


def test_regex_classifier_matches_library_goldens(spark):
    df = spark.createDataFrame([(ua,) for ua, _, _ in GOLDEN_FAMILIES], "ua string")
    rows = df.select(
        "ua",
        ua_browser_family(F.col("ua")).alias("b"),
        ua_os_family(F.col("ua")).alias("o"),
    ).collect()
    got = {r.ua: (r.b, r.o) for r in rows}
    for ua, browser, os_ in GOLDEN_FAMILIES:
        assert got[ua] == (browser, os_), f"{ua!r}: {got[ua]} != {(browser, os_)}"
