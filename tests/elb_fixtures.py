"""Synthetic ALB line corpus for end-to-end pipeline tests (FIXTURES.md §F1).

Deterministic generator: N requests across a handful of IPs, with controlled
status codes, bot UAs, session gaps, and a couple of adversarial lines.
"""

from __future__ import annotations

import gzip
from datetime import datetime, timedelta

UA_CHROME = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/137.0.0.0 Safari/537.36"
)
UA_BOT = "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)"
UA_CURL = "curl/8.5.0"

IPS = ["1.1.1.1", "2.2.2.2", "3.3.3.3", "4.4.4.4"]


def make_line(
    ts: datetime,
    ip: str = "1.1.1.1",
    status: int = 200,
    ua: str = UA_CHROME,
    url: str = "https://app.example.com:443/api/items?page=2",
    method: str = "GET",
    rpt: str = "0.001",
    tpt: str = "0.303",
    resppt: str = "0.000",
    error_reason: str = "-",
) -> str:
    t = ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
    return (
        f"h2 {t} app/test-lb/abc123 {ip}:54321 172.31.0.1:80 {rpt} {tpt} {resppt} "
        f'{status} {status} 74 1013 "{method} {url} HTTP/2.0" "{ua}" '
        f"TLS_AES_128_GCM_SHA256 TLSv1.3 arn:aws:elb:tg/test "
        f'"Root=1-abc" "app.example.com" "session-reused" 1 {t} '
        f'"waf,forward" "-" "{error_reason}" "172.31.0.1:80" "{status}" "-" "-" '
        f"TID_0123456789abcdef"
    )


def corpus(base: datetime | None = None) -> list[str]:
    base = base or datetime(2025, 5, 26, 12, 0, 0)
    lines: list[str] = []
    # ip1: a burst session then a >30min gap then another session
    for i in range(5):
        lines.append(make_line(base + timedelta(minutes=i), ip="1.1.1.1"))
    lines.append(make_line(base + timedelta(minutes=45), ip="1.1.1.1"))
    # ip2: errors (4xx/5xx) for the error report
    lines.append(make_line(base, ip="2.2.2.2", status=404, error_reason="TargetNotFound"))
    lines.append(make_line(base + timedelta(minutes=1), ip="2.2.2.2", status=503))
    # ip3: bot traffic
    for i in range(3):
        lines.append(make_line(base + timedelta(minutes=i * 2), ip="3.3.3.3", ua=UA_BOT))
    # ip4: curl with '-' numeric fields and whole-second timestamp
    line = make_line(base, ip="4.4.4.4", ua=UA_CURL, rpt="-1", tpt="-1", resppt="-1")
    lines.append(line)
    lines.append(
        make_line(base + timedelta(seconds=300), ip="4.4.4.4", ua=UA_CURL)
    )  # exactly 300s later: left-open rolling boundary case
    # adversarial: short line (dropped), bad timestamp (dropped)
    lines.append("too short")
    lines.append(make_line(base).replace(base.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z", "BADTIME", 1))
    return lines


def write_gz(path: str, lines: list[str]) -> str:
    with gzip.open(path, "wt", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    return path
