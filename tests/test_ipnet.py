"""CIDR / longest-prefix-match enrichment (operators/ipnet.py):
octet-math parsing vs the stdlib, a 300-IP randomized differential
against an ipaddress-module LPM replica, nesting/no-match/invalid-IP
semantics, the loud bad-feed guard, and the zero-corpus-shuffle plan
pin (the design claim: a chain of broadcast left joins, one pass)."""

from __future__ import annotations

import ipaddress
import random

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import ipnet

FEED = [
    ("10.0.0.0/8", "corp-backbone"),
    ("10.1.0.0/16", "corp-east"),
    ("10.1.2.0/24", "corp-east-lab"),
    ("192.168.0.0/16", "rfc1918-b"),
    ("0.0.0.0/0", "default-route"),
    ("203.0.113.7/32", "honeypot"),
    # unmasked base: must normalize to 172.16.0.0/12
    ("172.16.99.4/12", "rfc1918-c"),
]


def _feed(spark, rows=FEED):
    return ipnet.parse_cidr(
        spark.createDataFrame(rows, "cidr string, org string")
    )


def _lpm_py(ip: str):
    try:
        addr = ipaddress.IPv4Address(ip)
    except Exception:
        return None, None
    best = None
    for cidr, org in FEED:
        net = ipaddress.IPv4Network(cidr, strict=False)
        if addr in net and (best is None or net.prefixlen > best[0]):
            best = (net.prefixlen, org)
    return best if best else (None, None)


def test_ip4_to_long_matches_stdlib_and_rejects_garbage(spark):
    good = ["0.0.0.0", "255.255.255.255", "10.1.2.3", "203.0.113.7"]
    bad = ["-", "", "1.2.3", "1.2.3.4.5", "256.1.1.1", "a.b.c.d",
           "2001:db8::1", "1.2.3.-4", " 1.2.3.4"]
    df = spark.createDataFrame([(s,) for s in good + bad], "ip string")
    got = {
        r.ip: r.v
        for r in df.select("ip", ipnet.ip4_to_long(F.col("ip")).alias("v")).collect()
    }
    for s in good:
        assert got[s] == int(ipaddress.IPv4Address(s)), s
    for s in bad:
        assert got[s] is None, s


def test_parse_cidr_normalizes_unmasked_bases(spark):
    rows = {r.cidr: (r.prefix_len, r.base_long) for r in _feed(spark).collect()}
    for cidr, _ in FEED:
        net = ipaddress.IPv4Network(cidr, strict=False)
        assert rows[cidr] == (
            net.prefixlen,
            int(net.network_address),
        ), cidr
    # a garbage row parses to NULLs and the join builder rejects it loudly
    bad = ipnet.parse_cidr(
        spark.createDataFrame([("nonsense/99", "x")], "cidr string, org string")
    )
    assert bad.collect()[0].prefix_len is None
    logs = spark.createDataFrame([("1.2.3.4",)], "client_ip string")
    with pytest.raises(ValueError, match="failed to parse"):
        ipnet.longest_prefix_match(logs, bad, "client_ip", ["org"])


def test_lpm_randomized_differential_vs_stdlib(spark):
    """300 seeded IPs biased into the feed's nested blocks, enriched in
    ONE Spark job, each row compared against the ipaddress-module
    longest-prefix replica (default route catches everything valid, so
    nesting depth 0/8/12/16/24/32 all occur)."""
    rng = random.Random(0x1B4D)
    ips = []
    for _ in range(300):
        roll = rng.random()
        if roll < 0.35:
            ips.append(f"10.{rng.randint(0, 3)}.{rng.randint(0, 5)}.{rng.randint(0, 255)}")
        elif roll < 0.5:
            ips.append(f"172.{rng.randint(0, 63)}.{rng.randint(0, 255)}.1")
        elif roll < 0.6:
            ips.append("203.0.113.7" if rng.random() < 0.5 else "203.0.113.8")
        elif roll < 0.7:
            ips.append("not-an-ip")
        else:
            ips.append(
                f"{rng.randint(0, 255)}.{rng.randint(0, 255)}"
                f".{rng.randint(0, 255)}.{rng.randint(0, 255)}"
            )
    logs = spark.createDataFrame([(i, s) for i, s in enumerate(ips)],
                                 "rid int, client_ip string")
    out = ipnet.longest_prefix_match(logs, _feed(spark), "client_ip", ["org"])
    got = {r.rid: (r.matched_prefix_len, r.org) for r in out.collect()}
    assert len(got) == len(ips)  # left joins: no row loss, no duplication
    for i, s in enumerate(ips):
        want_len, want_org = _lpm_py(s)
        assert got[i] == (want_len, want_org), (s, got[i], want_len, want_org)


def test_lpm_plan_has_zero_corpus_shuffles(spark):
    """The design claim, MEASURED from executed-plan SQLMetrics: the
    whole chain is broadcast joins — no Exchange writes any corpus
    rows (broadcast exchanges report no shuffleRecordsWritten)."""
    from test_plan_quality import _executed_metric_sum

    logs = spark.range(100_000).select(
        F.concat(
            F.lit("10."), (F.col("id") % 4).cast("string"),
            F.lit(".2."), (F.col("id") % 250).cast("string"),
        ).alias("client_ip")
    )
    out = ipnet.longest_prefix_match(logs, _feed(spark), "client_ip", ["org"])
    n = out.count()
    assert n == 100_000
    shuffled = _executed_metric_sum(
        out, "Exchange", "shuffleRecordsWritten"
    )
    assert shuffled == 0, shuffled
    # and the matches themselves are right: 10.1.2.x -> the /24 block
    sample = out.filter(F.col("client_ip") == "10.1.2.3").limit(1).collect()
    assert sample and sample[0].org == "corp-east-lab"


# --- queued r15 gate: cidr_lpm_enrichment (pre-rehearsed, the freeze
# discipline — body + oracle live here until registration) ------------

# --- the r12 catalog gate (REGISTERED in plans/catalog_r12.py as
# `cidr_lpm_enrichment`; the rehearsal imports the registered body +
# oracle so it exercises the exact catalog entry) ---------------------

from advanced_elb_logs_etl_spark.plans.catalog_r12 import (  # noqa: E402
    CIDR_GATE_FEED as GATE_FEED,  # noqa: F401  (composition test feed)
    CIDR_LPM_ORACLE as CIDR_LPM_ORACLE_QUEUED_R15,
    q_cidr_lpm_enrichment,
)


def test_queued_lpm_gate_matches_duckdb_twin(spark):
    """Full driver-protocol rehearsal of the registered r12 entry at
    sf0.01
    through the pandas fetch path: nested blocks, a no-match bucket,
    and multi-depth coalesce all carry driver signal."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = q_cidr_lpm_enrichment(spark, sf)
    scols = sorted(sdf.columns)
    spd = sdf.select(*scols).toPandas()
    srows = sorted(
        tuple(str(x) for x in r) for r in spd.itertuples(index=False)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    dpd = con.execute(CIDR_LPM_ORACLE_QUEUED_R15).df()
    assert sorted(dpd.columns) == scols
    drows = sorted(
        tuple(str(x) for x in r) for r in dpd[scols].itertuples(index=False)
    )
    assert srows == drows
    # the gate exercises depth: at least three distinct matched lengths
    # plus the unmatched bucket
    lens = {r.matched_prefix_len for r in spd.itertuples(index=False)}
    assert len([x for x in lens if x == x]) >= 3  # NaN-safe distinct count


def test_lpm_composes_with_the_alb_parse_pipeline(spark):
    """Domain integration: parse real ALB fixture lines, then enrich the
    parser's client_ip by longest prefix — the IPv6 quirk and malformed
    lines flow through as NULL matches, valid IPv4s match their
    blocks."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from elb_fixtures import corpus

    from advanced_elb_logs_etl_spark.operators.parse import parse_alb_lines

    lines = corpus()
    parsed = parse_alb_lines(
        spark.createDataFrame([(l,) for l in lines], "value string")
    )
    feed = ipnet.parse_cidr(
        spark.createDataFrame(
            [("1.1.1.0/24", "one-net"), ("3.0.0.0/8", "bot-asn")],
            "cidr string, org string",
        )
    )
    out = ipnet.longest_prefix_match(parsed, feed, "client_ip", ["org"])
    got = {
        (r.client_ip, r.org, r.matched_prefix_len)
        for r in out.select("client_ip", "org", "matched_prefix_len")
        .distinct()
        .collect()
    }
    assert ("1.1.1.1", "one-net", 24) in got
    assert ("3.3.3.3", "bot-asn", 8) in got
    assert ("2.2.2.2", None, None) in got  # no covering block
    # row count preserved through the chain
    assert out.count() == parsed.count()


def test_keep_ip_long_passthrough(spark):
    logs = spark.createDataFrame([("10.1.2.3",)], "client_ip string")
    out = ipnet.longest_prefix_match(
        logs, _feed(spark), "client_ip", ["org"], keep_ip_long=True
    ).collect()[0]
    assert out.ip_long == int(ipaddress.IPv4Address("10.1.2.3"))
    assert out.matched_prefix_len == 24


# --- ADVICE r11 hardening pins -------------------------------------------


def test_leading_zero_octets_rejected_like_stdlib(spark):
    """'010.1.2.3' parses as 10.1.2.3 under plain int-cast octet math
    but the stdlib ipaddress parser rejects it — the strict rlike now
    matches the stdlib (ADVICE r11)."""
    cases = ["010.1.2.3", "1.02.3.4", "1.2.3.007", "00.0.0.0"]
    ok = ["0.0.0.0", "10.1.2.3", "255.255.255.255", "1.0.200.9"]
    df = spark.createDataFrame([(c,) for c in cases + ok], "ip string")
    got = {
        r.ip: r.v
        for r in df.select(
            "ip", ipnet.ip4_to_long(F.col("ip")).alias("v")
        ).collect()
    }
    for c in cases:
        with pytest.raises(Exception):
            ipaddress.IPv4Address(c)
        assert got[c] is None, c
    for c in ok:
        assert got[c] == int(ipaddress.IPv4Address(c)), c


def test_empty_prefix_table_raises_loudly(spark):
    """A zero-row feed must fail with a clear message, not an opaque
    zero-arm coalesce error (ADVICE r11)."""
    ips = spark.createDataFrame([("10.0.0.1",)], "client_ip string")
    empty = ipnet.parse_cidr(
        spark.createDataFrame([], "cidr string, org string")
    )
    with pytest.raises(ValueError, match="prefix table is empty"):
        ipnet.longest_prefix_match(ips, empty, "client_ip", ["org"])


def test_null_payload_in_best_block_stays_null(spark):
    """When the MOST SPECIFIC matching block carries a NULL payload
    value, the payload must be NULL — not a less-specific block's
    payload while matched_prefix_len still reports the specific length
    (ADVICE r11: payload and matched_prefix_len always come from the
    same block)."""
    feed = ipnet.parse_cidr(
        spark.createDataFrame(
            [("10.0.0.0/8", "backbone"), ("10.1.0.0/16", None)],
            "cidr string, org string",
        )
    )
    ips = spark.createDataFrame(
        [("10.1.2.3",), ("10.9.9.9",)], "client_ip string"
    )
    got = {
        r.client_ip: (r.org, r.matched_prefix_len)
        for r in ipnet.longest_prefix_match(
            ips, feed, "client_ip", ["org"]
        ).collect()
    }
    # inside the /16 with NULL org: NULL payload, length 16 (same block)
    assert got["10.1.2.3"] == (None, 16)
    # outside the /16: the /8 payload
    assert got["10.9.9.9"] == ("backbone", 8)
