"""CIDR / longest-prefix-match IP enrichment — the network-dimension
join the reference's geolocation pipeline approximates per-IP
(reference fetch_geolocations, :430-468, one HTTP lookup per distinct
client IP): at 100 TB the production form is a PREFIX TABLE (ASN/org/
country per CIDR block, e.g. a MaxMind/RouteViews-style feed) joined by
longest-prefix match, not a per-IP service call.

Spark-first design: a routing-table join is a per-row "most specific
containing block" lookup.  The scalable shape here is ONE pass over the
corpus with a chain of BROADCAST left joins, one per distinct prefix
length present in the table (<= 33, realistically ~15 for public BGP
feeds), probing longest-first, then one coalesce across the chain —
zero shuffles of the corpus (pinned by test via executed-plan
SQLMetrics), no exploded fan-out, no corpus-sized groupBy to pick the
winner.  Contrast the classic alternatives: exploding each row into all
prefix masks shuffles a 33x corpus; a range join + "narrowest range per
row" re-aggregates the corpus.

All Column expressions (whole-stage codegen) — integer octet math plus
one anchored validation rlike; no UDFs.  IPv4 only: the IPv6 quirk
(parse.py P6) yields NULLs here, which the left joins pass through.

SQL twin (for a future gate): the same per-length masked equi-joins are
plain SQL; ip4_to_long's twin is
  CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216 + ... (guarded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ip4_to_long",
    "parse_cidr",
    "longest_prefix_match",
]

_OCTET_MULS = (16_777_216, 65_536, 256, 1)


def _mask(prefix_len: int) -> int:
    """The /n netmask as an int (0 <= n <= 32)."""
    if not 0 <= prefix_len <= 32:
        raise ValueError(f"prefix_len must be in [0, 32], got {prefix_len}")
    return (0xFFFFFFFF << (32 - prefix_len)) & 0xFFFFFFFF


def ip4_to_long(ip: Column) -> Column:
    """Dotted-quad IPv4 -> BIGINT in [0, 2^32), NULL for anything that
    is not exactly four in-range integer octets (IPv6, hostnames, empty,
    sentinel '-').  Column math: one anchored rlike (the strictness
    guard — try_cast alone trims whitespace and accepts signs, and a
    digits-only pattern would admit leading-zero octets like
    '010.1.2.3', all of which the stdlib ipaddress parser rejects;
    ADVICE r11) + split + try_cast + the positional multiply-add with
    the 0-255 range guard."""
    parts = F.split(ip, r"\.")
    octets = [
        F.element_at(parts, i + 1).try_cast("long") for i in range(4)
    ]
    ok = ip.rlike(r"^(0|[1-9]\d{0,2})(\.(0|[1-9]\d{0,2})){3}$")
    for o in octets:
        ok = ok & o.isNotNull() & (o >= 0) & (o <= 255)
    val = sum(
        (o * F.lit(m) for o, m in zip(octets, _OCTET_MULS)),
        start=F.lit(0),
    )
    return F.when(ok, val).otherwise(F.lit(None).cast("long"))


def parse_cidr(table: DataFrame, cidr_col: str = "cidr") -> DataFrame:
    """Normalize a prefix table: parse 'a.b.c.d/n' into (prefix_len INT,
    base_long BIGINT) — base masked to its own length, so feeds that
    carry unmasked bases (10.1.2.3/16) still match correctly.  Rows
    whose CIDR fails to parse get NULL base_long/prefix_len (filter or
    audit upstream; longest_prefix_match rejects them loudly).

    CONTRACT for longest_prefix_match: (prefix_len, base_long) must be
    unique — duplicate blocks would duplicate matched corpus rows."""
    plen = F.substring_index(F.col(cidr_col), "/", -1).try_cast("int")
    plen = F.when((plen >= 0) & (plen <= 32), plen)
    base = ip4_to_long(F.substring_index(F.col(cidr_col), "/", 1))
    # mask the base to its length: clear the low (32 - n) bits as exact
    # float-of-power-of-two math (base / 2^k is exact in binary FP for
    # base < 2^32, floor and the re-multiply are exact under 2^53) —
    # per-row shift counts, which F.shiftleft's int-only arg can't do
    low = F.pow(F.lit(2.0), (F.lit(32) - plen).cast("double"))
    masked = (F.floor(base / low) * low).cast("long")
    ok = plen.isNotNull() & base.isNotNull()
    return table.withColumns(
        {
            "prefix_len": F.when(ok, plen),
            "base_long": F.when(ok, masked),
        }
    )


def longest_prefix_match(
    df: DataFrame,
    prefixes: DataFrame,
    ip_col: str,
    payload_cols: list[str],
    keep_ip_long: bool = False,
) -> DataFrame:
    """Enrich ``df`` with the payload of the MOST SPECIFIC prefix-table
    block containing each row's IPv4 — plus ``matched_prefix_len``
    (NULL when no block matches or the IP fails to parse).

    ``prefixes`` is parse_cidr output (prefix_len, base_long,
    payload...); rows with NULL prefix_len/base_long are rejected with
    a ValueError (a silently dropped block would mis-enrich every IP it
    covers).  The distinct prefix lengths are collected (bounded: <= 33
    values) to build the join chain longest-first.

    Scale shape (100 TB): the corpus is touched ONCE; each length's
    block slice broadcasts (routing feeds are ~1M rows total — far
    under broadcast thresholds when sliced); the chain is |lengths|
    BroadcastHashJoins in one stage with zero corpus shuffles (pinned
    by test via shuffleRecordsWritten == 0), then one coalesce picks
    the longest match without any re-aggregation."""
    bad = prefixes.filter(
        F.col("prefix_len").isNull() | F.col("base_long").isNull()
    ).count()
    if bad:
        raise ValueError(
            f"{bad} prefix rows failed to parse (NULL prefix_len/"
            "base_long) — fix or filter the feed explicitly"
        )
    lens = sorted(
        (
            r.prefix_len
            for r in prefixes.select("prefix_len").distinct().collect()
        ),
        reverse=True,
    )
    if not lens:
        # mirror the loud NULL-row rejection: an empty feed would
        # otherwise surface as an opaque py4j error from the zero-arm
        # coalesce below (ADVICE r11)
        raise ValueError(
            "prefix table is empty — longest_prefix_match needs at "
            "least one parsed (prefix_len, base_long) block"
        )
    out = df.withColumn("_ip_long", ip4_to_long(F.col(ip_col)))
    for n in lens:
        slice_n = prefixes.filter(F.col("prefix_len") == n).select(
            F.col("base_long").alias(f"_b{n}"),
            *[F.col(c).alias(f"_{c}_{n}") for c in payload_cols],
        )
        out = out.join(
            F.broadcast(slice_n),
            out["_ip_long"].bitwiseAND(F.lit(_mask(n))) == F.col(f"_b{n}"),
            "left",
        )
    # Payloads are picked by a chained CASE on the MATCH indicator, not
    # a coalesce over payload values: a matching block whose payload
    # value is NULL must yield NULL, not fall through to a less-specific
    # block's payload while matched_prefix_len reports the specific
    # length (ADVICE r11 — payload and matched_prefix_len always come
    # from the same block).
    def _from_best_block(values: dict[int, Column]) -> Column:
        expr = None
        for n in lens:
            cond = F.col(f"_b{n}").isNotNull()
            expr = (
                F.when(cond, values[n])
                if expr is None
                else expr.when(cond, values[n])
            )
        return expr

    sel = [
        _from_best_block({n: F.col(f"_{c}_{n}") for n in lens}).alias(c)
        for c in payload_cols
    ]
    sel.append(
        _from_best_block({n: F.lit(n) for n in lens})
        .cast("int")
        .alias("matched_prefix_len")
    )
    keep = [c for c in df.columns] + (["_ip_long"] if keep_ip_long else [])
    result = out.select(*keep, *sel)
    if keep_ip_long:
        result = result.withColumnRenamed("_ip_long", "ip_long")
    return result
