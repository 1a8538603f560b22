"""Skew-mitigation operators (SURVEY.md §4.3: a single hot client_ip can
dominate a `client_ip` hash partition at 100 TB).

Two tools:

- `salted_agg`: two-phase aggregation — phase 1 aggregates on
  (key, salt in [0, S)), spreading one hot key over S reducers; phase 2
  merges the S partials per key. Results are IDENTICAL to the direct
  groupBy for any algebraic aggregate (sum/count/min/max); the cost is one
  extra (tiny) shuffle of S rows per key. AQE's skew handling covers joins
  and some aggregations automatically, but an explicit salt is the reliable
  form when one key is orders of magnitude hotter than the rest.

- `salted_broadcast_left_join`: for completeness — a broadcast join needs
  no salting (no shuffle of the fact side); this helper just documents that
  decision path and falls through to `broadcast()`.

Salting does NOT apply to order-sensitive window operators (W1-W7): a
windowed session computation needs all of a key's rows in one partition by
definition. The mitigation there is coarse time-bucket pre-splitting, at
the cost of approximate session boundaries at bucket edges
(operators/sessions.py module notes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs maps output column -> (input column, fn) with fn in
    {'sum', 'count', 'min', 'max'} (the algebraically mergeable set; avg is
    expressed as sum+count by the caller, exactly how Spark's own partial
    aggregation does it).

    The salt is derived deterministically (hash of a high-cardinality
    column, else a per-row hash) so results are reproducible.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for name, (col, fn) in aggs.items():
        if fn not in phase1_fn:
            raise ValueError(f"{fn} is not algebraically mergeable; decompose it")

    salt_col: Column = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(num_salts))
        if salt_source
        else F.pmod(F.hash(*[F.col(k) for k in keys], F.monotonically_increasing_id()),
                    F.lit(num_salts))
    )
    phase1 = (
        df.withColumn("_salt", salt_col)
        .groupBy(*keys, "_salt")
        .agg(*[phase1_fn[fn](col).alias(name) for name, (col, fn) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[merge_fn[fn](name).alias(name) for name, (col, fn) in aggs.items()]
    )


def replicated_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salt-replicate equi-join for a skewed fact key when the build side is
    too big to broadcast: every dim row is replicated once per salt (cost
    S x |dim| rows — the explicit price of de-skewing without broadcast),
    and each fact row picks ONE salt from a hash of its full row, so a hot
    key's rows spread over S reducers instead of one.

    The salt choice cannot change the join RESULT (every (key, salt) bucket
    sees the full dim row set for that key), so result identity with the
    plain join holds by construction — pinned in tests with a planted
    100:1 hot key. Use when AQE's skew split doesn't fire (e.g. the skew is
    inside one huge row-group, or a downstream op pins the partitioning).

    Only inner/left joins are offered: right/full would need the dim-side
    duplicates de-duplicated after the join, which reintroduces a skewed
    shuffle."""
    if how not in ("inner", "left"):
        raise ValueError(f"replicated_skew_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(num_salts))
    f = fact.withColumn("_salt", salt.cast("int"))
    # the cast cannot wrap the generator (Spark rejects nested generators);
    # sequence(lit, lit) already yields ints, matching the fact side's cast
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return f.join(d, on=[key, "_salt"], how=how).drop("_salt")
