"""Cross-engine-deterministic text/hash primitives for the dedup and
similarity operators.

Everything here has an exact SQL twin (documented per function) so the
DuckDB oracle can verify dedup/similarity results VALUE-for-value, not just
shape. The shared 60-bit hash is the first 15 hex digits of md5 — identical
in any engine with md5 + hex->int, and comfortably inside a signed 64-bit.

These are Column expressions (whole-stage codegen), not UDFs: at 100 TB the
shingling+hashing pass dominates dedup cost, so it must stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(col: Column, seed: int | None = None) -> Column:
    """60-bit md5-derived hash. SQL twin:
    ('0x' || substr(md5(<seed>:s), 1, 15))::BIGINT"""
    s = col if seed is None else F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed text. SQL twin:
    regexp_split_to_array(trim(s), '\\s+')"""
    return F.split(F.trim(col), r"\s+")


def ngram_fold(toks: Column, n: int) -> Column:
    """All word n-grams of a token-array column, position order, WITH
    multiplicity; < n tokens -> empty array (guarded: Spark sequence(1,0)
    yields [1,0], unlike SQL generate_series). THE shared n-gram kernel —
    shingles() and text.ngram_array are thin wrappers, so the subtle form
    below has exactly one home.

    SQL twin:
    CASE WHEN len(toks) >= n THEN list_transform(
      generate_series(1, len(toks)-(n-1)), i -> toks[i] || ' ' || ...)
    ELSE [] END

    Evaluate-once shape: array HOFs are interpreted (CodegenFallback) with
    no common-subexpression elimination, so any form that references the
    `toks` EXPRESSION more than once re-runs it that many times per row —
    the original zip_with fold referenced it ~2x per fold step (slice
    source + out_len), i.e. ~15 regex splits per row at n=8 (measured
    2.5 s -> 0.8 s for the 8-gram pass over 5k docs at sf0.1).  The fix is
    the repo's standard bound-lambda-variable trick (see
    streaming/neardup.py band_key_rows): materialize the token array ONCE
    as a 1-element array, then build every gram inside the lambda, where
    `tk` is a cheap variable reference; per output position one n-slice +
    one concat_ws, no intermediate gram arrays at all.
    """
    empty = F.array().cast("array<string>")
    if n == 1:
        return F.when(F.size(toks) >= 1, toks).otherwise(empty)

    def _body(tk: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
        )
        return F.when(F.size(tk) >= n, grams).otherwise(empty)

    return F.transform(F.array(toks), _body).getItem(0)


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (set semantics for Jaccard/MinHash):
    array_distinct over ngram_fold, which preserves position order, so
    first occurrences match the transform form's (and its <n-token guard
    already yields the empty array)."""
    return F.array_distinct(ngram_fold(tokens(col), n))


#: Mersenne prime for the universal-hash minhash permutations.
MINHASH_P = 2_147_483_647


def _minhash_coefficients(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h'(x) = (a*x + b) mod P. Fixed LCG so
    the SQL oracle embeds the identical constants."""
    state = 42
    out = []
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (MINHASH_P - 2)) + 1  # in [1, P-1]
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MINHASH_P
        out.append((a, b))
    return out


def shingle_hashes(sh: Column) -> Column:
    """Hash each shingle once with h60 — md5 is the expensive step, so it
    runs ONCE per shingle; the per-seed minhash permutations are cheap
    arithmetic over these. SQL twin: list_transform(shingles, s -> h60(s))."""
    return F.transform(sh, lambda s: h60(s))


def minhash_signature(hashes: Column, num_hashes: int = 16) -> list[Column]:
    """MinHash signature over pre-hashed shingles via universal hashing:
    mh_j = min over h of (a_j * (h mod P) + b_j) mod P.

    All intermediates stay < 2^62, so the arithmetic is overflow-free and
    identical in any 64-bit-integer engine. Empty shingle set -> null
    minhash (min of an empty list is null in both engines).

    SQL twin per j:
      list_min(list_transform(hashes, h -> (a_j * (h % P) + b_j) % P))
    """
    coefs = _minhash_coefficients(num_hashes)

    def perm(j: int):
        a, b = coefs[j]
        # single-arg lambda: a two-arg lambda would make F.transform pass the
        # ELEMENT INDEX as the second argument, silently shadowing the seed.
        return lambda h: (F.lit(a) * (h % MINHASH_P) + F.lit(b)) % MINHASH_P

    return [
        F.array_min(F.transform(hashes, perm(j))).alias(f"mh{j}")
        for j in range(num_hashes)
    ]


def positional_shingle_hash_rows(df, id_col: str = "doc_id", text_col: str = "text",
                                 n: int = 3):
    """Exploded positional shingle hashes: one row per (id, pos, h) where h
    is h60 of the n-gram starting at token position pos.

    The shared physical kernel behind with_shingle_hashes, SimHash, and
    winnowing: posexplode + lead() windows + md5 stays entirely in
    whole-stage codegen (array higher-order functions run interpreted and
    measured ~5x slower). One shuffle on the doc id — placed BEFORE the
    tokenize+explode: the lead() window needs hashpartitioning(id) anyway,
    and shuffling compact doc text instead of exploded (id, pos, tok) rows
    both shrinks the exchange ~10x and parallelizes tokenization (the
    testdata parquet is a single row group, so the raw scan is ONE
    partition; without this the whole explode ran on one core).
    """
    from pyspark.sql import Window

    tok = (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(F.col(id_col))
        .select(F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"))
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("tok", k).over(w) for k in range(1, n)]
    sh = tok.select(
        F.col(id_col),
        F.col("pos"),
        F.concat_ws(" ", F.col("tok"), *leads).alias("s"),
        leads[-1].alias("_guard"),
    ).filter(F.col("_guard").isNotNull())
    return sh.select(F.col(id_col), F.col("pos"), h60(F.col("s")).alias("h"))
