"""Cross-engine text primitives: tokenization, portable hashing, shingles.

Portable 60-bit hash: both Spark and DuckDB expose md5() with identical
output, so ``hash60(s) = int(md5(s)[:15], 16)`` is computable in both —
Spark via conv(hex,16,10), DuckDB via CAST('0x'||hex AS BIGINT). 15 hex
digits < 2^60, so it fits a signed BIGINT with headroom for modular
arithmetic in MinHash permutations. Spark's native xxhash64 would be faster
but is not reproducible in the oracle; production can swap it in behind the
same API.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: (a*h + b) stays under 2^62 for a,b,h < P.
MINHASH_PRIME = 2_147_483_647


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization of trimmed text (Spark side)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.split(F.trim(col), r"\s+")


def sql_tokens(expr: str) -> str:
    """DuckDB twin of :func:`tokens`."""
    return f"string_split_regex(trim({expr}), '\\s+')"


def hash60(c: Column) -> Column:
    """Portable 60-bit hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def sql_hash60(expr: str) -> str:
    """DuckDB twin of :func:`hash60`."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def normalized(c: Column | str) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapsed
    whitespace, trimmed."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def sql_normalized(expr: str) -> str:
    return f"regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g')"


def shingles_from(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    array column: the MinHash input set.

    ``toks`` must be a plain column reference (project the tokenization
    into a column first). Passing the ``tokens(...)`` expression directly
    would re-run the regex split inside every ``element_at`` of the lambda
    — O(positions × n) tokenizations per document, which measured ~5×
    slower than the whole rest of the MinHash pipeline.

    Documents shorter than n words yield a single shingle (the whole text),
    so every document has a non-empty set.
    """
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), k - n + 1),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.array_distinct(
        F.when(k >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def sql_word_shingles(toks_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles_from` over a token-list expression.

    ``toks_expr`` should be a (cheap) reference to an already-computed token
    list column — it is referenced n+2 times.
    """
    parts = " || ' ' || ".join(f"{toks_expr}[i+{j}]" for j in range(n))
    return (
        f"list_distinct(CASE WHEN len({toks_expr}) >= {n} THEN "
        f"list_transform(range(1, len({toks_expr}) - {n} + 2), i -> {parts}) "
        f"ELSE [array_to_string({toks_expr}, ' ')] END)"
    )


def raw_shingles_from(toks: Column, n: int = 3) -> Column:
    """Word n-grams WITH multiplicity (no ``array_distinct``) — the input
    for term-frequency-weighted sparse vectors (all-pairs cosine), where
    a repeated shingle must count twice. Same short-document convention as
    :func:`shingles_from` (documents under n words yield one whole-text
    gram)."""
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), k - n + 1),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(k >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))


def sql_raw_word_shingles(toks_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`raw_shingles_from` (multiplicity-preserving)."""
    parts = " || ' ' || ".join(f"{toks_expr}[i+{j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks_expr}) >= {n} THEN "
        f"list_transform(range(1, len({toks_expr}) - {n} + 2), i -> {parts}) "
        f"ELSE [array_to_string({toks_expr}, ' ')] END"
    )
