"""Engine-portable hashing primitives.

Everything is built on md5 (identical output in Spark and DuckDB) so the
DuckDB oracle can reproduce Spark results bit-for-bit. Spark's native
``hash()``/``xxhash64`` would be faster but engine-specific; md5 runs
JVM-side in codegen, which is fast enough (bench-verified) and keeps the
correctness gate meaningful. The minhash permutation family is linear
``(a_i * h + b_i) mod p`` over the 32-bit md5 prefix — one md5 per
shingle total, not per permutation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^61 - 1 (Mersenne prime); a_i < 2^31, h < 2^32 → a*h + b < 2^63, no overflow
MERSENNE_P = 2305843009213693951
_A_MOD = 2147483647


def perm_params(i: int) -> tuple[int, int]:
    """Deterministic permutation constants, same formula in SQL."""
    a = (2654435761 * (i + 1)) % _A_MOD or 1
    b = (40503 * (i + 7)) % _A_MOD
    return a, b


def h32_py(s: str) -> int:
    """Python-side mirror of h32 — for driver-side planning literals
    (BM25 band pruning predicates, pseudo-model weights, synthetic
    embeddings). One definition: a drifted copy would silently
    mis-bucket against the engine-side md5 convention."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def h32(col: Column) -> Column:
    """First 8 hex chars of md5 as a bigint in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def h32_sql(expr: str) -> str:
    return f"(('0x' || substring(md5({expr}), 1, 8))::BIGINT)"


def perm(col: Column, i: int) -> Column:
    a, b = perm_params(i)
    return (col * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


def perm_sql(expr: str, i: int) -> str:
    a, b = perm_params(i)
    return f"(({expr} * CAST({a} AS BIGINT) + {b}) % {MERSENNE_P})"


def round6(col: Column) -> Column:
    """Portable 6-dp rounding: floor(x*1e6 + 0.5)/1e6 — pure IEEE double
    ops, bit-identical across engines. Engine-native round() differs:
    Spark rounds the shortest decimal repr (BigDecimal.valueOf), DuckDB
    rounds the true binary value, so boundary cases flip."""
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def round6_sql(expr: str) -> str:
    return f"(floor(({expr}) * 1e6 + 0.5) / 1e6)"


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    return F.filter(
        F.split(F.lower(col), r"\s+"), lambda x: x != F.lit("")
    )


def tokens_sql(expr: str) -> str:
    return f"list_filter(string_split_regex(lower({expr}), '\\s+'), x -> x <> '')"


# largest prime below 2^32: combined shingle hashes stay in the 32-bit
# domain `perm` expects (a_i * h must fit int64); the rolling mix
# (c * 4099 + h) peaks below 2^45 — no overflow in either engine
SHINGLE_P = 4294967291
_MIX = 4099


def combine_shingles(th: Column, k: int = 3) -> Column:
    """Rolling-combined hashed word k-grams from a *materialized*
    token-hash column (array<bigint>): one md5 per TOKEN (not per
    shingle), then integer mixing — ~k× fewer hashes than hashing joined
    shingle strings, and bigint sets make the Jaccard set-ops integer
    comparisons. `th` must be a bound column, not an inline transform —
    element_at over an expression would re-evaluate it per element.

    PRECONDITION: rows must be pre-filtered to size(th) >= k. The
    expression is deliberately unguarded — wrapping it in when()
    disables codegen/CSE when a downstream filter references it
    (measured 200× slowdown)."""

    def combine(i):
        c = F.element_at(th, i)
        for j in range(1, k):
            c = (c * F.lit(_MIX) + F.element_at(th, i + j)) % F.lit(SHINGLE_P)
        return c

    return F.transform(F.sequence(F.lit(1), F.size(th) - (k - 1)), combine)


def combine_shingles_sql(th: str, k: int = 3) -> str:
    c = f"{th}[i]"
    for j in range(1, k):
        c = f"(({c}) * {_MIX} + {th}[i+{j}]) % {SHINGLE_P}"
    return (
        f"CASE WHEN len({th}) >= {k} THEN "
        f"list_transform(range(1, len({th}) - {k - 2}), i -> {c}) "
        f"ELSE [] END"
    )


def shingles(tok: Column, k: int = 3) -> Column:
    """Word k-grams: ['a','b','c','d'] → ['a b c', 'b c d']."""
    return F.when(
        F.size(tok) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(tok, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(tok_expr: str, k: int = 3) -> str:
    return (
        f"CASE WHEN len({tok_expr}) >= {k} THEN "
        f"list_transform(range(1, len({tok_expr}) - {k - 2}), "
        f"i -> array_to_string(({tok_expr})[i:i+{k - 1}], ' ')) "
        f"ELSE [] END"
    )
