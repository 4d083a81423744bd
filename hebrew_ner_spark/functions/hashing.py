"""Portable deterministic hashing shared by Spark plans and DuckDB oracles.

The dedup / fingerprint / LSH operators need hash functions that (a) run
JVM-side in Spark (no Python in the hot path) and (b) can be reproduced
bit-for-bit by the DuckDB correctness oracle. ``xxhash64``'s seed handling
is Spark-private, so we standardise on the first 60 bits of md5 — both
engines expose md5 over identical UTF-8 bytes:

    spark:  conv(substr(md5(concat(s, ':', seed)), 1, 15), 16, 10)::long
    duckdb: CAST(concat('0x', substr(md5(s || ':' || seed), 1, 15)) AS BIGINT)

15 hex digits = 60 bits, comfortably inside a signed 64-bit int, so the
two engines agree exactly (verified by the correctness gate on every run).

At 100 TB md5 costs more than xxhash64 but is still ~GB/s per core and
stays inside whole-stage codegen; swap `phash_col` for `xxhash64` on a real
cluster if oracle portability is no longer needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60


def phash_py(s: str, seed: int = 0) -> int:
    """The same 60-bit hash in pure Python — single source of truth for
    driver-side constant derivation (CRF weights, minhash coefficients,
    LSH sign matrices)."""
    import hashlib

    return int(hashlib.md5(f"{s}:{seed}".encode()).hexdigest()[:15], 16)


def phash_col(col: Column, seed: int) -> Column:
    """60-bit portable hash of a string column, JVM-side."""
    return (
        F.conv(F.substring(F.md5(F.concat_ws(":", col, F.lit(str(seed)))), 1, 15), 16, 10)
        .cast("long")
    )


def phash_sql_expr(col_name: str, seed: int) -> str:
    """Spark SQL fragment equivalent of phash_col (for use inside expr())."""
    return (
        f"CAST(conv(substr(md5(concat({col_name}, ':', '{seed}')), 1, 15), 16, 10) AS BIGINT)"
    )


def phash_duck(expr: str, seed: int) -> str:
    """DuckDB SQL fragment computing the identical 60-bit hash."""
    return (
        f"CAST(concat('0x', substr(md5({expr} || ':{seed}'), 1, 15)) AS BIGINT)"
    )


def shingles_col(toks_col: str, k: int) -> Column:
    """Distinct word k-gram shingles of an array<string> column, JVM-side.

    Documents shorter than k tokens yield an empty array (guarded — Spark's
    sequence() would otherwise generate a *descending* range).
    """
    return F.expr(
        f"""
        CASE WHEN size({toks_col}) < {k} THEN array()
             ELSE array_distinct(transform(
                    sequence(0, size({toks_col}) - {k}),
                    i -> concat_ws(' ', slice({toks_col}, i + 1, {k}))))
        END
        """
    )


def shingles_duck(toks_expr: str, k: int) -> str:
    """DuckDB fragment: distinct k-gram shingles of a list-of-varchar expr.

    DuckDB range(a, b) is empty when b <= a, so no short-doc guard needed;
    list slicing is 1-based and end-inclusive.
    """
    return (
        f"list_distinct(list_transform(range(0, len({toks_expr}) - {k} + 1), "
        f"i -> array_to_string(({toks_expr})[i + 1:i + {k}], ' ')))"
    )


# --- MinHash universal-hash family -----------------------------------------
#
# H seeded hashes per shingle as H md5 calls is the dominant dedup cost at
# corpus scale. The standard fix: ONE strong base hash per shingle, then a
# universal family h_s(x) = (a_s * x + b_s) mod p over it. p = 2^31 - 1
# keeps a_s * x + b_s < 2^62 — exact in int64, so Spark and DuckDB agree
# bit-for-bit with plain integer arithmetic (no 128-bit ops needed).

MINHASH_P = 2_147_483_647  # 2^31 - 1, Mersenne prime


def minhash_coeffs(num: int) -> list[tuple[int, int]]:
    """Deterministic (a_s, b_s) per seed, derived from the portable md5
    hash: a in [1, p-1], b in [0, p-1]."""
    out = []
    for s in range(num):
        a = phash_py(f"A|{s}") % (MINHASH_P - 1) + 1
        b = phash_py(f"B|{s}") % MINHASH_P
        out.append((a, b))
    return out
