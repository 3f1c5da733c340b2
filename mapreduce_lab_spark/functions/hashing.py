"""Cross-engine deterministic hashing primitives.

The dedup/fingerprint operators need a hash that Spark and the DuckDB
oracle compute identically. Spark's ``hash()`` (Murmur3) and DuckDB's
``hash()`` disagree, so the engine-portable primitive is md5 — both
produce the same 32-char hex — truncated to 8 hex chars and read as an
unsigned 32-bit integer. That int then feeds universal-hash
permutations ``(a*x + b) mod p`` for MinHash, with p = 2^31-1 and x
reduced mod p first so ``a*x`` stays below 2^63 (no int64 overflow in
either engine).

Scale note: md5-per-token is ~2× the cost of Murmur3 but still fully
JVM-side (no Python); on a real deployment where no external oracle
must agree, swap ``hex8_int`` for ``F.hash`` — every operator here
takes the hash as a plugged-in expression.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MINHASH_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne)

# 16 universal-hash permutations, fixed seed so Spark and the oracle
# SQL (generated from the same list) always agree.
_rng = random.Random(42)
MINHASH_PERMS: list[tuple[int, int]] = [
    (_rng.randrange(1, MINHASH_PRIME), _rng.randrange(0, MINHASH_PRIME))
    for _ in range(16)
]


def hex8_int(col: Column) -> Column:
    """First 8 hex chars of md5 as an unsigned 32-bit int (in a long)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def oracle_hex8_int(expr: str) -> str:
    """DuckDB twin of hex8_int()."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def perm_hash(x: Column, a: int, b: int) -> Column:
    """Universal hash (a*x + b) mod p over a hex8_int value."""
    p = F.lit(MINHASH_PRIME)
    return (F.lit(a) * (x % p) + F.lit(b)) % p


def oracle_perm_hash(expr: str, a: int, b: int) -> str:
    """DuckDB twin of perm_hash()."""
    p = MINHASH_PRIME
    return f"(({a} * (({expr}) % {p}) + {b}) % {p})"
