"""Engine-portable hashing: polynomial string hashes computable
bit-identically by Spark Column expressions AND DuckDB list expressions.

Why this exists: the production dedup/fingerprint operators hash with
``xxhash64`` (JVM-side, fastest), which no SQL oracle can replicate. The
driver's correctness gate runs each catalog query against a DuckDB oracle,
so the catalog variants of minhash / simhash / winnowing swap the hash
function for a classic base-31 polynomial hash over the codepoints,
mod the Mersenne prime 2^31-1 — pure integer arithmetic both engines
evaluate identically (verified hash-equal at sf0.01/sf0.1). The operator
*logic* (shingling, banding, bit-vote, windowed min) is the same code path
either way: only the leaf hash expression is swapped.

Spark fold: aggregate(sequence(1, len), 0, (acc,i) -> (acc*31 + ord(c_i)) % p)
DuckDB fold: list_reduce(list_transform(range(1, len+1), i -> ord(...)), ...)
(list_reduce seeds with the first element; identical because 0*31+c1 = c1 < p.)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MERSENNE = (1 << 31) - 1


def poly_hash(c: Column, mult: int = 31) -> Column:
    """Base-``mult`` polynomial hash of a non-empty string column, mod 2^31-1.

    Stays in [0, 2^31-1): mult < 2^31 keeps every intermediate product
    below 2^62 — no int64 overflow.
    """
    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1))),
        F.lit(0).cast("bigint"),
        lambda acc, i: (acc * mult + F.ascii(c.substr(i, F.lit(1)))) % F.lit(MERSENNE),
    )


def poly_hash_wide(c: Column) -> Column:
    """62-bit portable hash: two independent poly hashes packed as
    h31(c) * 2^31 + h131(c). Non-negative bigint; bits 0..61 usable."""
    return poly_hash(c, 31) * F.lit(1 << 31).cast("bigint") + poly_hash(c, 131)


def md5_hash60(c: Column) -> Column:
    """60-bit engine-portable hash: first 15 hex chars of md5, as bigint.
    Native md5 in both engines — use this where the hash is applied per
    k-gram at scan volume (the per-char polynomial fold is interpreted
    per-element and too slow there)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def duck_md5_hash60(s: str) -> str:
    """DuckDB SQL fragment matching md5_hash60."""
    return f"CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"


def duck_poly(s: str, mult: int = 31) -> str:
    """DuckDB SQL fragment computing poly_hash(s, mult); ``s`` is a SQL
    expression yielding a non-empty VARCHAR."""
    return (
        f"list_reduce(list_transform(range(1, length({s})+1), "
        f"i -> CAST(ord(substr({s}, CAST(i AS INT), 1)) AS BIGINT)), "
        f"(a,b) -> (a*{mult}+b) % {MERSENNE})"
    )


def duck_poly_wide(s: str) -> str:
    return f"({duck_poly(s, 31)} * {1 << 31} + {duck_poly(s, 131)})"
