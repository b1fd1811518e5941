"""Portable (engine-agnostic) hashing built on md5.

Spark's ``hash()`` / ``xxhash64()`` are engine-specific, so results
could never be verified by an external oracle. Instead we derive 32-bit
integers from the md5 hex digest, which every SQL engine computes
identically:

    portable_hash(s, seed) = int(md5(seed || ':' || s)[0:8], 16)

DuckDB equivalent (used in oracle SQL):

    CAST(concat('0x', substr(md5(concat('<seed>', ':', s)), 1, 8)) AS BIGINT)

md5 runs JVM-side inside whole-stage codegen; at 100 TB this is a
per-row scalar op with no shuffle implications.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash(col: Column | str, seed: int = 0) -> Column:
    """32-bit non-negative integer hash of a string column, as BIGINT.

    Stable across Spark, DuckDB, Python (hashlib) — see module doc.
    """
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(str(seed)), F.lit(":"), c)
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")


def portable_hash_sql(expr: str, seed: int = 0) -> str:
    """DuckDB SQL text computing the same value as ``portable_hash``."""
    return (
        f"CAST(concat('0x', substr(md5(concat('{seed}', ':', {expr}))"
        f", 1, 8)) AS BIGINT)"
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized, lowercased text.

    The batch analogue of a rolling content hash — used for exact-dup
    detection where byte-identical modulo whitespace counts as equal.
    """
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.md5(normalized)


def fingerprint_sql(expr: str) -> str:
    """DuckDB SQL computing the same value as ``fingerprint``."""
    return f"md5(lower(trim(regexp_replace({expr}, '\\s+', ' ', 'g'))))"
