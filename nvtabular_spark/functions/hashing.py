"""Stable hashing contract.

The reference hashes with cuDF ``hash_series`` and explicitly disclaims
GPU/CPU hash consistency (categorify.py:332-338). We therefore define
our own engine contract with two interchangeable hash families:

* ``xxhash64`` (default) — Spark's built-in 64-bit xxHash; JVM-side,
  codegen'd, the fast path at scale.
* ``md5`` ("portable") — first 60 bits of md5 of the string form;
  slower but reproducible in any SQL engine (DuckDB oracle parity:
  ``CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)``).

Both treat NULL as NULL (callers decide null routing before hashing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_FAMILIES = ("xxhash64", "md5")


def hash64(col: Column, family: str = "xxhash64", seed: int = 0) -> Column:
    """64-bit (md5: 60-bit, always non-negative) hash of a column."""
    if family == "xxhash64":
        if seed:
            return F.xxhash64(col, F.lit(seed))
        return F.xxhash64(col)
    if family == "md5":
        h = F.md5(col.cast("string") if seed == 0
                  else F.concat(col.cast("string"), F.lit(f"#{seed}")))
        return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash family {family!r}; use one of {HASH_FAMILIES}")


def hash_bucket(col: Column, num_buckets: int, family: str = "xxhash64",
                seed: int = 0) -> Column:
    """Non-negative bucket id in [0, num_buckets)."""
    return F.pmod(hash64(col, family, seed), F.lit(num_buckets))


def md5_hash64_sql(expr: str) -> str:
    """ANSI/DuckDB SQL equivalent of ``hash64(col, 'md5')`` — used to
    build oracle queries that agree bit-for-bit with the Spark plan."""
    return f"CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"


def md5_bucket_sql(expr: str, num_buckets: int) -> str:
    return f"({md5_hash64_sql(expr)} % {num_buckets})"
