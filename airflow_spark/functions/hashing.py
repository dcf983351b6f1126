"""Portable uniform hashing shared by the sampling / splitting family.

One spelling, used everywhere a deterministic, engine-reproducible
uniform integer is needed (the DuckDB oracles re-derive it as
``CAST(concat('0x', substr(md5(salt || ':' || x), 1, 8)) AS BIGINT)``):
the first 8 hex digits of ``md5(salt:value)`` as a 32-bit integer.
xxhash64 is faster JVM-side but not portable SQL — use it only where
no oracle twin is needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_uniform(col: Column, salt: str, modulus: int | None = None) -> Column:
    """Uniform bigint in [0, 2^32) from ``md5(salt:value)``; reduced
    mod ``modulus`` when given. Null inputs hash to null (callers
    decide whether to drop or coalesce)."""
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), col.cast("string"))), 1, 8
            ),
            16,
            10,
        )
        .cast("bigint")
    )
    return h % modulus if modulus else h


def md5_unit_interval(col: Column, salt: str) -> Column:
    """Uniform double in (0, 1]: ``(md5_uniform + 1) / 2^32`` — the
    strictly-positive form sequential-Poisson sampling needs (a zero
    would divide away the weight)."""
    return (md5_uniform(col, salt) + 1) / F.lit(4294967296.0)
