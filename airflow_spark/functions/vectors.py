"""Vector (array<float/double>) column functions.

JVM-side higher-order functions (zip_with / aggregate) — per-row work
stays in codegen; no Arrow round-trip. Accumulation is in DOUBLE for
stability regardless of the storage element type (float32 in the
embeddings table).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _sum_array(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array columns."""
    return _sum_array(F.zip_with(_col(a), _col(b), lambda x, y: x * y))


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(_sum_array(F.transform(_col(a), lambda x: x * x)))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either side has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def lit_vector(values: list[float]) -> Column:
    """A literal array<double> column from a Python list (broadcast as
    part of the plan — for probe/query vectors)."""
    return F.array(*[F.lit(float(v)) for v in values])


def quantize_int8(vec: Column | str) -> Column:
    """Max-abs symmetric int8 quantization of a float vector:
    ``struct(scale double, codes array<tinyint>)`` with
    ``scale = max|x|/127`` and ``code = floor(x/scale + 0.5)``
    (round-half-up spelled as floor so every engine agrees on ties).
    4x smaller than float32 at <0.5% cosine error on unit vectors —
    the storage/IO lever for a 100 TB embedding corpus. Zero vectors
    get scale 0 and all-zero codes. Expression-only (no UDF)."""
    v = F.transform(_col(vec), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    codes = F.when(
        scale > 0,
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("tinyint")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return F.struct(
        F.coalesce(scale, F.lit(0.0)).alias("scale"), codes.alias("codes")
    )


def dequantize_int8(q: Column | str) -> Column:
    """Inverse of ``quantize_int8``: ``array<double>`` reconstruction
    ``code * scale``."""
    qq = _col(q)
    return F.transform(
        qq.getField("codes"), lambda c: c.cast("double") * qq.getField("scale")
    )
