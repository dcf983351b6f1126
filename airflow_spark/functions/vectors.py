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
