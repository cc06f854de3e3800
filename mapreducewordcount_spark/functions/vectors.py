"""Vector math over ``array<float>`` embedding columns.

Pure column expressions (``zip_with`` + ``aggregate``) — the dot
product runs inside codegen, no Python round-trip. Elements are cast
to double *before* accumulation so results are reproducible across
engines (and match a DuckDB ``DOUBLE[]`` oracle bit-for-bit up to
summation order; left-to-right in both).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(F.zip_with(_d(a), _d(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def hyperplane_bits(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-random-projection LSH key: one bit per hyperplane.

    ``planes`` is a small driver-side list of fixed-seed hyperplanes —
    embedded as literals into the plan (broadcast by value), so the
    bucketing is a pure column expression. Vectors with the same bit
    string land in the same LSH bucket; cosine-similar vectors agree
    on most hyperplane signs.
    """
    bits = []
    for plane in planes:
        arr = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(F.zip_with(_d(vec), arr, lambda x, y: x * y),
                        F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)
