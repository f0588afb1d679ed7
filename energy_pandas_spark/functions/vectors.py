"""Dense-vector math over ``array<float|double>`` columns.

Pure ``zip_with`` / ``aggregate`` expressions — evaluated on the JVM,
no UDF, no Arrow transfer. Accumulation is strictly left-to-right in
element order, which keeps results bit-deterministic for a given array
(and matches DuckDB's sequential list aggregation closely enough for
rounded oracle comparison).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "dot",
    "l2_norm",
    "l2_normalize",
    "cosine_similarity",
    "quantize_int8",
    "dequantize_int8",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Inner product of two equal-length array columns."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize an array column (zero vectors pass through)."""
    a = _c(a)
    n = l2_norm(a)
    return F.when(n == 0.0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda x: x.cast("double") / n)
    )


def quantize_int8(a: Column | str) -> Column:
    """Symmetric per-vector int8 quantization of an embedding column —
    the standard storage/ANN compression (4x over float32).

    Returns ``struct<scale double, q array<int>>`` with
    ``scale = max|v| / 127`` and ``q_i = round(v_i / scale)`` (so
    ``q_i * scale`` reconstructs the vector to within scale/2 per
    element). Zero vectors quantize to scale 0 and all-zero codes.
    Pure transform/aggregate expressions — JVM-side, deterministic.
    """
    a = _c(a)
    max_abs = F.aggregate(
        a,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = max_abs / F.lit(127.0)
    q = F.when(max_abs == 0.0, F.transform(a, lambda x: F.lit(0))).otherwise(
        F.transform(a, lambda x: F.round(x.cast("double") / scale).cast("int"))
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qs: Column | str) -> Column:
    """Inverse of :func:`quantize_int8`: ``array<double>`` reconstruction
    from the (scale, codes) struct."""
    qs = _c(qs)
    return F.transform(
        qs.getField("q"), lambda x: x.cast("double") * qs.getField("scale")
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    a, b = _c(a), _c(b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )
