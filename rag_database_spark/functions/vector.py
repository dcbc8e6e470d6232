"""Vector column functions — dot product, norms, cosine similarity.

Pure column expressions over ``array<float|double>`` columns; they stay
JVM-side (no Arrow hop) and are exact, unlike the reference's HNSW
approximate path (src/storage/vector_store.py:136-145). The reference
L2-normalizes embeddings at encode time (src/embeddings/dense_embedder.py:59-65),
so cosine == dot there; we provide both.

Summation is left-to-right over the array (``F.aggregate``), matching a
sequential loop — the DuckDB oracle's list functions reduce in the same
order, which keeps float results comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def l2_normalize(a: Column) -> Column:
    """Mirror of dense_embedder.py:59-65 (normalize_embeddings=True)."""
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda v: v / n)).otherwise(a)


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def to_double_array(a: Column) -> Column:
    """Cast array<float> → array<double> so accumulation happens in f64;
    the oracle casts to DOUBLE[] identically."""
    return a.cast("array<double>")
