"""Model-free deterministic text embedder — the engine's M1-lite
(reference M1: BGE dense embedding, src/embeddings/dense_embedder.py;
models are not available in this environment, so the engine ships a
hash-projection embedder with the SAME shape contract: text →
array<double>[dim], L2-normalizable, deterministic).

Each dimension is an independent md5-keyed projection of the token
stream — pure JVM column expressions, reproducible bit-for-bit by the
DuckDB oracle (same md5 → hex-parse trick the MinHash family uses). A
real model replaces this with a Pandas UDF of identical signature
(SNIPPETS.md[1] pattern); every downstream operator (cosine top-k,
near-dup, hybrid legs) is agnostic to which produced the vectors.

Construction: vec[i] = mean over tokens t of u(md5(i|t)) where u maps
the first 15 hex chars to [-1, 1). Token-frequency weighted, order-
insensitive — a bag-of-words random projection, so texts sharing tokens
land near each other (enough structure for rank-based tests)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rag_database_spark.functions.text import tokenize

EMBED_DIM = 8
_SCALE = float(1 << 59)  # hash60 range midpoint


def _unit(h: Column) -> Column:
    """60-bit unsigned hash → [-1, 1)."""
    return h / F.lit(_SCALE) - 1.0


def hash_embed(text_col: Column, dim: int = EMBED_DIM) -> Column:
    """array<double>[dim]; empty token stream → zero vector."""
    from rag_database_spark.operators.dedup import hash60

    toks = tokenize(text_col)
    n = F.size(toks)

    def merge_for(i: int):
        # plain closure: a default-arg binding would change the lambda's
        # arity and pyspark dispatches higher-order lambdas by arity
        return lambda acc, t: acc + _unit(
            hash60(F.concat(F.lit(f"e{i}|"), t))
        )

    dims = []
    for i in range(dim):
        total = F.aggregate(toks, F.lit(0.0), merge_for(i))
        dims.append(F.when(n > 0, total / n).otherwise(F.lit(0.0)))
    return F.array(*dims)
