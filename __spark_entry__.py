"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine lives in ``rag_database_spark``; every entry here cites the
SURVEY §2 operator ids it exercises.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from rag_database_spark import oracles, workload
from rag_database_spark.operators import bm25 as bm25_ops
from rag_database_spark.operators import similarity
from rag_database_spark.operators.fusion import FETCH_MULTIPLIER
from rag_database_spark.operators.hybrid import hybrid_search
from rag_database_spark.sources.tables import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch hybrid search (Q1 = A3+J11+W1+A1+T2) at sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    return _hybrid_rrf(spark, sf_dir)


# --------------------------------------------------------------------------
# queries() entries — each (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------


def _bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/T1/W1: batch BM25 top-k over documents."""
    docs = load_table(spark, sf_dir, "documents")
    queries = workload.queries_df(spark)
    scored = bm25_ops.score_queries(
        queries, bm25_ops.build_postings(docs), bm25_ops.build_doclens(docs)
    )
    limit = workload.HYBRID_LIMIT * FETCH_MULTIPLIER
    return bm25_ops.topk(scored, limit).select(
        "query_id",
        "doc_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def _dense_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11/T3: exact batch cosine top-k over embeddings."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = workload.queries_df(spark)
    qvecs = queries.join(
        emb, queries["query_vec_id"] == emb["vec_id"]
    ).select("query_id", F.col("embedding").alias("qvec"))
    return similarity.cosine_topk(
        qvecs, emb, workload.HYBRID_LIMIT, id_col="vec_id", vec_col="embedding"
    ).select(
        "query_id",
        "id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def _hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: BM25 + dense legs fused with weighted RRF (k=60, .3/.5)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = workload.queries_df(spark)
    return hybrid_search(queries, docs, emb, limit=workload.HYBRID_LIMIT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": _bm25_topk,
        "dense_topk": _dense_topk,
        "hybrid_rrf": _hybrid_rrf,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk": oracles.bm25_topk_sql(),
        "dense_topk": oracles.dense_topk_sql(),
        "hybrid_rrf": oracles.hybrid_rrf_sql(),
    }
