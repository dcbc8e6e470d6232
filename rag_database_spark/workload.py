"""Deterministic bulk-query workload over the driver's tables.

The reference serves one query per HTTP request (src/api/main.py:370-445);
the batch engine evaluates a *workload* of queries in one plan — the
Spark-idiomatic form (SURVEY §3.1 "batch of queries runs the same plan
with an extra query_id grouping column").

These constants are the single source of truth for BOTH the Spark
queries and the DuckDB oracle SQL (interpolated there), so the two sides
can never drift.

Each workload row: (query_id, query_text, query_vec_id) — the dense leg
uses the embedding row with vec_id == query_vec_id as the query vector
(deterministic, model-free; FIXTURES.md's hash-projection idea adapted
to the driver's real tables where doc_id and vec_id are aligned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

HYBRID_QUERIES: tuple[tuple[int, str, int], ...] = (
    (1, "fast hash join order table scan", 3),
    (2, "window merge sort batch stream", 7),
    (3, "spark filter scan column vector", 42),
    (4, "customer data group agg value", 99),
    (5, "slow query row key part small", 123),
)

HYBRID_LIMIT = 10

# vec_ids whose embeddings act as standalone similarity-search queries
KNN_QUERY_IDS: tuple[int, ...] = (0, 7, 42, 99, 123)
KNN_K = 10


def queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(HYBRID_QUERIES), "query_id long, query_text string, query_vec_id long"
    )


def queries_values_sql() -> str:
    """DuckDB VALUES literal for the same workload."""
    rows = ", ".join(
        f"({qid}, '{text}', {vid})" for qid, text, vid in HYBRID_QUERIES
    )
    return f"(VALUES {rows}) AS q(query_id, query_text, query_vec_id)"
