"""rag_database_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference RAG engine (anuj2504/Rag-database),
re-expressed Spark-first for 100 TB batch scale.

Layout:
    session     — SparkSession builder tuned for local test / cluster scale
    sources     — table loaders / writers (Parquet, tenant-partitioned)
    functions   — pure column-expression function families (text, vector, extraction)
    operators   — composite DataFrame operators (bm25, similarity, fusion, dedup, graph, ...)
    streaming   — Structured Streaming ingestion & windowed analytics
"""

__version__ = "0.1.0"
