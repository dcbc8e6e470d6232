from rag_database_spark.functions import text, vector

__all__ = ["text", "vector"]
