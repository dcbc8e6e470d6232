"""Structured Streaming ingestion + windowed analytics (engine
extension — SURVEY §2.11: the reference has no streams; its ingestion
is request-driven batch, master_pipeline.py:772-845. The streaming path
reuses the SAME transformations via foreachBatch, so batch and stream
stay semantically identical — the batch form is what the DuckDB oracle
checks).

Scale notes: the tumbling aggregation is keyed on (window, event_type)
— bounded state per window; the watermark bounds how long state is
retained, so a perpetual stream holds O(#types × #open windows) rows of
state per executor. File-source streaming scales by listing parallelism
and maxFilesPerTrigger back-pressure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
DEFAULT_WATERMARK = "2 hours"


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream with an explicit schema (streams cannot
    infer). ``maxFilesPerTrigger`` is the back-pressure knob."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def hourly_event_agg(events: DataFrame, exact_users: bool = True) -> DataFrame:
    """Tumbling 1-hour windows per event type: count, value sum, user
    reach. Works identically on a batch frame (the oracle-checked form)
    and a stream (add ``with_watermark`` first).

    ``exact_users=False`` switches to ``approx_count_distinct`` — the
    streaming-legal and 100 TB-friendly form (exact distinct is
    unsupported in streaming aggregation and shuffles every user id)."""
    users = (
        F.countDistinct("user_id")
        if exact_users
        else F.approx_count_distinct("user_id")
    )
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            users.alias("n_users"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def sliding_event_agg(events: DataFrame) -> DataFrame:
    """Sliding 1-hour windows every 15 minutes — each event lands in 4
    windows (late-data demo surface; not oracle-checked since DuckDB
    has no window-duplication primitive)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("bucket_start"), "n_events")
    )


def with_watermark(
    events: DataFrame, delay: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Late-data policy: rows later than ``delay`` behind the max seen
    event time are dropped and their windows finalized."""
    return events.withWatermark("ts", delay)


def stream_hourly_to_memory(
    spark: SparkSession, src_path: str, query_name: str
):
    """Run the hourly aggregation over all currently-available files
    (availableNow trigger) into an in-memory sink — the test/demo
    topology. Returns the StreamingQuery (caller awaits termination)."""
    stream = with_watermark(read_event_stream(spark, src_path))
    return (
        hourly_event_agg(stream, exact_users=False)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def stream_ingest_documents(
    spark: SparkSession, src_path: str, dst_path: str, schema: str
):
    """S14-analog incremental ingest: each micro-batch of documents runs
    the SAME chunk pipeline as batch ingest and appends parquet —
    foreachBatch reuse keeps stream/batch semantics identical."""
    from rag_database_spark.operators.chunking import chunk_pipeline

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        chunk_pipeline(batch_df).write.mode("append").parquet(dst_path)

    return (
        spark.readStream.schema(schema)
        .parquet(src_path)
        .writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .option("checkpointLocation", dst_path + "_checkpoint")
        .start()
    )
