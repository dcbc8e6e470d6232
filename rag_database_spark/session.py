"""SparkSession factory.

Local test mode runs ``local[$SPARK_GRAFT_CPUS]`` in one JVM; on a real
cluster the same configs apply per-executor. Scale-relevant choices:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting) —
  at 100 TB the static ``spark.sql.shuffle.partitions`` is only a ceiling;
  AQE right-sizes each exchange from observed map output.
- Arrow on — every Pandas-UDF boundary (embedding, MaxSim, chunkers)
  transfers columnar batches, not pickled rows.
- UTC session timezone — parquet timestamps compare bit-identically with
  the DuckDB oracle.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "rag_database_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the session.

    On a cluster, drop the ``master`` override and submit with
    ``spark-submit --master yarn|k8s`` — everything else carries over.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata writes TIMESTAMP(NANOS) parquet; read as long
        # and convert at the source (sources.tables.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # The generated-class cache defaults to 100 entries; a workload
        # running 60+ distinct queries interleaved (bench, a real query
        # server) evicts constantly and pays seconds of Janino
        # recompilation PER QUERY PER PASS — measured 2-5× inflation of
        # steady-state times at sf0.1. Static conf: must be set here.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # bucketed tables (bm25.write_index_bucketed) land here; static
        # conf, so it must be set before the session exists
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                str(Path(__file__).resolve().parent.parent / ".cache" / "warehouse"),
            ),
        )
        .config("spark.ui.enabled", "false")
        # files.maxPartitionBytes default 128m is right for the 100 TB target;
        # local sf tables are single files and AQE coalesces the tail.
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
