"""Parquet table sources and tenant-partitioned sinks.

The driver materializes ten deterministic tables per scale factor
(TESTDATA.md). Loading is a plain columnar scan: Catalyst pushes filters
and prunes columns into the Parquet reader, so callers should express
predicates on the returned DataFrame rather than pre-collecting.

Reference parity: the reference's stores (pickle BM25, Qdrant, Postgres —
src/storage/{bm25_store,vector_store,metadata_store}.py) become Parquet
tables; its per-document delete+reinsert upsert (metadata_store.py:799-847)
maps to dynamic partition overwrite in ``write_partitioned``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# fan_out target = this × defaultParallelism. Two tasks per core
# smooths per-row cost skew (document lengths vary ~100×, so exactly
# core-count partitions leave stragglers holding the stage open) while
# keeping tasks big enough to amortize per-task setup of the very wide
# generated projections — measured at sf0.1: factor 8 (19 rows/task)
# was 5-20× SLOWER than factor 2 on the 19-regex quality scan.
FAN_OUT_FACTOR = 2

# Memoized input partition counts keyed by the DataFrame's semantic
# hash: probing via df.rdd.getNumPartitions() builds the full physical
# plan + RDD lineage, which is pure driver overhead when the same scan
# feeds many operators. The hash covers the analyzed plan (source path
# included), so a repeat probe of the same input is a dict hit. Bounded
# so a long-lived session can't grow it without limit; staleness (a
# path re-written with more files between calls) only costs one
# redundant exchange, never correctness.
_FAN_OUT_MEMO: dict[int, int] = {}
_FAN_OUT_MEMO_MAX = 256


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin reshard an under-parallel input before a CPU-heavy
    per-row stage (regex banks, shingle hashing, embedding).

    A small parquet table arrives as ONE input split (one file, one row
    group), so without this every per-row-expensive projection — and the
    map side of any groupBy that follows it — runs on a single core no
    matter how many the cluster has. At production scale inputs arrive
    in many files/row-groups, the partition count already exceeds the
    target, and this returns the input unchanged — the extra exchange
    exists only in the degenerate under-split case, where its cost
    (shuffling the raw rows once) is dwarfed by the parallelism it buys.

    Apply per-operator, only before genuinely CPU-bound projections
    (the 19-regex quality scan, rolling-hash fingerprints, shingle
    hashing, hash embedding): measured at sf0.1 the reshard wins 2-6×
    there but costs ~0.6-1 s where the per-row work is one cheap split
    (the chunk pipeline) or where a shuffle follows anyway (exact
    dedup's groupBy).
    """
    spark = df.sparkSession
    target = min_parts or FAN_OUT_FACTOR * spark.sparkContext.defaultParallelism
    key = df.semanticHash()
    nparts = _FAN_OUT_MEMO.get(key)
    if nparts is None:
        nparts = df.rdd.getNumPartitions()
        if len(_FAN_OUT_MEMO) >= _FAN_OUT_MEMO_MAX:
            _FAN_OUT_MEMO.clear()
        _FAN_OUT_MEMO[key] = nparts
    if nparts >= target:
        return df
    return df.repartition(target)


# columns stored as TIMESTAMP(NANOS) in the driver parquet; Spark reads
# them as long (nanosAsLong) and we convert to micros-precision
# timestamps — the same truncation DuckDB applies reading NANOS.
_NANOS_TS_COLS = {"events": ("ts",), "orders": ("o_orderdate",),
                  "lineitem": ("l_shipdate",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table. Column pruning / predicate pushdown apply."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # The driver parquet stores TIMESTAMP(NANOS); a vanilla session throws
    # PARQUET_TYPE_ILLEGAL without this runtime-settable conf. Idempotent,
    # so set it here rather than relying on session-build configuration.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Timestamps must collect in UTC to hash-match the DuckDB oracle on a
    # harness-built session whose default tz is the host's. Also runtime-
    # settable and idempotent.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Parquet timestamp[us] without a timezone would load as
    # TIMESTAMP_NTZ under Spark 4's inference default, which functions
    # like unix_micros reject outright; with the session pinned to UTC
    # the LTZ reading is byte-identical, so disable the inference.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            # integer `div`, NOT float division: epoch-nanos ≈ 1.7e18
            # exceeds double's 53-bit mantissa, so /1000 rounds the
            # low microseconds
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql access."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("organization_id",),
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Tenant-partitioned Parquet sink.

    ``dynamic=True`` + mode=overwrite replaces only the partitions present
    in ``df`` — the Spark-native form of the reference's per-document
    delete-then-insert re-ingest (metadata_store.py:799-847), idempotent
    under replay.
    """
    writer = df.write.mode(mode)
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def append_tombstones(spark, root: str, ids, id_col: str = "doc_id") -> None:
    """Shared logical-delete primitive for persisted index artifacts
    (BM25 postings, IVF lists, IVF-PQ coded lists): append the ids to
    a tombstone table under the artifact root — cost ∝ delta, never
    a rewrite; the matching reader anti-joins them out
    (merge-on-read, the ``sources/acid.py`` contract). Idempotent
    under replay: duplicate tombstone rows change nothing.

    A DataFrame argument must either carry ``id_col`` or be a single
    column (taken as the ids whatever its name); a multi-column frame
    without ``id_col`` raises — silently tombstoning whichever column
    happened to be first would delete the wrong rows with no error."""
    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame(
            [(int(i),) for i in ids], f"{id_col} long"
        )
    if id_col in ids.columns:
        src = id_col
    elif len(ids.columns) == 1:
        src = ids.columns[0]
    else:
        raise ValueError(
            f"append_tombstones: no column {id_col!r} in {ids.columns}; "
            "pass the id column explicitly or a single-column frame"
        )
    ids.select(F.col(src).alias(id_col)).write.mode(
        "append"
    ).parquet(f"{root}/tombstones")


def read_tombstones(spark, root: str, id_col: str = "doc_id"):
    """Distinct tombstoned ids under an artifact root, or None when no
    delete has ever run. Existence goes through the root's Hadoop
    FileSystem so ``hdfs://`` / object-store artifacts behave like
    local ones."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(f"{root}/tombstones")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    tomb = spark.read.parquet(f"{root}/tombstones")
    return tomb.select(F.col(tomb.columns[0]).alias(id_col)).distinct()
