"""Table catalog and format readers/writers.

Scale posture: readers never infer schemas on big data unless asked
(schema inference scans the input twice); writers bound file sizes so
downstream scans parallelize.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CANONICAL_TABLES: List[str] = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (no session-global conf mutation; timestamp columns
    load with Spark's native parquet mapping — TIMESTAMP_NTZ for
    isAdjustedToUTC=false)."""
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str,
             schema: Optional[StructType] = None,
             header: bool = True, **options) -> DataFrame:
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # Schema inference is an extra full scan — acceptable only on
        # small inputs; callers on big data should pass a schema.
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str,
              schema: Optional[StructType] = None, **options) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One canonical testdata table (TESTDATA.md layout)."""
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str,
                names: Optional[List[str]] = None) -> Dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name)
            for name in (names or CANONICAL_TABLES)}


def register_temp_views(spark: SparkSession, sf_dir: str,
                        names: Optional[List[str]] = None) -> None:
    """Register canonical tables as temp views for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def write_parquet(df: DataFrame, path: str,
                  partition_by: Optional[List[str]] = None,
                  max_records_per_file: int = 1_000_000,
                  mode: str = "error") -> None:
    """Parquet sink with bounded file sizes (so a 100 TB output still scans
    with good parallelism) and optional hive-style partitioning."""
    writer = df.write.mode(mode).option("maxRecordsPerFile",
                                        max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(df: DataFrame, table: str, bucket_cols: List[str],
                         num_buckets: int = 32,
                         sort_cols: Optional[List[str]] = None,
                         mode: str = "error") -> None:
    """Bucketed managed table: co-locates future joins/aggregations on the
    bucket columns — repeated joins on the same key skip their shuffle
    entirely (the 100 TB answer to 'this join runs every day'). Bucketing
    requires saveAsTable (bucket metadata lives in the catalog)."""
    writer = (df.write.mode(mode)
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_stream(spark: SparkSession, path: str, schema: StructType,
                fmt: str = "parquet",
                max_files_per_trigger: Optional[int] = None) -> DataFrame:
    """File-based streaming source. Streaming readers REQUIRE an explicit
    schema (no inference mid-stream); ``maxFilesPerTrigger`` bounds
    per-micro-batch work."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader (columnar, predicate-pushdown-capable like parquet;
    built into Spark — no extra packages)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str,
              partition_by: Optional[List[str]] = None,
              max_records_per_file: int = 1_000_000,
              mode: str = "error") -> None:
    """ORC sink with the same bounded-file-size posture as
    write_parquet."""
    writer = df.write.mode(mode).option("maxRecordsPerFile",
                                        max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_stream(df: DataFrame, path: str, checkpoint_dir: str,
                 fmt: str = "parquet",
                 output_mode: str = "append",
                 available_now: bool = False,
                 processing_time: Optional[str] = None,
                 partition_by: Optional[List[str]] = None):
    """File streaming sink with MANDATORY checkpointing (exactly-once
    file outputs survive restarts only through the checkpoint — an
    un-checkpointed file sink silently reprocesses everything on
    restart). ``available_now=True`` drains the source then stops (the
    batch-backfill trigger); otherwise ``processing_time`` (e.g.
    "30 seconds") sets the micro-batch cadence. Returns the started
    StreamingQuery — callers own awaitTermination/stop."""
    writer = (df.writeStream.format(fmt)
              .outputMode(output_mode)
              .option("path", path)
              .option("checkpointLocation", checkpoint_dir))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
