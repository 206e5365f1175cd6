"""Public-partition overlap summary.

Reference semantics: analysis/dataset_summary.py:22-108 — how many of the
declared public partitions actually occur in the data, how many will be
released empty, and how much data the public filter drops.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelinedp_spark.dp_engine import DataFrameExtractors


@dataclasses.dataclass
class PublicPartitionsSummary:
    """Reference: analysis/dataset_summary.py (PublicPartitionsSummary)."""

    num_dataset_partitions: int
    num_public_partitions: int
    num_in_both: int
    num_dataset_only: int  # present in data, dropped by the public filter
    num_public_only: int   # released as empty partitions
    ratio_rows_dropped: float


def compute_public_partitions_summary(
        df: DataFrame, extractors: DataFrameExtractors,
        public_partitions: Sequence) -> PublicPartitionsSummary:
    """Two small aggregations: distinct dataset partitions (with row
    counts) joined against the broadcast public list."""
    pk_cols = list(extractors.partition_key_columns)
    spark = df.sparkSession
    pub_rows = list(dict.fromkeys(
        p if isinstance(p, tuple) else (p,) for p in public_partitions))
    pub_df = spark.createDataFrame(pub_rows, pk_cols)

    counts = df.groupBy(*pk_cols).agg(F.count(F.lit(1)).alias("__n__"))
    joined = counts.join(F.broadcast(pub_df.withColumn("__pub__",
                                                       F.lit(True))),
                         on=pk_cols, how="full_outer")
    agg = joined.agg(
        F.sum(F.when(F.col("__n__").isNotNull(), 1).otherwise(0))
        .alias("n_dataset"),
        F.sum(F.when(F.col("__n__").isNotNull() &
                     F.col("__pub__").isNotNull(), 1).otherwise(0))
        .alias("n_both"),
        F.sum(F.when(F.col("__n__").isNotNull() & F.col("__pub__").isNull(),
                     1).otherwise(0)).alias("n_dataset_only"),
        F.sum(F.when(F.col("__n__").isNull(), 1).otherwise(0))
        .alias("n_public_only"),
        F.sum(F.when(F.col("__pub__").isNull(), F.col("__n__"))
              .otherwise(0)).alias("rows_dropped"),
        F.sum(F.coalesce(F.col("__n__"), F.lit(0))).alias("rows_total"),
    ).collect()[0]
    total = agg["rows_total"] or 0
    return PublicPartitionsSummary(
        num_dataset_partitions=int(agg["n_dataset"] or 0),
        num_public_partitions=len(pub_rows),
        num_in_both=int(agg["n_both"] or 0),
        num_dataset_only=int(agg["n_dataset_only"] or 0),
        num_public_only=int(agg["n_public_only"] or 0),
        ratio_rows_dropped=(float(agg["rows_dropped"] or 0) / total
                            if total else 0.0))
