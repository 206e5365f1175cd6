"""Distributed running (prefix) aggregates.

A global ``SUM(...) OVER (ORDER BY ...)`` collapses Spark onto a single
task (one unpartitioned window). The scalable equivalent is the classic
two-phase prefix sum:

1. range-partition by the order column and sort within partitions —
   partition p holds a contiguous, sorted key range;
2. aggregate one total per partition (tiny: #partitions rows), turn the
   totals into exclusive per-partition offsets on the driver, and
   broadcast them;
3. stream each partition once (Arrow batches), accumulating the local
   running sum on top of the partition's offset.

Cost: one range-exchange + one #partitions-row collect. Every phase is
data-parallel, so the operator holds at any corpus size, unlike the
single-task window.

No reference counterpart (net-new; the reference has no window/ordered
operators at all — SURVEY.md §2.F).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def running_sum(df: DataFrame, order_col: str, value_col: str,
                out_col: str = "running_sum",
                num_partitions: Optional[int] = None,
                small_input_threshold: int = 1_000_000) -> DataFrame:
    """Exact running sum of ``value_col`` in ``order_col`` order.

    Appends ``out_col`` (long) to the schema. ``order_col`` must be
    globally unique for a deterministic result (ties within a partition
    are broken by the in-partition sort, but the caller's semantics
    shouldn't depend on tie order).

    With ``num_partitions=None`` (adaptive, the default) the input is
    persisted and counted once; at or below ``small_input_threshold``
    rows the plain single-task window is used — optimal at that size,
    and the count has already materialized the cache so the upstream
    plan (often an expensive pipeline) runs exactly once instead of
    three times (range-sampling pass + totals job + output job). Above
    the threshold — the only regime that matters at cluster scale — the
    distributed two-phase prefix sum runs against the persisted input.
    Passing ``num_partitions`` explicitly always forces the distributed
    path.

    Caching note: the persisted frames stay cached after the returned
    DataFrame is consumed (they cannot be unpersisted before the lazy
    output plan runs). Long-lived sessions issuing many calls should
    ``spark.catalog.clearCache()`` periodically, as bench.py does.
    """
    import pandas as pd

    spark = df.sparkSession
    if num_partitions is None:
        df = df.persist()
        rows = df.count()
        if rows <= small_input_threshold:
            w = (Window.orderBy(order_col)
                 .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            return df.withColumn(out_col,
                                 F.sum(value_col).over(w).cast("long"))
    n = num_partitions or spark.sparkContext.defaultParallelism
    part = (df.repartitionByRange(n, F.col(order_col))
            .sortWithinPartitions(order_col)
            .withColumn("_pid", F.spark_partition_id())
            .persist())
    totals = {r["_pid"]: r["_t"] for r in
              part.groupBy("_pid").agg(F.sum(value_col).alias("_t"))
              .collect()}
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    bc = spark.sparkContext.broadcast(offsets)
    out_schema = part.drop("_pid").schema.add(out_col, "long")

    def _cumsum(batches):
        carry = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if carry is None:
                carry = bc.value.get(int(pdf["_pid"].iloc[0]), 0)
            run = pdf[value_col].cumsum() + carry
            carry = int(run.iloc[-1])
            out = pdf.drop(columns=["_pid"])
            out[out_col] = run.astype("int64")
            yield out

    return part.mapInPandas(_cumsum, schema=out_schema)
