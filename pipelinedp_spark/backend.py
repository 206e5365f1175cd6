"""Dataflow primitives: the reference backend surface as DataFrame helpers.

The reference defines a ~20-op ``PipelineBackend`` interface executed on
RDDs/PCollections/python iterables (reference:
pipeline_dp/pipeline_backend.py:29-263, spark_rdd_backend.py:24-152). In a
Spark-first engine these are thin, named wrappers over DataFrame operators —
kept as an explicit module so the operator inventory is visible, testable,
and consistently tuned (broadcast thresholds, salting, bounded sampling).

Conventions: ops take/return DataFrames with *named columns*; keyed ops take
the key column name(s) explicitly (the reference's (k, v) tuples become
columns — reference: pipeline_dp/dp_engine.py:129-195's retyped tuples).

Scale notes baked in:
- ``sample_fixed_per_key`` is a window ``row_number() <= n`` — bounded
  per-key state, uniform without replacement, skew handled by AQE
  (reference materializes per-key lists: spark_rdd_backend.py:121-124).
- ``filter_by_key`` broadcasts small key sets and falls back to a shuffled
  semi-join; ``filter_by_key_sharded`` adds explicit salting for heavy
  skew (reference: pipeline_functions.py:119-156).
- ``group_by_key`` (collect_list) is provided for parity but flagged: for
  unbounded groups prefer aggregates — the engine itself never calls it.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_Cols = Union[str, Sequence[str]]


def _as_list(cols: _Cols) -> List[str]:
    return [cols] if isinstance(cols, str) else list(cols)


# ---------------------------------------------------------------------------
# Row-wise ops (reference: pipeline_backend.py:60-140)
# ---------------------------------------------------------------------------


def map_rows(df: DataFrame, *exprs: Column) -> DataFrame:
    """1-to-1 transform: ``select`` of column expressions
    (reference map(): pipeline_backend.py:60-66)."""
    return df.select(*exprs)


def map_values(df: DataFrame, value_col: str, expr: Column) -> DataFrame:
    """Transform the value column, keep everything else
    (reference: pipeline_backend.py:134-140)."""
    return df.withColumn(value_col, expr)


def flat_map(df: DataFrame, array_expr: Column, out_col: str,
             keep: Optional[Sequence[str]] = None) -> DataFrame:
    """1-to-many via explode of an array expression
    (reference: pipeline_backend.py:93-99)."""
    keep_cols = [F.col(c) for c in (keep if keep is not None else df.columns)]
    return df.select(*keep_cols, F.explode(array_expr).alias(out_col))


def filter_rows(df: DataFrame, condition: Column) -> DataFrame:
    """Reference: pipeline_backend.py:146-148."""
    return df.filter(condition)


def keys(df: DataFrame, key_cols: _Cols) -> DataFrame:
    """Reference: pipeline_backend.py:184-186."""
    return df.select(*_as_list(key_cols))


def values(df: DataFrame, value_cols: _Cols) -> DataFrame:
    """Reference: pipeline_backend.py:188-190."""
    return df.select(*_as_list(value_cols))


# ---------------------------------------------------------------------------
# Side inputs (reference: pipeline_backend.py:68-91,101-124,150-169 — the
# reference's Spark backend never implemented these; broadcast covers them)
# ---------------------------------------------------------------------------


def with_singleton_side_input(df: DataFrame, side: DataFrame,
                              out_col: str) -> DataFrame:
    """Attach a 1-row side input as a column via broadcast cross join
    (reference map_with_side_inputs: pipeline_backend.py:68-91)."""
    side_cols = side.columns
    packed = side.select(F.struct(*side_cols).alias(out_col))
    return df.crossJoin(F.broadcast(packed))


def filter_with_side_input(df: DataFrame, side: DataFrame,
                           condition: Callable[[Column], Column],
                           out_col: str = "__side__") -> DataFrame:
    """Filter with a broadcast singleton side input
    (reference: pipeline_backend.py:150-169)."""
    joined = with_singleton_side_input(df, side, out_col)
    return joined.filter(condition(F.col(out_col))).drop(out_col)


# ---------------------------------------------------------------------------
# Keyed ops
# ---------------------------------------------------------------------------


def group_by_key(df: DataFrame, key_cols: _Cols,
                 value_col: str) -> DataFrame:
    """(k, v) -> (k, list(v)). Parity op only — materializes per-key lists
    (reference: pipeline_backend.py:142-144); unbounded groups should use
    aggregates instead."""
    return (df.groupBy(*_as_list(key_cols))
            .agg(F.collect_list(value_col).alias(value_col)))


def filter_by_key(df: DataFrame, keys_df: DataFrame, key_cols: _Cols,
                  broadcast: bool = True) -> DataFrame:
    """Semi-join against a key collection — the reference's only join
    (reference: pipeline_backend.py:171-182, spark_rdd_backend.py:100-113).
    ``broadcast=True`` hints the build side small; otherwise AQE decides."""
    kl = _as_list(key_cols)
    right = keys_df.select(*kl).distinct()
    if broadcast:
        right = F.broadcast(right)
    return df.join(right, on=kl, how="left_semi")


def filter_by_key_sharded(df: DataFrame, keys_df: DataFrame, key_cols: _Cols,
                          sharding_factor: int = 16) -> DataFrame:
    """Skew-safe semi-join: salt the probe side into ``sharding_factor``
    shards and replicate the key set per shard
    (reference: pipeline_functions.py:119-156). Use when a handful of hot
    keys would overload single reducers and the key set is too large to
    broadcast."""
    kl = _as_list(key_cols)
    salted = df.withColumn(
        "__salt__", (F.rand() * sharding_factor).cast("int"))
    shards = keys_df.select(*kl).distinct().crossJoin(
        F.broadcast(
            df.sparkSession.range(sharding_factor)
            .select(F.col("id").cast("int").alias("__salt__"))))
    return (salted.join(shards, on=[*kl, "__salt__"], how="left_semi")
            .drop("__salt__"))


def sample_fixed_per_key(df: DataFrame, key_cols: _Cols, n: int,
                         order_cols: Optional[Sequence[Column]] = None
                         ) -> DataFrame:
    """<= n uniformly sampled rows per key, without replacement — the
    contribution-bounding workhorse (reference:
    pipeline_backend.py:192-201). Window ``row_number() <= n`` over a
    random order: never materializes per-key state."""
    order = list(order_cols) if order_cols else [F.rand()]
    w = Window.partitionBy(*_as_list(key_cols)).orderBy(*order)
    return (df.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= n).drop("__rn__"))


def count_per_element(df: DataFrame, element_cols: _Cols) -> DataFrame:
    """Frequency of each element (reference: pipeline_backend.py:203-205)."""
    return df.groupBy(*_as_list(element_cols)).agg(
        F.count(F.lit(1)).alias("count"))


def sum_per_key(df: DataFrame, key_cols: _Cols, value_col: str) -> DataFrame:
    """Reference: pipeline_backend.py:207-209."""
    return df.groupBy(*_as_list(key_cols)).agg(
        F.sum(value_col).alias(value_col))


def combine_per_key(df: DataFrame, key_cols: _Cols,
                    aggs: Sequence[Column]) -> DataFrame:
    """Per-key merge of associative+commutative accumulators — expressed as
    native aggregate expressions so Catalyst plans partial (map-side)
    aggregation (reference: pipeline_backend.py:211-222,
    spark_rdd_backend.py:132-137)."""
    return df.groupBy(*_as_list(key_cols)).agg(*aggs)


def min_max_per_key(df: DataFrame, key_cols: _Cols,
                    value_col: str) -> DataFrame:
    """Reference: pipeline_functions.py:103-116."""
    return df.groupBy(*_as_list(key_cols)).agg(
        F.min(value_col).alias("min"), F.max(value_col).alias("max"))


# ---------------------------------------------------------------------------
# Collection-level ops
# ---------------------------------------------------------------------------


def flatten(*dfs: DataFrame) -> DataFrame:
    """N-ary union by column name (reference: pipeline_backend.py:237-239)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def distinct(df: DataFrame, cols: Optional[_Cols] = None) -> DataFrame:
    """Reference: pipeline_backend.py:241-243."""
    return (df.select(*_as_list(cols)) if cols is not None else df).distinct()


def reshuffle(df: DataFrame, num_partitions: Optional[int] = None,
              cols: Optional[_Cols] = None) -> DataFrame:
    """Repartition for parallelism (reference: pipeline_backend.py:245-247;
    unimplemented in the reference's Spark backend)."""
    if cols is not None:
        parts = [F.col(c) for c in _as_list(cols)]
        return (df.repartition(num_partitions, *parts)
                if num_partitions else df.repartition(*parts))
    return df.repartition(num_partitions) if num_partitions else \
        df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def to_list(df: DataFrame, value_col: str) -> DataFrame:
    """Collect a column into a single-row array — only for provably small
    inputs (reference: pipeline_backend.py:249-251)."""
    return df.agg(F.collect_list(value_col).alias(value_col))


def to_collection(spark: SparkSession, rows, schema) -> DataFrame:
    """Lift a local iterable (reference: pipeline_backend.py:32-46)."""
    return spark.createDataFrame(rows, schema)


def size(df: DataFrame) -> DataFrame:
    """1-row collection size (reference: pipeline_functions.py:31-39)."""
    return df.agg(F.count(F.lit(1)).alias("size"))


def annotate(df: DataFrame, **annotations) -> DataFrame:
    """Metadata annotation hook (reference: pipeline_backend.py:253-263).
    Spark plans carry no user metadata; annotations are driver-side only,
    so this is an explicit no-op that returns the input unchanged."""
    return df
