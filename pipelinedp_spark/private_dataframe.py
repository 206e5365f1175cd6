"""PrivateDataFrame: the privacy-wrapper API surface.

Mirrors the reference's PrivateRDD contract (reference:
pipeline_dp/private_spark.py:23-313): ``make_private`` wraps a collection
with a privacy-unit binding and a shared budget accountant; transformations
preserve the privacy unit; DP actions (count / sum / mean / variance /
privacy_id_count / percentile / vector_sum / select_partitions) build params
and delegate to DPEngine, each consuming a budget share.

Spark-first differences: rows stay columnar (no (pid, row) tuple wrapping —
the privacy-unit column simply must survive every transformation, which
``select``/``with_column``/``filter`` enforce), and actions return lazy
``DPResult``s: call ``budget_accountant.compute_budgets()`` once after
declaring all actions, then ``.dataframe()`` (two-phase protocol,
reference: examples/movie_view_ratings/run_on_spark.py:50-86).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipelinedp_spark.aggregate_params import (AggregateParams, Metrics,
                                               NoiseKind, NormKind,
                                               PartitionSelectionStrategy,
                                               SelectPartitionsParams)
from pipelinedp_spark.budget_accounting import NaiveBudgetAccountant
from pipelinedp_spark.dp_engine import (DataFrameExtractors, DPEngine,
                                        DPResult)

_Cols = Union[str, Sequence[str]]


@dataclasses.dataclass
class _MetricParams:
    """Shared fields of the per-metric params objects
    (reference: pipeline_dp/aggregate_params.py:488-767)."""

    partition_key: _Cols = None
    max_partitions_contributed: int = None
    max_contributions_per_partition: int = None
    budget_weight: float = 1.0
    noise_kind: NoiseKind = NoiseKind.LAPLACE
    public_partitions: Optional[Sequence] = None
    partition_selection_strategy: PartitionSelectionStrategy = (
        PartitionSelectionStrategy.TRUNCATED_GEOMETRIC)
    # Reference parity (aggregate_params.py:527-531,560-563): skip the
    # engine's row sampling when the data already satisfies the declared
    # bounds; minimum privacy-unit count on top of private selection.
    contribution_bounds_already_enforced: bool = False
    pre_threshold: Optional[int] = None


@dataclasses.dataclass
class CountParams(_MetricParams):
    pass


@dataclasses.dataclass
class PrivacyIdCountParams(_MetricParams):
    pass


@dataclasses.dataclass
class SumParams(_MetricParams):
    value_column: str = None
    min_value: Optional[float] = None
    max_value: Optional[float] = None
    min_sum_per_partition: Optional[float] = None
    max_sum_per_partition: Optional[float] = None


@dataclasses.dataclass
class MeanParams(_MetricParams):
    value_column: str = None
    min_value: float = None
    max_value: float = None


@dataclasses.dataclass
class VarianceParams(_MetricParams):
    value_column: str = None
    min_value: float = None
    max_value: float = None


@dataclasses.dataclass
class PercentileParams(_MetricParams):
    value_column: str = None
    percentiles: Sequence[float] = (50.0,)
    min_value: float = None
    max_value: float = None


@dataclasses.dataclass
class VectorSumParams(_MetricParams):
    value_column: str = None
    max_norm: float = None
    vector_size: int = None
    norm_kind: NormKind = NormKind.LINF


class PrivateDataFrame:
    """A DataFrame bound to a privacy unit and a budget accountant."""

    def __init__(self, df: DataFrame, budget_accountant: NaiveBudgetAccountant,
                 privacy_unit_column: str):
        if privacy_unit_column not in df.columns:
            raise ValueError(
                f"privacy unit column '{privacy_unit_column}' not in "
                f"{df.columns}")
        self._df = df
        self._accountant = budget_accountant
        self._pid = privacy_unit_column

    # -- privacy-preserving transformations (reference map/flat_map:
    # private_spark.py:42-66 — keyed by pid; here: pid column must survive).
    def select(self, *cols: Union[str, Column]) -> "PrivateDataFrame":
        out = self._df.select(*cols)
        if self._pid not in out.columns:
            raise ValueError(
                f"select must keep the privacy unit column '{self._pid}'")
        return PrivateDataFrame(out, self._accountant, self._pid)

    def with_column(self, name: str, expr: Column) -> "PrivateDataFrame":
        if name == self._pid:
            raise ValueError("cannot overwrite the privacy unit column")
        return PrivateDataFrame(self._df.withColumn(name, expr),
                                self._accountant, self._pid)

    def filter(self, condition: Column) -> "PrivateDataFrame":
        return PrivateDataFrame(self._df.filter(condition), self._accountant,
                                self._pid)

    @property
    def columns(self) -> List[str]:
        return self._df.columns

    # -- DP actions -----------------------------------------------------
    def _engine(self) -> DPEngine:
        return DPEngine(self._accountant)

    def _run(self, params: _MetricParams, metrics, value_column,
             extra: dict, out_metric_col: str) -> DPResult:
        agg = AggregateParams(
            metrics=metrics,
            max_partitions_contributed=params.max_partitions_contributed,
            max_contributions_per_partition=(
                params.max_contributions_per_partition),
            budget_weight=params.budget_weight,
            noise_kind=params.noise_kind,
            partition_selection_strategy=(
                params.partition_selection_strategy),
            contribution_bounds_already_enforced=(
                params.contribution_bounds_already_enforced),
            pre_threshold=params.pre_threshold,
            **extra)
        extractors = DataFrameExtractors(
            privacy_id_column=self._pid,
            partition_key_columns=params.partition_key,
            value_column=value_column)
        return self._engine().aggregate(self._df, agg, extractors,
                                        params.public_partitions)

    def count(self, params: CountParams) -> DPResult:
        """Reference: private_spark.py:191-230."""
        return self._run(params, [Metrics.COUNT], None, {}, "count")

    def privacy_id_count(self, params: PrivacyIdCountParams) -> DPResult:
        """Reference: private_spark.py:232-273."""
        return self._run(params, [Metrics.PRIVACY_ID_COUNT], None, {},
                         "privacy_id_count")

    def sum(self, params: SumParams) -> DPResult:
        """Reference: private_spark.py:151-189."""
        extra = dict(min_value=params.min_value, max_value=params.max_value,
                     min_sum_per_partition=params.min_sum_per_partition,
                     max_sum_per_partition=params.max_sum_per_partition)
        return self._run(params, [Metrics.SUM], params.value_column, extra,
                         "sum")

    def mean(self, params: MeanParams) -> DPResult:
        """Reference: private_spark.py:111-149."""
        extra = dict(min_value=params.min_value, max_value=params.max_value)
        return self._run(params, [Metrics.MEAN], params.value_column, extra,
                         "mean")

    def variance(self, params: VarianceParams) -> DPResult:
        """Reference: private_spark.py:68-109."""
        extra = dict(min_value=params.min_value, max_value=params.max_value)
        return self._run(params, [Metrics.VARIANCE], params.value_column,
                         extra, "variance")

    def percentile(self, params: PercentileParams) -> DPResult:
        specs = [Metrics.PERCENTILE(p) for p in params.percentiles]
        extra = dict(min_value=params.min_value, max_value=params.max_value)
        return self._run(params, specs, params.value_column, extra,
                         "percentile")

    def vector_sum(self, params: VectorSumParams) -> DPResult:
        extra = dict(vector_max_norm=params.max_norm,
                     vector_norm_kind=params.norm_kind,
                     vector_size=params.vector_size)
        return self._run(params, [Metrics.VECTOR_SUM], params.value_column,
                         extra, "vector_sum")

    def select_partitions(self, params: SelectPartitionsParams,
                          partition_key: _Cols) -> DPResult:
        """Reference: private_spark.py:275-306."""
        extractors = DataFrameExtractors(
            privacy_id_column=self._pid,
            partition_key_columns=partition_key,
            value_column=None)
        return self._engine().select_partitions(self._df, params, extractors)


def make_private(df: DataFrame, budget_accountant: NaiveBudgetAccountant,
                 privacy_unit_column: str) -> PrivateDataFrame:
    """Reference: pipeline_dp/private_spark.py:308-313."""
    return PrivateDataFrame(df, budget_accountant, privacy_unit_column)
