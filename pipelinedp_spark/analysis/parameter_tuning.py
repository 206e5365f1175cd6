"""Parameter tuning: pick contribution bounds that minimize expected error.

Reference semantics: analysis/parameter_tuning.py:122-419 — generate
candidate L0/Linf bounds from the dataset histograms (quantile-anchored with
constant relative step), run the multi-configuration utility analysis in one
pass, and return the configuration with minimum RMSE of the tuned metric.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame

from pipelinedp_spark.aggregate_params import AggregateParams, Metric
from pipelinedp_spark.analysis.histograms import (DatasetHistograms,
                                                  Histogram,
                                                  compute_dataset_histograms)
from pipelinedp_spark.analysis.utility_analysis import (
    MultiParameterConfiguration, UtilityAnalysisEngine, UtilityReport)
from pipelinedp_spark.dp_engine import DataFrameExtractors

MAX_CANDIDATES = 100


def _candidates_constant_relative_step(histogram: Histogram,
                                       max_candidates: int = 20) -> List[int]:
    """Candidate bounds spanning [1, max] with a constant relative step
    (reference: parameter_tuning.py:282-311)."""
    upper = int(histogram.max_value)
    if upper <= 1:
        return [1]
    if upper <= max_candidates:
        return list(range(1, upper + 1))
    step = upper ** (1.0 / max_candidates)
    out, cur = [], 1.0
    for _ in range(max_candidates):
        v = int(round(cur))
        if not out or v > out[-1]:
            out.append(v)
        cur *= step
    if out[-1] != upper:
        out.append(upper)
    return out


@dataclasses.dataclass
class TuneResult:
    """Reference: analysis/parameter_tuning.py TuneResult (condensed)."""

    recommended_max_partitions_contributed: int
    recommended_max_contributions_per_partition: int
    recommended_rmse: float
    utility_reports: List[UtilityReport]
    configurations: MultiParameterConfiguration
    histograms: DatasetHistograms


def tune(df: DataFrame,
         params: AggregateParams,
         extractors: DataFrameExtractors,
         epsilon: float,
         delta: float,
         tuned_metric: Metric = Metric.COUNT,
         public_partitions: Optional[Sequence] = None,
         max_candidates_per_parameter: int = 10,
         histograms: Optional[DatasetHistograms] = None) -> TuneResult:
    """Grid = L0 candidates x Linf candidates (capped at MAX_CANDIDATES),
    scored by one multi-config utility-analysis pass; argmin RMSE wins
    (reference: parameter_tuning.py:332-419)."""
    if histograms is None:
        histograms = compute_dataset_histograms(df, extractors)
    l0_cands = _candidates_constant_relative_step(
        histograms.l0_contributions_histogram, max_candidates_per_parameter)
    linf_cands = _candidates_constant_relative_step(
        histograms.linf_contributions_histogram, max_candidates_per_parameter)
    grid = [(a, b) for a in l0_cands for b in linf_cands][:MAX_CANDIDATES]
    conf = MultiParameterConfiguration(
        max_partitions_contributed=[g[0] for g in grid],
        max_contributions_per_partition=[g[1] for g in grid])
    engine = UtilityAnalysisEngine(epsilon, delta)
    reports = engine.analyze(df, params, extractors, conf, public_partitions)

    best_idx, best_rmse = None, math.inf
    for rep in reports:
        for err in rep.metric_errors:
            if err.metric == tuned_metric and err.rmse < best_rmse:
                best_rmse = err.rmse
                best_idx = rep.configuration_index
    if best_idx is None:
        raise ValueError(f"tuned metric {tuned_metric} not analyzed")
    return TuneResult(
        recommended_max_partitions_contributed=grid[best_idx][0],
        recommended_max_contributions_per_partition=grid[best_idx][1],
        recommended_rmse=best_rmse,
        utility_reports=reports,
        configurations=conf,
        histograms=histograms)
