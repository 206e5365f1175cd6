"""Utility analysis, dataset histograms, and parameter tuning.

Spark-first re-expression of the reference's analysis layer (reference:
analysis/ and pipeline_dp/dataset_histograms/): everything is computed with
native DataFrame aggregations; only the tiny binned summaries are collected
to the driver.
"""

from pipelinedp_spark.analysis.pre_aggregation import preaggregate
from pipelinedp_spark.analysis.histograms import (DatasetHistograms,
                                                  FrequencyBin, Histogram,
                                                  compute_dataset_histograms,
                                                  compute_ratio_dropped)
from pipelinedp_spark.analysis.histogram_error_estimator import (
    CountErrorEstimator, create_estimator_for_count_and_privacy_id_count,
    create_estimator_for_sum)
from pipelinedp_spark.analysis.utility_analysis import (MetricUtility,
                                                        MultiParameterConfiguration,
                                                        UtilityAnalysisEngine,
                                                        UtilityReport)
from pipelinedp_spark.analysis.parameter_tuning import (TuneResult, tune)
from pipelinedp_spark.analysis.dp_strategy_selector import (DPStrategy,
                                                            DPStrategySelector)
from pipelinedp_spark.analysis.dataset_summary import (
    PublicPartitionsSummary, compute_public_partitions_summary)

__all__ = [
    "CountErrorEstimator",
    "DatasetHistograms",
    "DPStrategy",
    "DPStrategySelector",
    "FrequencyBin",
    "Histogram",
    "MetricUtility",
    "MultiParameterConfiguration",
    "PublicPartitionsSummary",
    "TuneResult",
    "compute_public_partitions_summary",
    "UtilityAnalysisEngine",
    "UtilityReport",
    "compute_dataset_histograms",
    "compute_ratio_dropped",
    "create_estimator_for_count_and_privacy_id_count",
    "create_estimator_for_sum",
    "preaggregate",
    "tune",
]
