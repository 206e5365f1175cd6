"""pipelinedp_spark: a PySpark-native differential-privacy analytics engine.

Brand-new implementation with the query capabilities of the reference DP
aggregation framework (OpenMined/PipelineDP), re-expressed as native Spark
DataFrame plans, plus large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).
"""

from pipelinedp_spark.aggregate_params import (AddDPNoiseParams,
                                               AggregateParams, MechanismType,
                                               Metric, Metrics, NoiseKind,
                                               NormKind,
                                               PartitionSelectionStrategy,
                                               SelectPartitionsParams)
from pipelinedp_spark.budget_accounting import (Budget, MechanismSpec,
                                                NaiveBudgetAccountant)
from pipelinedp_spark.dataframes import Columns, ContributionBounds, Query, \
    QueryBuilder
from pipelinedp_spark.dp_engine import (DataFrameExtractors, DPEngine,
                                        DPResult, MultiSumParams,
                                        MultiSumSpec,
                                        MultiValueDataFrameExtractors)
from pipelinedp_spark.private_contribution_bounds import (
    CalculatePrivateContributionBoundsParams, PrivateContributionBounds)
from pipelinedp_spark.pld_accounting import PLDBudgetAccountant
from pipelinedp_spark.rdp_accounting import RDPBudgetAccountant
from pipelinedp_spark.private_dataframe import (CountParams, MeanParams,
                                                PercentileParams,
                                                PrivacyIdCountParams,
                                                PrivateDataFrame, SumParams,
                                                VarianceParams,
                                                VectorSumParams, make_private)

__version__ = "0.1.0"

__all__ = [
    "AddDPNoiseParams",
    "AggregateParams",
    "Budget",
    "CalculatePrivateContributionBoundsParams",
    "Columns",
    "ContributionBounds",
    "CountParams",
    "PLDBudgetAccountant",
    "PrivateContributionBounds",
    "RDPBudgetAccountant",
    "DataFrameExtractors",
    "DPEngine",
    "DPResult",
    "make_private",
    "MeanParams",
    "MechanismSpec",
    "MechanismType",
    "MultiSumParams",
    "MultiSumSpec",
    "MultiValueDataFrameExtractors",
    "Metric",
    "Metrics",
    "NaiveBudgetAccountant",
    "NoiseKind",
    "NormKind",
    "PartitionSelectionStrategy",
    "PercentileParams",
    "PrivacyIdCountParams",
    "PrivateDataFrame",
    "Query",
    "QueryBuilder",
    "SelectPartitionsParams",
    "SumParams",
    "VarianceParams",
    "VectorSumParams",
]
