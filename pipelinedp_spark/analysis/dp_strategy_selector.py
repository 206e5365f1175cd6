"""DP strategy selection: noise kind, partition selection, thresholding.

Reference semantics: analysis/dp_strategy_selector.py:25-199 — choose the
noise kind that minimizes noise stddev at the given (epsilon, delta,
sensitivities); choose post-aggregation thresholding when PRIVACY_ID_COUNT
is among the metrics (its noised count doubles as the selection signal);
otherwise pick the thresholding strategy matching the chosen noise.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from pipelinedp_spark import dp_computations as dp
from pipelinedp_spark.aggregate_params import (Metric, NoiseKind,
                                               PartitionSelectionStrategy)


@dataclasses.dataclass
class DPStrategy:
    """Reference: analysis/dp_strategy_selector.py:25-31."""

    noise_kind: Optional[NoiseKind]
    partition_selection_strategy: Optional[PartitionSelectionStrategy]
    post_aggregation_thresholding: bool


class DPStrategySelector:
    """Reference: analysis/dp_strategy_selector.py:33-199."""

    def __init__(self, epsilon: float, delta: float, metrics: List[Metric],
                 is_public_partitions: bool):
        if not is_public_partitions and delta == 0:
            raise ValueError(
                "private partition selection requires delta > 0")
        self._epsilon = epsilon
        self._delta = delta
        self._metrics = metrics
        self._public = is_public_partitions

    @property
    def is_public_partitions(self) -> bool:
        return self._public

    @property
    def metrics(self) -> List[Metric]:
        return self._metrics

    def select_noise_kind(self, epsilon: float, delta: float,
                          sensitivities: dp.Sensitivities) -> NoiseKind:
        """Minimum-stddev choice (reference: :121-141). Laplace needs no
        delta; Gaussian is only eligible when delta > 0."""
        laplace_std = dp.laplace_std(epsilon, sensitivities.l1)
        if delta == 0:
            return NoiseKind.LAPLACE
        gaussian_std = dp.gaussian_sigma(epsilon, delta, sensitivities.l2)
        return (NoiseKind.GAUSSIAN
                if gaussian_std < laplace_std else NoiseKind.LAPLACE)

    def use_post_aggregation_thresholding(self,
                                          metrics: List[Metric]) -> bool:
        """Reference: :143-151 — when PRIVACY_ID_COUNT is computed and
        partitions are private, its noised value doubles as the selection
        statistic, saving the separate selection budget."""
        return (not self._public) and Metric.PRIVACY_ID_COUNT in metrics

    def get_dp_strategy(self,
                        sensitivities: dp.Sensitivities) -> DPStrategy:
        """Reference: :63-119."""
        if not self._metrics:
            # select_partitions only.
            return DPStrategy(
                noise_kind=None,
                partition_selection_strategy=(
                    PartitionSelectionStrategy.TRUNCATED_GEOMETRIC),
                post_aggregation_thresholding=False)
        if self._public:
            noise = self.select_noise_kind(self._epsilon, self._delta,
                                           sensitivities)
            return DPStrategy(noise_kind=noise,
                              partition_selection_strategy=None,
                              post_aggregation_thresholding=False)
        if self.use_post_aggregation_thresholding(self._metrics):
            # Half the delta funds thresholding (reference: :100-116).
            noise = self.select_noise_kind(self._epsilon, self._delta / 2,
                                           sensitivities)
            strategy = (PartitionSelectionStrategy.LAPLACE_THRESHOLDING
                        if noise == NoiseKind.LAPLACE else
                        PartitionSelectionStrategy.GAUSSIAN_THRESHOLDING)
            return DPStrategy(noise_kind=noise,
                              partition_selection_strategy=strategy,
                              post_aggregation_thresholding=True)
        # Budget halves between metrics and selection (naive split).
        noise = self.select_noise_kind(self._epsilon / 2, self._delta / 2,
                                       sensitivities)
        strategy = (PartitionSelectionStrategy.LAPLACE_THRESHOLDING
                    if noise == NoiseKind.LAPLACE else
                    PartitionSelectionStrategy.GAUSSIAN_THRESHOLDING)
        return DPStrategy(noise_kind=noise,
                          partition_selection_strategy=strategy,
                          post_aggregation_thresholding=False)
