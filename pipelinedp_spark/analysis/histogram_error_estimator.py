"""RMSE estimation from dataset histograms — no data rescan.

Reference semantics: pipeline_dp/dataset_histograms/histogram_error_estimator
.py:23-238: given the contribution histograms, estimate the error of a DP
count/privacy-id-count/sum for candidate (l0, linf) bounds as
    rmse^2 = (dropped contributions)^2 + noise_std^2
where the dropped ratio comes from the L0/Linf histograms and the noise std
from the mechanism at the per-aggregation budget.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

from pipelinedp_spark import dp_computations as dp
from pipelinedp_spark.aggregate_params import Metric, NoiseKind
from pipelinedp_spark.analysis.histograms import (DatasetHistograms,
                                                  Histogram,
                                                  compute_ratio_dropped)


def _interpolate_ratio(ratios: Sequence[Tuple[float, float]],
                       bound: float) -> float:
    """Linear interpolation of (bound, ratio_dropped) pairs
    (reference: histogram_error_estimator.py:114-128)."""
    if not ratios:
        return 0.0
    if bound <= ratios[0][0]:
        return ratios[0][1]
    for (x1, y1), (x2, y2) in zip(ratios, ratios[1:]):
        if bound <= x2:
            if x2 == x1:
                return y2
            t = (bound - x1) / (x2 - x1)
            return y1 + t * (y2 - y1)
    return ratios[-1][1]


class CountErrorEstimator:
    """Estimator for COUNT / PRIVACY_ID_COUNT / SUM rmse at candidate
    (l0, linf) bounds (reference: histogram_error_estimator.py:32-138)."""

    def __init__(self, metric: Metric, epsilon: float, delta: float,
                 noise_kind: NoiseKind, l0_ratios: List[Tuple[float, float]],
                 linf_ratios: Optional[List[Tuple[float, float]]],
                 base_value: float):
        self._metric = metric
        self._eps = epsilon
        self._delta = delta
        self._noise = noise_kind
        self._l0_ratios = l0_ratios
        self._linf_ratios = linf_ratios
        self._base = base_value  # total contributions (or total sum)

    def get_ratio_dropped_l0(self, l0: int) -> float:
        return _interpolate_ratio(self._l0_ratios, l0)

    def get_ratio_dropped_linf(self, linf: float) -> float:
        if self._linf_ratios is None:
            return 0.0
        return _interpolate_ratio(self._linf_ratios, linf)

    def get_stddev(self, l0: int, linf: float = 1.0) -> float:
        sens = dp.Sensitivities(l0=l0, linf=float(linf))
        return dp.noise_std(self._noise, self._eps, self._delta, sens)

    def estimate_rmse(self, l0: int, linf: Optional[float] = None) -> float:
        """reference: histogram_error_estimator.py:67-105,187-196: combine
        the (1 - kept)^2 bias of dropped contributions with noise variance."""
        linf_eff = 1.0 if linf is None else float(linf)
        ratio = 1.0 - (1.0 - self.get_ratio_dropped_l0(l0)) * \
            (1.0 - self.get_ratio_dropped_linf(linf_eff))
        bias = ratio * self._base
        std = self.get_stddev(l0, linf_eff)
        return math.sqrt(bias * bias + std * std)


def create_estimator_for_count_and_privacy_id_count(
        histograms: DatasetHistograms, metric: Metric, epsilon: float,
        delta: float, noise_kind: NoiseKind) -> CountErrorEstimator:
    """Reference: histogram_error_estimator.py:141-184."""
    l0_ratios = compute_ratio_dropped(histograms.l0_contributions_histogram)
    if metric == Metric.PRIVACY_ID_COUNT:
        linf_ratios = None
        base = histograms.l0_contributions_histogram.total_sum
    else:
        linf_ratios = compute_ratio_dropped(
            histograms.linf_contributions_histogram)
        base = histograms.linf_contributions_histogram.total_sum
    return CountErrorEstimator(metric, epsilon, delta, noise_kind, l0_ratios,
                               linf_ratios, base)


def create_estimator_for_sum(histograms: DatasetHistograms, epsilon: float,
                             delta: float,
                             noise_kind: NoiseKind) -> CountErrorEstimator:
    """Reference: histogram_error_estimator.py:199-238. Linf ratios come
    from the per-(pid, pk) sum histogram."""
    if histograms.linf_sum_contributions_histogram is None:
        raise ValueError("sum estimator requires a value column")
    l0_ratios = compute_ratio_dropped(histograms.l0_contributions_histogram)
    linf_ratios = compute_ratio_dropped(
        histograms.linf_sum_contributions_histogram)
    base = histograms.linf_sum_contributions_histogram.total_sum
    return CountErrorEstimator(Metric.SUM, epsilon, delta, noise_kind,
                               l0_ratios, linf_ratios, base)
