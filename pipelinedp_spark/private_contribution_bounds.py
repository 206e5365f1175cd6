"""Differentially-private choice of contribution bounds (L0).

Reference semantics: pipeline_dp/private_contribution_bounds.py:27-195 —
score each candidate L0 bound by the (negated) sum of its noise impact and
its dropped-contributions impact, then pick one with the exponential
mechanism:

  score(k) = -0.5 * P * noise_std(k) - 0.5 * sum_uid max(min(n_uid, B) - k, 0)

where P = number of partitions, n_uid = partitions the user contributed to,
B = min(upper_bound, P). The histogram inputs make the data-dependent term
O(bins); candidates have 3 significant digits (same binning as the L0
histogram), so the candidate list is logarithmic in the upper bound.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from pipelinedp_spark import dp_computations as dp
from pipelinedp_spark.aggregate_params import NoiseKind
from pipelinedp_spark.analysis.histograms import Histogram


@dataclasses.dataclass
class CalculatePrivateContributionBoundsParams:
    """Reference: pipeline_dp/aggregate_params.py
    (CalculatePrivateContributionBoundsParams)."""

    aggregation_noise_kind: NoiseKind
    aggregation_eps: float
    aggregation_delta: float
    calculation_eps: float
    max_partitions_contributed_upper_bound: int

    def __post_init__(self):
        if self.calculation_eps <= 0 or self.aggregation_eps <= 0:
            raise ValueError("epsilons must be positive")
        if self.max_partitions_contributed_upper_bound <= 0:
            raise ValueError("upper bound must be positive")


@dataclasses.dataclass
class PrivateContributionBounds:
    """Reference: pipeline_dp/aggregate_params.py
    (PrivateContributionBounds)."""

    max_partitions_contributed: int


def generate_possible_contribution_bounds(upper_bound: int) -> List[int]:
    """Bounds with at most 3 significant digits: 1..999, 1000, 1010, ...
    (reference: private_contribution_bounds.py:178-195)."""
    bounds = []
    current, power = 1, 10
    while current <= upper_bound:
        bounds.append(current)
        if current >= power:
            power *= 10
        current += max(1, power // 1000)
    return bounds


class L0ScoringFunction(dp.ExponentialMechanism.ScoringFunction):
    """Reference: private_contribution_bounds.py:89-176. Valid for COUNT
    and PRIVACY_ID_COUNT (linf factors out of both impact terms)."""

    def __init__(self, params: CalculatePrivateContributionBoundsParams,
                 number_of_partitions: int, l0_histogram: Histogram):
        self._params = params
        self._number_of_partitions = number_of_partitions
        self._l0_histogram = l0_histogram

    def _upper_bound(self) -> int:
        return min(self._params.max_partitions_contributed_upper_bound,
                   self._number_of_partitions)

    @property
    def global_sensitivity(self) -> float:
        return float(self._upper_bound())

    @property
    def is_monotonic(self) -> bool:
        return True

    def _impact_noise(self, k: int) -> float:
        sens = dp.count_sensitivities(k, 1)
        std = dp.noise_std(self._params.aggregation_noise_kind,
                           self._params.aggregation_eps,
                           self._params.aggregation_delta, sens)
        return self._number_of_partitions * std

    def _impact_dropped(self, k: int) -> float:
        b = self._upper_bound()
        return sum(
            max(min(bin.lower, b) - k, 0) * bin.count
            for bin in self._l0_histogram.bins)

    def score(self, k: int) -> float:
        return -(0.5 * self._impact_noise(k) + 0.5 * self._impact_dropped(k))


class PrivateL0Calculator:
    """Reference: private_contribution_bounds.py:27-87."""

    def __init__(self, params: CalculatePrivateContributionBoundsParams,
                 number_of_partitions: int, l0_histogram: Histogram):
        self._params = params
        self._n_partitions = number_of_partitions
        self._l0_histogram = l0_histogram

    def calculate(self, rng=None) -> int:
        scoring = L0ScoringFunction(self._params, self._n_partitions,
                                    self._l0_histogram)
        candidates = generate_possible_contribution_bounds(
            scoring._upper_bound())
        return int(dp.ExponentialMechanism(scoring).apply(
            self._params.calculation_eps, candidates, rng=rng))

    def calculate_deterministic(self) -> int:
        """Zero-noise twin of `calculate`: the score argmax (smallest
        candidate on ties) — the value the exponential mechanism
        converges to as calculation_eps -> inf. Used by the engine's
        noise_mode='zero' so the DP bound choice is reproducible and
        SQL-mirrorable, like every other zero-noise path."""
        scoring = L0ScoringFunction(self._params, self._n_partitions,
                                    self._l0_histogram)
        candidates = generate_possible_contribution_bounds(
            scoring._upper_bound())
        return int(max(candidates,
                       key=lambda k: (scoring.score(k), -k)))
