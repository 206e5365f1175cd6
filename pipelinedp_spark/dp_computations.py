"""Driver-side DP math: sensitivities, noise scales, thresholds, and the
truncated-geometric partition-selection probabilities.

All formulas are standard published DP results (Dwork-Roth; Balle-Wang;
Desfontaines-Voss-Gipson partition selection, PETS 2022). Semantics mirror
the reference's parameterization (reference: pipeline_dp/dp_computations.py:
80-160,586-818) with a new implementation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import numpy as np

from pipelinedp_spark.aggregate_params import NoiseKind


@dataclasses.dataclass
class Sensitivities:
    """L0/Linf with derived L1 = l0*linf, L2 = sqrt(l0)*linf
    (reference: pipeline_dp/dp_computations.py:624-664)."""

    l0: Optional[int] = None
    linf: Optional[float] = None
    l1: Optional[float] = None
    l2: Optional[float] = None

    def __post_init__(self):
        if self.l0 is not None and self.linf is not None:
            if self.l1 is None:
                self.l1 = self.l0 * self.linf
            if self.l2 is None:
                self.l2 = math.sqrt(self.l0) * self.linf
        if self.l1 is None and self.l2 is None:
            raise ValueError("insufficient sensitivities: need l1 or l2 "
                             "(directly or via l0 and linf)")


def laplace_scale(eps: float, l1_sensitivity: float) -> float:
    """Laplace mechanism scale b = l1/eps; std = b*sqrt(2)."""
    if eps <= 0:
        raise ValueError("eps must be positive")
    return l1_sensitivity / eps


def laplace_std(eps: float, l1_sensitivity: float) -> float:
    return laplace_scale(eps, l1_sensitivity) * math.sqrt(2)


def gaussian_sigma(eps: float, delta: float, l2_sensitivity: float) -> float:
    """Analytic Gaussian mechanism sigma (Balle & Wang, ICML 2018) via binary
    search on the exact (eps, delta) characterization — tighter than the
    classic sqrt(2 ln(1.25/delta)) bound."""
    if eps <= 0 or not 0 < delta < 1:
        raise ValueError("need eps > 0 and 0 < delta < 1")

    def delta_for_sigma(sigma: float) -> float:
        # Exact delta of the Gaussian mechanism at given sigma (unit l2).
        # The second term is exp(eps) * Phi(-(a+b)); for large eps the
        # factor overflows while the product is tiny, so combine in logs.
        a = 1.0 / (2.0 * sigma)
        b = eps * sigma
        log_term = eps + _log_phi_neg(a + b)
        term = math.exp(log_term) if log_term < 700.0 else math.inf
        return _phi(a - b) - term

    lo, hi = 1e-6, 1.0
    while delta_for_sigma(hi) > delta:
        hi *= 2
        if hi > 1e12:
            raise ValueError("sigma search diverged")
    for _ in range(100):
        mid = (lo + hi) / 2
        if delta_for_sigma(mid) > delta:
            lo = mid
        else:
            hi = mid
    return hi * l2_sensitivity


def _phi(x: float) -> float:
    """Standard normal CDF."""
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _log_phi_neg(y: float) -> float:
    """log Phi(-y), stable for large positive y (erfc underflows past
    ~26 sigma; switch to the standard asymptotic expansion)."""
    if y < 20.0:
        return math.log(0.5 * math.erfc(y / math.sqrt(2.0)))
    return -0.5 * y * y - math.log(y * math.sqrt(2.0 * math.pi))


def _phi_inv(p: float) -> float:
    """Standard normal quantile via bisection (scipy-free)."""
    if not 0 < p < 1:
        raise ValueError("p must be in (0,1)")
    lo, hi = -40.0, 40.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if _phi(mid) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def noise_scale(noise_kind: NoiseKind, eps: float, delta: float,
                sensitivities: Sensitivities) -> float:
    """The distribution parameter for the additive mechanism: Laplace scale b
    or Gaussian sigma."""
    if noise_kind == NoiseKind.LAPLACE:
        return laplace_scale(eps, sensitivities.l1)
    return gaussian_sigma(eps, delta, sensitivities.l2)


def noise_std(noise_kind: NoiseKind, eps: float, delta: float,
              sensitivities: Sensitivities) -> float:
    if noise_kind == NoiseKind.LAPLACE:
        return laplace_std(eps, sensitivities.l1)
    return gaussian_sigma(eps, delta, sensitivities.l2)


# ---------------------------------------------------------------------------
# Partition-selection thresholds (reference: pipeline_dp/partition_selection.py
# :33-138 and dp_computations.py:121-160 — behavior, not implementation).
# ---------------------------------------------------------------------------


def _per_partition_delta(delta: float, l0: int) -> float:
    """Split the thresholding delta across the <= l0 partitions one user can
    influence: delta_p = 1 - (1 - delta)^(1/l0)."""
    return 1.0 - math.pow(1.0 - delta, 1.0 / l0)


def laplace_thresholding(eps: float, delta: float,
                         l0: int) -> tuple[float, float]:
    """Laplace partition selection on the privacy-id count.

    Returns (laplace_scale, threshold): add Laplace(scale) to the per-
    partition privacy-id count and keep the partition iff noisy count >=
    threshold. Threshold solves P(1 + Lap(b) >= T) = delta_p.
    """
    b = laplace_scale(eps, float(l0))
    delta_p = _per_partition_delta(delta, l0)
    if delta_p >= 0.5:
        threshold = 1.0 + b * math.log(2.0 * (1.0 - delta_p))
    else:
        threshold = 1.0 - b * math.log(2.0 * delta_p)
    return b, threshold


def gaussian_thresholding(eps: float, delta: float,
                          l0: int) -> tuple[float, float]:
    """Gaussian partition selection: half of delta funds the noise, half the
    threshold. Returns (sigma, threshold)."""
    delta_noise = delta / 2.0
    delta_threshold = delta / 2.0
    sigma = gaussian_sigma(eps, delta_noise, math.sqrt(l0))
    delta_p = _per_partition_delta(delta_threshold, l0)
    threshold = 1.0 + sigma * _phi_inv(1.0 - delta_p)
    return sigma, threshold


def thresholding_from_std(noise_kind: NoiseKind, std: float, delta: float,
                          l0: int) -> float:
    """Threshold for a given pre-chosen noise std (PLD-style path)."""
    delta_p = _per_partition_delta(delta, l0)
    if noise_kind == NoiseKind.LAPLACE:
        b = std / math.sqrt(2)
        if delta_p >= 0.5:
            return 1.0 + b * math.log(2.0 * (1.0 - delta_p))
        return 1.0 - b * math.log(2.0 * delta_p)
    return 1.0 + std * _phi_inv(1.0 - delta_p)


def weighted_gaussian_thresholding(eps: float, delta: float,
                                   l0: int) -> tuple[float, float]:
    """Weighted Gaussian partition selection: each (privacy_id, partition)
    carries weight 1/sqrt(#partitions of the id), so every privacy id has
    total L2 weight exactly 1 and sigma is l0-independent
    (reference: pipeline_dp/partition_selection.py:92-99,
    pipeline_dp/dp_engine.py:664-714). Half the delta funds the noise, half
    the threshold. Returns (sigma, threshold) applied to per-partition
    weight sums."""
    sigma = gaussian_sigma(eps, delta / 2.0, 1.0)
    delta_p = _per_partition_delta(delta / 2.0, l0)
    threshold = 1.0 + sigma * _phi_inv(1.0 - delta_p)
    return sigma, threshold


# ---------------------------------------------------------------------------
# Exponential mechanism (reference: pipeline_dp/dp_computations.py:707-761).
# ---------------------------------------------------------------------------


class ExponentialMechanism:
    """Choose a parameter from a candidate list with probability
    proportional to exp(eps * score / (sensitivity * [2 if not monotonic])).
    Driver-side: candidate lists are small by construction."""

    class ScoringFunction:
        def score(self, k) -> float:
            raise NotImplementedError

        @property
        def global_sensitivity(self) -> float:
            raise NotImplementedError

        @property
        def is_monotonic(self) -> bool:
            raise NotImplementedError

    def __init__(self, scoring_function: "ExponentialMechanism.ScoringFunction"):
        self._scoring_function = scoring_function

    def probabilities(self, eps: float, candidates: List) -> np.ndarray:
        scores = np.array(
            [self._scoring_function.score(k) for k in candidates],
            dtype=float)
        denom = self._scoring_function.global_sensitivity
        if not self._scoring_function.is_monotonic:
            denom *= 2
        # Stabilize exp by shifting by the max score.
        logw = scores * eps / denom
        logw -= logw.max()
        w = np.exp(logw)
        return w / w.sum()

    def apply(self, eps: float, candidates: List, rng=None):
        probs = self.probabilities(eps, candidates)
        rng = rng or np.random.default_rng()
        return candidates[int(rng.choice(len(candidates), p=probs))]


# ---------------------------------------------------------------------------
# Renyi-DP composition helpers (used by the tight budget accountant).
# ---------------------------------------------------------------------------

RDP_ALPHAS = [1.25, 1.5, 1.75, 2.0, 2.5, 3.0, 4.0, 5.0, 6.0, 8.0, 12.0,
              16.0, 24.0, 32.0, 48.0, 64.0, 128.0, 256.0, 512.0]


def gaussian_rdp(sigma: float, alpha: float) -> float:
    """RDP of the Gaussian mechanism at unit L2 sensitivity (exact)."""
    return alpha / (2.0 * sigma * sigma)


def laplace_rdp(scale: float, alpha: float) -> float:
    """RDP of the Laplace mechanism at unit L1 sensitivity (Mironov 2017,
    Table II)."""
    b = scale
    if alpha <= 1.0:
        return 1.0 / b + math.exp(-1.0 / b) - 1.0  # KL divergence (alpha=1)
    x = (alpha - 1) / b
    if x > 500:
        # exp overflow regime: log(t1) dominates; RDP -> 1/b (the pure eps).
        return (math.log(alpha / (2 * alpha - 1)) + x) / (alpha - 1)
    t1 = (alpha / (2 * alpha - 1)) * math.exp(x)
    t2 = ((alpha - 1) / (2 * alpha - 1)) * math.exp(-alpha / b)
    return math.log(t1 + t2) / (alpha - 1)


def pure_dp_rdp(eps: float, alpha: float) -> float:
    """Conservative RDP bound of any pure eps-DP mechanism: RDP(alpha) <=
    min(eps, 2*alpha*eps^2) for eps <= 1 (Bun-Steinke); eps is always a
    valid bound."""
    return min(eps, 2.0 * alpha * eps * eps) if eps <= 1 else eps


def eps_from_rdp(rdp_at_alpha: List[float], delta: float) -> float:
    """Standard RDP -> (eps, delta) conversion: eps = min over alpha of
    rdp(alpha) + log(1/delta)/(alpha - 1)."""
    best = math.inf
    for a, r in zip(RDP_ALPHAS, rdp_at_alpha):
        if a <= 1.0:
            continue
        best = min(best, r + math.log(1.0 / delta) / (a - 1.0))
    return best


def truncated_geometric_probabilities(eps: float, delta: float,
                                      l0: int,
                                      max_n: int = 100_000) -> np.ndarray:
    """Keep-probabilities p[n] for the optimal DP partition-selection
    mechanism (Desfontaines, Voss, Gipson — "Differentially private partition
    selection", PETS 2022). p[n] = P(keep | n privacy ids). Index 0 -> 0.0.

    A user influencing up to l0 partitions gets per-partition budget
    (eps/l0, delta/l0). The optimal mechanism follows the recursion
        p_n = min(e^eps1 * p_{n-1} + delta1,
                  1 - e^{-eps1} * (1 - p_{n-1} - delta1),
                  1)
    truncated where it reaches 1. Returns the array up to (and including) the
    first n with p_n == 1, capped at max_n.
    """
    eps1 = eps / l0
    delta1 = delta / l0
    probs = [0.0]
    e_pos = math.exp(eps1)
    e_neg = math.exp(-eps1)
    while probs[-1] < 1.0 and len(probs) <= max_n:
        prev = probs[-1]
        nxt = min(e_pos * prev + delta1,
                  1.0 - e_neg * (1.0 - prev - delta1),
                  1.0)
        probs.append(nxt)
    return np.array(probs)


# ---------------------------------------------------------------------------
# Mean / variance mechanism math (reference: pipeline_dp/dp_computations.py
# :284-312,353-412,586-621 — semantics only).
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MeanScales:
    """Noise scales for the normalized-sum mean estimator.

    dp_count = count + noise(count_scale)
    dp_norm_sum = sum(clip(v) - mid) + noise(norm_sum_scale)
    dp_mean = mid + dp_norm_sum / max(1, dp_count)
    """

    mid: float
    count_scale: float
    norm_sum_scale: float


def mean_scales(noise_kind: NoiseKind, eps: float, delta: float, l0: int,
                linf: int, min_value: float, max_value: float) -> MeanScales:
    """eps/delta are split equally between count and normalized sum
    (reference: pipeline_dp/dp_computations.py:284-312)."""
    mid = (min_value + max_value) / 2.0
    half_range = (max_value - min_value) / 2.0
    eps_c, eps_s = eps / 2.0, eps / 2.0
    delta_c, delta_s = delta / 2.0, delta / 2.0
    count_sens = Sensitivities(l0=l0, linf=float(linf))
    sum_sens = Sensitivities(l0=l0, linf=linf * half_range)
    return MeanScales(
        mid=mid,
        count_scale=noise_scale(noise_kind, eps_c, delta_c, count_sens),
        norm_sum_scale=noise_scale(noise_kind, eps_s, delta_s, sum_sens)
        if sum_sens.l1 > 0 else 0.0,
    )


@dataclasses.dataclass
class VarianceScales:
    mid: float
    count_scale: float
    norm_sum_scale: float
    norm_sum_sq_scale: float


def variance_scales(noise_kind: NoiseKind, eps: float, delta: float, l0: int,
                    linf: int, min_value: float,
                    max_value: float) -> VarianceScales:
    """eps/delta split into 3 equal parts: count, normalized sum, normalized
    sum of squares (reference: pipeline_dp/dp_computations.py:284-312).

    Values are normalized to [-r/2, r/2] around mid; squares live in
    [0, (r/2)^2] so the squares-sum Linf is linf * (r/2)^2.
    """
    mid = (min_value + max_value) / 2.0
    half_range = (max_value - min_value) / 2.0
    eps3, delta3 = eps / 3.0, delta / 3.0
    count_sens = Sensitivities(l0=l0, linf=float(linf))
    sum_sens = Sensitivities(l0=l0, linf=linf * half_range)
    sq_sens = Sensitivities(l0=l0, linf=linf * half_range * half_range)
    return VarianceScales(
        mid=mid,
        count_scale=noise_scale(noise_kind, eps3, delta3, count_sens),
        norm_sum_scale=noise_scale(noise_kind, eps3, delta3, sum_sens)
        if sum_sens.l1 > 0 else 0.0,
        norm_sum_sq_scale=noise_scale(noise_kind, eps3, delta3, sq_sens)
        if sq_sens.l1 > 0 else 0.0,
    )


def count_sensitivities(l0: int, linf: int) -> Sensitivities:
    """Reference: pipeline_dp/dp_computations.py:764-770."""
    return Sensitivities(l0=l0, linf=float(linf))


def privacy_id_count_sensitivities(l0: int) -> Sensitivities:
    """Reference: pipeline_dp/dp_computations.py:773-778 (Linf = 1)."""
    return Sensitivities(l0=l0, linf=1.0)


def sum_sensitivities(l0: int, linf_contributions: Optional[int],
                      min_value: Optional[float], max_value: Optional[float],
                      min_sum: Optional[float],
                      max_sum: Optional[float]) -> Sensitivities:
    """Two clipping regimes (reference: pipeline_dp/dp_computations.py:781-794):
    per-contribution clip => Linf = max_contributions_per_partition *
    max(|min_value|, |max_value|); per-partition clip => Linf =
    max(|min_sum|, |max_sum|)."""
    if min_value is not None:
        linf = linf_contributions * max(abs(min_value), abs(max_value))
    else:
        linf = max(abs(min_sum), abs(max_sum))
    return Sensitivities(l0=l0, linf=linf)


def vector_sum_sensitivities(l0: int, norm_kind: str,
                             max_norm: float, vector_size: int) -> Sensitivities:
    """Per-vector norm clip to max_norm; one vector per (pid, partition).

    Linf-norm clip => each coordinate <= max_norm => l1 per partition
    <= size*max_norm; L1 clip => l1 <= max_norm; L2 clip => l2 <= max_norm.
    """
    if norm_kind == "l1":
        return Sensitivities(l0=l0, l1=l0 * max_norm,
                             l2=math.sqrt(l0) * max_norm)
    if norm_kind == "l2":
        return Sensitivities(l0=l0, l1=l0 * max_norm * math.sqrt(vector_size),
                             l2=math.sqrt(l0) * max_norm)
    return Sensitivities(l0=l0,
                         l1=l0 * max_norm * vector_size,
                         l2=math.sqrt(l0) * max_norm * math.sqrt(vector_size))
