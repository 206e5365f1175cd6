"""Privacy-loss-distribution (PLD) budget accounting.

Semantics mirror the reference ``PLDBudgetAccountant`` (reference:
pipeline_dp/budget_accounting.py:479-747): every mechanism's noise is a
multiple of one *base* noise standard deviation (scaled by sensitivity /
weight), and ``compute_budgets`` binary-searches the smallest base std whose
PLD *composition* across all mechanisms still satisfies
(total_epsilon, total_delta). The reference delegates the PLD machinery to
Google's ``dp_accounting``; that library is not available here, so the
distribution algebra is implemented from scratch on numpy using the
published construction (Sommer-Meiser-Mohammadi, PETS'19; Koskela et al.
AISTATS'20): pessimistically discretized privacy-loss PMFs composed by FFT
convolution, with epsilon-for-delta read off the hockey-stick divergence

    delta(eps) = inf_mass + sum_{l > eps} (1 - e^{eps - l}) * P[loss = l].

Differences from the reference, by necessity of engine integration: the
engine derives noise scales from (eps, delta) pairs, so after the base std
is found each spec is back-filled with the (eps, delta) pair that makes the
engine's calibration reproduce exactly the PLD-derived std (for Laplace the
inversion is closed-form; for Gaussian it is a monotone bisection against
the analytic Balle-Wang calibration). The per-spec pairs are bookkeeping
for calibration only — the end-to-end guarantee is certified by the
composed PLD, which is the whole point of the accountant.
"""

from __future__ import annotations

import logging
import math
from typing import List, Optional

import numpy as np

from pipelinedp_spark import dp_computations as dp
from pipelinedp_spark.aggregate_params import MechanismType
from pipelinedp_spark.budget_accounting import (MechanismSpec,
                                                NaiveBudgetAccountant)

logger = logging.getLogger(__name__)

_GAUSSIAN_TYPES = (MechanismType.GAUSSIAN,
                   MechanismType.GAUSSIAN_THRESHOLDING)
_LAPLACE_TYPES = (MechanismType.LAPLACE, MechanismType.LAPLACE_THRESHOLDING)
_GENERIC_TYPES = (MechanismType.GENERIC, MechanismType.TRUNCATED_GEOMETRIC)
_THRESHOLDING_TYPES = (MechanismType.LAPLACE_THRESHOLDING,
                       MechanismType.GAUSSIAN_THRESHOLDING)

_TAIL_MASS = 1e-15  # per-side truncation for continuous losses


class DiscretePLD:
    """A privacy-loss distribution on the integer grid ``loss = i * h``.

    ``pmf[j]`` is the probability of loss ``(offset + j) * h``; ``inf_mass``
    is the probability of infinite loss. Discretization is pessimistic:
    every continuous loss value is rounded UP to the next grid point, so
    composed epsilons are upper bounds.
    """

    __slots__ = ("h", "offset", "pmf", "inf_mass")

    def __init__(self, h: float, offset: int, pmf: np.ndarray,
                 inf_mass: float = 0.0):
        self.h = h
        self.offset = offset
        self.pmf = pmf
        self.inf_mass = inf_mass

    # -- constructors -------------------------------------------------------

    @staticmethod
    def from_laplace(b: float, h: float) -> "DiscretePLD":
        """Unit-sensitivity Laplace(b). Loss support is [-1/b, 1/b]:
        an atom of 1/2 at +1/b (x <= 0), an atom of e^{-1/b}/2 at -1/b
        (x >= 1), and loss (1-2x)/b with x ~ Lap(b) density on 0 < x < 1."""
        top = 1.0 / b
        hi = math.ceil(top / h)
        lo = -hi
        pmf = np.zeros(hi - lo + 1)
        pmf[hi - lo] += 0.5                      # atom at +1/b (rounded up)
        pmf[0] += math.exp(-top) / 2.0           # atom at -1/b (lowest cell)
        # Continuous part: loss l = (1-2x)/b for x in (0,1) =>
        # x = (1 - l*b)/2, P(loss <= l) corresponds to P(x >= (1-l*b)/2).
        # Mass in loss-cell (l0, l1] = P(x in [(1-l1 b)/2, (1-l0 b)/2)).
        edges = (np.arange(lo, hi + 1) * h).clip(-top, top)
        x_at = (1.0 - edges * b) / 2.0           # decreasing in loss
        cdf = 1.0 - 0.5 * np.exp(-x_at / b)      # P(X <= x) for x in (0,1)
        # cell j (upper edge edges[j]) gets P(x in (x_at[j], x_at[j-1]])
        mass = np.empty(hi - lo + 1)
        mass[0] = 0.0
        mass[1:] = cdf[:-1] - cdf[1:]
        np.maximum(mass, 0.0, out=mass)
        pmf += mass
        pmf /= pmf.sum()
        return DiscretePLD(h, lo, pmf, 0.0)

    @staticmethod
    def from_gaussian(sigma: float, h: float) -> "DiscretePLD":
        """Unit-sensitivity Gaussian(sigma): loss ~ N(mu, s) with
        mu = 1/(2 sigma^2), s = 1/sigma."""
        mu = 1.0 / (2.0 * sigma * sigma)
        s = 1.0 / sigma
        # z such that upper tail beyond mu + z*s is < _TAIL_MASS
        z = math.sqrt(max(2.0 * math.log(1.0 / _TAIL_MASS), 1.0))
        lo = math.floor((mu - z * s) / h)
        hi = math.ceil((mu + z * s) / h)
        edges = np.arange(lo - 1, hi + 1) * h
        zs = (edges - mu) / s
        cdf = _phi(zs)
        pmf = np.diff(cdf)                       # mass rounded up to edge
        np.maximum(pmf, 0.0, out=pmf)
        inf_mass = float(1.0 - cdf[-1])          # upper tail -> +inf (pess.)
        pmf[0] += cdf[0]                         # lower tail -> lowest cell
        return DiscretePLD(h, lo, pmf, inf_mass)

    @staticmethod
    def from_privacy_parameters(eps0: float, delta0: float,
                                h: float) -> "DiscretePLD":
        """Canonical PLD of a generic (eps0, delta0)-DP mechanism: +inf
        w.p. delta0; +-eps0 with the standard randomized-response masses."""
        k = math.ceil(eps0 / h)
        pmf = np.zeros(2 * k + 1)
        e = math.exp(eps0)
        pmf[2 * k] = (1.0 - delta0) * e / (1.0 + e)
        pmf[0] = (1.0 - delta0) / (1.0 + e)
        return DiscretePLD(h, -k, pmf, delta0)

    # -- algebra ------------------------------------------------------------

    def compose(self, other: "DiscretePLD") -> "DiscretePLD":
        assert self.h == other.h
        pmf = _fft_convolve(self.pmf, other.pmf)
        inf_mass = 1.0 - (1.0 - self.inf_mass) * (1.0 - other.inf_mass)
        return DiscretePLD(self.h, self.offset + other.offset, pmf, inf_mass)

    def self_compose(self, count: int) -> "DiscretePLD":
        result = None
        power = self
        n = count
        while n:
            if n & 1:
                result = power if result is None else result.compose(power)
            n >>= 1
            if n:
                power = power.compose(power)
        return result

    def delta_for_epsilon(self, eps: float) -> float:
        losses = (self.offset + np.arange(len(self.pmf))) * self.h
        over = losses > eps
        return float(self.inf_mass
                     + np.sum((1.0 - np.exp(eps - losses[over]))
                              * self.pmf[over]))

    def epsilon_for_delta(self, delta: float) -> float:
        """Smallest eps with delta(eps) <= delta (delta() is decreasing)."""
        if self.delta_for_epsilon(0.0) <= delta:
            lo, hi = -1.0, 0.0
            while self.delta_for_epsilon(lo) <= delta:
                lo *= 2.0
                if lo < -1e6:
                    return lo
        else:
            lo, hi = 0.0, 1.0
            while self.delta_for_epsilon(hi) > delta:
                hi *= 2.0
                if hi > 1e8:
                    return hi
        for _ in range(80):
            mid = (lo + hi) / 2.0
            if self.delta_for_epsilon(mid) <= delta:
                hi = mid
            else:
                lo = mid
        return hi


_erf = np.vectorize(math.erf)


def _phi(x: np.ndarray) -> np.ndarray:
    """Standard normal CDF (vectorized math.erf; no scipy here)."""
    return 0.5 * (1.0 + _erf(np.asarray(x) / math.sqrt(2.0)))


def _fft_convolve(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    n = len(a) + len(b) - 1
    size = 1 << (n - 1).bit_length()
    fa = np.fft.rfft(a, size)
    fb = np.fft.rfft(b, size)
    out = np.fft.irfft(fa * fb, size)[:n]
    np.maximum(out, 0.0, out=out)
    return out


class PLDBudgetAccountant(NaiveBudgetAccountant):
    """Drop-in accountant: binary search on a base noise std under PLD
    composition (reference: pipeline_dp/budget_accounting.py:580-641).

    Every mechanism's unit-sensitivity noise std is ``base_std / weight``;
    epsilon/delta pairs are back-filled so the engine's (eps, delta) ->
    scale calibration reproduces those stds exactly.
    """

    # Matches the reference: a quarter of total delta funds thresholding
    # when thresholding mechanisms are present (budget_accounting.py:707).
    _THRESHOLDING_DELTA_FRACTION = 0.25

    def __init__(self,
                 total_epsilon: float,
                 total_delta: float = 0.0,
                 pld_discretization: float = 1e-4,
                 num_aggregations: Optional[int] = None,
                 aggregation_weights: Optional[List[float]] = None):
        super().__init__(total_epsilon, total_delta,
                         num_aggregations=num_aggregations,
                         aggregation_weights=aggregation_weights)
        self._h = pld_discretization
        self.base_noise_std: Optional[float] = None

    # -- composition --------------------------------------------------------

    def _mechanism_pld(self, spec: MechanismSpec,
                       base_std: float) -> DiscretePLD:
        unit_std = base_std / spec.weight
        if spec.mechanism_type in _LAPLACE_TYPES:
            pld = DiscretePLD.from_laplace(unit_std / math.sqrt(2.0), self._h)
        elif spec.mechanism_type in _GAUSSIAN_TYPES:
            pld = DiscretePLD.from_gaussian(unit_std, self._h)
        elif spec.mechanism_type in _GENERIC_TYPES:
            eps0 = math.sqrt(2.0) / unit_std
            delta0 = (eps0 / self._total_epsilon * self._total_delta
                      if self._total_delta else 0.0)
            pld = DiscretePLD.from_privacy_parameters(eps0, delta0, self._h)
        else:  # pragma: no cover - all engine types are covered above
            raise ValueError(f"unsupported mechanism {spec.mechanism_type}")
        if spec.count > 1:
            pld = pld.self_compose(spec.count)
        return pld

    def _compose_all(self, base_std: float) -> DiscretePLD:
        composed = None
        for spec in self._specs:
            pld = self._mechanism_pld(spec, base_std)
            composed = pld if composed is None else composed.compose(pld)
        return composed

    def _thresholding_delta(self) -> float:
        has = any(s.mechanism_type in _THRESHOLDING_TYPES
                  for s in self._specs)
        return self._THRESHOLDING_DELTA_FRACTION * self._total_delta \
            if has else 0.0

    def _find_base_std(self) -> float:
        """Binary search the smallest base std satisfying the budget
        (reference: _find_minimum_base_noise_std /
        _calculate_max_noise_std, budget_accounting.py:627-662)."""
        delta = self._total_delta - self._thresholding_delta()
        hi = 1.0
        while (self._compose_all(hi).epsilon_for_delta(delta)
               > self._total_epsilon):
            hi *= 2.0
            if hi > 1e9:
                # Bracket cap hit: no base std up to 1e9 satisfies the
                # budget (pathological eps/delta). Returning the cap would
                # silently under-deliver the guarantee — fail loudly.
                raise ValueError(
                    f"PLD base-std search could not satisfy "
                    f"(eps={self._total_epsilon}, delta={delta}) with base "
                    f"std <= 1e9; achieved eps at cap = "
                    f"{self._compose_all(hi).epsilon_for_delta(delta):.4g}. "
                    f"The budget is too small for the registered "
                    f"mechanisms.")
        lo = 0.0
        while lo + 1e-4 < hi:
            mid = (lo + hi) / 2.0
            eps = self._compose_all(mid).epsilon_for_delta(delta)
            if eps <= self._total_epsilon:
                hi = mid
            else:
                lo = mid
        return hi

    # -- budget assignment ---------------------------------------------------

    def compute_budgets(self) -> None:
        if self._finalized:
            raise AssertionError("compute_budgets() called twice")
        self._finalized = True
        self._validate_aggregation_contract()
        if not self._specs:
            logger.warning("No budget requests registered")
            return

        if self._total_delta == 0:
            # Pure-eps pipeline: only Laplace composes; naive linear
            # composition is tight-ish and matches the reference formula
            # base = sum(weights) * sqrt(2) / eps.
            sum_weights = sum(s.weight * s.count for s in self._specs)
            base_std = sum_weights * math.sqrt(2.0) / self._total_epsilon
        else:
            base_std = self._find_base_std()
        self.base_noise_std = base_std

        thr_specs = [s for s in self._specs
                     if s.mechanism_type in _THRESHOLDING_TYPES]
        thr_delta_each = (self._thresholding_delta() / len(thr_specs)
                          if thr_specs else 0.0)

        for spec in self._specs:
            unit_std = base_std / spec.weight
            if spec.mechanism_type in _THRESHOLDING_TYPES:
                # The keep-threshold may spend exactly its reservation —
                # engine thresholding sites read this field instead of
                # splitting ``delta`` heuristically (the Laplace selection
                # site would otherwise spend the FULL delta on the
                # threshold, exceeding the reservation 2x).
                spec.set_thresholding_delta(thr_delta_each)
            if spec.mechanism_type in _LAPLACE_TYPES:
                # engine: b = l1 / eps  =>  eps making b_unit = std/sqrt(2)
                eps = math.sqrt(2.0) / unit_std
                delta = (thr_delta_each
                         if spec.mechanism_type in _THRESHOLDING_TYPES
                         else 0.0)
            elif spec.mechanism_type in _GAUSSIAN_TYPES:
                if spec.mechanism_type in _THRESHOLDING_TYPES:
                    delta = 2.0 * thr_delta_each
                    cal_delta = thr_delta_each
                else:
                    # nominal accounting delta; the true guarantee is the
                    # composed PLD. Any positive value works for the
                    # calibration inversion; use an equal share.
                    delta = self._total_delta / (2.0 * len(self._specs))
                    cal_delta = delta
                eps = _invert_gaussian_sigma(unit_std, cal_delta)
            else:  # generic / truncated geometric
                eps = math.sqrt(2.0) / unit_std
                delta = eps / self._total_epsilon * self._total_delta
            spec.set_eps_delta(eps, delta)

    def composed_epsilon(self, delta: Optional[float] = None) -> float:
        """Diagnostic: epsilon certified by the composed PLD at the found
        base std (should be <= total_epsilon)."""
        if self.base_noise_std is None:
            raise AssertionError("compute_budgets() not called")
        d = self._total_delta - self._thresholding_delta() \
            if delta is None else delta
        return self._compose_all(self.base_noise_std).epsilon_for_delta(d)


def _invert_gaussian_sigma(target_sigma: float, delta: float) -> float:
    """The eps for which the engine's analytic Gaussian calibration
    (dp_computations.gaussian_sigma, Balle-Wang) yields target_sigma at
    unit L2 sensitivity. gaussian_sigma is decreasing in eps."""
    lo, hi = 1e-12, 1.0
    while dp.gaussian_sigma(hi, delta, 1.0) > target_sigma:
        hi *= 2.0
        if hi > 1e8:
            break
    for _ in range(80):
        mid = (lo + hi) / 2.0
        if dp.gaussian_sigma(mid, delta, 1.0) > target_sigma:
            lo = mid
        else:
            hi = mid
    return hi
