"""Tight budget accounting via Renyi-DP composition.

Fills the role of the reference's ``PLDBudgetAccountant`` (reference:
pipeline_dp/budget_accounting.py:479-747 — which binary-searches a base
noise level under privacy-loss-distribution composition from Google's
``dp_accounting``): same two-phase request/compute contract as the naive
accountant, but the composed privacy cost is measured with Renyi-DP curves
(exact for Gaussian, Mironov's closed form for Laplace, a conservative
pure-DP bound for the geometric selection mechanism) instead of summing
(eps, delta) linearly. ``compute_budgets`` binary-searches the largest
uniform epsilon multiplier m >= 1 such that the composition of all
mechanisms at (m * naive_eps_i) still satisfies (total_eps, total_delta) —
every mechanism gets at least its naive share and usually substantially
more (less noise), with the gain growing with the number of composed
Gaussian mechanisms.

The implementation is self-contained (no external accounting library) and
intentionally conservative: when RDP cannot certify a multiplier above 1,
the result equals naive composition.
"""

from __future__ import annotations

import logging

from pipelinedp_spark import dp_computations as dp
from pipelinedp_spark.aggregate_params import MechanismType
from pipelinedp_spark.budget_accounting import (MechanismSpec,
                                                NaiveBudgetAccountant)

logger = logging.getLogger(__name__)

_GAUSSIAN_TYPES = (MechanismType.GAUSSIAN,
                   MechanismType.GAUSSIAN_THRESHOLDING)
_LAPLACE_TYPES = (MechanismType.LAPLACE, MechanismType.LAPLACE_THRESHOLDING)


class RDPBudgetAccountant(NaiveBudgetAccountant):
    """Drop-in replacement for NaiveBudgetAccountant with RDP composition."""

    # Fraction of total delta reserved for the RDP -> (eps, delta)
    # conversion; the rest is distributed to the delta-consuming mechanisms.
    _CONVERSION_DELTA_FRACTION = 0.5

    def compute_budgets(self) -> None:
        if self._finalized:
            raise AssertionError("compute_budgets() called twice")
        self._finalized = True
        self._validate_aggregation_contract()
        if not self._specs:
            logger.warning("No budget requests registered")
            return

        total_weight = sum(s.weight * s.count for s in self._specs)
        delta_specs = [s for s in self._specs if s.uses_delta]
        delta_weight = sum(s.weight * s.count for s in delta_specs)
        if self._total_delta > 0 and delta_specs:
            delta_mech_total = self._total_delta * \
                (1.0 - self._CONVERSION_DELTA_FRACTION)
            conversion_delta = self._total_delta * \
                self._CONVERSION_DELTA_FRACTION
        else:
            delta_mech_total = 0.0
            conversion_delta = self._total_delta

        def naive_eps(spec: MechanismSpec) -> float:
            return self._total_epsilon * spec.weight / total_weight

        def mech_delta(spec: MechanismSpec) -> float:
            if not spec.uses_delta or delta_weight == 0:
                return 0.0
            return delta_mech_total * spec.weight / delta_weight

        def composed_eps(multiplier: float) -> float:
            """epsilon at conversion_delta of all mechanisms run with
            m-amplified budgets, composed via RDP."""
            rdp = [0.0] * len(dp.RDP_ALPHAS)
            for s in self._specs:
                eps_i = naive_eps(s) * multiplier
                d_i = mech_delta(s)
                for idx, alpha in enumerate(dp.RDP_ALPHAS):
                    if s.mechanism_type in _GAUSSIAN_TYPES and d_i > 0:
                        sigma = dp.gaussian_sigma(eps_i, d_i, 1.0)
                        r = dp.gaussian_rdp(sigma, alpha)
                    elif s.mechanism_type in _LAPLACE_TYPES:
                        r = dp.laplace_rdp(1.0 / eps_i, alpha)
                    else:
                        r = dp.pure_dp_rdp(eps_i, alpha)
                    rdp[idx] += r * s.count
            if conversion_delta <= 0:
                # Pure-DP composition fallback: sum of epsilons.
                return sum(naive_eps(s) * multiplier * s.count
                           for s in self._specs)
            return dp.eps_from_rdp(rdp, conversion_delta)

        # m = 1 may already exceed the budget under RDP accounting (the
        # conversion costs log(1/delta)/(alpha-1)); composition is
        # certified by naive accounting in that case.
        lo, hi = 1.0, 1.0
        if composed_eps(1.0) <= self._total_epsilon:
            while hi < 1e6 and composed_eps(hi * 2) <= self._total_epsilon:
                hi *= 2
            lo = hi
            hi = hi * 2
            for _ in range(60):
                mid = (lo + hi) / 2
                if composed_eps(mid) <= self._total_epsilon:
                    lo = mid
                else:
                    hi = mid
        multiplier = lo
        if multiplier > 1.0:
            logger.info("RDP accounting amplified per-mechanism epsilon by "
                        "%.3fx over naive composition", multiplier)
        for spec in self._specs:
            spec.set_eps_delta(naive_eps(spec) * multiplier,
                               mech_delta(spec))


