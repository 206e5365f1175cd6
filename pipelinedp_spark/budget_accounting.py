"""Privacy budget accounting (driver-side, two-phase).

Phase 1: while the query plan is being declared, every DP mechanism calls
``request_budget`` and receives a lazy ``MechanismSpec``. Phase 2: after the
whole pipeline is declared, ``compute_budgets`` distributes the total (eps,
delta) across the requests (naive composition), filling eps/delta into the
specs before any Spark action runs. Semantics mirror the reference contract
(reference: pipeline_dp/budget_accounting.py:43-476); implementation is new.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional

from pipelinedp_spark.aggregate_params import MechanismType

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class Budget:
    """Total privacy budget (epsilon, delta)."""

    epsilon: float
    delta: float = 0.0

    def __post_init__(self):
        if self.epsilon <= 0:
            raise ValueError(f"epsilon must be positive, got {self.epsilon}")
        if not 0 <= self.delta < 1:
            raise ValueError(f"delta must be in [0, 1), got {self.delta}")


class MechanismSpec:
    """A lazy budget share for one DP mechanism.

    eps/delta are None until the accountant's ``compute_budgets`` runs
    (reference: pipeline_dp/budget_accounting.py:43-123).
    """

    def __init__(self,
                 mechanism_type: MechanismType,
                 weight: float = 1.0,
                 count: int = 1):
        self.mechanism_type = mechanism_type
        self.weight = weight
        self.count = count  # number of identical mechanisms sharing this spec
        self._eps: Optional[float] = None
        self._delta: Optional[float] = None
        # Delta earmarked specifically for the keep-threshold of a
        # thresholding mechanism (reference: budget_accounting.py
        # set_thresholding_delta). None => the engine falls back to its
        # historical split of ``delta`` (full delta for Laplace selection,
        # half/half for Gaussian). Accountants that reserve a distinct
        # thresholding budget (PLD) set it so every thresholding site spends
        # exactly the reserved amount.
        self._thresholding_delta: Optional[float] = None

    @property
    def eps(self) -> float:
        if self._eps is None:
            raise AssertionError(
                "Privacy budget is not calculated yet. Call "
                "BudgetAccountant.compute_budgets() first.")
        return self._eps

    @property
    def delta(self) -> float:
        if self._delta is None:
            raise AssertionError(
                "Privacy budget is not calculated yet. Call "
                "BudgetAccountant.compute_budgets() first.")
        return self._delta

    @property
    def uses_delta(self) -> bool:
        return self.mechanism_type not in (MechanismType.LAPLACE,)

    def set_eps_delta(self, eps: float, delta: float) -> None:
        self._eps = eps
        self._delta = delta

    @property
    def thresholding_delta(self) -> Optional[float]:
        return self._thresholding_delta

    def set_thresholding_delta(self, delta: float) -> None:
        self._thresholding_delta = delta

    def __repr__(self):
        return (f"MechanismSpec({self.mechanism_type.value}, weight="
                f"{self.weight}, eps={self._eps}, delta={self._delta})")


class BudgetAccountantScope:
    """``with accountant.scope(weight):`` — budget requested inside the scope
    shares ``weight`` of the total, normalized among its own requests
    (reference: pipeline_dp/budget_accounting.py:184-200)."""

    def __init__(self, accountant: "NaiveBudgetAccountant", weight: float):
        self.accountant = accountant
        self.weight = weight
        self.specs: List[MechanismSpec] = []

    def __enter__(self):
        self.accountant._enter_scope(self)
        return self

    def __exit__(self, exc_type, exc_value, exc_tb):
        self.accountant._exit_scope()
        self._normalize_weights()

    def _normalize_weights(self):
        total = sum(spec.weight for spec in self.specs)
        if total == 0:
            return
        for spec in self.specs:
            spec.weight = spec.weight * self.weight / total


class NaiveBudgetAccountant:
    """Naive (basic) composition: eps_i = eps * w_i / sum(w), likewise delta.

    Reference: pipeline_dp/budget_accounting.py:362-476.
    """

    def __init__(self,
                 total_epsilon: float,
                 total_delta: float = 0.0,
                 num_aggregations: Optional[int] = None,
                 aggregation_weights: Optional[List[float]] = None):
        Budget(total_epsilon, total_delta)  # validate
        self._total_epsilon = total_epsilon
        self._total_delta = total_delta
        self._specs: List[MechanismSpec] = []
        self._scopes_stack: List[BudgetAccountantScope] = []
        self._finalized = False
        self._expected_num_aggregations = num_aggregations
        self._expected_aggregation_weights = aggregation_weights
        self._actual_aggregations = 0
        if num_aggregations is not None and num_aggregations <= 0:
            raise ValueError("num_aggregations must be positive")
        if (num_aggregations is not None and aggregation_weights is not None
                and len(aggregation_weights) != num_aggregations):
            raise ValueError(
                "len(aggregation_weights) must equal num_aggregations")

    def request_budget(self,
                       mechanism_type: MechanismType,
                       weight: float = 1.0,
                       count: int = 1) -> MechanismSpec:
        if self._finalized:
            raise AssertionError(
                "compute_budgets() already called; cannot request more budget")
        if mechanism_type != MechanismType.LAPLACE and self._total_delta == 0:
            raise AssertionError(
                f"{mechanism_type.value} requires delta > 0")
        spec = MechanismSpec(mechanism_type, weight=weight, count=count)
        self._specs.append(spec)
        if self._scopes_stack:
            self._scopes_stack[-1].specs.append(spec)
        return spec

    def scope(self, weight: float) -> BudgetAccountantScope:
        self._actual_aggregations += 1
        return BudgetAccountantScope(self, weight)

    def _enter_scope(self, scope: BudgetAccountantScope):
        self._scopes_stack.append(scope)

    def _exit_scope(self):
        self._scopes_stack.pop()

    def compute_budgets(self) -> None:
        if self._finalized:
            raise AssertionError("compute_budgets() called twice")
        self._finalized = True
        self._validate_aggregation_contract()
        if not self._specs:
            logger.warning("No budget requests registered")
            return
        total_weight = sum(s.weight * s.count for s in self._specs)
        delta_weight = sum(s.weight * s.count for s in self._specs
                           if s.uses_delta)
        for spec in self._specs:
            eps = self._total_epsilon * spec.weight / total_weight
            if spec.uses_delta:
                delta = self._total_delta * spec.weight / delta_weight
            else:
                delta = 0.0
            spec.set_eps_delta(eps, delta)

    def _validate_aggregation_contract(self):
        expected = self._expected_num_aggregations
        if expected is not None and expected != self._actual_aggregations:
            raise ValueError(
                f"num_aggregations={expected} declared but "
                f"{self._actual_aggregations} aggregation scopes were used")

    @property
    def finalized(self) -> bool:
        return self._finalized
