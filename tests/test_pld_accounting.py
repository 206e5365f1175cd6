"""PLD accountant: distribution algebra against analytic ground truth,
base-std search tightness, and reference-semantics contracts.

The reference computes these numbers with Google's dp_accounting; that
library is unavailable here, so correctness is pinned where closed forms
exist (Gaussian composition is exactly Gaussian; Laplace is (1/b, 0)-DP)
and by self-consistency (the composed PLD at the found base std must
certify the requested budget, and must beat naive composition when
composing many mechanisms).
"""

import math

import numpy as np
import pytest

from pipelinedp_spark import dp_computations as dp
from pipelinedp_spark.aggregate_params import MechanismType
from pipelinedp_spark.pld_accounting import (DiscretePLD,
                                             PLDBudgetAccountant)

H = 1e-4


# ---------------------------------------------------------------------------
# DiscretePLD primitives
# ---------------------------------------------------------------------------


def test_gaussian_pld_matches_analytic_delta():
    """delta(eps) of a single Gaussian mechanism has a closed form
    (Balle & Wang 2018, eq. 5): delta = Phi(mu/2s' - eps/s') -
    e^eps Phi(-mu/2s' - eps/s') with s'=1/sigma, mu=1/sigma^2... using
    the standard formulation with mu = s^2/2 for loss ~ N(mu, s)."""
    sigma = 2.0
    pld = DiscretePLD.from_gaussian(sigma, H)
    s = 1.0 / sigma

    def phi(x):
        return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))

    for eps in (0.1, 0.5, 1.0):
        analytic = phi(s / 2.0 - eps / s) - math.exp(eps) * phi(
            -s / 2.0 - eps / s)
        got = pld.delta_for_epsilon(eps)
        # pessimistic discretization: got >= analytic, but tight
        assert analytic - 1e-9 <= got <= analytic + 5e-4, (eps, got,
                                                           analytic)


def test_laplace_pld_is_pure_dp_at_one_over_b():
    b = 0.5
    pld = DiscretePLD.from_laplace(b, H)
    # Laplace(b) is (1/b, 0)-DP: delta vanishes at eps = 1/b.
    assert pld.delta_for_epsilon(1.0 / b + 2 * H) <= 1e-12
    assert pld.delta_for_epsilon(1.0 / b - 0.05) > 1e-6
    # pmf is a probability distribution
    assert pld.pmf.sum() == pytest.approx(1.0, abs=1e-9)


def test_gaussian_self_composition_is_gaussian():
    """k-fold composition of Gaussian(sigma) equals Gaussian with loss
    params (k*mu, sqrt(k)*s) — i.e. the PLD of sigma/sqrt(k)."""
    sigma, k = 3.0, 4
    composed = DiscretePLD.from_gaussian(sigma, H).self_compose(k)
    direct = DiscretePLD.from_gaussian(sigma / math.sqrt(k), H)
    for eps in (0.2, 0.8):
        assert composed.delta_for_epsilon(eps) == pytest.approx(
            direct.delta_for_epsilon(eps), abs=5e-4)


def test_epsilon_for_delta_inverts_delta_for_epsilon():
    pld = DiscretePLD.from_gaussian(1.5, H)
    for delta in (1e-3, 1e-5):
        eps = pld.epsilon_for_delta(delta)
        assert pld.delta_for_epsilon(eps) <= delta
        assert pld.delta_for_epsilon(eps - 0.01) > delta


def test_generic_pld_randomized_response_masses():
    pld = DiscretePLD.from_privacy_parameters(1.0, 1e-3, H)
    assert pld.inf_mass == pytest.approx(1e-3)
    assert pld.pmf.sum() == pytest.approx(1.0 - 1e-3, abs=1e-12)
    # (eps0, delta0) mechanism satisfies exactly its own parameters.
    assert pld.delta_for_epsilon(1.0) == pytest.approx(1e-3, abs=1e-9)


# ---------------------------------------------------------------------------
# Accountant
# ---------------------------------------------------------------------------


def _gauss_accountant(n, eps, delta):
    acct = PLDBudgetAccountant(eps, delta)
    for _ in range(n):
        acct.request_budget(MechanismType.GAUSSIAN)
    acct.compute_budgets()
    return acct


def test_single_gaussian_matches_balle_wang():
    """One Gaussian mechanism: the PLD-derived std must match the analytic
    optimal calibration within discretization tolerance (and never be
    optimistic by more than the discretization error)."""
    eps, delta = 2.0, 1e-6
    acct = _gauss_accountant(1, eps, delta)
    analytic = dp.gaussian_sigma(eps, delta, 1.0)
    assert acct.base_noise_std == pytest.approx(analytic, rel=0.02)


def test_k_gaussians_compose_like_sqrt_k():
    """k identical Gaussians at base std sigma behave as one Gaussian at
    sigma/sqrt(k), so the found base must be ~ sqrt(k) * single-mech
    sigma — and strictly better than naive eps-splitting."""
    eps, delta, k = 2.0, 1e-6, 9
    acct = _gauss_accountant(k, eps, delta)
    expected = math.sqrt(k) * dp.gaussian_sigma(eps, delta, 1.0)
    assert acct.base_noise_std == pytest.approx(expected, rel=0.03)
    naive = dp.gaussian_sigma(eps / k, delta / k, 1.0)
    assert acct.base_noise_std < 0.75 * naive


def test_single_laplace_base_std():
    """With a delta budget, one Laplace mechanism needs b <= 1/eps (pure
    DP at 1/b); PLD may certify slightly less noise via the delta."""
    eps, delta = 1.0, 1e-6
    acct = PLDBudgetAccountant(eps, delta)
    spec = acct.request_budget(MechanismType.LAPLACE)
    acct.compute_budgets()
    b = acct.base_noise_std / math.sqrt(2.0)
    assert 0.8 / eps <= b <= 1.0 / eps + 1e-3
    # back-filled eps reproduces the engine calibration b = 1/eps_spec
    assert 1.0 / spec.eps == pytest.approx(b, rel=1e-6)


def test_mixed_composition_certifies_budget():
    eps, delta = 3.0, 1e-5
    acct = PLDBudgetAccountant(eps, delta)
    acct.request_budget(MechanismType.LAPLACE)
    acct.request_budget(MechanismType.GAUSSIAN)
    acct.request_budget(MechanismType.GAUSSIAN, weight=2.0)
    acct.compute_budgets()
    # self-consistency: the composed PLD at the found base std satisfies
    # the requested budget, and the search is tight (0.01% less noise
    # would overshoot epsilon by more than the search threshold allows).
    assert acct.composed_epsilon() <= eps + 1e-6
    assert acct.base_noise_std is not None


def test_thresholding_reserves_quarter_delta():
    eps, delta = 1.0, 1e-4
    acct = PLDBudgetAccountant(eps, delta)
    spec = acct.request_budget(MechanismType.LAPLACE_THRESHOLDING)
    acct.compute_budgets()
    # all thresholding delta (0.25 * total) goes to the single spec's
    # keep-threshold, pinned via the dedicated field the engine reads
    assert spec.thresholding_delta == pytest.approx(0.25 * delta)
    # Laplace noise is pure-eps, so the spec's total delta IS the threshold
    assert spec.delta == pytest.approx(0.25 * delta)


def test_total_delta_spend_within_budget_laplace_selection():
    """Regression (round-3 advice): with Laplace-thresholding selection the
    engine spends spec.thresholding_delta on the threshold while noise is
    certified by the composed PLD at total_delta - reservation. The sum of
    the two must not exceed total_delta."""
    eps, delta = 1.0, 1e-4
    acct = PLDBudgetAccountant(eps, delta)
    thr_spec = acct.request_budget(MechanismType.LAPLACE_THRESHOLDING)
    acct.request_budget(MechanismType.LAPLACE)  # a count metric
    acct.compute_budgets()
    noise_delta_certified = delta - acct._thresholding_delta()
    threshold_spend = thr_spec.thresholding_delta
    assert threshold_spend == pytest.approx(0.25 * delta)
    assert noise_delta_certified + threshold_spend <= delta + 1e-18
    # and the composed PLD actually certifies the noise at that delta
    assert acct.composed_epsilon() <= eps + 1e-6


def test_gaussian_thresholding_delta_split():
    """GAUSSIAN_THRESHOLDING: threshold gets the reservation, noise the
    other half of spec.delta — engine sites derive noise_delta =
    spec.delta - thresholding_delta."""
    eps, delta = 1.0, 1e-4
    acct = PLDBudgetAccountant(eps, delta)
    spec = acct.request_budget(MechanismType.GAUSSIAN_THRESHOLDING)
    acct.compute_budgets()
    assert spec.thresholding_delta == pytest.approx(0.25 * delta)
    assert spec.delta == pytest.approx(0.5 * delta)
    assert spec.delta - spec.thresholding_delta + spec.thresholding_delta \
        <= 0.5 * delta + 1e-18


def test_pure_eps_matches_reference_formula():
    """delta == 0: base = sum(weights) * sqrt(2) / eps (reference
    budget_accounting.py:598-603)."""
    acct = PLDBudgetAccountant(2.0, 0.0)
    acct.request_budget(MechanismType.LAPLACE)
    acct.request_budget(MechanismType.LAPLACE, weight=3.0)
    acct.compute_budgets()
    assert acct.base_noise_std == pytest.approx(4.0 * math.sqrt(2.0) / 2.0)


def test_count_self_composition():
    eps, delta = 2.0, 1e-6
    one = _gauss_accountant(4, eps, delta)
    acct = PLDBudgetAccountant(eps, delta)
    acct.request_budget(MechanismType.GAUSSIAN, count=4)
    acct.compute_budgets()
    assert acct.base_noise_std == pytest.approx(one.base_noise_std,
                                                rel=0.01)


def test_generic_selection_spec_gets_reference_eps_delta():
    """GENERIC specs get eps0 = sqrt(2)/std, delta0 = eps0/eps*delta
    (reference budget_accounting.py:615-621)."""
    eps, delta = 1.0, 1e-5
    acct = PLDBudgetAccountant(eps, delta)
    spec = acct.request_budget(MechanismType.GENERIC)
    acct.compute_budgets()
    eps0 = math.sqrt(2.0) / acct.base_noise_std
    assert spec.eps == pytest.approx(eps0)
    assert spec.delta == pytest.approx(eps0 / eps * delta)


def test_engine_runs_with_pld_accountant(spark):
    """End-to-end: DPEngine calibrates from PLD-assigned specs; zero-noise
    output equals the naive-accountant zero-noise output (bounding and
    selection semantics are budget-independent in zero-noise mode with
    public partitions)."""
    import pipelinedp_spark as pds
    from pyspark.sql import functions as F

    df = spark.range(200).select(
        (F.col("id") % 40).alias("uid"),
        (F.col("id") % 4).alias("grp"),
        (F.col("id") % 7).cast("double").alias("v"))
    # caps chosen non-binding (each uid has 5 rows in exactly 1 group) so
    # zero-noise output is deterministic — no bounding sample runs.
    params = pds.AggregateParams(
        metrics=[pds.Metrics.COUNT, pds.Metrics.SUM],
        max_partitions_contributed=1,
        max_contributions_per_partition=5,
        min_value=0.0, max_value=6.0)
    outs = {}
    for name, acct in (("naive", pds.NaiveBudgetAccountant(2.0, 1e-6)),
                       ("pld", PLDBudgetAccountant(2.0, 1e-6))):
        engine = pds.DPEngine(acct, noise_mode="zero")
        res = engine.aggregate(
            df, params,
            pds.DataFrameExtractors("uid", "grp", "v"),
            public_partitions=[0, 1, 2, 3])
        acct.compute_budgets()
        outs[name] = {tuple(r) for r in res.dataframe().collect()}
    assert outs["naive"] == outs["pld"]


def test_beats_naive_on_many_mechanisms():
    """The reason this accountant exists: for 8 composed Gaussian
    mechanisms PLD certifies substantially less noise than naive
    eps/delta splitting."""
    eps, delta = 1.0, 1e-6
    n = 8
    acct = _gauss_accountant(n, eps, delta)
    naive_sigma = dp.gaussian_sigma(eps / n, delta / n, 1.0)
    assert acct.base_noise_std < 0.7 * naive_sigma
