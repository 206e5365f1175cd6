"""Statistical calibration of the noise MECHANISMS themselves (r9):
the e2e suites verify near-exactness at huge epsilon, but nothing
pinned the noise *distribution*. Each test draws ~10^6 samples through
the real SecureNoiseSource pandas-UDF path and runs a
Kolmogorov-Smirnov (continuous mechanisms) or binomial (selection
keep-probabilities) test against the closed form — plus a MUTATION
check inside the test: the same statistic must REJECT an injected 1.1x
scale bug, so the test provably has the power it claims.

alpha = 1e-5 (KS critical value c = sqrt(-ln(alpha/2)/2) ~ 2.47, i.e.
D_crit ~ 0.00247 at n = 10^6) — far below the ~0.018-0.023 max-CDF-gap
a 1.1x scale error produces, so the tests are simultaneously
non-flaky and sharp. No scipy: the KS statistic and both CDFs are a
few lines of numpy/math."""

import math

import numpy as np
from pyspark.sql import functions as F

from pipelinedp_spark.noise import SecureNoiseSource

N = 1_000_000
KS_CRIT = math.sqrt(-math.log(1e-5 / 2.0) / 2.0) / math.sqrt(N)


def _samples(spark, col) -> np.ndarray:
    df = spark.range(N).select(col.alias("x"))
    return np.array([r["x"] for r in df.collect()], dtype=np.float64)


def _ks(samples: np.ndarray, cdf) -> float:
    s = np.sort(samples)
    grid = cdf(s)
    n = len(s)
    ecdf_hi = np.arange(1, n + 1) / n
    ecdf_lo = np.arange(0, n) / n
    return max(np.abs(ecdf_hi - grid).max(),
               np.abs(grid - ecdf_lo).max())


def test_laplace_noise_is_calibrated(spark):
    scale = 2.5
    x = _samples(spark, SecureNoiseSource().laplace(scale))

    def cdf(v, b=scale):
        return np.where(v < 0, 0.5 * np.exp(v / b),
                        1.0 - 0.5 * np.exp(-v / b))

    assert _ks(x, cdf) < KS_CRIT
    # mutation power: the same samples must FAIL against a 1.1x-scale
    # closed form (i.e. the test would catch a 1.1x bug in the source)
    assert _ks(x, lambda v: cdf(v, 1.1 * scale)) > 4 * KS_CRIT


def test_gaussian_noise_is_calibrated(spark):
    sigma = 3.0
    x = _samples(spark, SecureNoiseSource().gaussian(sigma))

    def cdf(v, s=sigma):
        from numpy import vectorize
        erf = vectorize(math.erf)
        return 0.5 * (1.0 + erf(v / (s * math.sqrt(2.0))))

    assert _ks(x, cdf) < KS_CRIT
    assert _ks(x, lambda v: cdf(v, 1.1 * sigma)) > 4 * KS_CRIT


def test_truncated_geometric_keep_matches_closed_form(spark):
    """Empirical keep frequency at a fixed privacy-id count must match
    `truncated_geometric_probabilities`' closed form to binomial
    precision — and the acceptance band must be tight enough to reject
    a 1.1x probability bug."""
    from pipelinedp_spark.dp_computations import \
        truncated_geometric_probabilities

    probs = truncated_geometric_probabilities(eps=1.0, delta=1e-4, l0=1)
    # pick the count whose keep probability is nearest 0.5 — where the
    # binomial variance (and the test's discrimination) peaks
    n_star = int(np.argmin(np.abs(probs - 0.5)))
    p = float(probs[n_star])
    assert 0.2 < p < 0.8
    n_draws = 400_000
    src = SecureNoiseSource()
    keep = src.geometric_keep(F.lit(n_star).cast("long"), probs, None)
    df = spark.range(n_draws).select(keep.alias("k"))
    p_hat = df.filter("k").count() / n_draws
    band = 5.0 * math.sqrt(p * (1 - p) / n_draws)   # ~0.004
    assert abs(p_hat - p) < band
    # mutation power: a 1.1x-probability bug shifts p_hat by 0.1*p —
    # far outside the band, so this assertion would catch it
    assert 0.1 * p > 2 * band


def test_zero_mode_is_exactly_zero(spark):
    from pipelinedp_spark.noise import ZeroNoiseSource

    z = ZeroNoiseSource()
    df = spark.range(100).select(
        (F.lit(7.0) + z.laplace(9.9)).alias("a"),
        (F.lit(7.0) + z.gaussian(9.9)).alias("b"))
    rows = df.collect()
    assert all(r["a"] == 7.0 and r["b"] == 7.0 for r in rows)
