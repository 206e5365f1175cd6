"""Analysis-layer tests: pre-aggregation, histograms, error estimation,
utility analysis, tuning, strategy selection."""

import math

import pytest
from pyspark.sql import functions as F

import pipelinedp_spark as pds
from pipelinedp_spark import analysis as A
from pipelinedp_spark.aggregate_params import (AggregateParams, Metric,
                                               Metrics, NoiseKind)
from pipelinedp_spark.analysis.histograms import HistogramType
from pipelinedp_spark.dp_computations import Sensitivities
from pipelinedp_spark.dp_engine import DataFrameExtractors


@pytest.fixture
def data(spark):
    # user u contributes to partitions 0..(u % 3), 2 rows each, value 1.5
    rows = []
    for u in range(12):
        for pk in range(u % 3 + 1):
            rows += [(u, f"p{pk}", 1.5), (u, f"p{pk}", 1.5)]
    return spark.createDataFrame(rows, "uid int, pk string, v double")


EXT = DataFrameExtractors("uid", "pk", "v")


def test_preaggregate(data):
    out = A.preaggregate(data, EXT)
    rows = out.collect()
    # one row per (pid, pk): users with u%3==2 contribute to 3 partitions
    assert len(rows) == sum(u % 3 + 1 for u in range(12))
    r = [x for x in rows if x["n_partitions"] == 3][0]
    assert r["count"] == 2 and r["sum"] == 3.0 and r["n_contributions"] == 6


def test_preaggregate_sampling_deterministic(data):
    a = A.preaggregate(data, EXT, partitions_sampling_prob=0.5).collect()
    b = A.preaggregate(data, EXT, partitions_sampling_prob=0.5).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    assert len(a) < A.preaggregate(data, EXT).count()


def test_dataset_histograms(data):
    h = A.compute_dataset_histograms(data, EXT)
    # L0: 4 users each with 1, 2, 3 partitions
    l0 = {b.lower: b.count for b in h.l0_contributions_histogram.bins}
    assert l0 == {1: 4, 2: 4, 3: 4}
    # Linf: every (pid, pk) has exactly 2 contributions
    linf = {b.lower: b.count for b in h.linf_contributions_histogram.bins}
    assert set(linf) == {2}
    assert h.l0_contributions_histogram.total_count == 12
    assert h.count_per_partition_histogram.total_count == 3  # 3 partitions
    assert h.sum_per_partition_histogram is not None


def test_dataset_histograms_empty_df(spark):
    # Regression (r04 advice): empty input with a value column crashed
    # with KeyError('linf_sum') in the float-bin range lookup.
    empty = spark.createDataFrame([], "uid int, pk string, v double")
    h = A.compute_dataset_histograms(empty, EXT)
    assert h.l0_contributions_histogram.bins == []
    assert h.linf_sum_contributions_histogram.bins == []
    assert h.sum_per_partition_histogram.bins == []


def test_dataset_histograms_all_null_value(spark):
    # All-null value column: float ranges collapse to lo=None; float
    # histograms must come back empty instead of TypeError-ing.
    df = spark.createDataFrame([(1, "p0", None), (2, "p0", None)],
                               "uid int, pk string, v double")
    h = A.compute_dataset_histograms(df, EXT)
    assert h.linf_sum_contributions_histogram.bins == []
    assert h.sum_per_partition_histogram.bins == []
    # integer histograms still real
    assert h.l0_contributions_histogram.total_count == 2


def test_log_binning_large_values(spark):
    df = spark.createDataFrame(
        [(1, "a", float(i)) for i in range(1)] +
        [(u, "a", 1.0) for u in range(2, 5)],
        "uid int, pk string, v double")
    # put one user with 12345 contributions in one partition
    big = spark.createDataFrame([(99, "b", 1.0)] * 12345,
                                "uid int, pk string, v double")
    h = A.compute_dataset_histograms(df.unionByName(big), EXT)
    lowers = [b.lower for b in h.linf_contributions_histogram.bins]
    assert 12300 in lowers  # 12345 -> keep 3 significant digits


def test_histogram_quantiles():
    bins = [A.FrequencyBin(i, i + 1, 10, 10 * i, i, i) for i in range(1, 11)]
    h = A.Histogram(HistogramType.L0_CONTRIBUTIONS, bins)
    assert h.quantiles([0.05, 0.5, 1.0]) == [1, 5, 10]


def test_compute_ratio_dropped():
    # 10 pairs with 2 contributions each: cap at 1 drops half.
    bins = [A.FrequencyBin(2, 3, 10, 20, 2, 2)]
    h = A.Histogram(HistogramType.LINF_CONTRIBUTIONS, bins)
    ratios_list = A.compute_ratio_dropped(h)
    ratios = dict(ratios_list)
    assert ratios[0] == 1.0
    assert ratios[2] == 0.0
    # bound=1 is interpolated: dropped = 20 - 10*1 = 10 of 20 -> 0.5
    from pipelinedp_spark.analysis.histogram_error_estimator import \
        _interpolate_ratio
    assert _interpolate_ratio(ratios_list, 1) == pytest.approx(0.5)


def test_error_estimator(data):
    h = A.compute_dataset_histograms(data, EXT)
    est = A.create_estimator_for_count_and_privacy_id_count(
        h, Metric.COUNT, epsilon=1.0, delta=0.0, noise_kind=NoiseKind.LAPLACE)
    # Dropping nothing at max bounds: rmse = noise std only.
    rmse_full = est.estimate_rmse(l0=3, linf=2)
    assert rmse_full == pytest.approx(est.get_stddev(3, 2))
    # Tight bounds increase rmse via dropped data.
    assert est.estimate_rmse(l0=1, linf=1) != rmse_full
    assert est.get_ratio_dropped_l0(3) == 0.0
    assert est.get_ratio_dropped_l0(1) > 0.0


def test_utility_analysis_prefers_loose_bounds_when_noise_cheap(data):
    params = AggregateParams(metrics=[Metrics.COUNT],
                             max_partitions_contributed=1,
                             max_contributions_per_partition=1)
    conf = A.MultiParameterConfiguration(
        max_partitions_contributed=[1, 3],
        max_contributions_per_partition=[1, 2])
    engine = A.UtilityAnalysisEngine(epsilon=100.0, delta=1e-6)
    reports = engine.analyze(data, params, EXT, conf,
                             public_partitions=["p0", "p1", "p2"])
    assert len(reports) == 2
    rmse = {r.configuration_index: r.metric_errors[0].rmse for r in reports}
    # With huge epsilon the bounding error dominates: (3, 2) is exact, so
    # its rmse is pure noise std = l1/eps * sqrt(2) = 6/100 * sqrt(2).
    assert rmse[1] < rmse[0]
    assert rmse[1] == pytest.approx(6.0 / 100.0 * math.sqrt(2.0), rel=1e-6)


def test_utility_analysis_private_partitions(data):
    params = AggregateParams(metrics=[Metrics.PRIVACY_ID_COUNT],
                             max_partitions_contributed=1,
                             max_contributions_per_partition=1)
    conf = A.MultiParameterConfiguration(
        max_partitions_contributed=[3],
        max_contributions_per_partition=[2])
    reports = A.UtilityAnalysisEngine(5.0, 1e-6).analyze(
        data, params, EXT, conf)
    rep = reports[0]
    assert 0 < rep.partitions_kept_expected <= rep.partitions_total == 3


def test_tune(data):
    params = AggregateParams(metrics=[Metrics.COUNT],
                             max_partitions_contributed=1,
                             max_contributions_per_partition=1)
    result = A.tune(data, params, EXT, epsilon=100.0, delta=1e-6,
                    tuned_metric=Metric.COUNT,
                    public_partitions=["p0", "p1", "p2"])
    # Huge epsilon -> pick (near-)max bounds: no contribution dropped.
    assert result.recommended_max_partitions_contributed == 3
    assert result.recommended_max_contributions_per_partition == 2
    assert result.recommended_rmse < 0.1


def test_strategy_selector():
    sens = Sensitivities(l0=4, linf=1.0)
    sel = A.DPStrategySelector(epsilon=1.0, delta=1e-6,
                               metrics=[Metric.COUNT],
                               is_public_partitions=True)
    s = sel.get_dp_strategy(sens)
    assert s.partition_selection_strategy is None
    assert not s.post_aggregation_thresholding
    assert s.noise_kind in (NoiseKind.LAPLACE, NoiseKind.GAUSSIAN)

    sel2 = A.DPStrategySelector(1.0, 1e-6,
                                [Metric.PRIVACY_ID_COUNT, Metric.COUNT],
                                is_public_partitions=False)
    s2 = sel2.get_dp_strategy(sens)
    assert s2.post_aggregation_thresholding
    assert s2.partition_selection_strategy is not None

    # High-dimensional sensitivities favor Gaussian at loose delta.
    wide = Sensitivities(l0=10000, linf=1.0)
    kind = sel.select_noise_kind(1.0, 1e-3, wide)
    assert kind == NoiseKind.GAUSSIAN


def test_utility_analysis_mean_path(data):
    """MEAN error via the delta method on (count, sum) errors. With huge
    epsilon and non-binding bounds the mean is exact up to noise: rmse
    must be small relative to the true mean (1.5) and shrink as epsilon
    grows; bias is zero when nothing clips."""
    params = AggregateParams(metrics=[Metrics.MEAN],
                             max_partitions_contributed=1,
                             max_contributions_per_partition=1,
                             min_value=0.0, max_value=3.0)
    conf = A.MultiParameterConfiguration(
        max_partitions_contributed=[3],
        max_contributions_per_partition=[2],
        min_sum_per_partition=[0.0],
        max_sum_per_partition=[3.0])
    rmses = {}
    for eps in (10.0, 1000.0):
        reports = A.UtilityAnalysisEngine(eps, 1e-6).analyze(
            data, params, EXT, conf, public_partitions=["p0", "p1", "p2"])
        err = reports[0].metric_errors[0]
        assert err.metric == Metric.MEAN
        assert err.expected_abs_bias == pytest.approx(0.0, abs=1e-9)
        rmses[eps] = err.rmse
    assert rmses[1000.0] < rmses[10.0] / 50
    assert rmses[1000.0] < 0.05  # near-exact at eps=1000


def test_utility_analysis_mean_requires_sum_bounds(data):
    params = AggregateParams(metrics=[Metrics.MEAN],
                             max_partitions_contributed=1,
                             max_contributions_per_partition=1,
                             min_value=0.0, max_value=3.0)
    conf = A.MultiParameterConfiguration(
        max_partitions_contributed=[3],
        max_contributions_per_partition=[2])
    with pytest.raises(ValueError, match="sum_per_partition"):
        A.UtilityAnalysisEngine(10.0, 1e-6).analyze(
            data, params, EXT, conf, public_partitions=["p0"])
