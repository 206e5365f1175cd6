"""DPEngine: differentially-private aggregations as native DataFrame plans.

Pipeline (mirrors the reference stage order, reference:
pipeline_dp/dp_engine.py:115-195, re-expressed Spark-first):

  select(pid, partition cols, value)            [column pruning -> scan]
  [left_semi broadcast join public partitions]  [drop non-public early]
  window Linf sample -> groupBy(pid, pk) partial aggregates
  window L0 sample over pid
  groupBy(pk) final merge                       [map-side partial agg]
  [union empty public partitions]
  [DP partition selection filter]
  noise projection + metric formulas            [budget-dependent, lazy]

Budget protocol is two-phase like the reference: ``aggregate`` registers
MechanismSpecs and returns a lazy result; the noise projection is built only
when budgets are computed (reference: pipeline_dp/budget_accounting.py two-
phase contract; pipeline_dp/dataframes.py:206-212).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, List, Optional, Sequence, Union

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from pipelinedp_spark import contribution_bounders as bounders
from pipelinedp_spark import dp_computations as dp
from pipelinedp_spark.aggregate_params import (AddDPNoiseParams,
                                               AggregateParams, MechanismType,
                                               Metric, Metrics, NoiseKind,
                                               PartitionSelectionStrategy,
                                               SelectPartitionsParams)
from pipelinedp_spark.budget_accounting import (MechanismSpec,
                                                NaiveBudgetAccountant)
from pipelinedp_spark.noise import NoiseSource, create_noise_source

_PID = "__pid__"
_VALUE = "__value__"
_PP_COUNT = "__pp_count__"
_PP_SUM = "__pp_sum__"
_PP_NORM_SUM = "__pp_norm_sum__"
_PP_NORM_SQ = "__pp_norm_sq__"
_PID_COUNT = "__pid_count__"
_COUNT = "__count__"
_SUM = "__sum__"
_NORM_SUM = "__norm_sum__"
_NORM_SQ = "__norm_sq__"
_BIN = "__bin__"
_BCNT = "__bcnt__"
_CUM = "__cum__"
_TOT = "__tot__"
_P = "__p__"
_POS = "__pos__"
_VV = "__vv__"


@dataclasses.dataclass
class DataFrameExtractors:
    """Named-column analogue of the reference's DataExtractors triple
    (reference: pipeline_dp/data_extractors.py:20-30)."""

    privacy_id_column: str
    partition_key_columns: Union[str, Sequence[str]]
    value_column: Optional[str] = None

    def __post_init__(self):
        if isinstance(self.partition_key_columns, str):
            self.partition_key_columns = [self.partition_key_columns]
        self.partition_key_columns = list(self.partition_key_columns)


@dataclasses.dataclass
class MultiValueDataFrameExtractors(DataFrameExtractors):
    """Multiple value columns aggregated in one pass — the reference's
    MultiValueDataExtractors (reference: pipeline_dp/data_extractors.py:
    33-44, tuple-packed values) become plain named columns here."""

    value_columns: Optional[List[str]] = None

    def __post_init__(self):
        super().__post_init__()
        if self.value_columns:
            self.value_columns = list(self.value_columns)


@dataclasses.dataclass
class MultiSumSpec:
    """Per-column clip bounds + output name for one of several SUMs
    computed in a single aggregation pass."""

    min_value: Optional[float] = None
    max_value: Optional[float] = None
    min_sum_per_partition: Optional[float] = None
    max_sum_per_partition: Optional[float] = None
    output_name: Optional[str] = None

    def __post_init__(self):
        per_contribution = self.min_value is not None
        per_partition = self.min_sum_per_partition is not None
        if per_contribution == per_partition:
            raise ValueError(
                "set exactly one of (min_value, max_value) or "
                "(min_sum_per_partition, max_sum_per_partition)")
        if per_contribution and self.max_value is None:
            raise ValueError("min_value and max_value must be set together")
        if per_partition and self.max_sum_per_partition is None:
            raise ValueError("min/max_sum_per_partition must be set together")


@dataclasses.dataclass
class MultiSumParams:
    """Parameters of a single-pass multi-column DP sum
    (engine-level analogue of the reference's MultiValueDataExtractors
    flow, reference: pipeline_dp/data_extractors.py:33-44)."""

    max_partitions_contributed: int
    max_contributions_per_partition: int
    noise_kind: NoiseKind = NoiseKind.LAPLACE
    include_count: bool = False
    include_privacy_id_count: bool = False
    partition_selection_strategy: PartitionSelectionStrategy = (
        PartitionSelectionStrategy.TRUNCATED_GEOMETRIC)
    pre_threshold: Optional[int] = None
    budget_weight: float = 1.0


class DPResult:
    """Lazy result: the noise projection needs computed budgets, so the final
    DataFrame is built on first access after ``compute_budgets()``."""

    def __init__(self, thunk: Callable[[], DataFrame],
                 accountant: NaiveBudgetAccountant):
        self._thunk = thunk
        self._accountant = accountant
        self._df: Optional[DataFrame] = None

    def dataframe(self) -> DataFrame:
        if self._df is None:
            if not self._accountant.finalized:
                raise AssertionError(
                    "call budget_accountant.compute_budgets() before "
                    "materializing a DP result")
            self._df = self._thunk()
        return self._df


def _clip(col: Column, lo: float, hi: float) -> Column:
    return F.greatest(F.least(col, F.lit(float(hi))), F.lit(float(lo)))


class CustomCombiner:
    """User-defined DP aggregation hook (reference:
    pipeline_dp/combiners.py:110-161 + examples/experimental/
    custom_combiners.py). Subclass and implement:

    - ``request_budget(accountant)``: called once at graph construction;
      store the returned MechanismSpec(s) on self.
    - ``output_schema``: DDL fragment of the metric columns this combiner
      emits, e.g. ``"my_metric double"``.
    - ``compute(pdf)``: given one partition's contribution-bounded rows as
      a pandas DataFrame with columns ``__pid__`` (and ``__value__`` when a
      value column was declared), return a dict of output column -> value.
      THE COMBINER IS RESPONSIBLE FOR ITS OWN DP (noise, clipping beyond
      the engine's row bounds), exactly like the reference contract.
    """

    output_schema: str = ""

    def request_budget(self, accountant) -> None:
        raise NotImplementedError

    def compute(self, pdf: pd.DataFrame) -> dict:
        raise NotImplementedError

    def make_compute_fn(self, pk_cols: Sequence[str]):
        combiner = self

        def _fn(pdf: pd.DataFrame) -> pd.DataFrame:
            out = combiner.compute(pdf)
            row = {c: pdf.iloc[0][c] for c in pk_cols}
            row.update(out)
            return pd.DataFrame([row])

        return _fn


class _CompositeCustomCombiner(CustomCombiner):
    """Composes several CustomCombiners for `AggregateParams.
    custom_combiners` (reference compound-combiner semantics): each
    requests its own budget; per partition, outputs merge into one row
    (duplicate output columns are an error)."""

    def __init__(self, combiners: Sequence[CustomCombiner]):
        self._combiners = list(combiners)
        self.output_schema = ", ".join(
            c.output_schema for c in self._combiners)

    def request_budget(self, accountant) -> None:
        for c in self._combiners:
            c.request_budget(accountant)

    def compute(self, pdf: pd.DataFrame) -> dict:
        out: dict = {}
        for c in self._combiners:
            for k, v in c.compute(pdf).items():
                if k in out:
                    raise ValueError(
                        f"custom combiners emit duplicate column {k!r}")
                out[k] = v
        return out


def _resolve_prefiltered(params, public_partitions) -> bool:
    """Validate + read `public_partitions_already_filtered` (reference:
    aggregate_params.py:267-269 — only usable with public partitions).
    Param types without the flag (e.g. MultiSumParams) read as False."""
    if getattr(params, "public_partitions_already_filtered", False) \
            and public_partitions is None:
        raise ValueError(
            "public_partitions_already_filtered requires public "
            "partitions")
    return getattr(params, "public_partitions_already_filtered", False)


def _vector_clip_udf(norm_kind: str, max_norm: float):
    """Arrow-batched per-vector norm clip: v * min(1, max_norm/||v||)."""

    @F.pandas_udf("array<double>")
    def _clipv(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return v
        a = np.stack(v.to_numpy()).astype("float64")
        if norm_kind == "l1":
            n = np.abs(a).sum(axis=1)
        elif norm_kind == "l2":
            n = np.linalg.norm(a, axis=1)
        else:
            n = np.abs(a).max(axis=1)
        factor = np.where(n > max_norm, max_norm / np.maximum(n, 1e-300), 1.0)
        return pd.Series(list(a * factor[:, None]))

    return _clipv


class DPEngine:
    """Reference: pipeline_dp/dp_engine.py:71-305 (semantics)."""

    def __init__(self,
                 budget_accountant: NaiveBudgetAccountant,
                 noise_mode: str = "secure",
                 sample_order_cols: Optional[Sequence[Column]] = None):
        self._accountant = budget_accountant
        self._noise_mode = noise_mode
        self._noise: NoiseSource = create_noise_source(noise_mode)
        self._order_cols = sample_order_cols
        self._reports: List[List[str]] = []

    # ------------------------------------------------------------------
    # aggregate
    # ------------------------------------------------------------------
    def aggregate(self,
                  df: DataFrame,
                  params: AggregateParams,
                  extractors: DataFrameExtractors,
                  public_partitions: Optional[Union[DataFrame, Sequence]] = None
                  ) -> DPResult:
        if params.custom_combiners:
            combiner = (params.custom_combiners[0]
                        if len(params.custom_combiners) == 1
                        else _CompositeCustomCombiner(
                            params.custom_combiners))
            return self.aggregate_custom(df, params, extractors, combiner,
                                         public_partitions)
        report: List[str] = [f"DPEngine.aggregate: metrics={params.metrics}"]
        self._reports.append(report)
        pk_cols = extractors.partition_key_columns
        metric_kinds = set(params.metric_kinds)

        needs_value = bool(metric_kinds
                           & {Metric.SUM, Metric.MEAN, Metric.VARIANCE,
                              Metric.PERCENTILE, Metric.VECTOR_SUM,
                              Metric.VECTOR_MEAN})
        if needs_value and extractors.value_column is None:
            raise ValueError("value_column required for value metrics")

        if metric_kinds & {Metric.VECTOR_SUM, Metric.VECTOR_MEAN}:
            return self._aggregate_vector_sum(df, params, extractors,
                                              public_partitions, report)

        # --- stage 1: projection (drives Catalyst column pruning). ---
        cols = [F.col(extractors.privacy_id_column).alias(_PID)] + \
            [F.col(c) for c in pk_cols]
        if extractors.value_column is not None:
            cols.append(
                F.col(extractors.value_column).cast(DoubleType()).alias(_VALUE))
        data = df.select(*cols)
        report.append(
            f"Extracted ({extractors.privacy_id_column}, "
            f"{pk_cols}, {extractors.value_column})")

        # --- stage 2: drop non-public partitions before bounding. ---
        prefiltered = _resolve_prefiltered(params, public_partitions)
        pub_df = None
        if public_partitions is not None:
            pub_df = self._as_partitions_df(df.sparkSession, pk_cols,
                                            public_partitions, like=df)
            if prefiltered:
                report.append(
                    "Public partitions pre-filtered by caller (drop "
                    "skipped)")
            elif (not isinstance(public_partitions, DataFrame)
                    and len(pk_cols) == 1 and len(public_partitions) <= 1000):
                # Small local key list: isin() compiles to a pushed-down
                # scan filter — no broadcast exchange at all.
                values = [p[0] if isinstance(p, tuple) else p
                          for p in public_partitions]
                data = data.filter(F.col(pk_cols[0]).isin(values))
                report.append("Dropped non-public partitions (isin pushdown)")
            else:
                data = data.join(F.broadcast(pub_df), on=pk_cols,
                                 how="left_semi")
                report.append(
                    "Dropped non-public partitions (broadcast semi-join)")

        # --- stage 3: budget requests. ---
        specs = self._request_budgets(params, public_partitions is not None,
                                      report)

        # --- stage 4: contribution bounding + per-(pid,pk) partials. ---
        per_pid_pk = self._bound_contributions(data, params, pk_cols,
                                               metric_kinds, report)

        # Percentiles ride a parallel bounded-histogram pipeline and join
        # back on the partition key in finalize (independent Linf/L0 sample
        # from the scalar partials; both enforce the declared bounds).
        pct_hist = None
        if params.percentiles_to_compute:
            if params.percentile_algorithm == "tree":
                from pipelinedp_spark import quantile_tree as qt
                pct_hist = self._percentile_histogram(
                    data, params, pk_cols, report, nbins=qt.num_leaves())
            else:
                pct_hist = self._percentile_histogram(data, params, pk_cols,
                                                      report)

        # --- stage 5: final merge per partition key. ---
        final_aggs = [
            F.count(F.lit(1)).alias(_PID_COUNT),
            F.sum(_PP_COUNT).alias(_COUNT),
        ]
        if _PP_SUM in per_pid_pk.columns:
            final_aggs.append(F.sum(_PP_SUM).alias(_SUM))
        if _PP_NORM_SUM in per_pid_pk.columns:
            final_aggs.append(F.sum(_PP_NORM_SUM).alias(_NORM_SUM))
        if _PP_NORM_SQ in per_pid_pk.columns:
            final_aggs.append(F.sum(_PP_NORM_SQ).alias(_NORM_SQ))
        aggregated = per_pid_pk.groupBy(*pk_cols).agg(*final_aggs)
        report.append("Aggregated partials per partition key")

        accountant = self._accountant
        engine = self

        def finalize() -> DataFrame:
            out = aggregated
            if pub_df is not None:
                out = engine._add_empty_public_partitions(out, pub_df, pk_cols)
                report.append("Added empty public partitions")
            elif not params.post_aggregation_thresholding:
                out = engine._select_private_partitions(
                    out, specs["partition_selection"], params, report)
            pct_values = None
            if pct_hist is not None:
                if params.percentile_algorithm == "tree":
                    pct_values = engine._percentile_tree_values(
                        pct_hist, params, specs["percentile"], pk_cols,
                        report)
                else:
                    pct_values = engine._percentile_values(
                        pct_hist, params, specs["percentile"], pk_cols,
                        report)
            out = engine._compute_metrics(out, params, specs, pk_cols, report,
                                          pct_values)
            return out

        return DPResult(finalize, accountant)

    # ------------------------------------------------------------------
    def _request_budgets(self, params: AggregateParams, public: bool,
                         report: List[str]) -> dict:
        specs: dict = {}
        mt = params.noise_kind.convert_to_mechanism_type()
        metric_kinds = set(params.metric_kinds)
        with self._accountant.scope(params.budget_weight):
            # Combiner grouping mirrors the reference factory
            # (reference: pipeline_dp/combiners.py:914-1003): VARIANCE
            # subsumes MEAN/COUNT/SUM; MEAN subsumes COUNT/SUM.
            if Metric.VARIANCE in metric_kinds:
                specs["variance"] = self._accountant.request_budget(mt)
            elif Metric.MEAN in metric_kinds:
                specs["mean"] = self._accountant.request_budget(mt)
            else:
                if Metric.COUNT in metric_kinds:
                    specs["count"] = self._accountant.request_budget(mt)
                if Metric.SUM in metric_kinds:
                    specs["sum"] = self._accountant.request_budget(mt)
            if Metric.PERCENTILE in metric_kinds:
                specs["percentile"] = self._accountant.request_budget(mt)
            if Metric.VECTOR_SUM in metric_kinds \
                    or Metric.VECTOR_MEAN in metric_kinds:
                specs["vector_sum"] = self._accountant.request_budget(mt)
            if Metric.VECTOR_MEAN in metric_kinds:
                # denominator release: the bounded contribution count
                specs["vector_count"] = self._accountant.request_budget(mt)
            if Metric.PRIVACY_ID_COUNT in metric_kinds:
                if params.post_aggregation_thresholding:
                    thr_mt = (MechanismType.LAPLACE_THRESHOLDING
                              if params.noise_kind == NoiseKind.LAPLACE else
                              MechanismType.GAUSSIAN_THRESHOLDING)
                    specs["privacy_id_count"] = \
                        self._accountant.request_budget(thr_mt)
                else:
                    specs["privacy_id_count"] = \
                        self._accountant.request_budget(mt)
            if not public and not params.post_aggregation_thresholding:
                specs["partition_selection"] = self._accountant.request_budget(
                    params.partition_selection_strategy.mechanism_type)
                report.append(
                    f"Private partition selection: "
                    f"{params.partition_selection_strategy.value}")
        return specs

    # ------------------------------------------------------------------
    def _bound_contributions(self, data: DataFrame, params: AggregateParams,
                             pk_cols: Sequence[str], metric_kinds: set,
                             report: List[str]) -> DataFrame:
        per_partition_clip = params.min_sum_per_partition is not None
        partials: List[Column] = []
        value_dependent = bool(metric_kinds
                               & {Metric.SUM, Metric.MEAN, Metric.VARIANCE,
                                  Metric.PERCENTILE, Metric.VECTOR_SUM})
        linf = params.max_contributions_per_partition
        l0 = params.max_partitions_contributed

        # Count partial: when no row sampling runs, cap with least().
        sampling = value_dependent and not per_partition_clip
        if params.contribution_bounds_already_enforced or \
                params.max_contributions is not None or sampling or \
                linf is None:
            partials.append(F.count(F.lit(1)).alias(_PP_COUNT))
        else:
            partials.append(
                F.least(F.count(F.lit(1)), F.lit(linf)).alias(_PP_COUNT))

        if Metric.SUM in metric_kinds:
            if per_partition_clip:
                partials.append(
                    _clip(F.sum(_VALUE), params.min_sum_per_partition,
                          params.max_sum_per_partition).alias(_PP_SUM))
            else:
                partials.append(
                    F.sum(_clip(F.col(_VALUE), params.min_value,
                                params.max_value)).alias(_PP_SUM))
        if metric_kinds & {Metric.MEAN, Metric.VARIANCE}:
            mid = (params.min_value + params.max_value) / 2.0
            norm = _clip(F.col(_VALUE), params.min_value,
                         params.max_value) - F.lit(mid)
            partials.append(F.sum(norm).alias(_PP_NORM_SUM))
            if Metric.VARIANCE in metric_kinds:
                partials.append(F.sum(norm * norm).alias(_PP_NORM_SQ))

        if params.contribution_bounds_already_enforced:
            report.append("Contribution bounding: none (already enforced)")
            return bounders.bound_noop(data, _PID, pk_cols, partials)
        if params.max_contributions is not None:
            report.append(
                f"Contribution bounding: <= {params.max_contributions} total "
                "contributions per privacy id")
            return bounders.bound_per_privacy_id(data, _PID, pk_cols, partials,
                                                 params.max_contributions,
                                                 self._order_cols)
        if not params.perform_cross_partition_contribution_bounding:
            # L0 sampling disabled by the caller (data already satisfies the
            # L0 bound); max_partitions_contributed STAYS in the noise
            # sensitivity (reference: pipeline_dp/dp_engine.py:418-430 —
            # LinfSampler / NoOpSampler dispatch).
            if per_partition_clip or not (sampling and linf is not None):
                report.append(
                    "Contribution bounding: cross-partition bounding "
                    f"disabled (L0 <= {l0} kept in sensitivity), no sampling")
                return bounders.bound_noop(data, _PID, pk_cols, partials)
            report.append(
                "Contribution bounding: cross-partition bounding disabled "
                f"(L0 <= {l0} kept in sensitivity), Linf <= {linf} rows per "
                "(pid, partition)")
            return bounders.bound_linf_only(data, _PID, pk_cols, partials,
                                            linf, row_sampling_needed=True,
                                            order_cols=self._order_cols)
        if per_partition_clip:
            report.append(
                f"Contribution bounding: per-partition sum clip to "
                f"[{params.min_sum_per_partition}, "
                f"{params.max_sum_per_partition}], L0 <= {l0}")
            return bounders.bound_cross_partition_only(data, _PID, pk_cols,
                                                       partials, l0,
                                                       self._order_cols)
        plan_note = ""
        if sampling and linf is not None:
            plan_note = (" [aggregate-first: sort only oversize groups]"
                         if linf >= bounders.OVERSIZE_SPLIT_MIN_CAP
                         else " [window sample]")
        report.append(
            f"Contribution bounding: Linf <= {linf} rows per (pid, partition),"
            f" L0 <= {l0} partitions per pid{plan_note}")
        return bounders.bound_cross_and_per_partition(
            data, _PID, pk_cols, partials, l0, linf,
            row_sampling_needed=sampling, order_cols=self._order_cols)

    # ------------------------------------------------------------------
    def _select_private_partitions(self, out: DataFrame, spec: MechanismSpec,
                                   params: AggregateParams,
                                   report: List[str]) -> DataFrame:
        """Reference: pipeline_dp/dp_engine.py:332-400 (semantics)."""
        l0 = params.max_partitions_contributed or params.max_contributions
        strategy = params.partition_selection_strategy
        pre = params.pre_threshold
        pid_count = F.col(_PID_COUNT)
        if strategy == PartitionSelectionStrategy.TRUNCATED_GEOMETRIC:
            probs = dp.truncated_geometric_probabilities(
                spec.eps, spec.delta, l0)
            keep = self._noise.geometric_keep(pid_count, probs, pre)
            report.append("Partition selection: truncated geometric")
            return out.filter(keep)
        # An accountant that reserved a distinct thresholding budget (PLD)
        # pins the threshold's delta via spec.thresholding_delta; otherwise
        # the historical split applies (full delta for Laplace, whose noise
        # is pure-eps; half/half for Gaussian).
        thr_delta = spec.thresholding_delta
        if strategy == PartitionSelectionStrategy.LAPLACE_THRESHOLDING:
            scale, threshold = dp.laplace_thresholding(
                spec.eps, thr_delta if thr_delta is not None else spec.delta,
                l0)
            noisy = self._noise.add_noise(pid_count.cast(DoubleType()),
                                          "laplace", scale)
        else:
            if thr_delta is None:
                sigma, threshold = dp.gaussian_thresholding(
                    spec.eps, spec.delta, l0)
            else:
                sigma = dp.gaussian_sigma(spec.eps, spec.delta - thr_delta,
                                          math.sqrt(l0))
                threshold = dp.thresholding_from_std(
                    NoiseKind.GAUSSIAN, sigma, thr_delta, l0)
            noisy = self._noise.add_noise(pid_count.cast(DoubleType()),
                                          "gaussian", sigma)
        keep = noisy >= F.lit(threshold)
        if pre is not None:
            keep = keep & (pid_count >= F.lit(pre))
        report.append(
            f"Partition selection: {strategy.value}, threshold={threshold:.3f}")
        return out.filter(keep)

    # ------------------------------------------------------------------
    def _compute_metrics(self, out: DataFrame, params: AggregateParams,
                         specs: dict, pk_cols: Sequence[str],
                         report: List[str],
                         pct_values: Optional[DataFrame] = None) -> DataFrame:
        kind = params.noise_kind.value
        l0 = params.max_partitions_contributed
        linf = params.max_contributions_per_partition
        noise = self._noise
        metric_cols: dict = {}
        # metric name -> applied noise stddev (constant per metric: the
        # mechanism scale depends only on budget + sensitivities, never on
        # the partition's value), emitted as `<name>_noise_stddev` columns
        # when params.output_noise_stddev is set
        # (reference: pipeline_dp/combiners.py:276-288,323-335,439-454).
        stddev_vals: dict = {}

        if "count" in specs:
            spec = specs["count"]
            sens = self._count_sensitivities(params)
            scale = dp.noise_scale(params.noise_kind, spec.eps, spec.delta,
                                   sens)
            metric_cols["count"] = noise.add_noise(
                F.col(_COUNT).cast(DoubleType()), kind, scale)
            stddev_vals["count"] = dp.noise_std(params.noise_kind, spec.eps,
                                                spec.delta, sens)
            report.append(f"COUNT: {kind} noise, scale={scale:.4g}")
        if "sum" in specs:
            spec = specs["sum"]
            sens = dp.sum_sensitivities(
                l0 or params.max_contributions, linf, params.min_value,
                params.max_value, params.min_sum_per_partition,
                params.max_sum_per_partition)
            scale = dp.noise_scale(params.noise_kind, spec.eps, spec.delta,
                                   sens)
            metric_cols["sum"] = noise.add_noise(F.col(_SUM), kind, scale)
            stddev_vals["sum"] = dp.noise_std(params.noise_kind, spec.eps,
                                              spec.delta, sens)
            report.append(f"SUM: {kind} noise, scale={scale:.4g}")
        if "mean" in specs:
            spec = specs["mean"]
            ms = dp.mean_scales(params.noise_kind, spec.eps, spec.delta, l0,
                                linf, params.min_value, params.max_value)
            dp_count = noise.add_noise(
                F.col(_COUNT).cast(DoubleType()), kind, ms.count_scale)
            dp_norm_sum = noise.add_noise(F.col(_NORM_SUM), kind,
                                          ms.norm_sum_scale)
            out = out.withColumn("__dp_count__", dp_count) \
                     .withColumn("__dp_norm_sum__", dp_norm_sum)
            dp_mean = (F.lit(ms.mid) + F.col("__dp_norm_sum__") /
                       F.greatest(F.lit(1.0), F.col("__dp_count__")))
            metric_cols["mean"] = dp_mean
            if Metric.COUNT in params.metric_kinds:
                metric_cols["count"] = F.col("__dp_count__")
            if Metric.SUM in params.metric_kinds:
                metric_cols["sum"] = dp_mean * F.col("__dp_count__")
            report.append(f"MEAN: normalized-sum estimator, mid={ms.mid}")
        if "variance" in specs:
            spec = specs["variance"]
            vs = dp.variance_scales(params.noise_kind, spec.eps, spec.delta,
                                    l0, linf, params.min_value,
                                    params.max_value)
            out = out.withColumn(
                "__dp_count__",
                noise.add_noise(F.col(_COUNT).cast(DoubleType()), kind,
                                vs.count_scale))
            out = out.withColumn(
                "__dp_norm_sum__",
                noise.add_noise(F.col(_NORM_SUM), kind, vs.norm_sum_scale))
            out = out.withColumn(
                "__dp_norm_sq__",
                noise.add_noise(F.col(_NORM_SQ), kind, vs.norm_sum_sq_scale))
            denom = F.greatest(F.lit(1.0), F.col("__dp_count__"))
            mean_norm = F.col("__dp_norm_sum__") / denom
            mean_sq_norm = F.col("__dp_norm_sq__") / denom
            dp_var = mean_sq_norm - mean_norm * mean_norm
            dp_mean = F.lit(vs.mid) + mean_norm
            metric_cols["variance"] = dp_var
            if Metric.MEAN in params.metric_kinds:
                metric_cols["mean"] = dp_mean
            if Metric.COUNT in params.metric_kinds:
                metric_cols["count"] = F.col("__dp_count__")
            if Metric.SUM in params.metric_kinds:
                metric_cols["sum"] = dp_mean * F.col("__dp_count__")
            report.append("VARIANCE: 3-way budget split estimator")
        if "privacy_id_count" in specs:
            spec = specs["privacy_id_count"]
            sens = dp.privacy_id_count_sensitivities(
                l0 or params.max_contributions)
            if params.post_aggregation_thresholding:
                # Reference: combiners.py:360-416 + dp_computations.py:821-885:
                # noised pid-count released iff >= threshold; rows below are
                # dropped entirely.
                nk = spec.mechanism_type.to_noise_kind()
                # Thresholding delta: accountant-pinned reservation when
                # present (PLD), else half of the mechanism delta.
                thr_delta = (spec.thresholding_delta
                             if spec.thresholding_delta is not None
                             else spec.delta / 2)
                noise_delta = spec.delta - thr_delta
                std = dp.noise_std(nk, spec.eps, noise_delta, sens)
                threshold = dp.thresholding_from_std(nk, std, thr_delta,
                                                     l0 or 1)
                noisy = noise.add_noise(
                    F.col(_PID_COUNT).cast(DoubleType()), nk.value,
                    dp.noise_scale(nk, spec.eps, noise_delta, sens))
                out = out.withColumn("__dp_pid_count__", noisy)
                out = out.filter(
                    F.col("__dp_pid_count__") >= F.lit(threshold))
                metric_cols["privacy_id_count"] = F.col("__dp_pid_count__")
                stddev_vals["privacy_id_count"] = std
                report.append(
                    f"PRIVACY_ID_COUNT: post-aggregation thresholding at "
                    f"{threshold:.3f}")
            else:
                scale = dp.noise_scale(params.noise_kind, spec.eps, spec.delta,
                                       sens)
                metric_cols["privacy_id_count"] = noise.add_noise(
                    F.col(_PID_COUNT).cast(DoubleType()), kind, scale)
                stddev_vals["privacy_id_count"] = dp.noise_std(
                    params.noise_kind, spec.eps, spec.delta, sens)
                report.append(
                    f"PRIVACY_ID_COUNT: {kind} noise, scale={scale:.4g}")

        if pct_values is not None:
            # Left join: empty public partitions have no histogram rows; a
            # missing quantile of an empty partition resolves to min_value
            # (rank 0 of an empty distribution).
            out = out.join(pct_values, on=list(pk_cols), how="left")

        ordered = [F.col(c) for c in pk_cols]
        for m in params.metrics:
            name = m.output_name
            if name in metric_cols:
                ordered.append(metric_cols[name].cast(DoubleType()).alias(name))
            elif m.metric == Metric.PERCENTILE and pct_values is not None:
                ordered.append(
                    F.coalesce(F.col(name), F.lit(float(params.min_value)))
                    .cast(DoubleType()).alias(name))
            if params.output_noise_stddev and name in stddev_vals:
                ordered.append(
                    F.lit(float(stddev_vals[name])).cast(DoubleType())
                    .alias(f"{name}_noise_stddev"))
        return out.select(*ordered)

    # ------------------------------------------------------------------
    # PERCENTILE: bounded-domain histogram sketch
    # (reference semantics: pipeline_dp/combiners.py:629-719 — the reference
    # uses a PyDP QuantileTree; this engine releases a DP histogram of
    # `percentile_bins` equi-width bins over [min_value, max_value] and
    # interpolates quantiles from the noised cumulative counts. Fully
    # native: two bounded groupBys + window cumsum, no per-key sketch
    # state, no UDAF.)
    # ------------------------------------------------------------------
    def _percentile_histogram(self, data: DataFrame, params: AggregateParams,
                              pk_cols: Sequence[str],
                              report: List[str],
                              nbins: Optional[int] = None) -> DataFrame:
        """Contribution-bounded per-(pk, bin) counts of clipped values."""
        nbins = nbins or params.percentile_bins
        lo, hi = float(params.min_value), float(params.max_value)
        width = (hi - lo) / nbins if hi > lo else 1.0
        bin_col = F.least(
            F.lit(nbins - 1).cast("long"),
            F.floor((_clip(F.col(_VALUE), lo, hi) - F.lit(lo)) /
                    F.lit(width))).cast("int")
        report.append(
            f"PERCENTILE: {nbins}-bin histogram sketch over [{lo}, {hi}]")
        binned = data.withColumn(_BIN, bin_col)
        enforce = not params.contribution_bounds_already_enforced
        linf = params.max_contributions_per_partition
        l0 = params.max_partitions_contributed
        if not enforce or (linf is None and l0 is None):
            return (binned.groupBy(*pk_cols, _BIN)
                    .agg(F.count(F.lit(1)).cast("double").alias(_BCNT)))
        # ONE map-side-combined per-(pid, pk) count pass drives BOTH
        # bounding steps, so no full-data shuffle or sort remains in the
        # common generous-cap case: the Linf sample touches only
        # oversize groups (joined back, AQE-broadcast / eliminated when
        # the set is empty), and the L0 key sample draws from the tiny
        # totals frame instead of a distinct() over raw rows. The final
        # (pk, bin) histogram aggregates map-side, so the only
        # corpus-sized data movement left is the scan itself.
        keys = [_PID, *pk_cols]
        rows = binned
        if (linf is not None
                and linf >= bounders.OVERSIZE_SPLIT_MIN_CAP):
            totals = binned.groupBy(*keys).agg(
                F.count(F.lit(1)).alias(bounders._GC))
            over = bounders._oversize_keys(totals, keys, linf)
            ok_cols = [f"__ok{i}__" for i in range(len(keys))]
            cond = bounders._oversize_key_cond(keys, ok_cols)
            ok = binned.join(over, on=cond, how="left_anti")
            big = binned.join(over, on=cond, how="left_semi")
            rows = ok.unionByName(
                bounders._limit_per_key(big, keys, linf,
                                        self._order_cols))
            if l0 is not None:
                # key sample drawn from the tiny totals frame, not a
                # distinct() over raw rows
                keyset = bounders._limit_per_key(
                    totals.select(*keys), [_PID], l0, self._order_cols)
                rows = rows.join(keyset, on=keys, how="left_semi")
        else:
            # Binding-cap regime (see bounders.OVERSIZE_SPLIT_MIN_CAP):
            # plain window sample.
            if linf is not None:
                rows = bounders._limit_per_key(rows, keys, linf,
                                               self._order_cols)
            if l0 is not None:
                keyset = bounders._limit_per_key(
                    rows.select(*keys).distinct(), [_PID], l0,
                    self._order_cols)
                rows = rows.join(keyset, on=keys, how="left_semi")
        return (rows.groupBy(*pk_cols, _BIN)
                .agg(F.count(F.lit(1)).cast("double").alias(_BCNT)))

    def _percentile_values(self, hist: DataFrame, params: AggregateParams,
                           spec: MechanismSpec, pk_cols: Sequence[str],
                           report: List[str]) -> DataFrame:
        """Noise the histogram cells, then linearly interpolate each
        requested quantile from the cumulative counts. One mechanism
        releases the whole histogram (each user's rows touch <= l0*linf
        cells with <= linf per cell -> the scalar count sensitivities)."""
        nbins = params.percentile_bins
        lo, hi = float(params.min_value), float(params.max_value)
        width = (hi - lo) / nbins if hi > lo else 1.0
        l0 = params.max_partitions_contributed or params.max_contributions or 1
        linf = params.max_contributions_per_partition or 1
        scale = dp.noise_scale(params.noise_kind, spec.eps, spec.delta,
                               dp.count_sensitivities(l0, linf))
        # Densify to the full public bin domain before noising: empty bins
        # MUST draw noise too, otherwise bin occupancy (which one user can
        # flip) reaches the release un-noised. nbins rows per partition
        # key, generated post-aggregation — negligible at any scale.
        pks = hist.select(*pk_cols).distinct()
        full = (pks.withColumn(
            _BIN, F.explode(F.sequence(F.lit(0), F.lit(nbins - 1))))
            .withColumn(_BIN, F.col(_BIN).cast("int")))
        hist = (full.join(hist, on=[*pk_cols, _BIN], how="left")
                .fillna(0.0, subset=[_BCNT]))
        noisy = F.greatest(
            self._noise.add_noise(F.col(_BCNT).cast(DoubleType()),
                                  params.noise_kind.value, scale),
            F.lit(0.0))
        hist = hist.withColumn(_BCNT, noisy)
        wcum = Window.partitionBy(*pk_cols).orderBy(_BIN)
        wtot = Window.partitionBy(*pk_cols)
        hist = (hist.withColumn(_CUM, F.sum(_BCNT).over(wcum))
                .withColumn(_TOT, F.sum(_BCNT).over(wtot)))
        ps = [float(p) for p in params.percentiles_to_compute]
        hp = hist.withColumn(_P, F.explode(F.array(*[F.lit(p) for p in ps])))
        rank = F.col(_P) / F.lit(100.0) * F.col(_TOT)
        # Linear interpolation inside the first bin whose cumulative count
        # reaches the rank (min_by over qualifying bins).
        val = (F.lit(lo) + F.lit(width) *
               (F.col(_BIN) +
                (rank - (F.col(_CUM) - F.col(_BCNT))) / F.col(_BCNT)))
        sel = hp.filter((F.col(_BCNT) > 0) & (F.col(_CUM) >= rank))
        long_df = sel.groupBy(*pk_cols, _P).agg(
            F.min_by(val, F.col(_BIN)).alias("__val__"))
        out = long_df.groupBy(*pk_cols).pivot(_P, ps).agg(F.first("__val__"))
        for m in params.metrics:
            if m.metric == Metric.PERCENTILE:
                out = out.withColumnRenamed(str(float(m.parameter)),
                                            m.output_name)
        report.append(f"PERCENTILE: noise scale={scale:.4g}, qs={ps}")
        return out

    def _percentile_tree_values(self, hist: DataFrame,
                                params: AggregateParams,
                                spec: MechanismSpec,
                                pk_cols: Sequence[str],
                                report: List[str]) -> DataFrame:
        """Quantile-tree path (reference: pipeline_dp/combiners.py:629-719
        semantics; height-4 branching-16 hierarchical histogram). The
        sketch state is the native leaf-count histogram from
        `_percentile_histogram(nbins=16^4)`; the noisy descent runs per
        partition key in an Arrow-batched applyInPandas, drawing fresh
        noise for every visited node (empty ones included) at the
        per-level budget eps/height and sharing draws across quantiles."""
        import pandas as pd
        from pipelinedp_spark import quantile_tree as qt
        from pyspark.sql.types import StructField, StructType

        lo, hi = float(params.min_value), float(params.max_value)
        height = qt.DEFAULT_TREE_HEIGHT
        branching = qt.DEFAULT_BRANCHING_FACTOR
        l0 = params.max_partitions_contributed or params.max_contributions \
            or 1
        linf = params.max_contributions_per_partition or 1
        kind = params.noise_kind
        # Per-level composition: each entry touches one node per level, so
        # each level is a histogram of sensitivity l0*linf released with
        # eps/height (and delta/height for Gaussian).
        scale = dp.noise_scale(
            kind, spec.eps / height,
            (spec.delta / height) if spec.delta else 0.0,
            dp.count_sensitivities(l0, linf))
        ps = [float(p) for p in params.percentiles_to_compute]
        noise_mode = self._noise_mode
        kind_value = kind.value

        pk_fields = [f for f in hist.schema.fields if f.name in pk_cols]
        schema = StructType(pk_fields +
                            [StructField(str(p), DoubleType())
                             for p in ps])

        def descend(pdf: "pd.DataFrame") -> "pd.DataFrame":
            vals = qt.compute_tree_quantiles(
                pdf[_BIN].to_numpy(), pdf[_BCNT].to_numpy(), ps, lo, hi,
                qt.make_noise_fn(noise_mode, kind_value, scale),
                height, branching)
            row = {c: [pdf[c].iloc[0]] for c in pk_cols}
            row.update({str(p): [v] for p, v in zip(ps, vals)})
            return pd.DataFrame(row)

        out = hist.groupBy(*pk_cols).applyInPandas(descend, schema)
        for m in params.metrics:
            if m.metric == Metric.PERCENTILE:
                out = out.withColumnRenamed(str(float(m.parameter)),
                                            m.output_name)
        report.append(
            f"PERCENTILE: quantile tree h={height} b={branching}, "
            f"per-node scale={scale:.4g}, qs={ps}")
        return out

    # ------------------------------------------------------------------
    # VECTOR_SUM: per-vector norm clip + elementwise DP sum
    # (reference: pipeline_dp/combiners.py:850-911 semantics). Plan shape:
    # Linf window sample -> numpy norm-clip (Arrow-batched) -> posexplode
    # to (pid, pk, pos) -> partial sum -> L0 key sample (semi-join) ->
    # final (pk, pos) sum -> per-element noise -> array reassembly via
    # bounded collect_list (exactly vector_size elements per group).
    # ------------------------------------------------------------------
    def _aggregate_vector_sum(self, df: DataFrame, params: AggregateParams,
                              extractors: DataFrameExtractors,
                              public_partitions,
                              report: List[str]) -> DPResult:
        pk_cols = extractors.partition_key_columns
        size = int(params.vector_size)
        data = df.select(
            F.col(extractors.privacy_id_column).alias(_PID),
            *[F.col(c) for c in pk_cols],
            F.col(extractors.value_column).cast("array<double>")
            .alias(_VALUE))
        pub_df = None
        if public_partitions is not None:
            pub_df = self._as_partitions_df(df.sparkSession, pk_cols,
                                            public_partitions, like=df)
            if _resolve_prefiltered(params, public_partitions):
                report.append("Public partitions pre-filtered by caller")
            else:
                data = data.join(F.broadcast(pub_df), on=list(pk_cols),
                                 how="left_semi")
                report.append("Dropped non-public partitions")
        specs = self._request_budgets(params, public_partitions is not None,
                                      report)
        linf = params.max_contributions_per_partition
        if not params.contribution_bounds_already_enforced and \
                linf is not None:
            data = bounders.limit_rows_per_key(data, [_PID, *pk_cols],
                                               linf, self._order_cols)
        # L0 sampling happens at the (pid, pk) KEY level BEFORE the d-fold
        # explode: the key frame is 1/d the exploded size, and sampling
        # first means the explode+sum subtree is built once (a post-explode
        # keys.distinct() branch would recompute it for the semi-join).
        l0 = params.max_partitions_contributed
        if not params.contribution_bounds_already_enforced and l0 is not None:
            keys = bounders._limit_per_key(
                data.select(_PID, *pk_cols).distinct(), [_PID], l0,
                self._order_cols)
            data = data.join(keys, on=[_PID, *pk_cols], how="left_semi")
        else:
            keys = data.select(_PID, *pk_cols).distinct()
        clip = _vector_clip_udf(params.vector_norm_kind.value,
                                float(params.vector_max_norm))
        data = data.withColumn(_VALUE, clip(F.col(_VALUE)))
        is_mean = Metric.VECTOR_MEAN in set(params.metric_kinds)
        which = "VECTOR_MEAN" if is_mean else "VECTOR_SUM"
        report.append(
            f"{which}: per-vector {params.vector_norm_kind.value}-norm "
            f"clip to {params.vector_max_norm}, Linf <= {linf}")
        ex = data.select(*pk_cols, F.posexplode(_VALUE).alias(_POS, _VV))
        final = ex.groupBy(*pk_cols, _POS).agg(F.sum(_VV).alias(_VV))
        # Denominator for VECTOR_MEAN: the bounded CONTRIBUTION count per
        # partition (each contribution is one clipped vector), released
        # with its own budget share; computed off the same bounded frame.
        contrib_counts = (data.groupBy(*pk_cols)
                          .agg(F.count(F.lit(1)).cast("double")
                               .alias("__vn__"))
                          if is_mean else None)
        pid_counts = keys.groupBy(*pk_cols).agg(
            F.count(F.lit(1)).alias(_PID_COUNT))
        engine = self
        out_name = params.metrics[0].output_name

        def finalize() -> DataFrame:
            out = final
            if pub_df is not None:
                pos_df = df.sparkSession.range(size).select(
                    F.col("id").cast("int").alias(_POS))
                grid = pub_df.crossJoin(pos_df)
                out = grid.join(final, on=[*pk_cols, _POS], how="left") \
                    .fillna({_VV: 0.0})
                report.append("Added empty public partitions (zero vectors)")
            elif not params.post_aggregation_thresholding:
                kept = engine._select_private_partitions(
                    pid_counts, specs["partition_selection"], params, report)
                out = out.join(kept.select(*pk_cols), on=list(pk_cols),
                               how="left_semi")
            # One clipped vector per contribution; <= linf contributions per
            # (pid, pk) => per-partition norm bound scales by linf.
            sens = dp.vector_sum_sensitivities(
                l0 or 1, params.vector_norm_kind.value,
                float(params.vector_max_norm) * (linf or 1), size)
            spec = specs["vector_sum"]
            scale = dp.noise_scale(params.noise_kind, spec.eps, spec.delta,
                                   sens)
            out = out.withColumn(
                _VV, engine._noise.add_noise(F.col(_VV),
                                             params.noise_kind.value, scale))
            report.append(f"{which}: elementwise noise scale={scale:.4g}")
            if is_mean:
                # One noisy denominator draw per partition key (noise is
                # applied on the per-pk count frame, THEN joined), floored
                # at 1 so empty public partitions release zero vectors.
                cnt_spec = specs["vector_count"]
                cnt_scale = dp.noise_scale(
                    params.noise_kind, cnt_spec.eps, cnt_spec.delta,
                    dp.count_sensitivities(l0 or 1, linf or 1))
                noisy_n = contrib_counts.withColumn(
                    "__vn__", engine._noise.add_noise(
                        F.col("__vn__"), params.noise_kind.value,
                        cnt_scale))
                out = (out.join(F.broadcast(noisy_n), on=list(pk_cols),
                                how="left")
                       .withColumn(_VV, F.col(_VV)
                                   / F.greatest(F.coalesce(
                                       F.col("__vn__"), F.lit(0.0)),
                                       F.lit(1.0))))
                report.append(
                    f"VECTOR_MEAN: denominator noise scale="
                    f"{cnt_scale:.4g}")
            return out.groupBy(*pk_cols).agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col(_POS),
                                                         F.col(_VV)))),
                    lambda s: s[_VV]).alias(out_name))

        return DPResult(finalize, self._accountant)

    # ------------------------------------------------------------------
    # Custom combiner plug-in
    # ------------------------------------------------------------------
    def aggregate_custom(self, df: DataFrame, params: AggregateParams,
                         extractors: DataFrameExtractors,
                         combiner: "CustomCombiner",
                         public_partitions=None) -> DPResult:
        """User-defined DP aggregation (reference CustomCombiner contract:
        pipeline_dp/combiners.py:110-161 — the combiner requests budget at
        graph construction and implements its own DP in compute).

        The engine supplies contribution bounding (the declared Linf/L0
        window samples) and hands each partition's bounded rows to the
        combiner as an Arrow batch via applyInPandas; the combiner returns
        one output row per partition. Group size is bounded by the
        contribution bounds times the partition's user count — combiners
        needing sublinear state should pre-aggregate in SQL instead."""
        report = [f"DPEngine.aggregate_custom: {type(combiner).__name__}"]
        self._reports.append(report)
        pk_cols = extractors.partition_key_columns
        cols = [F.col(extractors.privacy_id_column).alias(_PID)] + \
            [F.col(c) for c in pk_cols]
        if extractors.value_column is not None:
            cols.append(F.col(extractors.value_column).cast(DoubleType())
                        .alias(_VALUE))
        data = df.select(*cols)
        if public_partitions is not None \
                and not _resolve_prefiltered(params, public_partitions):
            pub_df = self._as_partitions_df(df.sparkSession, pk_cols,
                                            public_partitions, like=df)
            data = data.join(F.broadcast(pub_df), on=list(pk_cols),
                             how="left_semi")
        with self._accountant.scope(params.budget_weight):
            combiner.request_budget(self._accountant)
        linf = params.max_contributions_per_partition
        l0 = params.max_partitions_contributed
        if not params.contribution_bounds_already_enforced:
            if linf is not None:
                data = bounders.limit_rows_per_key(
                    data, [_PID, *pk_cols], linf, self._order_cols)
            if l0 is not None:
                keys = bounders._limit_per_key(
                    data.select(_PID, *pk_cols).distinct(), [_PID], l0,
                    self._order_cols)
                data = data.join(keys, on=[_PID, *pk_cols], how="left_semi")
        report.append(f"Contribution bounding: Linf <= {linf}, L0 <= {l0}")
        schema = ", ".join(
            [f"`{c}` {data.schema[c].dataType.simpleString()}"
             for c in pk_cols] + [combiner.output_schema])
        fn = combiner.make_compute_fn(pk_cols)
        return DPResult(
            lambda: data.groupBy(*pk_cols).applyInPandas(fn, schema),
            self._accountant)

    # ------------------------------------------------------------------
    # Multi-column sums in one pass
    # ------------------------------------------------------------------
    def aggregate_multi_sum(self, df: DataFrame, params: MultiSumParams,
                            extractors: "MultiValueDataFrameExtractors",
                            sum_specs: List[MultiSumSpec],
                            public_partitions=None) -> DPResult:
        """DP sums of several value columns sharing ONE contribution-bounding
        pass (one Linf sample, one L0 sample, one shuffle chain); each
        column has its own clip bounds and its own budget share."""
        if not extractors.value_columns or \
                len(extractors.value_columns) != len(sum_specs):
            raise ValueError("one MultiSumSpec per value column required")
        report = [f"DPEngine.aggregate_multi_sum: "
                  f"{len(sum_specs)} sum columns"]
        self._reports.append(report)
        pk_cols = extractors.partition_key_columns
        l0 = params.max_partitions_contributed
        linf = params.max_contributions_per_partition

        cols = [F.col(extractors.privacy_id_column).alias(_PID)] + \
            [F.col(c) for c in pk_cols] + \
            [F.col(c).cast(DoubleType()).alias(f"__value{i}__")
             for i, c in enumerate(extractors.value_columns)]
        data = df.select(*cols)

        pub_df = None
        if public_partitions is not None:
            pub_df = self._as_partitions_df(df.sparkSession, pk_cols,
                                            public_partitions, like=df)
            if _resolve_prefiltered(params, public_partitions):
                report.append("Public partitions pre-filtered by caller")
            else:
                data = data.join(F.broadcast(pub_df), on=list(pk_cols),
                                 how="left_semi")
                report.append("Dropped non-public partitions")

        with self._accountant.scope(params.budget_weight):
            mt = params.noise_kind.convert_to_mechanism_type()
            specs = {"sums": [self._accountant.request_budget(mt)
                              for _ in sum_specs]}
            if params.include_count:
                specs["count"] = self._accountant.request_budget(mt)
            if params.include_privacy_id_count:
                specs["privacy_id_count"] = self._accountant.request_budget(mt)
            if public_partitions is None:
                specs["partition_selection"] = self._accountant.request_budget(
                    params.partition_selection_strategy.mechanism_type)

        # Row sampling is only needed when a per-contribution clip depends
        # on WHICH rows survive; per-partition clips and count caps do not.
        row_sampling = any(s.min_value is not None for s in sum_specs)
        partials: List[Column] = [
            (F.count(F.lit(1)) if row_sampling else
             F.least(F.count(F.lit(1)), F.lit(linf))).alias(_PP_COUNT)]
        for i, s in enumerate(sum_specs):
            v = F.col(f"__value{i}__")
            if s.min_value is not None:
                partials.append(
                    F.sum(_clip(v, s.min_value, s.max_value))
                    .alias(f"__pp_sum{i}__"))
            else:
                partials.append(
                    _clip(F.sum(v), s.min_sum_per_partition,
                          s.max_sum_per_partition).alias(f"__pp_sum{i}__"))
        per_pid_pk = bounders.bound_cross_and_per_partition(
            data, _PID, pk_cols, partials, l0, linf,
            row_sampling_needed=row_sampling, order_cols=self._order_cols)
        report.append(
            f"Shared contribution bounding: Linf <= {linf}, L0 <= {l0}")

        final_aggs = [F.count(F.lit(1)).alias(_PID_COUNT),
                      F.sum(_PP_COUNT).alias(_COUNT)] + \
            [F.sum(f"__pp_sum{i}__").alias(f"__sum{i}__")
             for i in range(len(sum_specs))]
        aggregated = per_pid_pk.groupBy(*pk_cols).agg(*final_aggs)
        engine = self
        agg_params = AggregateParams(
            metrics=[Metrics.COUNT],
            max_partitions_contributed=l0,
            max_contributions_per_partition=linf,
            noise_kind=params.noise_kind,
            partition_selection_strategy=params.partition_selection_strategy,
            pre_threshold=params.pre_threshold)

        def finalize() -> DataFrame:
            out = aggregated
            if pub_df is not None:
                out = engine._add_empty_public_partitions(out, pub_df,
                                                          pk_cols)
            else:
                out = engine._select_private_partitions(
                    out, specs["partition_selection"], agg_params, report)
            kind = params.noise_kind.value
            ordered = [F.col(c) for c in pk_cols]
            if params.include_count:
                cs = specs["count"]
                scale = dp.noise_scale(params.noise_kind, cs.eps, cs.delta,
                                       dp.count_sensitivities(l0, linf))
                ordered.append(
                    engine._noise.add_noise(
                        F.col(_COUNT).cast(DoubleType()), kind, scale)
                    .alias("count"))
            if params.include_privacy_id_count:
                ps = specs["privacy_id_count"]
                scale = dp.noise_scale(
                    params.noise_kind, ps.eps, ps.delta,
                    dp.privacy_id_count_sensitivities(l0))
                ordered.append(
                    engine._noise.add_noise(
                        F.col(_PID_COUNT).cast(DoubleType()), kind, scale)
                    .alias("privacy_id_count"))
            for i, (s, spec) in enumerate(zip(sum_specs, specs["sums"])):
                sens = dp.sum_sensitivities(
                    l0, linf, s.min_value, s.max_value,
                    s.min_sum_per_partition, s.max_sum_per_partition)
                scale = dp.noise_scale(params.noise_kind, spec.eps,
                                       spec.delta, sens)
                name = s.output_name or \
                    f"sum_{extractors.value_columns[i]}"
                ordered.append(
                    engine._noise.add_noise(F.col(f"__sum{i}__"), kind,
                                            scale).alias(name))
                report.append(f"SUM[{name}]: {kind} noise, "
                              f"scale={scale:.4g}")
            return out.select(*ordered)

        return DPResult(finalize, self._accountant)

    def _count_sensitivities(self, params: AggregateParams) -> dp.Sensitivities:
        if params.max_contributions is not None:
            m = params.max_contributions
            return dp.Sensitivities(l1=float(m), l2=float(m))
        return dp.count_sensitivities(params.max_partitions_contributed,
                                      params.max_contributions_per_partition)

    # ------------------------------------------------------------------
    def _add_empty_public_partitions(self, out: DataFrame, pub_df: DataFrame,
                                     pk_cols: Sequence[str]) -> DataFrame:
        """Reference: pipeline_dp/dp_engine.py:315-330 — every public key
        appears in the output; missing ones get empty accumulators."""
        joined = pub_df.join(out, on=list(pk_cols), how="left")
        fills = {c: 0 for c in out.columns if c not in pk_cols}
        return joined.fillna(fills)

    # ------------------------------------------------------------------
    def select_partitions(self, df: DataFrame, params: SelectPartitionsParams,
                          extractors: DataFrameExtractors) -> DPResult:
        """Reference: pipeline_dp/dp_engine.py:220-305 (semantics)."""
        report = ["DPEngine.select_partitions"]
        self._reports.append(report)
        if params.partition_selection_strategy == \
                PartitionSelectionStrategy.WEIGHTED_GAUSSIAN_THRESHOLDING:
            return self._select_partitions_weighted_gaussian(
                df, params, extractors, report)
        pk_cols = extractors.partition_key_columns
        data = df.select(
            F.col(extractors.privacy_id_column).alias(_PID),
            *[F.col(c) for c in pk_cols]).distinct()
        bounded = bounders._limit_per_key(data, [_PID],
                                          params.max_partitions_contributed,
                                          self._order_cols)
        counts = bounded.groupBy(*pk_cols).agg(
            F.count(F.lit(1)).alias(_PID_COUNT))
        with self._accountant.scope(params.budget_weight):
            spec = self._accountant.request_budget(
                params.partition_selection_strategy.mechanism_type)
        agg_params = AggregateParams(
            metrics=[Metrics.COUNT],
            max_partitions_contributed=params.max_partitions_contributed,
            max_contributions_per_partition=1,
            partition_selection_strategy=params.partition_selection_strategy,
            pre_threshold=params.pre_threshold)
        engine = self

        def finalize() -> DataFrame:
            kept = engine._select_private_partitions(counts, spec, agg_params,
                                                     report)
            return kept.select(*pk_cols)

        return DPResult(finalize, self._accountant)

    # ------------------------------------------------------------------
    def _select_partitions_weighted_gaussian(
            self, df: DataFrame, params: SelectPartitionsParams,
            extractors: DataFrameExtractors,
            report: List[str]) -> DPResult:
        """Weighted Gaussian partition selection (reference:
        pipeline_dp/dp_engine.py:664-714): each (pid, pk) is weighted
        1/sqrt(#partitions of the pid after L0 sampling), so every privacy
        id has total L2 weight exactly 1 and sigma is l0-independent. Plan:
        distinct -> L0 window sample -> pid-window weight (reuses the
        sample's hash partitioning) -> groupBy(pk) weight sum -> noisy
        threshold filter."""
        pk_cols = extractors.partition_key_columns
        data = df.select(
            F.col(extractors.privacy_id_column).alias(_PID),
            *[F.col(c) for c in pk_cols]).distinct()
        bounded = bounders._limit_per_key(data, [_PID],
                                          params.max_partitions_contributed,
                                          self._order_cols)
        w = Window.partitionBy(_PID)
        weighted = bounded.withColumn(
            "__weight__",
            F.lit(1.0) / F.sqrt(F.count(F.lit(1)).over(w)))
        weights = weighted.groupBy(*pk_cols).agg(
            F.sum("__weight__").alias("__weight__"))
        with self._accountant.scope(params.budget_weight):
            spec = self._accountant.request_budget(
                params.partition_selection_strategy.mechanism_type)
        engine = self
        l0 = params.max_partitions_contributed

        def finalize() -> DataFrame:
            sigma, threshold = dp.weighted_gaussian_thresholding(
                spec.eps, spec.delta, l0)
            noisy = engine._noise.add_noise(F.col("__weight__"), "gaussian",
                                            sigma)
            keep = noisy >= F.lit(threshold)
            if params.pre_threshold is not None:
                # pre-threshold applies to the raw weight sum floor.
                keep = keep & (F.col("__weight__") >=
                               F.lit(float(params.pre_threshold)) /
                               F.sqrt(F.lit(float(l0))))
            report.append(
                f"Partition selection: weighted gaussian, sigma={sigma:.3f},"
                f" threshold={threshold:.3f}")
            return weights.filter(keep).select(*pk_cols)

        return DPResult(finalize, self._accountant)

    # ------------------------------------------------------------------
    def calculate_private_contribution_bounds(
            self, df: DataFrame, params, extractors: DataFrameExtractors,
            rng=None):
        """DP choice of max_partitions_contributed via the exponential
        mechanism over log-spaced candidates
        (reference: pipeline_dp/dp_engine.py:479-531 +
        private_contribution_bounds.py:27-195). Runs two small jobs: the
        L0 histogram and the distinct-partition count."""
        from pipelinedp_spark.analysis.histograms import \
            compute_dataset_histograms
        from pipelinedp_spark.private_contribution_bounds import (
            PrivateContributionBounds, PrivateL0Calculator)
        histograms = compute_dataset_histograms(df, extractors)
        n_partitions = df.select(
            *extractors.partition_key_columns).distinct().count()
        calc = PrivateL0Calculator(params, n_partitions,
                                   histograms.l0_contributions_histogram)
        if self._noise_mode == "zero":
            # deterministic mode: the exponential mechanism degenerates
            # to the score argmax (what it converges to as
            # calculation_eps -> inf) — same contract as every other
            # zero-noise path, and the oracle-checkable one
            return PrivateContributionBounds(
                max_partitions_contributed=calc.calculate_deterministic())
        return PrivateContributionBounds(
            max_partitions_contributed=calc.calculate(rng=rng))

    # ------------------------------------------------------------------
    def add_dp_noise(self, df: DataFrame, value_columns: Union[str, List[str]],
                     params: AddDPNoiseParams) -> DPResult:
        """Pure noise addition with explicit sensitivities
        (reference: pipeline_dp/dp_engine.py:579-652)."""
        report = ["DPEngine.add_dp_noise"]
        self._reports.append(report)
        if isinstance(value_columns, str):
            value_columns = [value_columns]
        with self._accountant.scope(params.budget_weight):
            spec = self._accountant.request_budget(
                params.noise_kind.convert_to_mechanism_type())
        sens = dp.Sensitivities(l0=params.l0_sensitivity,
                                linf=params.linf_sensitivity,
                                l1=params.l1_sensitivity,
                                l2=params.l2_sensitivity)
        noise = self._noise
        kind = params.noise_kind.value

        def finalize() -> DataFrame:
            scale = dp.noise_scale(params.noise_kind, spec.eps, spec.delta,
                                   sens)
            out = df
            for c in value_columns:
                out = out.withColumn(
                    c, noise.add_noise(F.col(c).cast(DoubleType()), kind,
                                       scale))
            if params.output_noise_stddev:
                std = dp.noise_std(params.noise_kind, spec.eps, spec.delta,
                                   sens)
                for c in value_columns:
                    out = out.withColumn(f"{c}_noise_stddev",
                                         F.lit(float(std)))
            report.append(f"Added {kind} noise, scale={scale:.4g}")
            return out

        return DPResult(finalize, self._accountant)

    # ------------------------------------------------------------------
    def explain_computation_reports(self) -> List[str]:
        """Reference: pipeline_dp/report_generator.py:46-115."""
        return ["\n".join(r) for r in self._reports]

    # ------------------------------------------------------------------
    @staticmethod
    def _as_partitions_df(spark: SparkSession, pk_cols: Sequence[str],
                          partitions: Union[DataFrame, Sequence],
                          like: Optional[DataFrame] = None) -> DataFrame:
        """``like``: a DataFrame carrying the pk columns with the DATA's
        types; the public-partition frame is cast to them so literal
        inference (SQL ints -> INT) can't narrow the output key columns
        away from the source schema."""
        def align(pub: DataFrame) -> DataFrame:
            if like is None:
                return pub
            types = {f.name: f.dataType for f in like.schema.fields}
            return pub.select(*[
                F.col(c).cast(types[c]).alias(c) if c in types else F.col(c)
                for c in pub.columns])

        if isinstance(partitions, DataFrame):
            return align(partitions.select(*pk_cols).distinct())
        # Local list -> SQL VALUES LocalRelation: stays driver-side in
        # Catalyst (no parallelize job, no Python-serialization stage).
        rows = list(
            dict.fromkeys(p if isinstance(p, tuple) else (p,)
                          for p in partitions))

        def lit(v) -> str:
            if v is None:
                return "NULL"
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, float):
                # repr() of inf/nan is not a SQL literal.
                if math.isnan(v):
                    return "CAST('NaN' AS DOUBLE)"
                if math.isinf(v):
                    sign = "-" if v < 0 else ""
                    return f"CAST('{sign}Infinity' AS DOUBLE)"
                return repr(v)
            if isinstance(v, int):
                return repr(v)
            if isinstance(v, str):
                s = v.replace("\\", "\\\\").replace("'", "\\'")
                return f"'{s}'"
            raise ValueError(
                f"unsupported public-partition key type {type(v).__name__}: "
                f"pass keys as str/int/float/bool/None, or provide the "
                f"partitions as a DataFrame")

        values = ", ".join(
            "(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
        cols = ", ".join(f"`{c}`" for c in pk_cols)
        return align(spark.sql(f"SELECT * FROM VALUES {values} AS t({cols})"))
