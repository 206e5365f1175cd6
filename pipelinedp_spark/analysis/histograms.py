"""Dataset contribution/partition histograms.

Reference semantics: pipeline_dp/dataset_histograms/ (histograms.py:20-229,
computing_histograms.py:89-186). Integer histograms (counts) use logarithmic
binning that keeps the 3 most-significant digits of the bin lower
(count_histogram_computation.py:35-54 — "for scalability"); float histograms
(sums) use equal-width bins.

All heavy lifting is native: value extraction -> binning expression ->
groupBy(bin).agg(count/sum/min/max) -> collect of the (tiny) binned summary.
The raw data is scanned twice (integer histograms fused in one pass over
per-(pid, pk) aggregates; sum histograms need a min/max pre-pass).
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipelinedp_spark.dp_engine import DataFrameExtractors

NUMBER_OF_SUM_BUCKETS = 10_000


class HistogramType(enum.Enum):
    """Reference: pipeline_dp/dataset_histograms/histograms.py:62-80."""

    L0_CONTRIBUTIONS = "l0_contributions"
    L1_CONTRIBUTIONS = "l1_contributions"
    LINF_CONTRIBUTIONS = "linf_contributions"
    LINF_SUM_CONTRIBUTIONS = "linf_sum_contributions"
    COUNT_PER_PARTITION = "count_per_partition"
    COUNT_PRIVACY_ID_PER_PARTITION = "privacy_id_per_partition_count"
    SUM_PER_PARTITION = "sum_per_partition"


@dataclasses.dataclass
class FrequencyBin:
    """Reference: pipeline_dp/dataset_histograms/histograms.py:21-59."""

    lower: float
    upper: float
    count: int
    sum: float
    max: float
    min: float


@dataclasses.dataclass
class Histogram:
    """Binned frequency summary (reference: histograms.py:85-166)."""

    name: HistogramType
    bins: List[FrequencyBin]

    @property
    def total_count(self) -> int:
        return sum(b.count for b in self.bins)

    @property
    def total_sum(self) -> float:
        return sum(b.sum for b in self.bins)

    @property
    def max_value(self) -> float:
        return max((b.max for b in self.bins), default=0)

    def quantiles(self, qs: Sequence[float]) -> List[float]:
        """Approximate quantiles: for each q, the lower bound of the first
        bin at which the cumulative count reaches q * total
        (reference: histograms.py:134-166)."""
        if not self.bins:
            raise ValueError("cannot compute quantiles of an empty histogram")
        total = self.total_count
        out, cum, i = [], 0, 0
        bins = sorted(self.bins, key=lambda b: b.lower)
        for q in qs:
            target = q * total
            while i < len(bins) and cum + bins[i].count < target:
                cum += bins[i].count
                i += 1
            out.append(bins[min(i, len(bins) - 1)].lower)
        return out


@dataclasses.dataclass
class DatasetHistograms:
    """Reference: pipeline_dp/dataset_histograms/histograms.py:211-229."""

    l0_contributions_histogram: Histogram
    l1_contributions_histogram: Histogram
    linf_contributions_histogram: Histogram
    linf_sum_contributions_histogram: Optional[Histogram]
    count_per_partition_histogram: Histogram
    count_privacy_id_per_partition: Histogram
    sum_per_partition_histogram: Optional[Histogram]


def _log_bin_lower(value_col) -> "F.Column":
    """Integer log-binning: keep the 3 most-significant digits
    (reference: count_histogram_computation.py:35-54). base =
    10^max(0, floor(log10(v)) - 2); lower = floor(v / base) * base."""
    base = F.pow(F.lit(10.0),
                 F.greatest(F.floor(F.log10(value_col.cast("double")))
                            - F.lit(2), F.lit(0))).cast("long")
    return (F.floor(value_col.cast("double") / base) * base).cast("long")


def _collect_integer_histogram(df: DataFrame, value_col: str,
                               name: HistogramType) -> Histogram:
    v = F.col(value_col)
    binned = (df.withColumn("__lower__", _log_bin_lower(v))
              .groupBy("__lower__")
              .agg(F.count(F.lit(1)).alias("count"),
                   F.sum(v).alias("sum"),
                   F.max(v).alias("max"),
                   F.min(v).alias("min"))
              .orderBy("__lower__"))
    bins = []
    for r in binned.collect():
        lower = int(r["__lower__"])
        base = 10 ** max(0, len(str(max(lower, 1))) - 3)
        bins.append(FrequencyBin(lower=lower, upper=lower + base,
                                 count=int(r["count"]),
                                 sum=float(r["sum"]),
                                 max=float(r["max"]), min=float(r["min"])))
    return Histogram(name, bins)


def _collect_float_histogram(df: DataFrame, value_col: str,
                             name: HistogramType,
                             buckets: int = NUMBER_OF_SUM_BUCKETS
                             ) -> Histogram:
    """Equal-width binning for real-valued sums
    (reference: sum_histogram_computation.py:86-104)."""
    v = F.col(value_col).cast("double")
    mm = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).collect()[0]
    lo, hi = mm["lo"], mm["hi"]
    if lo is None:
        return Histogram(name, [])
    width = (hi - lo) / buckets if hi > lo else 1.0
    bin_idx = F.least(F.lit(buckets - 1),
                      F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"))
    binned = (df.withColumn("__bin__", bin_idx)
              .groupBy("__bin__")
              .agg(F.count(F.lit(1)).alias("count"), F.sum(v).alias("sum"),
                   F.max(v).alias("max"), F.min(v).alias("min"))
              .orderBy("__bin__"))
    bins = [FrequencyBin(lower=lo + r["__bin__"] * width,
                         upper=lo + (r["__bin__"] + 1) * width,
                         count=int(r["count"]), sum=float(r["sum"]),
                         max=float(r["max"]), min=float(r["min"]))
            for r in binned.collect()]
    return Histogram(name, bins)


def compute_dataset_histograms(df: DataFrame,
                               extractors: DataFrameExtractors
                               ) -> DatasetHistograms:
    """Computes all contribution/partition histograms in 2 passes over the
    per-(pid, pk) aggregate (reference:
    computing_histograms.py:89-186 computes them from 5 branches over the
    raw collection; here the shared per-(pid, pk) frame is cached)."""
    pid = extractors.privacy_id_column
    pk_cols = list(extractors.partition_key_columns)
    value = extractors.value_column
    has_value = value is not None

    value_expr = (F.sum(F.col(value).cast("double")) if has_value
                  else F.lit(0.0))
    per_pid_pk = df.groupBy(pid, *pk_cols).agg(
        F.count(F.lit(1)).alias("count"), value_expr.alias("sum")).cache()

    per_pid = per_pid_pk.groupBy(pid).agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.sum("count").alias("n_contributions"))
    per_pk = per_pid_pk.groupBy(*pk_cols).agg(
        F.count(F.lit(1)).alias("n_privacy_ids"),
        F.sum("count").alias("count"),
        F.sum("sum").alias("sum"))

    out = DatasetHistograms(
        l0_contributions_histogram=_collect_integer_histogram(
            per_pid, "n_partitions", HistogramType.L0_CONTRIBUTIONS),
        l1_contributions_histogram=_collect_integer_histogram(
            per_pid, "n_contributions", HistogramType.L1_CONTRIBUTIONS),
        linf_contributions_histogram=_collect_integer_histogram(
            per_pid_pk, "count", HistogramType.LINF_CONTRIBUTIONS),
        linf_sum_contributions_histogram=(_collect_float_histogram(
            per_pid_pk, "sum", HistogramType.LINF_SUM_CONTRIBUTIONS)
            if has_value else None),
        count_per_partition_histogram=_collect_integer_histogram(
            per_pk, "count", HistogramType.COUNT_PER_PARTITION),
        count_privacy_id_per_partition=_collect_integer_histogram(
            per_pk, "n_privacy_ids",
            HistogramType.COUNT_PRIVACY_ID_PER_PARTITION),
        sum_per_partition_histogram=(_collect_float_histogram(
            per_pk, "sum", HistogramType.SUM_PER_PARTITION)
            if has_value else None),
    )
    per_pid_pk.unpersist()
    return out


def compute_ratio_dropped(
        contribution_histogram: Histogram) -> List[Tuple[float, float]]:
    """For each candidate bound (bin lower), the ratio of contributions
    dropped if contributions were capped at that bound
    (reference: histograms.py:169-208). Returns (bound, ratio) ascending in
    bound; ratio at max_value is 0, at 0 is 1."""
    bins = sorted(contribution_histogram.bins, key=lambda b: b.lower)
    total = contribution_histogram.total_sum
    if total == 0:
        return [(0, 1.0)]
    out = [(contribution_histogram.max_value, 0.0)]
    # Walking bounds from high to low: contributions above `bound` are
    # truncated to `bound`; dropped = sum over bins above of (value - bound).
    count_above = 0
    sum_above = 0.0
    for b in reversed(bins):
        bound = b.lower
        dropped = (sum_above - count_above * bound) + \
            (b.sum - b.count * bound)
        if bound > 0:
            out.append((bound, dropped / total))
        count_above += b.count
        sum_above += b.sum
    out.append((0, 1.0))
    return out[::-1]
