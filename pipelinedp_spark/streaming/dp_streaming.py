"""DP aggregations over Structured Streaming.

Net-new (the reference is batch-only: SURVEY.md §2.F). Semantics carry the
batch engine's DP machinery to event-time windows:

  watermark -> per-(user, window) partial with an Linf cap ->
  per-window merge -> noise in the output projection

Contribution bounding in a stream: the exact batch bounder samples rows
per (user, partition) with a window sort, which is not available mid-
stream; instead the per-(user, window) COUNT/SUM partial is capped with
least()/clip() — exactly the batch engine's count fast path, and the same
sensitivity guarantee (each user moves a window's aggregate by at most
linf / the clip range). Cross-window L0 bounding has no streaming
equivalent with bounded state, so epsilon spends per *window* and callers
bound user scope by keying windows into the privacy unit via
`l0_per_window` (documented, mirrors production DP streaming systems).

Chained stateful aggregations (groupBy(user, window) then groupBy(window))
require Spark >= 3.4 append-mode multiple-stateful-operator support; both
aggregations share the event-time watermark.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from pipelinedp_spark import dp_computations as dp
from pipelinedp_spark.aggregate_params import NoiseKind
from pipelinedp_spark.noise import create_noise_source


def _clip(col: Column, lo: float, hi: float) -> Column:
    return F.greatest(F.least(col, F.lit(float(hi))), F.lit(float(lo)))


def dp_streaming_count(stream: DataFrame,
                       privacy_id_col: str,
                       timestamp_col: str,
                       window_duration: str,
                       watermark_delay: str,
                       epsilon_per_window: float,
                       max_contributions_per_window: int,
                       l0_per_window: int = 1,
                       noise_kind: NoiseKind = NoiseKind.LAPLACE,
                       delta_per_window: float = 0.0,
                       noise_mode: str = "secure",
                       slide_duration: Optional[str] = None) -> DataFrame:
    """DP event count per event-time window.

    Plan: watermark -> groupBy(pid, window) count capped at linf ->
    groupBy(window) sum + privacy-id count -> noise projection. Returns
    (window, count, privacy_id_count) with noised doubles.
    """
    win = F.window(F.col(timestamp_col), window_duration, slide_duration) \
        if slide_duration else F.window(F.col(timestamp_col),
                                        window_duration)
    linf = max_contributions_per_window
    per_user = (stream
                .withWatermark(timestamp_col, watermark_delay)
                .groupBy(F.col(privacy_id_col).alias("__pid__"),
                         win.alias("window"))
                .agg(F.least(F.count(F.lit(1)), F.lit(linf))
                     .alias("__capped__")))
    per_window = per_user.groupBy("window").agg(
        F.sum("__capped__").alias("__count__"),
        F.count(F.lit(1)).alias("__pids__"))

    sens = dp.count_sensitivities(l0_per_window, linf)
    scale = dp.noise_scale(noise_kind, epsilon_per_window / 2,
                           delta_per_window / 2 if delta_per_window else 0.0,
                           sens)
    pid_sens = dp.privacy_id_count_sensitivities(l0_per_window)
    pid_scale = dp.noise_scale(
        noise_kind, epsilon_per_window / 2,
        delta_per_window / 2 if delta_per_window else 0.0, pid_sens)
    noise = create_noise_source(noise_mode)
    return per_window.select(
        "window",
        noise.add_noise(F.col("__count__").cast(DoubleType()),
                        noise_kind.value, scale).alias("count"),
        noise.add_noise(F.col("__pids__").cast(DoubleType()),
                        noise_kind.value, pid_scale)
        .alias("privacy_id_count"))


def dp_streaming_sum(stream: DataFrame,
                     privacy_id_col: str,
                     timestamp_col: str,
                     value_col: str,
                     window_duration: str,
                     watermark_delay: str,
                     epsilon_per_window: float,
                     min_sum_per_window: float,
                     max_sum_per_window: float,
                     l0_per_window: int = 1,
                     noise_kind: NoiseKind = NoiseKind.LAPLACE,
                     delta_per_window: float = 0.0,
                     noise_mode: str = "secure") -> DataFrame:
    """DP sum per event-time window with a per-(user, window) sum clip —
    the batch engine's per-partition clipping regime. Returns
    (window, sum)."""
    per_user = (stream
                .withWatermark(timestamp_col, watermark_delay)
                .groupBy(F.col(privacy_id_col).alias("__pid__"),
                         F.window(F.col(timestamp_col), window_duration)
                         .alias("window"))
                .agg(_clip(F.sum(F.col(value_col).cast(DoubleType())),
                           min_sum_per_window, max_sum_per_window)
                     .alias("__clipped__")))
    per_window = per_user.groupBy("window").agg(
        F.sum("__clipped__").alias("__sum__"))
    sens = dp.sum_sensitivities(l0_per_window, None, None, None,
                                min_sum_per_window, max_sum_per_window)
    scale = dp.noise_scale(noise_kind, epsilon_per_window,
                           delta_per_window or 0.0, sens)
    noise = create_noise_source(noise_mode)
    return per_window.select(
        "window",
        noise.add_noise(F.col("__sum__"), noise_kind.value, scale)
        .alias("sum"))


def streaming_exact_dedup(stream: DataFrame,
                          fingerprint_col: str,
                          id_col: str,
                          timeout_minutes: Optional[int] = None) -> DataFrame:
    """Custom stateful operator: emit only the FIRST occurrence of each
    fingerprint across the whole stream (exact online dedup).

    applyInPandasWithState keeps one boolean per fingerprint group; state
    is partitioned by the fingerprint hash, so it scales horizontally, and
    an optional processing-time timeout bounds state for unbounded key
    spaces (trade exactness past the horizon for bounded memory — the
    standard production compromise).
    Returns (fingerprint, id) of first occurrences, update mode.
    """
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    out_schema = StructType([
        StructField("fingerprint", StringType()),
        StructField(id_col, LongType()),
    ])
    state_schema = StructType([StructField("seen", LongType())])
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if timeout_minutes else GroupStateTimeout.NoTimeout)
    ms = timeout_minutes

    def dedup_fn(key, pdfs, state: "GroupState"):
        if state.hasTimedOut:
            state.remove()
            return
        first_id = None
        for pdf in pdfs:
            if len(pdf) and first_id is None:
                first_id = int(pdf[id_col].min())
        if not state.exists and first_id is not None:
            state.update((1,))
            if ms:
                state.setTimeoutDuration(ms * 60 * 1000)
            yield pd.DataFrame({"fingerprint": [key[0]],
                                id_col: [first_id]})

    renamed = stream.select(
        F.col(fingerprint_col).alias("fingerprint"), F.col(id_col))
    return (renamed
            .groupBy("fingerprint")
            .applyInPandasWithState(dedup_fn, out_schema, state_schema,
                                    "update", timeout))


def session_window_counts(stream: DataFrame,
                          privacy_id_col: str,
                          timestamp_col: str,
                          gap_duration: str,
                          watermark_delay: str) -> DataFrame:
    """Per-user session windows (non-DP building block): sessions close
    after `gap_duration` of inactivity; state is bounded by the watermark.
    Returns (pid, session_window, n_events)."""
    return (stream
            .withWatermark(timestamp_col, watermark_delay)
            .groupBy(F.col(privacy_id_col).alias("pid"),
                     F.session_window(F.col(timestamp_col), gap_duration)
                     .alias("session_window"))
            .agg(F.count(F.lit(1)).alias("n_events")))
