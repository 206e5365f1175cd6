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

**Window-presence privacy.** A streaming stateful aggregation only ever
produces groups that received data, so a window row's *existence* reveals
"at least one event happened in this window". When ``delta_per_window > 0``
(and ``threshold_windows`` is not explicitly disabled) both aggregations
therefore run DP partition selection over the window grid: the noisy
per-window privacy-id count is compared against a Laplace/Gaussian
threshold funded by half of ``delta_per_window`` — the same
post-aggregation-thresholding construction as the batch engine
(dp_engine's PRIVACY_ID_COUNT thresholding path; reference semantics:
pipeline_dp/combiners.py:360-416). With ``delta_per_window == 0`` and
``threshold_windows=None`` the output is (eps, 0)-DP *conditional on the
released window set*: window presence itself is released exactly, which is
only safe when the window grid is public knowledge (e.g. "every hour has
traffic"). Callers wanting that must pass ``threshold_windows=False``
explicitly; otherwise a pure-eps budget raises.
"""

from __future__ import annotations

import re as _re

from typing import Optional

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from pipelinedp_spark import dp_computations as dp
from pipelinedp_spark.aggregate_params import NoiseKind
from pipelinedp_spark.noise import create_noise_source
from pipelinedp_spark import store


def _clip(col: Column, lo: float, hi: float) -> Column:
    return F.greatest(F.least(col, F.lit(float(hi))), F.lit(float(lo)))


def _resolve_thresholding(threshold_windows: Optional[bool],
                          delta_per_window: float) -> bool:
    """Default: threshold whenever a delta budget exists; refuse the silent
    presence leak on a pure-eps budget unless explicitly waived."""
    if threshold_windows is None:
        if delta_per_window <= 0.0:
            raise ValueError(
                "delta_per_window == 0 cannot fund DP window selection, and "
                "a streaming aggregation releases window *presence* exactly. "
                "Pass threshold_windows=False only if the window grid is "
                "public knowledge, or provide delta_per_window > 0.")
        return True
    if threshold_windows and delta_per_window <= 0.0:
        raise ValueError("threshold_windows=True requires "
                         "delta_per_window > 0")
    return threshold_windows


def _pid_threshold_filter(per_window: DataFrame, noise, noise_kind: NoiseKind,
                          eps: float, delta: float, l0: int,
                          pids_col: str) -> DataFrame:
    """Noise the per-window privacy-id count with (eps, delta/2) and keep
    windows whose noisy count clears the (delta/2)-funded threshold —
    the batch engine's post-aggregation-thresholding construction."""
    pid_sens = dp.privacy_id_count_sensitivities(l0)
    nk = noise_kind
    std = dp.noise_std(nk, eps, delta / 2, pid_sens)
    threshold = dp.thresholding_from_std(nk, std, delta / 2, l0)
    noisy = noise.add_noise(
        F.col(pids_col).cast(DoubleType()), nk.value,
        dp.noise_scale(nk, eps, delta / 2, pid_sens))
    out = per_window.withColumn("__dp_pids__", noisy)
    return out.filter(F.col("__dp_pids__") >= F.lit(threshold))


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
                       slide_duration: Optional[str] = None,
                       threshold_windows: Optional[bool] = None) -> DataFrame:
    """DP event count per event-time window.

    Plan: watermark -> groupBy(pid, window) count capped at linf ->
    groupBy(window) sum + privacy-id count -> noise projection ->
    (default) DP window selection on the noisy privacy-id count. Returns
    (window, count, privacy_id_count) with noised doubles; the released
    privacy_id_count is the SAME noisy draw the threshold filter saw.

    ``threshold_windows=None`` (default) enables selection and requires
    ``delta_per_window > 0``; passing ``False`` asserts the window grid is
    public and releases every non-empty window (presence leak documented in
    the module docstring).
    """
    do_threshold = _resolve_thresholding(threshold_windows, delta_per_window)
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
    noise = create_noise_source(noise_mode)
    if do_threshold:
        # pid metric's budget share is (eps/2, delta/2); within it, half the
        # delta funds the noise (Gaussian only) and half the threshold.
        per_window = _pid_threshold_filter(
            per_window, noise, noise_kind, epsilon_per_window / 2,
            delta_per_window / 2, l0_per_window, "__pids__")
        pid_col = F.col("__dp_pids__")
    else:
        pid_sens = dp.privacy_id_count_sensitivities(l0_per_window)
        pid_scale = dp.noise_scale(
            noise_kind, epsilon_per_window / 2,
            delta_per_window / 2 if delta_per_window else 0.0, pid_sens)
        pid_col = noise.add_noise(F.col("__pids__").cast(DoubleType()),
                                  noise_kind.value, pid_scale)
    return per_window.select(
        "window",
        noise.add_noise(F.col("__count__").cast(DoubleType()),
                        noise_kind.value, scale).alias("count"),
        pid_col.alias("privacy_id_count"))


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
                     noise_mode: str = "secure",
                     threshold_windows: Optional[bool] = None) -> DataFrame:
    """DP sum per event-time window with a per-(user, window) sum clip —
    the batch engine's per-partition clipping regime. With window
    selection enabled (the default; requires ``delta_per_window > 0``) the
    epsilon splits half to the sum noise and half to the selection noise.
    Returns (window, sum)."""
    do_threshold = _resolve_thresholding(threshold_windows, delta_per_window)
    per_user = (stream
                .withWatermark(timestamp_col, watermark_delay)
                .groupBy(F.col(privacy_id_col).alias("__pid__"),
                         F.window(F.col(timestamp_col), window_duration)
                         .alias("window"))
                .agg(_clip(F.sum(F.col(value_col).cast(DoubleType())),
                           min_sum_per_window, max_sum_per_window)
                     .alias("__clipped__")))
    per_window = per_user.groupBy("window").agg(
        F.sum("__clipped__").alias("__sum__"),
        F.count(F.lit(1)).alias("__pids__"))
    eps_sum = epsilon_per_window / 2 if do_threshold else epsilon_per_window
    delta_sum = delta_per_window / 2 if do_threshold else delta_per_window
    sens = dp.sum_sensitivities(l0_per_window, None, None, None,
                                min_sum_per_window, max_sum_per_window)
    scale = dp.noise_scale(noise_kind, eps_sum, delta_sum or 0.0, sens)
    noise = create_noise_source(noise_mode)
    if do_threshold:
        per_window = _pid_threshold_filter(
            per_window, noise, noise_kind, epsilon_per_window / 2,
            delta_per_window / 2, l0_per_window, "__pids__")
    return per_window.select(
        "window",
        noise.add_noise(F.col("__sum__"), noise_kind.value, scale)
        .alias("sum"))


def dp_streaming_mean(stream: DataFrame,
                      privacy_id_col: str,
                      timestamp_col: str,
                      value_col: str,
                      window_duration: str,
                      watermark_delay: str,
                      epsilon_per_window: float,
                      min_value: float,
                      max_value: float,
                      max_contributions_per_window: int,
                      l0_per_window: int = 1,
                      noise_kind: NoiseKind = NoiseKind.LAPLACE,
                      delta_per_window: float = 0.0,
                      noise_mode: str = "secure",
                      threshold_windows: Optional[bool] = None) -> DataFrame:
    """DP mean per event-time window: the batch engine's normalized-sum
    construction (noisy clipped-sum / noisy capped-count, each with half
    the metric budget) on top of the same watermark -> per-(user, window)
    partial -> per-window merge plan. Window selection as in
    dp_streaming_count. Returns (window, mean)."""
    do_threshold = _resolve_thresholding(threshold_windows, delta_per_window)
    linf = max_contributions_per_window
    mid = (min_value + max_value) / 2.0
    half = (max_value - min_value) / 2.0
    # Clip EVERY contribution to [min_value, max_value] first (batch-engine
    # per-value clipping: one out-of-range value shifts the user's window
    # sum by at most half, it cannot saturate it), then bound the per-user
    # normalized sum at +-linf*half. Deviation from the batch engine,
    # documented: a user with more than linf rows has their normalized sum
    # clipped toward the cap instead of row-sampled (streaming aggregates
    # cannot order-sample rows); sensitivity is identical, and the capped
    # count uses the same linf.
    clipped = stream.withColumn(
        "__nval__",
        _clip(F.col(value_col).cast(DoubleType()), float(min_value),
              float(max_value)) - F.lit(mid))
    per_user = (clipped
                .withWatermark(timestamp_col, watermark_delay)
                .groupBy(F.col(privacy_id_col).alias("__pid__"),
                         F.window(F.col(timestamp_col), window_duration)
                         .alias("window"))
                .agg(F.least(F.count(F.lit(1)), F.lit(linf))
                     .alias("__capped__"),
                     _clip(F.sum("__nval__"),
                           -float(linf) * half, float(linf) * half)
                     .alias("__nsum__")))
    per_window = per_user.groupBy("window").agg(
        F.sum("__capped__").alias("__count__"),
        F.sum("__nsum__").alias("__nsum__"),
        F.count(F.lit(1)).alias("__pids__"))

    eps_metric = epsilon_per_window / 2 if do_threshold \
        else epsilon_per_window
    delta_metric = delta_per_window / 2 if do_threshold \
        else delta_per_window
    cnt_sens = dp.count_sensitivities(l0_per_window, linf)
    sum_sens = dp.sum_sensitivities(l0_per_window, linf, -half, half,
                                    None, None)
    cnt_scale = dp.noise_scale(noise_kind, eps_metric / 2,
                               delta_metric / 2 if delta_metric else 0.0,
                               cnt_sens)
    sum_scale = dp.noise_scale(noise_kind, eps_metric / 2,
                               delta_metric / 2 if delta_metric else 0.0,
                               sum_sens)
    noise = create_noise_source(noise_mode)
    if do_threshold:
        per_window = _pid_threshold_filter(
            per_window, noise, noise_kind, epsilon_per_window / 2,
            delta_per_window / 2, l0_per_window, "__pids__")
    noisy_cnt = noise.add_noise(F.col("__count__").cast(DoubleType()),
                                noise_kind.value, cnt_scale)
    noisy_sum = noise.add_noise(F.col("__nsum__"), noise_kind.value,
                                sum_scale)
    return per_window.select(
        "window",
        (F.lit(mid) + noisy_sum / F.greatest(noisy_cnt, F.lit(1.0)))
        .alias("mean"))


def dp_streaming_variance(stream: DataFrame,
                          privacy_id_col: str,
                          timestamp_col: str,
                          value_col: str,
                          window_duration: str,
                          watermark_delay: str,
                          epsilon_per_window: float,
                          min_value: float,
                          max_value: float,
                          max_contributions_per_window: int,
                          l0_per_window: int = 1,
                          noise_kind: NoiseKind = NoiseKind.LAPLACE,
                          delta_per_window: float = 0.0,
                          noise_mode: str = "secure",
                          threshold_windows: Optional[bool] = None
                          ) -> DataFrame:
    """DP variance per event-time window: the batch engine's three-part
    construction (noisy capped count, noisy clipped normalized sum, noisy
    clipped normalized sum of squares, each with a third of the metric
    budget — dp_computations.variance_scales / reference
    pipeline_dp/dp_computations.py:284-312) on the same watermark ->
    per-(user, window) partial -> per-window merge plan as
    dp_streaming_mean, with the same per-value clipping and the same
    capped-sum deviation (documented there). Window selection as in
    dp_streaming_count. Returns (window, variance)."""
    do_threshold = _resolve_thresholding(threshold_windows, delta_per_window)
    linf = max_contributions_per_window
    mid = (min_value + max_value) / 2.0
    half = (max_value - min_value) / 2.0
    clipped = stream.withColumn(
        "__nval__",
        _clip(F.col(value_col).cast(DoubleType()), float(min_value),
              float(max_value)) - F.lit(mid))
    per_user = (clipped
                .withWatermark(timestamp_col, watermark_delay)
                .groupBy(F.col(privacy_id_col).alias("__pid__"),
                         F.window(F.col(timestamp_col), window_duration)
                         .alias("window"))
                .agg(F.least(F.count(F.lit(1)), F.lit(linf))
                     .alias("__capped__"),
                     _clip(F.sum("__nval__"),
                           -float(linf) * half, float(linf) * half)
                     .alias("__nsum__"),
                     _clip(F.sum(F.col("__nval__") * F.col("__nval__")),
                           0.0, float(linf) * half * half)
                     .alias("__nsq__")))
    per_window = per_user.groupBy("window").agg(
        F.sum("__capped__").alias("__count__"),
        F.sum("__nsum__").alias("__nsum__"),
        F.sum("__nsq__").alias("__nsq__"),
        F.count(F.lit(1)).alias("__pids__"))

    eps_metric = epsilon_per_window / 2 if do_threshold \
        else epsilon_per_window
    delta_metric = delta_per_window / 2 if do_threshold \
        else delta_per_window
    eps3 = eps_metric / 3
    delta3 = delta_metric / 3 if delta_metric else 0.0
    cnt_scale = dp.noise_scale(
        noise_kind, eps3, delta3, dp.count_sensitivities(l0_per_window,
                                                         linf))
    sum_scale = dp.noise_scale(
        noise_kind, eps3, delta3,
        dp.sum_sensitivities(l0_per_window, linf, -half, half, None, None))
    sq_scale = dp.noise_scale(
        noise_kind, eps3, delta3,
        dp.sum_sensitivities(l0_per_window, linf, 0.0, half * half,
                             None, None))
    noise = create_noise_source(noise_mode)
    if do_threshold:
        per_window = _pid_threshold_filter(
            per_window, noise, noise_kind, epsilon_per_window / 2,
            delta_per_window / 2, l0_per_window, "__pids__")
    noisy_cnt = F.greatest(
        noise.add_noise(F.col("__count__").cast(DoubleType()),
                        noise_kind.value, cnt_scale), F.lit(1.0))
    noisy_sum = noise.add_noise(F.col("__nsum__"), noise_kind.value,
                                sum_scale)
    noisy_sq = noise.add_noise(F.col("__nsq__"), noise_kind.value,
                               sq_scale)
    m = noisy_sum / noisy_cnt
    return per_window.select(
        "window", (noisy_sq / noisy_cnt - m * m).alias("variance"))


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


def dp_streaming_session_count(stream: DataFrame,
                               privacy_id_col: str,
                               timestamp_col: str,
                               gap_duration: str,
                               window_duration: str,
                               watermark_delay: str,
                               epsilon_per_window: float,
                               max_sessions_per_window: int,
                               l0_per_window: int = 1,
                               noise_kind: NoiseKind = NoiseKind.LAPLACE,
                               delta_per_window: float = 0.0,
                               noise_mode: str = "secure",
                               threshold_windows: Optional[bool] = None
                               ) -> DataFrame:
    """DP count of closed user sessions per tumbling event-time window.

    THREE chained stateful aggregations (Spark >= 3.4 multi-stateful
    append-mode support, validated on 4.1):

      per-user ``session_window`` close
      -> per-(user, tumble) session count capped at
         ``max_sessions_per_window``
      -> per-window merge (session sum + privacy-id count)

    A session is attributed to the tumbling window containing its session
    END (last event + gap, EXCLUSIVE boundary: a session ending exactly on
    a window edge belongs to the earlier window) — the chained-window
    assignment Spark implements for ``window(session_window_col, dur)``.
    Sensitivity mirrors dp_streaming_count with sessions as the
    contribution unit: a user moves a window's session count by at most
    linf and its privacy-id count by 1. Epsilon splits half to the count
    noise, half to the pid-count noise / DP window selection (same
    construction and presence-leak contract as dp_streaming_count).
    Returns (window, session_count, privacy_id_count), noised doubles.
    """
    do_threshold = _resolve_thresholding(threshold_windows, delta_per_window)
    linf = max_sessions_per_window
    sessions = (stream
                .withWatermark(timestamp_col, watermark_delay)
                .groupBy(F.col(privacy_id_col).alias("__pid__"),
                         F.session_window(F.col(timestamp_col), gap_duration)
                         .alias("__sw__"))
                .agg(F.count(F.lit(1)).alias("__n_events__")))
    per_user = (sessions
                .groupBy("__pid__",
                         F.window(F.col("__sw__"), window_duration)
                         .alias("window"))
                .agg(F.least(F.count(F.lit(1)), F.lit(linf))
                     .alias("__capped__")))
    per_window = per_user.groupBy("window").agg(
        F.sum("__capped__").alias("__count__"),
        F.count(F.lit(1)).alias("__pids__"))

    sens = dp.count_sensitivities(l0_per_window, linf)
    scale = dp.noise_scale(noise_kind, epsilon_per_window / 2,
                           delta_per_window / 2 if delta_per_window else 0.0,
                           sens)
    noise = create_noise_source(noise_mode)
    if do_threshold:
        per_window = _pid_threshold_filter(
            per_window, noise, noise_kind, epsilon_per_window / 2,
            delta_per_window / 2, l0_per_window, "__pids__")
        pid_col = F.col("__dp_pids__")
    else:
        pid_sens = dp.privacy_id_count_sensitivities(l0_per_window)
        pid_scale = dp.noise_scale(
            noise_kind, epsilon_per_window / 2,
            delta_per_window / 2 if delta_per_window else 0.0, pid_sens)
        pid_col = noise.add_noise(F.col("__pids__").cast(DoubleType()),
                                  noise_kind.value, pid_scale)
    return per_window.select(
        "window",
        noise.add_noise(F.col("__count__").cast(DoubleType()),
                        noise_kind.value, scale).alias("session_count"),
        pid_col.alias("privacy_id_count"))


def dp_streaming_vector_sum(stream: DataFrame,
                            privacy_id_col: str,
                            timestamp_col: str,
                            vector_col: str,
                            window_duration: str,
                            watermark_delay: str,
                            epsilon_per_window: float,
                            max_abs_per_dim: float,
                            dims: int,
                            noise_kind: NoiseKind = NoiseKind.LAPLACE,
                            delta_per_window: float = 0.0,
                            noise_mode: str = "secure",
                            threshold_windows: bool = False) -> DataFrame:
    """DP element-wise vector sum per event-time window — the streaming
    analogue of the batch VECTOR_SUM metric, in the per-partition-clip
    regime: each user's per-(window, dim) sum is clipped to
    [-max_abs_per_dim, +max_abs_per_dim] (an Linf-ball clip on the
    user's per-window aggregate — the norm kinds that clip individual
    contribution vectors need the whole vector at once, which a
    dim-exploded stateful aggregation cannot see; batch covers those).
    One user then moves at most ``dims`` cells by at most
    ``max_abs_per_dim`` each, so noise is scaled with
    Sensitivities(l0=dims, linf=max_abs_per_dim) under the chosen
    mechanism. Returns (window, dim, vector_sum) rows — callers pivot or
    collect dims downstream of the sink.

    Window thresholding is NOT supported: the per-dim rows of one
    window would each draw their own selection noise, so a window could
    be released for some dims and suppressed for others — a
    correctness-breaking inconsistency. Only a PUBLIC window grid is
    safe; ``threshold_windows=True`` raises.
    """
    if threshold_windows:
        raise ValueError(
            "dp_streaming_vector_sum cannot threshold windows: per-dim "
            "rows would draw independent selection noise and release a "
            "window for some dims but not others. Use it only when the "
            "window grid is public knowledge (threshold_windows=False).")
    exploded = stream.select(
        F.col(privacy_id_col).alias("__pid__"),
        F.col(timestamp_col),
        F.posexplode(F.col(vector_col)).alias("dim", "__v__"))
    per_user = (exploded
                .withWatermark(timestamp_col, watermark_delay)
                .groupBy(F.col("__pid__"),
                         F.window(F.col(timestamp_col), window_duration)
                         .alias("window"),
                         F.col("dim"))
                .agg(_clip(F.sum(F.col("__v__").cast(DoubleType())),
                           -max_abs_per_dim, max_abs_per_dim)
                     .alias("__clipped__")))
    per_window = per_user.groupBy("window", "dim").agg(
        F.sum("__clipped__").alias("__sum__"))
    sens = dp.Sensitivities(l0=dims, linf=float(max_abs_per_dim))
    scale = dp.noise_scale(noise_kind, epsilon_per_window,
                           delta_per_window or 0.0, sens)
    noise = create_noise_source(noise_mode)
    return per_window.select(
        "window", "dim",
        noise.add_noise(F.col("__sum__"), noise_kind.value, scale)
        .alias("vector_sum"))


def dp_streaming_percentile(stream: DataFrame,
                            privacy_id_col: str,
                            timestamp_col: str,
                            value_col: str,
                            window_duration: str,
                            watermark_delay: str,
                            epsilon_per_window: float,
                            min_value: float,
                            max_value: float,
                            percentile: float = 50.0,
                            n_bins: int = 256,
                            l0_per_window: int = 1,
                            noise_kind: NoiseKind = NoiseKind.LAPLACE,
                            delta_per_window: float = 0.0,
                            noise_mode: str = "secure",
                            threshold_windows: Optional[bool] = None,
                            percentile_algorithm: str = "histogram"
                            ) -> DataFrame:
    """DP percentile per event-time window over PER-USER window averages,
    via the batch engine's equi-width histogram sketch — or, with
    ``percentile_algorithm="tree"``, the reference quantile tree (the
    same height-4 branching-16 hierarchical histogram as the batch
    ``percentile_algorithm="tree"`` path; `quantile_tree.py`).

    Contribution unit: each user contributes exactly ONE value per window
    — the average of their clipped contributions — so every user moves
    exactly one histogram bin count by 1 (Linf = 1 by construction; the
    sketch's count-histogram sensitivity, no row sampling needed
    mid-stream). Plan: watermark -> per-(user, window) clipped mean
    (stateful) -> bin projection -> per-(window, bin) count (stateful,
    chained) -> per-bin noise -> per-window collect + quantile read-off
    (stateful, chained). The released percentile is the left-cumulative
    bin midpoint, exactly the batch QuantileCombiner histogram fast path.

    Window selection (default on, same contract as dp_streaming_count)
    thresholds on the noisy total user count = sum of noisy bin counts.
    The threshold is calibrated for the worst case it protects — a
    one-user window has exactly one occupied bin, so its noisy total is a
    single draw of the bin noise. Caveat (documented deviation from the
    batch sketch, which noises a dense bin grid): a streaming aggregation
    only materializes OCCUPIED (window, bin) rows, so within a released
    window the occupancy pattern of bins is not itself noised; a user who
    is alone in a bin shifts the read-off by at most one bin width beyond
    what the count noise covers. Use more users per window (the
    thresholding default) or coarser bins where that residual matters.
    Returns (window, percentile_value, n_users) with n_users the noisy
    total.
    """
    do_threshold = _resolve_thresholding(threshold_windows, delta_per_window)
    mid = (min_value + max_value) / 2.0
    width = (max_value - min_value) / n_bins

    per_user = (stream
                .withWatermark(timestamp_col, watermark_delay)
                .groupBy(F.col(privacy_id_col).alias("__pid__"),
                         F.window(F.col(timestamp_col), window_duration)
                         .alias("window"))
                .agg(F.avg(_clip(F.col(value_col).cast(DoubleType()),
                                 float(min_value), float(max_value)))
                     .alias("__uval__")))
    if percentile_algorithm == "tree":
        return _streaming_percentile_tree(
            per_user, do_threshold, epsilon_per_window, delta_per_window,
            float(min_value), float(max_value), percentile,
            l0_per_window, noise_kind, noise_mode)
    if percentile_algorithm != "histogram":
        raise ValueError(
            f"percentile_algorithm must be 'histogram' or 'tree', got "
            f"{percentile_algorithm!r}")
    binned = per_user.withColumn(
        "__bin__",
        F.least(F.greatest(
            F.floor((F.col("__uval__") - F.lit(float(min_value)))
                    / F.lit(width)).cast("int"), F.lit(0)),
            F.lit(n_bins - 1)))
    per_bin = binned.groupBy("window", "__bin__").agg(
        F.count(F.lit(1)).alias("__n__"))

    # Per-bin noise BEFORE the final collect: each user sits in exactly one
    # bin, so bin counts are disjoint count queries (parallel composition
    # within a window; epsilon spends once per window, not per bin).
    eps_metric = epsilon_per_window / 2 if do_threshold else epsilon_per_window
    delta_metric = (delta_per_window / 2 if do_threshold
                    else delta_per_window)
    sens = dp.count_sensitivities(l0_per_window, 1)
    scale = dp.noise_scale(noise_kind, eps_metric,
                           delta_metric if delta_metric else 0.0, sens)
    noise = create_noise_source(noise_mode)
    noisy_bins = per_bin.withColumn(
        "__nn__", noise.add_noise(F.col("__n__").cast(DoubleType()),
                                  noise_kind.value, scale))

    per_window = noisy_bins.groupBy("window").agg(
        F.sort_array(F.collect_list(F.struct("__bin__", "__nn__")))
        .alias("__hist__"))

    total = F.aggregate("__hist__", F.lit(0.0),
                        lambda acc, x: acc + F.greatest(x["__nn__"],
                                                        F.lit(0.0)))
    per_window = per_window.withColumn("__total__", total)
    target = F.col("__total__") * F.lit(percentile / 100.0)
    # scan: first bin where the cumulative (positive-clamped) count
    # reaches the target rank
    scan = F.aggregate(
        "__hist__",
        F.struct(F.lit(0.0).alias("cum"), F.lit(-1).alias("bin")),
        lambda acc, x: F.struct(
            (acc["cum"] + F.greatest(x["__nn__"], F.lit(0.0))).alias("cum"),
            F.when(acc["bin"] >= 0, acc["bin"])
            .when(acc["cum"] + F.greatest(x["__nn__"], F.lit(0.0))
                  >= target, x["__bin__"])
            .otherwise(F.lit(-1)).alias("bin")),
        lambda acc: acc["bin"])
    chosen = F.when(scan >= 0, scan).otherwise(F.lit(n_bins - 1))
    value = (F.lit(float(min_value))
             + (chosen.cast("double") + F.lit(0.5)) * F.lit(width))

    out = per_window.withColumn("percentile_value", value)
    if do_threshold:
        # Threshold on the noisy total: in the worst case (one user) the
        # total is a single draw of the per-bin noise, so the threshold is
        # calibrated against THAT std; it consumes the other delta half.
        bin_std = dp.noise_std(noise_kind, eps_metric,
                               delta_metric if delta_metric else 0.0, sens)
        threshold = dp.thresholding_from_std(
            noise_kind, bin_std, delta_per_window / 2, l0_per_window)
        out = out.filter(F.col("__total__") >= F.lit(threshold))
    return out.select("window",
                      F.col("percentile_value"),
                      F.col("__total__").alias("n_users"))


def _streaming_percentile_tree(per_user: DataFrame,
                               do_threshold: bool,
                               epsilon_per_window: float,
                               delta_per_window: float,
                               min_value: float,
                               max_value: float,
                               percentile: float,
                               l0_per_window: int,
                               noise_kind: NoiseKind,
                               noise_mode: str) -> DataFrame:
    """Quantile-tree streaming percentile (batch parity: the engine's
    ``percentile_algorithm="tree"`` path, `dp_engine._percentile_tree_values`,
    mirroring the reference combiner's h=4/b=16 hierarchical histogram).

    Plan: the stateful aggregation keeps EXACT per-(window, leaf) counts
    (leaf = 16^4-resolution bin of the per-user clipped window average —
    the same mergeable sketch state as batch); the noisy root-to-leaf
    descent runs in an Arrow-batched UDF over each window's collected
    sparse leaf histogram, drawing fresh noise for every visited node
    (empty children included) at the per-level budget eps/height — noise
    at READ time, exactly like batch, so state stores no noise.

    Budget: thresholding on -> (eps/2, delta/2) to the tree, (eps/2,
    delta/2) to the noisy privacy-id count that funds the threshold (the
    `dp_streaming_count` construction); off -> the tree gets the full
    budget and ``n_users`` is the descent's own level-1 noisy total
    (reuses the descent draws — no extra release).

    Returns (window, percentile_value, n_users) like the histogram path.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from pipelinedp_spark import quantile_tree as qt

    height = qt.DEFAULT_TREE_HEIGHT
    branching = qt.DEFAULT_BRANCHING_FACTOR
    n_leaves = branching ** height
    leaf_width = (max_value - min_value) / n_leaves

    leafed = per_user.withColumn(
        "__leaf__",
        F.least(F.greatest(
            F.floor((F.col("__uval__") - F.lit(min_value))
                    / F.lit(leaf_width)).cast("int"), F.lit(0)),
            F.lit(n_leaves - 1)))
    per_leaf = leafed.groupBy("window", "__leaf__").agg(
        F.count(F.lit(1)).alias("__n__"))
    per_window = per_leaf.groupBy("window").agg(
        F.collect_list(F.struct("__leaf__", "__n__")).alias("__hist__"),
        F.sum("__n__").alias("__pids__"))

    eps_tree = epsilon_per_window / 2 if do_threshold else epsilon_per_window
    delta_tree = (delta_per_window / 2 if do_threshold
                  else delta_per_window)
    tree_scale = dp.noise_scale(
        noise_kind, eps_tree / height,
        (delta_tree / height) if delta_tree else 0.0,
        dp.count_sensitivities(l0_per_window, 1))
    kind_value = noise_kind.value
    pct = float(percentile)
    lo, hi = min_value, max_value

    @pandas_udf("percentile_value double, n_users double")
    def _descend(hist: pd.Series) -> pd.DataFrame:
        out_v, out_n = [], []
        for h in hist:
            leaves = np.array([e["__leaf__"] for e in h], dtype=np.int64)
            counts = np.array([e["__n__"] for e in h], dtype=np.float64)
            vals, total = qt.compute_tree_quantiles(
                leaves, counts, [pct], lo, hi,
                qt.make_noise_fn(noise_mode, kind_value, tree_scale),
                height, branching, return_total=True)
            out_v.append(vals[0])
            out_n.append(total)
        return pd.DataFrame({"percentile_value": out_v, "n_users": out_n})

    noise = create_noise_source(noise_mode)
    out = per_window.withColumn("__res__", _descend(F.col("__hist__")))
    if do_threshold:
        out = _pid_threshold_filter(
            out, noise, noise_kind, epsilon_per_window / 2,
            delta_per_window / 2, l0_per_window, "__pids__")
        n_users = F.col("__dp_pids__")
    else:
        n_users = F.col("__res__.n_users")
    return out.select("window",
                      F.col("__res__.percentile_value")
                      .alias("percentile_value"),
                      n_users.alias("n_users"))


def near_dup_dedup_batch(batch: DataFrame,
                         state: Optional[DataFrame],
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         bits: int = 60,
                         num_blocks: int = 4,
                         max_hamming: int = 3,
                         materialize: bool = False) -> "tuple[DataFrame, DataFrame]":
    """One micro-batch of incremental NEAR-dup (simhash) dedup: drop
    batch docs within ``max_hamming`` of (a) any previously-kept doc
    (``state`` = accumulated block table) or (b) a smaller-id doc in the
    same batch. Pigeonhole blocking as in `operators.dedup.simhash_pairs`:
    a pair within Hamming distance num_blocks-1 shares at least one
    exact block, so block-equality joins find every candidate — which is
    why ``max_hamming <= num_blocks - 1`` is REQUIRED (validated below:
    a larger radius would silently miss pairs).

    Returns (kept_docs_with_simhash, kept_block_rows); append the block
    rows to the state table for the next batch. Both joins hash on
    (block_idx, block_val) — state-sized, never corpus x corpus.

    ``materialize=True`` localCheckpoints the shared upstreams (the
    fingerprint table and the duplicate-id set) so the two returned
    frames are cheap anti-joins off already-computed inputs — without it
    each returned frame independently re-runs the fingerprint UDF, the
    joins, and any ``state`` re-read when consumed. The streaming writer
    uses this so the state append cannot observe the same batch's
    output-path write mid-plan.
    """
    from pipelinedp_spark.operators.dedup import simhash_fingerprints

    if max_hamming > num_blocks - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs num_blocks >= "
            f"{max_hamming + 1} (pigeonhole: only pairs within Hamming "
            "distance num_blocks-1 are guaranteed to share a block); got "
            f"num_blocks={num_blocks}")
    block_bits = bits // num_blocks
    mask = (1 << block_bits) - 1
    # Arrow-batched fingerprint UDF (operators.dedup), NOT the pure
    # column-expression simhash64: the expression tree there is
    # per-bit-sized and bloats the task binary.
    fp = (batch.select(F.col(id_col), F.col(text_col))
          .join(simhash_fingerprints(batch, text_col, id_col), id_col))
    if materialize:
        fp = fp.localCheckpoint()
    blocks = fp.select(
        F.col(id_col), F.col("simhash"),
        F.posexplode(F.array(*[
            F.shiftright(F.col("simhash"), i * block_bits)
            .bitwiseAND(F.lit(mask)) for i in range(num_blocks)
        ])).alias("block_idx", "block_val"))

    hamming_vs = lambda other: F.bit_count(
        F.col("simhash").bitwiseXOR(F.col(other)))

    dup_ids = None
    if state is not None:
        st = state.select(F.col("block_idx"), F.col("block_val"),
                          F.col("simhash").alias("state_simhash"))
        vs_state = (blocks.join(st, ["block_idx", "block_val"])
                    .filter(hamming_vs("state_simhash") <= max_hamming)
                    .select(F.col(id_col)).distinct())
        dup_ids = vs_state

    left = blocks.select("block_idx", "block_val",
                         F.col(id_col).alias("id_a"),
                         F.col("simhash").alias("sh_a"))
    right = blocks.select("block_idx", "block_val",
                          F.col(id_col).alias(id_col),
                          F.col("simhash").alias("simhash"))
    in_batch = (right.join(left, ["block_idx", "block_val"])
                .filter((F.col("id_a") < F.col(id_col))
                        & (hamming_vs("sh_a") <= max_hamming))
                .select(F.col(id_col)).distinct())
    dup_ids = in_batch if dup_ids is None else dup_ids.unionByName(
        in_batch).distinct()
    if materialize:
        # Small (duplicate ids only); pins the state-table read so later
        # consumers can't observe concurrent appends to it.
        dup_ids = dup_ids.localCheckpoint()

    kept = fp.join(dup_ids, id_col, "left_anti")
    kept_blocks = blocks.join(dup_ids, id_col, "left_anti") \
        .select(id_col, "block_idx", "block_val", "simhash")
    return kept, kept_blocks


def streaming_near_dup_dedup(stream: DataFrame,
                             output_path: str,
                             state_path: str,
                             checkpoint_dir: str,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             bits: int = 60,
                             num_blocks: int = 4,
                             max_hamming: int = 3):
    """Streaming incremental near-dup dedup via foreachBatch: each
    micro-batch is deduped against the accumulated state-block table
    (parquet at ``state_path``) AND within itself, survivors append to
    ``output_path`` and their blocks to the state table.

    This is the production micro-batch pattern for stateful operators
    whose state is relational (block inverted index), not per-key
    scalars — applyInPandasWithState cannot express the multi-key
    (one doc -> num_blocks block groups) membership test. Caveat,
    documented: a batch replayed after a failure between the two
    appends can duplicate appended rows; an ACID table format's MERGE
    closes that window — out of scope here, the checkpoint still
    guarantees each input file is PROCESSED once.

    Returns the started StreamingQuery.
    """
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        try:
            state = spark.read.parquet(state_path)
        except Exception:
            state = None
        # materialize=True: the fingerprint table and duplicate-id set are
        # localCheckpoint'd inside, so both writes below are cheap
        # anti-joins off already-computed inputs — the fingerprint UDF and
        # the vs-state join run exactly once, and the state append cannot
        # re-read state_path (or observe the output-path write) mid-plan.
        kept, kept_blocks = near_dup_dedup_batch(
            batch_df, state, text_col, id_col, bits, num_blocks,
            max_hamming, materialize=True)
        kept.write.mode("append").parquet(output_path)
        kept_blocks.write.mode("append").parquet(state_path)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def streaming_token_topk(stream: DataFrame,
                         text_col: str = "text",
                         timestamp_col: str = "ts",
                         window_duration: str = "1 minute",
                         watermark_delay: str = "0 seconds",
                         k: int = 10,
                         capacity: int = 1024,
                         timeout_minutes: Optional[int] = None
                         ) -> DataFrame:
    """Streaming heavy hitters (trending tokens) per event-time window
    via the Space-Saving sketch (Metwally et al. 2005, "Efficient
    computation of frequent and top-k elements in data streams") in an
    `applyInPandasWithState` custom stateful operator.

    Per window the state is AT MOST ``capacity`` (token, est_count,
    max_overestimate) counters regardless of vocabulary size — the
    bounded-memory property that makes per-window exact counting
    untenable at stream scale. Arrivals for a token already tracked
    increment it; new tokens evict the minimum counter and inherit its
    count (so ``est_count`` never under-counts, and
    ``max_overestimate`` bounds the inflation — the classic guarantees:
    any token with true count > N/capacity is present). With
    ``capacity`` >= the window's distinct tokens the counts are EXACT.

    Plan: watermark -> explode tokens (per-trigger traffic only — the
    sketch, not the stream, holds history) -> state keyed by window
    start, horizontally partitioned across windows. Each trigger emits
    the current top ``k`` (update mode; downstream dedup by
    (window_start, token) keeps the latest). Eviction tie-breaks are
    deterministic (min count, then lexicographically largest token), so
    results are reproducible for a fixed arrival order. By default state
    lives until the query ends; ``timeout_minutes`` adds a processing-
    time TTL per window (reset on every arrival), the same bounded-state
    compromise as `streaming_exact_dedup` — closed windows stop
    receiving data and expire.

    Returns (window_start, token, est_count, max_overestimate).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (ArrayType, LongType, StringType,
                                   StructField, StructType, TimestampType)

    from pipelinedp_spark.functions import text as T

    out_schema = StructType([
        StructField("window_start", TimestampType()),
        StructField("token", StringType()),
        StructField("est_count", LongType()),
        StructField("max_overestimate", LongType()),
    ])
    state_schema = StructType([
        StructField("tokens", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
    ])
    cap, kk = int(capacity), int(k)
    ms = timeout_minutes
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ms else GroupStateTimeout.NoTimeout)

    toks = (stream.withWatermark(timestamp_col, watermark_delay)
            .select(F.window(F.col(timestamp_col), window_duration)
                    .alias("__w__"),
                    F.explode(T.tokens(F.col(text_col))).alias("token"))
            .filter(F.col("token") != "")
            .select(F.col("__w__.start").alias("window_start"), "token"))

    def topk_fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            t0, c0, e0 = state.get
            sketch = {tok: [int(c), int(e)]
                      for tok, c, e in zip(t0, c0, e0)}
        else:
            sketch = {}
        for pdf in pdfs:
            for tok, n in pdf["token"].value_counts().items():
                n = int(n)
                got = sketch.get(tok)
                if got is not None:
                    got[0] += n
                elif len(sketch) < cap:
                    sketch[tok] = [n, 0]
                else:
                    mn = min(v[0] for v in sketch.values())
                    victim = max(t for t, v in sketch.items()
                                 if v[0] == mn)
                    base = sketch.pop(victim)[0]
                    sketch[tok] = [base + n, base]
        items = sorted(sketch.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update(([t for t, _ in items],
                      [v[0] for _, v in items],
                      [v[1] for _, v in items]))
        if ms:
            state.setTimeoutDuration(ms * 60 * 1000)
        top = items[:kk]
        yield pd.DataFrame({
            "window_start": [key[0]] * len(top),
            "token": [t for t, _ in top],
            "est_count": [v[0] for _, v in top],
            "max_overestimate": [v[1] for _, v in top]})

    return (toks.groupBy("window_start")
            .applyInPandasWithState(topk_fn, out_schema, state_schema,
                                    "update", timeout))


def streaming_distinct_hll(stream: DataFrame,
                           value_col: str = "user_id",
                           timestamp_col: str = "ts",
                           window_duration: str = "1 hour",
                           watermark_delay: str = "0 seconds",
                           p: int = 8,
                           timeout_minutes: Optional[int] = None
                           ) -> DataFrame:
    """Streaming distinct-count per event-time window via the
    deterministic HyperLogLog sketch (`functions.sketches`): state per
    window is at most 2^p register maxima regardless of how many
    distinct values arrive — the bounded-memory replacement for
    `approx_count_distinct`'s engine-private sketch, with md5-derived
    registers so the streaming estimate EQUALS the batch
    `hll_distinct_estimate_by` over the same window's rows (parity
    tested; the register merge is a max, so arrival order and trigger
    boundaries cannot change it).

    Plan: watermark -> project (window_start, value) -> state keyed by
    window start (horizontally partitioned across windows). Each
    trigger re-emits the window's current estimate (update mode;
    downstream dedup by window_start keeps the latest).
    ``timeout_minutes`` adds the same processing-time TTL per window as
    `streaming_token_topk`.

    Returns (window_start, m, nonzero_registers, raw_estimate,
    estimate).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                                   LongType, StructField, StructType,
                                   TimestampType)

    from pipelinedp_spark.functions.sketches import (hll_estimate_py,
                                                     hll_reg_rho_py)

    m = 1 << int(p)
    out_schema = StructType([
        StructField("window_start", TimestampType()),
        StructField("m", LongType()),
        StructField("nonzero_registers", LongType()),
        StructField("raw_estimate", DoubleType()),
        StructField("estimate", DoubleType()),
    ])
    state_schema = StructType([
        StructField("regs", ArrayType(IntegerType())),
        StructField("rhos", ArrayType(IntegerType())),
    ])
    ms = timeout_minutes
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ms else GroupStateTimeout.NoTimeout)

    vals = (stream.withWatermark(timestamp_col, watermark_delay)
            .select(F.window(F.col(timestamp_col), window_duration)
                    .alias("__w__"),
                    F.col(value_col).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .select(F.col("__w__.start").alias("window_start"), "v"))

    def hll_fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            r0, h0 = state.get
            sketch = {int(r): int(h) for r, h in zip(r0, h0)}
        else:
            sketch = {}
        for pdf in pdfs:
            for v in pdf["v"].unique():
                reg, rho = hll_reg_rho_py(v, p)
                if rho > sketch.get(reg, 0):
                    sketch[reg] = rho
        state.update((list(sketch.keys()), list(sketch.values())))
        if ms:
            state.setTimeoutDuration(ms * 60 * 1000)
        raw, est = hll_estimate_py(sketch, p)
        yield pd.DataFrame({
            "window_start": [key[0]],
            "m": [m],
            "nonzero_registers": [len(sketch)],
            "raw_estimate": [raw],
            "estimate": [est]})

    return (vals.groupBy("window_start")
            .applyInPandasWithState(hll_fn, out_schema, state_schema,
                                    "update", timeout))


def line_dedup_batch(batch: DataFrame,
                     state: Optional[DataFrame],
                     text_col: str = "text",
                     id_col: str = "doc_id",
                     min_docs: int = 2,
                     delimiter: str = "\n",
                     materialize: bool = False
                     ) -> "tuple[DataFrame, DataFrame]":
    """One micro-batch of incremental corpus line dedup (the streaming
    twin of `operators.dedup.line_dedup`): a line is boilerplate once
    the number of distinct documents that ever contained it — across
    ALL batches so far plus this one — reaches ``min_docs``; such lines
    are stripped from THIS batch's documents (earlier batches were
    already emitted — the inherent one-pass tradeoff, so early copies
    of late-detected boilerplate survive; a compaction re-run of the
    batch operator over the emitted corpus closes that gap offline).

    ``state`` is the accumulated (line hash -> distinct-doc count)
    table from prior batches (None on the first batch). Returns
    (cleaned_docs, new_state); persist new_state for the next batch —
    it REPLACES the old state (counts are merged, not appended).

    Scale shape: per batch one posexplode + two map-side-combinable
    aggs on the 60-bit line hash; the state merge is a groupBy over
    state+batch hash counts (state is distinct-line-sized, not
    corpus-sized); ``materialize=True`` localCheckpoints the merged
    counts so the cleaned output and the returned state don't each
    re-run the merge (and the state write can never observe its own
    consumer mid-plan).
    """
    from pipelinedp_spark.functions import text as T
    from pipelinedp_spark.operators.dedup import _rebuild_kept_lines

    lines = batch.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col),
                             _re.escape(delimiter)))
        .alias("__pos__", "__line__"))
    lh = T.hex_to_long(F.md5(F.col("__line__"))).alias("__lh__")
    batch_counts = (lines.filter(F.trim(F.col("__line__")) != "")
                    .select(F.col(id_col), lh)
                    .groupBy("__lh__", id_col).agg(F.first(F.lit(1)))
                    .groupBy("__lh__")
                    .agg(F.count(F.lit(1)).alias("__nd__")))
    merged = batch_counts if state is None else (
        batch_counts.unionByName(state.select("__lh__", "__nd__"))
        .groupBy("__lh__").agg(F.sum("__nd__").cast("long")
                               .alias("__nd__")))
    if materialize:
        merged = merged.localCheckpoint()
    boiler = (merged.filter(F.col("__nd__") >= min_docs)
              .select("__lh__", F.lit(True).alias("__boiler__")))
    tagged = (lines.withColumn("__lh__", lh)
              .join(boiler, "__lh__", "left")
              .withColumn(
                  "__removed__",
                  F.coalesce(F.col("__boiler__"), F.lit(False))
                  & (F.trim(F.col("__line__")) != "")))
    return _rebuild_kept_lines(tagged, id_col, delimiter), merged


def streaming_line_dedup(stream: DataFrame,
                         output_path: str,
                         state_path: str,
                         checkpoint_dir: str,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         min_docs: int = 2,
                         delimiter: str = "\n"):
    """Streaming ingest-time boilerplate removal via foreachBatch:
    each micro-batch's documents are scrubbed of lines whose
    cumulative distinct-doc count (state parquet at ``state_path``)
    reaches ``min_docs``; cleaned docs append to ``output_path`` and
    the merged counts OVERWRITE the state table (same relational-state
    micro-batch pattern, and the same replay caveat, as
    `streaming_near_dup_dedup`). Returns the started StreamingQuery."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        try:
            state = spark.read.parquet(state_path)
        except Exception:
            state = None
        cleaned, new_state = line_dedup_batch(
            batch_df, state, text_col, id_col, min_docs, delimiter,
            materialize=True)
        cleaned.write.mode("append").parquet(output_path)
        # merged counts REPLACE the state; localCheckpoint above means
        # this write never re-reads state_path mid-overwrite.
        new_state.write.mode("overwrite").parquet(state_path)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def sentence_dedup_batch(batch: DataFrame,
                         state: Optional[DataFrame],
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         min_docs: int = 2,
                         min_chars: int = 0,
                         materialize: bool = False
                         ) -> "tuple[DataFrame, DataFrame]":
    """One micro-batch of incremental SENTENCE dedup (streaming twin of
    `operators.dedup.sentence_dedup`, same one-pass semantics and state
    contract as `line_dedup_batch`): a trimmed sentence is boilerplate
    once its cumulative distinct-doc count reaches ``min_docs``;
    sentences shorter than ``min_chars`` are exempt. State is the
    accumulated (sentence hash -> distinct-doc count) table; returns
    (cleaned_docs, new_state) with new_state REPLACING the old.

    Scale shape identical to `line_dedup_batch` — the only differences
    are the splitter (regexp sentence matches, see
    `dedup.SENTENCE_PATTERN`), the trim-normalized hash key, and the
    '' rebuild delimiter (each match carries its own spacing)."""
    from pipelinedp_spark.functions import text as T
    from pipelinedp_spark.operators.dedup import (SENTENCE_PATTERN,
                                                  _rebuild_kept_lines)

    sents = batch.select(
        F.col(id_col),
        F.posexplode(F.regexp_extract_all(F.col(text_col),
                                          F.lit(SENTENCE_PATTERN), 0))
        .alias("__pos__", "__line__"))
    norm = F.trim(F.col("__line__"))
    countable = (norm != "") & (F.length(norm) >= min_chars)
    lh = T.hex_to_long(F.md5(norm)).alias("__lh__")
    batch_counts = (sents.filter(countable)
                    .select(F.col(id_col), lh)
                    .groupBy("__lh__", id_col).agg(F.first(F.lit(1)))
                    .groupBy("__lh__")
                    .agg(F.count(F.lit(1)).alias("__nd__")))
    merged = batch_counts if state is None else (
        batch_counts.unionByName(state.select("__lh__", "__nd__"))
        .groupBy("__lh__").agg(F.sum("__nd__").cast("long")
                               .alias("__nd__")))
    if materialize:
        merged = merged.localCheckpoint()
    boiler = (merged.filter(F.col("__nd__") >= min_docs)
              .select("__lh__", F.lit(True).alias("__boiler__")))
    tagged = (sents.withColumn("__lh__", lh)
              .join(boiler, "__lh__", "left")
              .withColumn(
                  "__removed__",
                  F.coalesce(F.col("__boiler__"), F.lit(False))
                  & countable))
    rebuilt = _rebuild_kept_lines(tagged, id_col, "")
    # Keep empty/NULL-text docs (zero regexp matches → zero exploded
    # rows) — same corpus-membership contract as the batch operator.
    cleaned = (batch.select(id_col).join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
        F.coalesce("n_removed", F.lit(0)).cast("long")
        .alias("n_removed")))
    return cleaned, merged


def semantic_dedup_batch(batch: DataFrame,
                         state: Optional[DataFrame],
                         centroids,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         cosine_threshold: float = 0.7,
                         max_cluster_rows: int = 500_000,
                         materialize: bool = False
                         ) -> "tuple[DataFrame, DataFrame]":
    """One micro-batch of incremental SEMANTIC dedup — the streaming
    twin of `operators.semdedup.semantic_dedup` (same state contract as
    `near_dup_dedup_batch`): a batch vector is a duplicate iff its
    round(cosine, 6) >= ``cosine_threshold`` against (a) any previously
    KEPT vector in the same quantizer cell (``state``) or (b) any
    smaller-id same-cell vector of the same batch (kept or not — the
    batch operator's earlier-id rule). ``centroids`` is REQUIRED: cells
    must be stable across batches, so the quantizer trains offline (or
    on the first batch) and is passed in — retraining per batch would
    silently re-shard the state.

    Returns (flags, new_state): flags = (id_col, cell, is_dup) for the
    batch's rows; new_state = state plus the batch's kept
    (id_col, cell, vec) rows, REPLACING the old state.

    Scale shape: cell assignment is one Arrow pass; the comparison is
    the same per-cell numpy mat-mul as the batch operator
    (groupBy(cell).applyInPandas), sized by state+batch per cell and
    guarded by ``max_cluster_rows``; state never joins corpus x corpus.
    """
    import numpy as np
    from pipelinedp_spark.operators.semdedup import assign_cells_udf

    if centroids is None:
        raise ValueError(
            "semantic_dedup_batch requires fixed centroids: train once "
            "offline (train_ivf_centroids) so cells are stable across "
            "batches")
    src = batch.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_vec"))
    cells = src.withColumn("cell",
                           assign_cells_udf(centroids)(F.col("_vec")))         .withColumn("__st__", F.lit(False))
    if materialize:
        cells = cells.localCheckpoint()
    # Only state rows in cells the BATCH touches can influence a batch
    # flag; a cell with no batch row would run its O(n^2) mat-mul just
    # to discard every result. Semi-join the state to the batch's cell
    # set first so per-batch cost scales with the batch's footprint,
    # not the full accumulated state.
    merged = cells if state is None else cells.unionByName(
        state.select(F.col("_id"), F.col("_vec"), F.col("cell"),
                     F.lit(True).alias("__st__"))
        .join(cells.select("cell").distinct(), "cell", "left_semi")
        .select("_id", "_vec", "cell", "__st__"))

    thr = float(cosine_threshold)
    cap = int(max_cluster_rows)

    def _mark(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > cap:
            raise ValueError(
                f"cell {int(pdf['cell'].iloc[0])} has {len(pdf)} rows "
                f"(state+batch) > max_cluster_rows={cap}; raise "
                "num_clusters when training the quantizer")
        # state rows first (they are always "earlier"), then batch
        # rows by ascending id — the lower triangle then encodes
        # exactly the vs-state + earlier-in-batch rule.
        pdf = pdf.sort_values(["__st__", "_id"],
                              ascending=[False, True])
        mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        cos = np.round(unit @ unit.T, 6)
        hit = np.tril(cos >= thr, k=-1).any(axis=1)
        keep = ~pdf["__st__"].to_numpy()
        return pd.DataFrame({id_col: pdf["_id"].to_numpy()[keep],
                             "cell": pdf["cell"].to_numpy()[keep],
                             "is_dup": hit[keep]})

    flags = (merged.groupBy("cell")
             .applyInPandas(_mark,
                            schema=f"{id_col} long, cell int, "
                                   f"is_dup boolean"))
    if materialize:
        flags = flags.localCheckpoint()
    kept = (cells.join(
        flags.filter(~F.col("is_dup")).select(F.col(id_col).alias("_id")),
        "_id").select("_id", "_vec", "cell"))
    new_state = kept if state is None else state.select(
        "_id", "_vec", "cell").unionByName(kept)
    if materialize:
        # Pins the old-state read: the streaming writer OVERWRITES the
        # state path this plan reads from — unmaterialized, the write
        # would delete the files mid-scan.
        new_state = new_state.localCheckpoint()
    return flags, new_state


def streaming_semantic_dedup(stream: DataFrame,
                             centroids,
                             output_path: str,
                             state_path: str,
                             checkpoint_dir: str,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             cosine_threshold: float = 0.7,
                             max_cluster_rows: int = 500_000):
    """Streaming ingest-time semantic dedup via foreachBatch — the
    SemDeDup twin of `streaming_near_dup_dedup`, with the same state
    overwrite contract and replay caveat (an at-least-once retry of a
    batch can double-append to the output; state stays correct because
    it is rebuilt from scratch each write). Returns the started
    StreamingQuery."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        try:
            state = spark.read.parquet(state_path)
        except Exception:
            state = None
        flags, new_state = semantic_dedup_batch(
            batch_df, state, centroids, vec_col, id_col,
            cosine_threshold, max_cluster_rows, materialize=True)
        flags.write.mode("append").parquet(output_path)
        new_state.write.mode("overwrite").parquet(state_path)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def streaming_sentence_dedup(stream: DataFrame,
                             output_path: str,
                             state_path: str,
                             checkpoint_dir: str,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             min_docs: int = 2,
                             min_chars: int = 0):
    """Streaming ingest-time sentence-boilerplate removal via
    foreachBatch — `streaming_line_dedup` with the sentence splitter;
    same state overwrite contract and replay caveat. Returns the
    started StreamingQuery."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        try:
            state = spark.read.parquet(state_path)
        except Exception:
            state = None
        cleaned, new_state = sentence_dedup_batch(
            batch_df, state, text_col, id_col, min_docs, min_chars,
            materialize=True)
        cleaned.write.mode("append").parquet(output_path)
        new_state.write.mode("overwrite").parquet(state_path)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def streaming_exact_dedup_store(stream: DataFrame,
                                store_name: str,
                                output_path: str,
                                checkpoint_dir: str,
                                text_col: str = "text",
                                id_col: str = "doc_id"):
    """Streaming ingest-time EXACT dedup against the persisted bucketed
    fingerprint store (`operators.dedup.build_exact_store`) — unlike
    `streaming_exact_dedup` (applyInPandasWithState, state dies with
    the query), the store outlives the stream, is shared with batch
    jobs (`incremental_exact_dedup`), and anti-joins each micro-batch
    with zero Exchange on the store side.

    Per batch: first occurrence per fingerprint WITHIN the batch
    (min id — map-side-combinable argmin, no window), anti-join the
    store, append survivors to ``output_path`` and their fingerprints
    to the store (bucket-aligned append). EXACTLY-ONCE: an
    at-least-once replay of a micro-batch is suppressed by the
    ``{store}_ingest_log`` batch-id guard (`store.apply_batch_once`),
    so neither the output nor the fps table double-writes (the
    anti-join state was already replay-insensitive; the OUTPUT append
    was not, until the guard). Takedowns issued mid-stream
    (`remove_from_exact_store` between triggers) take effect at the
    next trigger — the tombstone table is refreshed per batch. The
    caller builds the store first (possibly from an empty
    reference). Returns the started StreamingQuery."""
    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_exact_batch_idempotent(
            batch_df, store_name, batch_id, text_col, id_col,
            sink=lambda surv: surv.select(id_col, "fingerprint")
            .write.mode("append").parquet(output_path),
            run_id=checkpoint_dir)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def ingest_exact_batch_idempotent(batch_df: DataFrame,
                                  store_name: str,
                                  batch_id: int,
                                  text_col: str = "text",
                                  id_col: str = "doc_id",
                                  sink=None,
                                  run_id: str = "") -> bool:
    """One exact-store ingest micro-batch, applied EXACTLY ONCE — the
    foreachBatch body of `streaming_exact_dedup_store`, shared so
    batch replays (and the oracle mirrors) drive the identical path.
    Dedups within the batch (first doc_id per fingerprint), anti-joins
    the accumulated store (honoring tombstoned takedowns — the
    tombstone table is refreshed per batch, so a mid-stream
    `remove_from_exact_store` takes effect at the next trigger),
    calls ``sink(survivors)`` INSIDE the guarded apply (so a replay
    skips the output write too), then appends the survivors'
    fingerprints bucket-aligned. Returns True if applied, False if
    skipped as an ingest-log replay (`store.apply_batch_once`)."""
    from pipelinedp_spark import store as _store
    from pipelinedp_spark.functions import text as TX
    s = batch_df.sparkSession
    # Each micro-batch runs in a CLONED session with its own
    # table-relation cache; resolve the store through the batch's
    # session and refresh first, or the file listing cached at
    # trigger 1 hides every later append (reproduced: cross-batch
    # duplicates silently survived).
    _store.refresh_table(s, f"{store_name}_fps")
    if s.catalog.tableExists(f"{store_name}_tombstones"):
        _store.refresh_table(s, f"{store_name}_tombstones")
    nbuck = int(store.read_meta(s, store_name)
                ["num_buckets"])
    has_prov = _store.table_has_prov(s, f"{store_name}_fps")

    def _apply() -> None:
        fp = TX.rolling_fingerprint(F.col(text_col))
        firsts = (batch_df.withColumn("fingerprint", fp)
                  .groupBy("fingerprint")
                  .agg(F.min(id_col).alias(id_col)))
        fps = s.table(f"{store_name}_fps")
        ts = _store.tombstones(s, store_name)
        if ts is not None:
            fps = fps.join(ts, "fingerprint", "left_anti")
        survivors = (firsts.repartition(nbuck, "fingerprint")
                     .join(fps, "fingerprint", "left_anti")
                     .localCheckpoint())
        if sink is not None:
            sink(survivors)
        out = survivors.select("fingerprint")
        if has_prov:
            # provenance stamp: lets the guard roll back this append
            # if we crash before the ingest-log row lands
            out = _store.with_prov(out, run_id or "", batch_id)
        (out.write.mode("append").format("parquet")
         .bucketBy(nbuck, "fingerprint").sortBy("fingerprint")
         .saveAsTable(f"{store_name}_fps"))

    return _store.apply_batch_once(
        s, store_name, batch_id, _apply, run_id=run_id,
        stamped={"_fps": "fingerprint"} if has_prov else None)


def streaming_near_dup_store(stream: DataFrame,
                             store_name: str,
                             output_path: str,
                             checkpoint_dir: str,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             jaccard_threshold: float = 0.8):
    """Streaming NEAR-dup ingest dedup against the persisted bucketed
    MinHash store (`operators.dedup.build_minhash_store`) — the
    near-dup sibling of `streaming_exact_dedup_store` and the
    store-backed alternative to `streaming_near_dup_dedup` (whose
    simhash-block state is private to the stream; this store is shared
    with batch `incremental_near_dup` jobs and outlives the query).

    Per batch: (1) within-batch near-dups drop (MinHash+LSH pairs with
    the STORE's fingerprint knobs, exact-Jaccard verified, larger id
    loses), (2) survivors anti-match the store (zero store-side
    Exchange), (3) survivors append to the output AND their bands +
    shingles append to the store bucket-aligned via
    `build_minhash_store(mode='append')`. EXACTLY-ONCE: replayed
    micro-batches are suppressed by the ``{store}_ingest_log``
    batch-id guard (`store.apply_batch_once`) — candidate joins were
    already duplicate-insensitive, but the output append and the
    per-increment bucket cap were not. Mid-stream takedowns
    (`remove_from_minhash_store` between triggers) take effect at the
    next trigger (per-batch tombstone refresh). Returns the started
    StreamingQuery."""
    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_near_dup_batch_idempotent(
            batch_df, store_name, batch_id, text_col, id_col,
            jaccard_threshold,
            sink=lambda surv: surv.write.mode("append")
            .parquet(output_path), run_id=checkpoint_dir)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def ingest_near_dup_batch_idempotent(batch_df: DataFrame,
                                     store_name: str,
                                     batch_id: int,
                                     text_col: str = "text",
                                     id_col: str = "doc_id",
                                     jaccard_threshold: float = 0.8,
                                     sink=None,
                                     run_id: str = "") -> bool:
    """One near-dup-store ingest micro-batch, applied EXACTLY ONCE —
    the foreachBatch body of `streaming_near_dup_store`, shared so
    batch replays (and the oracle mirrors) drive the identical path.
    Within-batch MinHash+LSH losers drop, survivors anti-match the
    accumulated store with the STORE's fingerprint knobs (honoring
    tombstoned takedowns — refreshed per batch, so a mid-stream
    `remove_from_minhash_store` takes effect at the next trigger),
    ``sink(survivors)`` runs INSIDE the guarded apply, and survivors'
    bands + shingles append bucket-aligned. Returns True if applied,
    False if skipped as an ingest-log replay — the output append and
    the per-increment max_bucket_size cap are NOT
    multiplicity-insensitive, even though the candidate joins are.

    A crash between apply and log is CONVERGENT (round 12, same
    protocol as BM25/exact): the batch's bands/shingles rows carry
    (run_id, batch_id) provenance stamps, so the re-run rolls them
    back before re-applying. Without the rollback the re-run would
    anti-match the batch against its OWN crashed attempt's bands —
    every doc reads as a near-dup of itself and the sink silently
    receives nothing (the batch's output would be lost, worse than a
    duplicate)."""
    from pipelinedp_spark import store as _store
    from pipelinedp_spark.operators import dedup as D
    s = batch_df.sparkSession
    for t in (f"{store_name}_bands", f"{store_name}_shingles"):
        _store.refresh_table(s, t)
    if s.catalog.tableExists(f"{store_name}_tombstones"):
        _store.refresh_table(s, f"{store_name}_tombstones")
    m = store.read_meta(s, store_name)
    k, num_hashes, rpb = (int(m["k"]), int(m["num_hashes"]),
                          int(m["rows_per_band"]))
    nbuck = int(m["num_buckets"])

    has_prov = _store.table_has_prov(s, f"{store_name}_bands")

    def _apply() -> None:
        # ONE signature pass for the whole micro-batch: pair
        # generation, the store anti-match and the store append all
        # consume the same checkpointed (id, shingles, band-hash)
        # profile instead of re-tokenizing/re-signing the batch text
        # at every step (was 3 signature passes + up to 6 shingle
        # passes per trigger — the bulk of the trigger floor).
        prof = D.minhash_profile(batch_df, text_col, id_col, k,
                                 num_hashes, rpb).localCheckpoint()
        pairs = D.minhash_lsh_pairs_from_profile(
            prof, id_col, jaccard_threshold)
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        within = batch_df.join(losers, id_col, "left_anti")
        survivors = D.incremental_near_dup(
            within, store_name, text_col, id_col,
            jaccard_threshold, profile=prof).localCheckpoint()
        if sink is not None:
            sink(survivors)
        D.build_minhash_store(survivors, store_name, text_col, id_col,
                              k, num_hashes, rpb, nbuck, mode="append",
                              prov=(run_id or "", int(batch_id)),
                              profile=prof)
        prof.unpersist()

    return _store.apply_batch_once(
        s, store_name, batch_id, _apply, run_id=run_id,
        stamped=({"_bands": "bh", "_shingles": "id"}
                 if has_prov else None))


def streaming_ann_ingest(stream: DataFrame,
                         store_name: str,
                         checkpoint_dir: str,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id"):
    """Streaming ingest into the persisted IVF-PQ vector index
    (`operators.similarity.build_ann_index`): each micro-batch encodes
    its vectors with the store's PERSISTED models (mode='append' —
    never retrains, so existing codes keep their cells) and lands them
    in their cell partitions; `ann_search_from_index` sees them on its
    next run. The caller builds the index first (training on a
    representative sample). EXACTLY-ONCE: an at-least-once replay is
    suppressed by the ``{store}_ingest_log`` batch-id guard
    (`store.apply_batch_once`) — without it a replayed batch appends
    duplicate code rows that occupy extra top-k slots in
    `ann_search_from_index` until `compact_store(kind='ann')` drops
    them (compaction remains the recovery for the one-batch
    crash-between-apply-and-log window). Returns the started
    StreamingQuery."""
    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_ann_batch_idempotent(batch_df, store_name, batch_id,
                                    vec_col, id_col,
                                    run_id=checkpoint_dir)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def ingest_ann_batch_idempotent(batch_df: DataFrame,
                                store_name: str,
                                batch_id: int,
                                vec_col: str = "embedding",
                                id_col: str = "vec_id",
                                run_id: str = "") -> bool:
    """One IVF-PQ index ingest micro-batch, applied EXACTLY ONCE — the
    foreachBatch body of `streaming_ann_ingest`, shared so batch
    replays (and the oracle mirrors) drive the identical path: refresh
    the model tables, encode with the PERSISTED quantizers
    (mode='append', never retrains), land codes in their cell
    partitions. Returns True if applied, False if skipped as an
    ingest-log replay (`store.apply_batch_once`) — without the guard a
    replayed batch appends duplicate code rows that occupy extra top-k
    slots until compaction. A crash between apply and log is
    CONVERGENT (round 12): the code rows carry (run_id, batch_id)
    provenance, so the re-run rolls the half-applied partition rows
    back before re-encoding."""
    from pipelinedp_spark import store as _store
    from pipelinedp_spark.operators.similarity import build_ann_index
    s = batch_df.sparkSession
    for t in (f"{store_name}_meta", f"{store_name}_centroids",
              f"{store_name}_codebooks"):
        _store.refresh_table(s, t)
    has_prov = _store.table_has_prov(s, f"{store_name}_codes")
    return _store.apply_batch_once(
        s, store_name, batch_id,
        lambda: build_ann_index(batch_df, store_name, corpus_id=id_col,
                                corpus_vec=vec_col, mode="append",
                                prov=(run_id or "", int(batch_id))),
        run_id=run_id,
        stamped=({"_codes": ("partition", "cell")}
                 if has_prov else None))


def ingest_span_batch_idempotent(batch_df: DataFrame,
                                 store_name: str,
                                 batch_id: int,
                                 text_col: str = "text",
                                 id_col: str = "doc_id",
                                 run_id: str = "") -> bool:
    """Append one micro-batch of REFERENCE documents to the persisted
    span-decontamination index (`dedup.build_span_store`) EXACTLY ONCE —
    e.g. an eval/benchmark suite that keeps growing while training
    batches are span-cut against it. Fingerprint knobs (min_len,
    seed_len) are inherited from the store meta so a streamed increment
    can never anchor differently from the build; replays are suppressed
    by the ingest log (`store.apply_batch_once`) — anchor rows are
    anti-join-insensitive, but per-append small files and the texts
    table are not free to duplicate. (Tombstones are a SERVING-side
    concern for this kind: the ingest path appends reference anchors
    and never reads them — `incremental_decontaminate_spans` applies
    takedowns at read time.)"""
    from pipelinedp_spark import store as _store
    from pipelinedp_spark.operators import dedup as D
    s = batch_df.sparkSession
    for t in (f"{store_name}_anchors", f"{store_name}_texts",
              f"{store_name}_meta"):
        _store.refresh_table(s, t)
    m = store.read_meta(s, store_name)
    has_prov = _store.table_has_prov(s, f"{store_name}_anchors")
    return _store.apply_batch_once(
        s, store_name, batch_id,
        lambda: D.build_span_store(batch_df, store_name, text_col,
                                   id_col, min_len=int(m["min_len"]),
                                   seed_len=int(m["seed_len"]),
                                   mode="append",
                                   prov=(run_id or "", int(batch_id))),
        run_id=run_id,
        stamped=({"_anchors": "ah", "_texts": "id"}
                 if has_prov else None))


def streaming_span_ingest(stream: DataFrame,
                          store_name: str,
                          checkpoint_dir: str,
                          text_col: str = "text",
                          id_col: str = "doc_id"):
    """Streaming ingest into the persisted span-decontamination index —
    the span member of the store family's streaming faces (exact /
    minhash / ann / bm25 / span / phash all share the exactly-once
    ingest-log contract since round 11). The caller builds the store
    first (possibly from an empty reference). Returns the started
    StreamingQuery."""
    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_span_batch_idempotent(batch_df, store_name, batch_id,
                                     text_col, id_col,
                                     run_id=checkpoint_dir)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def ingest_phash_batch_idempotent(batch_df: DataFrame,
                                  store_name: str,
                                  batch_id: int,
                                  binary_col: str = "image",
                                  id_col: str = "doc_id",
                                  run_id: str = "") -> bool:
    """Append one micro-batch of REFERENCE images to the persisted
    pHash dedup index (`multimodal.build_phash_store`) EXACTLY ONCE:
    hashes land as bit-block rows + (ph, id) member rows bucket-aligned
    with the store's knobs (max_hamming / num_blocks inherited from
    meta). Duplicate member rows from a replay would be tolerated by
    the takedown's existence-based survivorship, but the guard keeps
    the members table an exact image of the ingested corpus (and the
    blocks table free of per-replay small files). (Tombstones are a
    SERVING-side concern for this kind: ingest appends reference
    hashes and never reads them — `incremental_phash_dedup` applies
    takedowns at read time.)"""
    from pipelinedp_spark import store as _store
    from pipelinedp_spark.operators import multimodal as MM
    s = batch_df.sparkSession
    for t in (f"{store_name}_blocks", f"{store_name}_members",
              f"{store_name}_meta"):
        _store.refresh_table(s, t)
    m = store.read_meta(s, store_name)
    has_prov = _store.table_has_prov(s, f"{store_name}_blocks")
    return _store.apply_batch_once(
        s, store_name, batch_id,
        lambda: MM.build_phash_store(batch_df, store_name, binary_col,
                                     id_col,
                                     max_hamming=int(m["max_hamming"]),
                                     num_blocks=int(m["num_blocks"]),
                                     mode="append",
                                     prov=(run_id or "", int(batch_id))),
        run_id=run_id,
        stamped=({"_blocks": "bk", "_members": "ph"}
                 if has_prov else None))


def streaming_phash_ingest(stream: DataFrame,
                           store_name: str,
                           checkpoint_dir: str,
                           binary_col: str = "image",
                           id_col: str = "doc_id"):
    """Streaming ingest into the persisted pHash image-dedup index —
    the multimodal member of the store family's streaming faces. The
    caller builds the store first (possibly empty). Returns the
    started StreamingQuery."""
    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_phash_batch_idempotent(batch_df, store_name, batch_id,
                                      binary_col, id_col,
                                      run_id=checkpoint_dir)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def append_bm25_batch_idempotent(batch_df: DataFrame,
                                 store_name: str,
                                 batch_id: int,
                                 text_col: str = "text",
                                 id_col: str = "doc_id",
                                 run_id: str = "") -> bool:
    """Append one micro-batch to a persisted BM25 index EXACTLY ONCE.

    Unlike the anti-join stores (exact/minhash/span/phash — replay-safe
    because duplicate index rows can't change a semi/anti-join) and the
    ANN store (duplicates compactable by id), BM25 appends are NOT
    multiplicity-insensitive: a replayed batch double-counts tf, df and
    the n_docs/total_dl scalars, silently corrupting every score. The
    guard is the standard transactional-sink emulation, shared by the
    whole store family since round 11 (`store.apply_batch_once`): a
    ``{store}_ingest_log`` table records processed batch ids; a replay
    of a logged id is a no-op. Returns True if the batch was applied,
    False if skipped as a replay.

    A crash BETWEEN append and log is CONVERGENT (round 12): the
    batch's postings/terms rows are provenance-stamped with
    (run_id, batch_id), so the re-run — Structured Streaming replays
    the batch because its checkpoint never committed — finds the
    stamps with no log row, rewrites both tables without them,
    restores the meta scalars from the cleaned postings
    (`retrieval.restore_bm25_meta` — exact, the scalars are derivable
    from the live postings), and applies fresh: bit-identical to a
    crash-free run. Stores built before round 12 (no stamp columns)
    keep the documented one-batch window; `compact_store` also
    repairs it."""
    from pipelinedp_spark import store as _store
    from pipelinedp_spark.operators.retrieval import (
        build_bm25_index, restore_bm25_meta)
    s = batch_df.sparkSession
    has_prov = _store.table_has_prov(s, f"{store_name}_postings")

    def _apply() -> None:
        for t in (f"{store_name}_postings", f"{store_name}_terms",
                  f"{store_name}_meta"):
            _store.refresh_table(s, t)
        build_bm25_index(batch_df, store_name, text_col=text_col,
                         id_col=id_col, mode="append",
                         prov=(run_id or "", int(batch_id)))

    return _store.apply_batch_once(
        s, store_name, batch_id, _apply, run_id=run_id,
        stamped=({"_postings": "term", "_terms": "term"}
                 if has_prov else None),
        restore_fn=lambda: restore_bm25_meta(s, store_name))


def streaming_bm25_ingest(stream: DataFrame,
                          store_name: str,
                          checkpoint_dir: str,
                          text_col: str = "text",
                          id_col: str = "doc_id"):
    """Streaming ingest into the persisted BM25 inverted index
    (`operators.retrieval.build_bm25_index`) — the last store-family
    member to get a streaming face: each micro-batch appends its
    postings and df segment bucket-aligned and refreshes the
    n_docs/total_dl/avgdl scalars exactly, so `bm25_topk_from_index`
    between triggers always serves scores identical to a from-scratch
    index over everything ingested so far. At-least-once replays are
    suppressed by the ``{store}_ingest_log`` batch-id guard
    (`append_bm25_batch_idempotent`) because BM25 appends, unlike the
    anti-join stores, are corrupted by duplicates. The caller builds
    the index first (possibly from an empty corpus). Returns the
    started StreamingQuery."""
    def _process(batch_df: DataFrame, batch_id: int) -> None:
        append_bm25_batch_idempotent(batch_df, store_name, batch_id,
                                     text_col, id_col,
                                     run_id=checkpoint_dir)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def streaming_cluster_assign(stream: DataFrame, centroids,
                             vec_col: str = "embedding",
                             quant_scale: int = 1 << 20) -> DataFrame:
    """Attach a k-means `cluster` column to a stream of embeddings
    against FIXED centroids (from `clustering.kmeans_fit` offline).
    Assignment is a stateless codegen expression (k dot-product folds,
    no state store, no shuffle), so it runs identically on batch and
    streaming DataFrames — the rare operator whose streaming twin is
    the operator itself."""
    from pipelinedp_spark.operators.clustering import kmeans_assign_expr

    vd = F.transform(
        F.transform(F.col(vec_col).cast("array<double>"),
                    lambda x: F.floor(x * F.lit(float(quant_scale))
                                      + F.lit(0.5)).cast("long")),
        lambda x: x.cast("double"))
    return stream.withColumn("cluster", kmeans_assign_expr(vd, centroids))


def streaming_cluster_counts(stream: DataFrame, centroids,
                             ts_col: Optional[str] = None,
                             window: str = "1 minute",
                             watermark: str = "2 minutes",
                             vec_col: str = "embedding",
                             quant_scale: int = 1 << 20) -> DataFrame:
    """Topic-drift monitor: per-cluster arrival counts, optionally in
    event-time windows. With `ts_col`, state is watermark-bounded
    (late data beyond `watermark` is dropped and window state is
    evicted — the 100 TB/day stream never accumulates unbounded
    state); without, it is a running total for complete-mode sinks."""
    asg = streaming_cluster_assign(stream, centroids, vec_col,
                                   quant_scale)
    if ts_col is not None:
        return (asg.withWatermark(ts_col, watermark)
                .groupBy(F.window(F.col(ts_col), window), "cluster")
                .count())
    return asg.groupBy("cluster").count()


def streaming_funnel(stream: DataFrame,
                     steps,
                     user_col: str = "user_id",
                     type_col: str = "event_type",
                     ts_col: str = "ts") -> DataFrame:
    """Custom stateful operator: online ordered-funnel tracking via
    applyInPandasWithState. State per user = the completion times of
    the steps reached so far; each micro-batch advances the greedy
    state machine (earliest step-1 time, then earliest later step-2,
    ...), which computes exactly the batch `funnel.funnel_users`
    depths WHEN events arrive in per-user timestamp order across
    batches (replay sorted backfills, or a watermark-reordered
    upstream; out-of-order deliveries can only under-count — document
    the contract, don't silently repair it). Emits (user, completed,
    last_ts) in update mode; state is one small array per user,
    partitioned by user hash — horizontally scalable, never a
    per-user event list."""
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)
    from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                                   StructField, StructType)

    steps = list(steps)
    out_schema = StructType([
        StructField(user_col, LongType()),
        StructField("completed", IntegerType()),
        StructField("last_ts", LongType()),
    ])
    state_schema = StructType([
        StructField("times", ArrayType(LongType())),
    ])

    def funnel_fn(key, pdfs, state: "GroupState"):
        times = list(state.get[0]) if state.exists else []
        rows = []
        for pdf in pdfs:
            for t, ty in zip(pdf[ts_col].tolist(),
                             pdf[type_col].tolist()):
                rows.append((int(t), str(ty)))
        rows.sort()
        advanced = False
        for t, ty in rows:
            if (len(times) < len(steps) and ty == steps[len(times)]
                    and (not times or t > times[-1])):
                times.append(t)
                advanced = True
        if advanced:
            state.update((times,))
            yield pd.DataFrame({
                user_col: [int(key[0])],
                "completed": [len(times)],
                "last_ts": [times[-1]],
            })

    return (stream.select(F.col(user_col), F.col(type_col),
                          F.col(ts_col))
            .groupBy(user_col)
            .applyInPandasWithState(funnel_fn, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def streaming_window_counts(stream: DataFrame,
                            ts_col: str = "ts",
                            group_col: str = "event_type",
                            window: str = "1 hour",
                            watermark: str = "2 hours") -> DataFrame:
    """Watermark-bounded per-(group, window) arrival counts — the
    incremental half of the anomaly monitor (state evicts once the
    watermark passes a window; a 100 TB/day stream holds only open
    windows). Score the resulting count table with
    `funnel.anomaly_scores` per trigger or on a cadence."""
    return (stream.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("win"),
                     F.col(group_col))
            .count())


def streaming_interval_join(left: DataFrame,
                            right: DataFrame,
                            on: str,
                            left_ts: str = "l_ts",
                            right_ts: str = "r_ts",
                            lower_s: int = 0,
                            upper_s: int = 3600,
                            watermark: str = "2 hours",
                            how: str = "inner") -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event
    with right events of the same key whose timestamp falls in
    ``[left_ts - lower_s, left_ts + upper_s]`` (e.g. clicks joined to
    the views they followed). Both sides carry a watermark AND the
    join carries a time-range predicate — the two conditions Spark
    needs to bound the join state (each side evicts rows older than
    watermark + range; without them a stream-stream join buffers
    forever). Timestamp columns must be real timestamps and distinct
    names across the two sides."""
    if left_ts == right_ts or on in (left_ts, right_ts):
        raise ValueError("left_ts/right_ts must be distinct from each "
                         "other and from the key column")
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = F.expr(
        f"{right_ts} >= {left_ts} - INTERVAL {int(lower_s)} SECONDS "
        f"AND {right_ts} <= {left_ts} + INTERVAL {int(upper_s)} SECONDS")
    return (l.join(r.withColumnRenamed(on, "__rk__"),
                   (F.col(on) == F.col("__rk__")) & cond, how)
            .drop("__rk__"))


def streaming_apply_changes(stream: DataFrame,
                            snapshot_path: str,
                            checkpoint_dir: str,
                            key_col: str,
                            version_col: str,
                            delete_col: str = "_deleted"):
    """Streaming CDC maintenance via foreachBatch: each micro-batch of
    change rows MERGEs into the parquet current-snapshot table with
    `operators.scd.apply_changes` (latest version wins, tombstones
    delete). The snapshot is rebuilt and overwritten per batch —
    checkpointed first so the writer never deletes files mid-scan (the
    same pin as the dedup-state twins); at-least-once replay of a batch
    is idempotent because versions are absolute, not incremental.
    Returns the started StreamingQuery."""
    from pipelinedp_spark.operators.scd import apply_changes
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException
        if delete_col not in batch_df.columns:
            batch_df = batch_df.withColumn(delete_col, F.lit(False))
        # Only the missing-snapshot case (first batch) falls back to an
        # empty base; a merge-time error (schema drift, transient read
        # failure mid-merge) must propagate and fail the micro-batch —
        # swallowing it here would rebuild the snapshot from the batch
        # alone and mode('overwrite') would destroy every previously
        # merged key silently.
        try:
            state = spark.read.parquet(snapshot_path)
        except AnalysisException:
            state = None
        if state is not None:
            if delete_col not in state.columns:
                state = state.withColumn(delete_col, F.lit(False))
            merged = apply_changes(state, batch_df, key_col,
                                   version_col, delete_col)
        else:
            merged = apply_changes(
                batch_df.filter(~F.col(delete_col)).limit(0),
                batch_df, key_col, version_col, delete_col)
        merged = merged.localCheckpoint()
        merged.write.mode("overwrite").parquet(snapshot_path)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
