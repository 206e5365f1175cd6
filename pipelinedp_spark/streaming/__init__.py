"""Structured Streaming DP aggregations (net-new; the reference is
batch-only — SURVEY.md §2.F)."""

from pipelinedp_spark.streaming.dp_streaming import (
    dp_streaming_count, dp_streaming_mean, dp_streaming_percentile,
    dp_streaming_session_count, dp_streaming_sum, dp_streaming_variance,
    dp_streaming_vector_sum,
    session_window_counts, streaming_exact_dedup,
    streaming_near_dup_dedup, streaming_token_topk)

__all__ = [
    "dp_streaming_count",
    "dp_streaming_mean",
    "dp_streaming_percentile",
    "dp_streaming_variance",
    "dp_streaming_session_count",
    "dp_streaming_sum",
    "dp_streaming_vector_sum",
    "session_window_counts",
    "streaming_exact_dedup",
    "streaming_near_dup_dedup",
    "streaming_token_topk",
]
