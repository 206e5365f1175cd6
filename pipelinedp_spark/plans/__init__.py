"""Physical-plan inspection utilities."""

from pipelinedp_spark.plans.inspect import (count_shuffles, explain_str,
                                            has_broadcast_join,
                                            has_partial_aggregation,
                                            pushed_filters, scan_columns,
                                            whole_stage_codegen_spans)

__all__ = [
    "count_shuffles",
    "explain_str",
    "has_broadcast_join",
    "has_partial_aggregation",
    "pushed_filters",
    "scan_columns",
    "whole_stage_codegen_spans",
]
