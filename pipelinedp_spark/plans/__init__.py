"""Physical-plan inspection + scoped-conf utilities."""

from pipelinedp_spark.plans.conf import scoped_conf
from pipelinedp_spark.plans.inspect import (count_shuffles, explain_str,
                                            has_broadcast_join,
                                            has_partial_aggregation,
                                            pushed_filters, scan_columns,
                                            whole_stage_codegen_spans)

__all__ = [
    "scoped_conf",
    "count_shuffles",
    "explain_str",
    "has_broadcast_join",
    "has_partial_aggregation",
    "pushed_filters",
    "scan_columns",
    "whole_stage_codegen_spans",
]
