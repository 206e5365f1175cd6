"""Physical-plan inspection: make the plan the unit of review.

Operators in this engine are tuned against their ``explain`` output —
filters must reach the parquet scan, small sides must broadcast, aggregates
must have a map-side partial step, and the hot path must stay inside
whole-stage codegen. These helpers turn those properties into assertions so
plan-shape regressions fail tests instead of shipping
(the reference's analogous discipline is its computation-graph report
tests: reference tests/dp_engine_test.py:468-568).
"""

from __future__ import annotations

import re
from typing import List

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def count_shuffles(df: DataFrame) -> int:
    """Number of exchange operators in the physical plan. AQE may later
    replace some with local/broadcast variants; this counts the static
    plan's shuffle boundaries."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?:hash|range|Single)", plan))


def pushed_filters(df: DataFrame) -> List[str]:
    """Filters pushed into the data source scan (empty list = nothing
    pushed; a filter-heavy query with an empty list is a red flag)."""
    plan = explain_str(df, "formatted")
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_columns(df: DataFrame) -> List[List[str]]:
    """ReadSchema column lists per scan — verifies column pruning (a scan
    reading all columns for a 2-column projection is wrong)."""
    plan = explain_str(df, "formatted")
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",")
                if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple") or \
        "BroadcastNestedLoopJoin" in explain_str(df, "simple")


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when hash aggregates run in partial+final mode (map-side
    combine before the shuffle)."""
    plan = explain_str(df, "formatted")
    return "partial_" in plan or "Partial" in plan


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of whole-stage-codegen regions; zero means the plan fell back
    to fully interpreted execution. AQE plans only expose codegen *(n)
    markers once finalized, so this executes the plan to a noop sink first
    (cheap at test scale; use on samples in production)."""
    df.collect()  # finalizes THIS frame's AdaptiveSparkPlan
    plan = explain_str(df, "simple")
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)
