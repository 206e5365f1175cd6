"""Contribution bounding as window-sampled DataFrame stages.

The reference bounds sensitivity by materializing per-key lists and random-
sampling them (reference: pipeline_dp/contribution_bounders.py:63-247). Here
every bounder is expressed as bounded window sampling —
``row_number() OVER (PARTITION BY keys ORDER BY rand()) <= cap`` — which
never materializes per-key state, keeps uniform-without-replacement
semantics, and lets AQE handle skew. Each bounder returns one row per
(privacy_id, partition_key) carrying partial-aggregate columns; the caller
finishes with a groupBy(partition_key) merge, so Catalyst plans
map-side partial aggregation for both stages.

Plan shape (cross-and-per-partition case):
  shuffle 1: window over (pid, pk)  [Linf sample]  — reused by the
             groupBy(pid, pk) partial aggregation (same hash partitioning)
  shuffle 2: window over (pid)      [L0 sample]
  (caller)  shuffle 3: groupBy(pk) final merge
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn__"


def _sample_order(order_cols: Optional[Sequence[Column]]) -> List[Column]:
    # Deterministic ordering is a test hook; production uses rand() for
    # uniform-without-replacement sampling per key.
    return list(order_cols) if order_cols else [F.rand()]


def _limit_per_key(df: DataFrame, keys: Sequence[str], cap: int,
                   order_cols: Optional[Sequence[Column]]) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*_sample_order(order_cols))
    return (df.withColumn(_RN, F.row_number().over(w))
            .filter(F.col(_RN) <= cap).drop(_RN))


def bound_cross_and_per_partition(
        df: DataFrame,
        pid_col: str,
        pk_cols: Sequence[str],
        partial_aggs: List[Column],
        l0: int,
        linf: int,
        row_sampling_needed: bool = True,
        order_cols: Optional[Sequence[Column]] = None) -> DataFrame:
    """L0 + Linf bounding (reference: contribution_bounders.py:63-112).

    ``row_sampling_needed=False`` is the count-only fast path: when no
    partial aggregate depends on WHICH rows survive (COUNT is
    ``least(count, linf)`` regardless of the sample), the Linf window sort is
    skipped and the caller caps counts inside ``partial_aggs``.
    """
    keys = [pid_col, *pk_cols]
    if row_sampling_needed and linf is not None:
        df = _limit_per_key(df, keys, linf, order_cols)
    per_pid_pk = df.groupBy(*keys).agg(*partial_aggs)
    if l0 is not None:
        per_pid_pk = _limit_per_key(per_pid_pk, [pid_col], l0, order_cols)
    return per_pid_pk


def bound_per_privacy_id(
        df: DataFrame,
        pid_col: str,
        pk_cols: Sequence[str],
        partial_aggs: List[Column],
        max_contributions: int,
        order_cols: Optional[Sequence[Column]] = None) -> DataFrame:
    """Total-contributions (L1-style) bounding
    (reference: contribution_bounders.py:115-157): keep <= max_contributions
    rows per privacy id across ALL partitions, then aggregate per (pid, pk).
    """
    df = _limit_per_key(df, [pid_col], max_contributions, order_cols)
    return df.groupBy(pid_col, *pk_cols).agg(*partial_aggs)


def bound_cross_partition_only(
        df: DataFrame,
        pid_col: str,
        pk_cols: Sequence[str],
        partial_aggs: List[Column],
        l0: int,
        order_cols: Optional[Sequence[Column]] = None) -> DataFrame:
    """L0-only bounding (reference: contribution_bounders.py:160-202): the
    per-partition contribution is bounded by value semantics (e.g. the
    per-partition sum clip), so only cross-partition sampling happens."""
    per_pid_pk = df.groupBy(pid_col, *pk_cols).agg(*partial_aggs)
    return _limit_per_key(per_pid_pk, [pid_col], l0, order_cols)


def bound_linf_only(
        df: DataFrame,
        pid_col: str,
        pk_cols: Sequence[str],
        partial_aggs: List[Column],
        linf: int,
        row_sampling_needed: bool = True,
        order_cols: Optional[Sequence[Column]] = None) -> DataFrame:
    """Linf-only bounding (reference: contribution_bounders.py:205-231)."""
    keys = [pid_col, *pk_cols]
    if row_sampling_needed and linf is not None:
        df = _limit_per_key(df, keys, linf, order_cols)
    return df.groupBy(*keys).agg(*partial_aggs)


def bound_noop(df: DataFrame, pid_col: str, pk_cols: Sequence[str],
               partial_aggs: List[Column]) -> DataFrame:
    """No sampling — bounds assumed enforced by the data
    (reference: contribution_bounders.py:234-247)."""
    return df.groupBy(pid_col, *pk_cols).agg(*partial_aggs)
