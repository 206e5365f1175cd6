"""Ordered-funnel analysis over event streams (view -> click ->
purchase): per user, each step must occur strictly after the user's
match of the previous step; the report counts users surviving each
step and the conversion vs step 1.

No reference counterpart (net-new analytics op per project north
star); semantics follow the standard product-analytics funnel
(windowed variant via ``max_span``: all steps within a horizon of the
user's FIRST-step time).

Scale shape: step i is `events filtered to type_i` joined to the
previous step's (user, t) table — the type filter prunes the scan
(predicate pushdown) and the per-step state is one row per surviving
user, which only shrinks down the funnel; each state table is
localCheckpoint'd because it feeds BOTH the next step's join and the
final count union (the recompute-per-consumer trap). No windows, no
per-user event lists — a user with millions of events costs one MIN
aggregation, never a sorted in-memory array.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_users", "funnel_report"]


def funnel_users(events: DataFrame,
                 steps: List[str],
                 user_col: str = "user_id",
                 type_col: str = "event_type",
                 ts_col: str = "ts",
                 max_span: Optional[int] = None,
                 checkpoint: bool = True) -> List[DataFrame]:
    """One (user, t) DataFrame per funnel step: t is the user's
    earliest completion time of that step given strict ordering after
    the previous step's t (and, with ``max_span``, within
    first_step_t + max_span — same units as ts_col). Tables are
    localCheckpoint'd; element i feeds both the report and step
    i+1."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    def _mat(df):
        return df.localCheckpoint() if checkpoint else df

    first = _mat(events.filter(F.col(type_col) == steps[0])
                 .groupBy(user_col)
                 .agg(F.min(ts_col).alias("t"))
                 .withColumn("t0", F.col("t")))
    out = [first]
    for s in steps[1:]:
        prev = out[-1]
        cand = (events.filter(F.col(type_col) == s)
                .join(prev.select(user_col, F.col("t").alias("_pt"),
                                  "t0"), user_col)
                .filter(F.col(ts_col) > F.col("_pt")))
        if max_span is not None:
            cand = cand.filter(F.col(ts_col) <= F.col("t0") + max_span)
        out.append(_mat(cand.groupBy(user_col, "t0")
                        .agg(F.min(ts_col).alias("t"))
                        .select(user_col, "t", "t0")))
    return out


def funnel_report(events: DataFrame,
                  steps: List[str],
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts",
                  max_span: Optional[int] = None) -> DataFrame:
    """(step, step_name, users, conversion): users surviving each
    ordered step and the share of step-1 users still present."""
    tables = funnel_users(events, steps, user_col, type_col, ts_col,
                          max_span)
    spark = events.sparkSession
    sizes = [t.count() for t in tables]
    rows = ", ".join(
        f"({i + 1}, '{name}', {n})"
        for i, (name, n) in enumerate(zip(steps, sizes)))
    return spark.sql(
        f"SELECT CAST(step AS BIGINT) AS step, step_name, "
        f"CAST(users AS BIGINT) AS users, "
        f"ROUND(users / CAST({sizes[0]} AS DOUBLE), 6) AS conversion "
        f"FROM VALUES {rows} AS t(step, step_name, users)"
        if sizes[0] > 0 else
        f"SELECT CAST(step AS BIGINT) AS step, step_name, "
        f"CAST(users AS BIGINT) AS users, 0.0 AS conversion "
        f"FROM VALUES {rows} AS t(step, step_name, users)")


def retention_cohorts(events: DataFrame,
                      user_col: str = "user_id",
                      ts_col: str = "ts",
                      period: int = 7 * 86_400 * 1_000_000
                      ) -> DataFrame:
    """Cohort retention grid: cohort = the user's first-activity
    period (integer DIV of the epoch-micros timestamp, default weekly),
    retention(cohort, offset) = share of the cohort active
    ``offset`` periods later. Returns (cohort, offset, users,
    retention).

    Scale shape: one MIN-per-user agg (cohort assignment), one
    distinct over (user, period) — both map-side combinable; the
    cohort-size join is on the cohort-count table (periods x 1 rows,
    broadcast). Integer DIV throughout — a 10^13-micros epoch never
    touches double precision."""
    first = (events.groupBy(user_col)
             .agg(F.min(ts_col).alias("_t0"))
             .select(user_col,
                     F.expr(f"_t0 DIV {period}").alias("cohort")))
    active = (events.select(user_col,
                            F.expr(f"{ts_col} DIV {period}")
                            .alias("_p"))
              .distinct())
    grid = (active.join(first, user_col)
            .groupBy("cohort", (F.col("_p") - F.col("cohort"))
                     .alias("offset"))
            .agg(F.count(F.lit(1)).alias("users")))
    size = (first.groupBy("cohort")
            .agg(F.count(F.lit(1)).alias("_n")))
    return (grid.join(F.broadcast(size), "cohort")
            .filter(F.col("offset") >= 0)
            .select(F.col("cohort").cast("long"),
                    F.col("offset").cast("long"),
                    F.col("users").cast("long"),
                    F.round(F.col("users") / F.col("_n"), 6)
                    .alias("retention")))


def anomaly_scores(counts: DataFrame,
                   group_col: str = "event_type",
                   win_col: str = "win",
                   count_col: str = "c") -> DataFrame:
    """Signed squared-z anomaly score per (group, window) from a
    window-count table: (c*n - S)^2 / (n*Sq - S^2) with the sign of
    the deviation — integer numerator/denominator, ONE final division,
    so the ranking is bit-reproducible. Shared by the batch query and
    the streaming monitor (score the sink's count table per trigger or
    on a cadence — counting is the incremental part, scoring is a
    cheap group-cardinality pass)."""
    stats = (counts.groupBy(group_col)
             .agg(F.count(F.lit(1)).alias("_n"),
                  F.sum(count_col).alias("_s"),
                  F.sum(F.col(count_col) * F.col(count_col))
                  .alias("_sq")))
    dev = F.col(count_col) * F.col("_n") - F.col("_s")
    den = F.col("_n") * F.col("_sq") - F.col("_s") * F.col("_s")
    return (counts.join(F.broadcast(stats), group_col)
            .select(group_col, win_col,
                    F.col(count_col).cast("long").alias(count_col),
                    F.when(den > 0,
                           F.round(F.signum(dev.cast("double"))
                                   * (dev * dev) / den, 6))
                    .otherwise(F.lit(0.0)).alias("score")))
