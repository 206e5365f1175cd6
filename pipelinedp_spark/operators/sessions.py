"""Gap-based sessionization over event tables (batch).

Assigns a session id per key: a new session starts whenever the gap to
the previous event of the same key exceeds ``gap``. The batch mirror of
`streaming.dp_streaming.session_window_counts` (Structured Streaming's
session_window), with identical semantics on static data.

Plan shape: one keyed window (lag -> break flag -> running sum), i.e. a
single shuffle on the key and an in-partition sort — the same profile
as any per-entity timeline computation; skew follows the key
distribution, AQE applies. Session aggregates afterwards are an
ordinary hash aggregation on (key, session_id).

No reference counterpart (net-new per project north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, time_col: str, by: str, gap: int,
               out_col: str = "session_id") -> DataFrame:
    """Append a 0-based per-key session id (long). ``gap`` is in the
    units of the numeric ``time_col``; a gap strictly greater than
    ``gap`` starts a new session."""
    w = Window.partitionBy(by).orderBy(time_col)
    brk = F.when(
        F.col(time_col) - F.lag(time_col).over(w) > F.lit(gap),
        F.lit(1)).otherwise(F.lit(0))
    sid = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(out_col, sid.cast("long"))


def session_stats(df: DataFrame, time_col: str, by: str,
                  gap: int) -> DataFrame:
    """(by, session_id, n_events, dur) per session — duration in the
    time column's units."""
    s = sessionize(df, time_col, by, gap)
    return (s.groupBy(by, "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.max(time_col) - F.min(time_col)).alias("dur")))
