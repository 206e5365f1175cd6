"""Range (interval-containment) join — Spark executes non-equi joins as
nested loops; the scalable form is a chunked equi-join.

Matches each left row (a point ``time_col``) to every interval row with
``start_col <= t <= end_col``. Both sides are mapped onto fixed-width
time chunks: points get their one chunk id, intervals explode into every
chunk they overlap (a JVM-side ``sequence()``), and a plain hash
equi-join on the chunk id + an exact BETWEEN filter replaces the
nested-loop cross product. Cost scales with chunk overlap (interval
length / chunk width), not with |left| x |intervals|; pick ``chunk``
near the typical interval length. Each (point, interval) pair meets in
exactly one chunk — the point's own — so no dedup pass is needed.

No reference counterpart (net-new per project north star; the reference
has no joins beyond a key semi-join — SURVEY.md §2.F).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(points: DataFrame, time_col: str,
               intervals: DataFrame, start_col: str, end_col: str,
               chunk: int, key: Optional[str] = None) -> DataFrame:
    """Inner range join: all (point, interval) pairs with
    start <= t <= end, optionally also matching an equality ``key``.

    ``chunk`` is the bucket width in the units of ``time_col`` (e.g.
    nanoseconds). Returns every point column plus every interval column.
    """
    p = points.withColumn("_chunk",
                          F.expr(f"{time_col} DIV {chunk}").cast("long"))
    iv = intervals.withColumn(
        "_chunk",
        F.explode(F.sequence(
            F.expr(f"{start_col} DIV {chunk}").cast("long"),
            F.expr(f"{end_col} DIV {chunk}").cast("long"))))
    on = ["_chunk"] + ([key] if key else [])
    return (p.join(iv, on=on)
            .filter((F.col(time_col) >= F.col(start_col))
                    & (F.col(time_col) <= F.col(end_col)))
            .drop("_chunk"))
