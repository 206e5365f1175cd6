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

`sessionize_scalable` is the skew-proof variant: it range-partitions a
key's timeline across tasks and merges session boundaries in a
two-phase pass, so no single task ever holds a whole hot key. Measured
crossover: at ~10^5-10^6 events per hot key the window version is still
faster (a single-task sort is cheap; the two Arrow passes are not);
the scalable variant is for the regime where one key's timeline
exceeds a task's memory/time budget (10^8+ events at 100 TB).

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


def sessionize_scalable(df: DataFrame, time_col: str, by: str, gap: int,
                        out_col: str = "session_id",
                        num_partitions: int = None) -> DataFrame:
    """Skew-proof sessionize: identical output to `sessionize`, but a hot
    key's timeline is SPLIT across range partitions instead of serialized
    onto one window task.

    Two-phase, the `running.py` prefix-sum pattern applied to session
    boundaries:

    1. range-partition by (key, time) and sort within partitions — each
       partition holds a contiguous sorted slice, and a key spans at most
       a contiguous run of partitions;
    2. one Arrow pass emits per-partition EDGE summaries (first/last key
       only: first_ts, last_ts, local session count — <= 2 rows per
       partition), from which the driver computes, for every spanning
       key, the global session-id offset of each partition and whether
       the partition's first local session continues the previous
       partition's last one;
    3. a second Arrow pass over the same persisted partitions assigns
       local per-key session indices (cross-batch carry) and adds the
       broadcast offsets.

    Cost: one range exchange + a <= 2*num_partitions-row collect; every
    phase is data-parallel regardless of key skew. The single-window
    `sessionize` remains the cheaper plan when keys are well-distributed.

    Caching note: the range-partitioned input stays persisted after the
    returned DataFrame is consumed (it cannot be unpersisted before the
    lazy output pass runs). Long-lived sessions issuing many calls
    should ``spark.catalog.clearCache()`` periodically, as bench.py
    does.
    """
    import pandas as pd

    ts_type = dict(df.dtypes)[time_col]
    if not any(ts_type.startswith(t) for t in
               ("tinyint", "smallint", "int", "bigint", "float", "double",
                "decimal")):
        raise ValueError(
            f"sessionize_scalable requires a numeric time column (gap "
            f"arithmetic in column units); {time_col!r} is {ts_type}. "
            f"Convert first — e.g. F.unix_micros for timestamps — or use "
            f"sessionize().")

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # The boundary-stitch collect below is bounded BY CONSTRUCTION at
    # <= 2 rows per partition (`_edges_with_pid` keeps only each
    # partition's first and last key), so its size is known before any
    # job runs: guard it like every other driver collect in this
    # package — loudly, with the remedy — instead of assuming nobody
    # ever asks for tens of millions of partitions.
    max_boundary = int(spark.conf.get(
        "spark.pipelinedp.sessions.maxBoundaryRows", "4000000"))
    if 2 * n > max_boundary:
        raise ValueError(
            f"sessionize_scalable with num_partitions={n} would collect "
            f"up to {2 * n} boundary rows to the driver (2 per "
            f"partition), over the "
            f"spark.pipelinedp.sessions.maxBoundaryRows cap "
            f"({max_boundary}); lower num_partitions or raise the cap")
    part = (df.repartitionByRange(n, F.col(by), F.col(time_col))
            .sortWithinPartitions(by, time_col)
            .withColumn("_pid", F.spark_partition_id())
            .persist())

    def _breaks(pdf: "pd.DataFrame", prev_uid, prev_ts):
        uid = pdf[by]
        ts = pdf[time_col]
        brk = (uid != uid.shift()) | ((ts - ts.shift()) > gap)
        first_cont = (prev_uid is not None
                      and uid.iloc[0] == prev_uid
                      and ts.iloc[0] - prev_ts <= gap)
        brk.iloc[0] = not first_cont
        return brk.astype("int64")

    # Edge-summary timestamp type follows the data (int-family widens to
    # long; float-family to double) so float/decimal time columns survive
    # the round trip.
    edge_ts = ("double" if ts_type.startswith(("float", "double", "decimal"))
               else "long")
    edge_schema = f"{by} {dict(df.dtypes)[by]}, _first_ts {edge_ts}, " \
                  f"_last_ts {edge_ts}, _n_loc long"
    edges = (part.select(by, time_col, "_pid")
             .mapInPandas(lambda it: _edges_with_pid(it, by, time_col, gap),
                          schema=f"_pid int, {edge_schema}"))
    edge_rows = edges.collect()

    per_uid = {}
    for r in edge_rows:
        per_uid.setdefault(r[by], []).append(
            (r["_pid"], r["_first_ts"], r["_last_ts"], r["_n_loc"]))
    offsets = {}
    for uid, lst in per_uid.items():
        lst.sort()
        if len(lst) < 2:
            continue
        off = 0
        for (p0, _, last0, n0), (p1, first1, _, _) in zip(lst, lst[1:]):
            cont = (first1 - last0) <= gap
            off = off + n0 - (1 if cont else 0)
            offsets[(p1, uid)] = off
    bc = spark.sparkContext.broadcast(offsets)

    out_schema = part.drop("_pid").schema.add(out_col, "long")

    def _assign(batches):
        prev_uid = prev_ts = None
        carry_idx = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            brk = _breaks(pdf, prev_uid, prev_ts)
            grp_cum = brk.groupby(pdf[by]).cumsum()
            idx = grp_cum - 1
            if prev_uid is not None:
                mask = pdf[by] == prev_uid
                idx = idx + mask.astype("int64") * (carry_idx + 1)
            off = pdf[by].map(
                lambda u: bc.value.get((pid, u), 0)).astype("int64")
            out = pdf.drop(columns=["_pid"])
            out[out_col] = (idx + off).astype("int64")
            prev_uid = pdf[by].iloc[-1]
            prev_ts = pdf[time_col].iloc[-1]
            carry_idx = int(idx.iloc[-1])
            yield out

    return part.mapInPandas(_assign, schema=out_schema)


def _edges_with_pid(batches, by, time_col, gap):
    """Per-partition edge summaries: one row for the partition's first
    key and one for its last key (same row when they coincide):
    (pid, key, first_ts, last_ts, local session count)."""
    import pandas as pd

    pid = None
    summaries = {}   # uid -> [first_ts, last_ts, n_sessions]
    order = []
    prev_uid = prev_ts = None
    for pdf in batches:
        if len(pdf) == 0:
            continue
        pid = int(pdf["_pid"].iloc[0])
        uid_col = pdf[by]
        ts_col = pdf[time_col]
        brk = (uid_col != uid_col.shift()) | ((ts_col - ts_col.shift())
                                              > gap)
        first_cont = (prev_uid is not None
                      and uid_col.iloc[0] == prev_uid
                      and ts_col.iloc[0] - prev_ts <= gap)
        brk.iloc[0] = not first_cont
        nb = brk.astype("int64").groupby(uid_col).sum()
        firsts = ts_col.groupby(uid_col).min()
        lasts = ts_col.groupby(uid_col).max()
        for uid in uid_col.drop_duplicates():
            if uid in summaries:
                summaries[uid][1] = lasts[uid].item()
                summaries[uid][2] += int(nb[uid])
            else:
                summaries[uid] = [firsts[uid].item(), lasts[uid].item(),
                                  int(nb[uid])]
                order.append(uid)
        prev_uid = uid_col.iloc[-1]
        prev_ts = ts_col.iloc[-1]
    if pid is None:
        return
    keep = {order[0], order[-1]}
    rows = [(pid, u, *summaries[u]) for u in order if u in keep]
    yield pd.DataFrame(rows, columns=["_pid", by, "_first_ts", "_last_ts",
                                      "_n_loc"])


def session_stats(df: DataFrame, time_col: str, by: str,
                  gap: int) -> DataFrame:
    """(by, session_id, n_events, dur) per session — duration in the
    time column's units."""
    s = sessionize(df, time_col, by, gap)
    return (s.groupBy(by, "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.max(time_col) - F.min(time_col)).alias("dur")))
