"""As-of (most-recent-match) join — an operator Spark lacks natively.

For each left row, attach the right row with the greatest right-time
<= left-time (direction="backward"; "forward" = smallest >=) within the
same key group. The classic enrichment join for event streams and
timeseries feature lookup.

Plan shape: union the two sides with a side tag, shuffle ONCE on the
key, sort within partitions by (key, time, side), and stream each
partition through a single Arrow pass that forward-fills the latest
right-side values per key (a carry dict preserves fill state across
Arrow batches). Compared to the cogroup formulation (one pandas call
per key group), the sweep touches each partition once, so per-group
overhead vanishes — the operator costs one exchange + one linear scan
regardless of key cardinality, and skew degrades exactly like any keyed
shuffle (AQE applies).

Notes that earned their comments:
- Right-side columns are renamed to their OUTPUT names before the
  union: Catalyst prunes Python-UDF input columns by matching the
  output names the plan consumes, so pre-renaming keeps pruning
  consistent (a pruned input always corresponds to an output nobody
  reads) instead of silently dropping join inputs.
- Missing-side slots carry typed sentinels, not nulls: Arrow hands
  pandas a float64 column whenever an int64 column contains nulls, and
  float64 corrupts values above 2^53 (e.g. nanosecond epochs).

No reference counterpart (net-new per project north star; the reference
has no joins beyond a key semi-join — SURVEY.md §2.F).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegralType, NumericType, StructField,
                               StructType)

_T = "_asof_t"
_SIDE = "_asof_s"


def asof_join(left: DataFrame, right: DataFrame, time_col: str,
              by: str, direction: str = "backward",
              right_cols: Optional[List[str]] = None,
              suffix: str = "_right",
              tolerance: Optional[int] = None) -> DataFrame:
    """As-of join of two event tables on ``by``, matching along the
    numeric ``time_col``.

    Returns every left row plus the matched right columns, renamed with
    ``suffix`` where they collide with left names (unmatched rows get
    nulls). Right-side time is emitted as ``{time_col}{suffix}``.
    ``tolerance`` (in time_col units, like pandas merge_asof) nulls a
    match whose time gap exceeds it — a pure post-sweep column
    projection, so it adds nothing to the shuffle or the Arrow pass.
    """
    import pandas as pd

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"got {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError("tolerance must be non-negative")

    rcols_src = right_cols or [c for c in right.columns if c != by]
    if time_col not in rcols_src:
        rcols_src = [time_col] + rcols_src
    left_names = {f.name for f in left.schema.fields}
    renames = {c: (c + suffix if c in left_names else c) for c in rcols_src}
    rcols = [renames[c] for c in rcols_src]
    rtime = renames[time_col]

    lfields = list(left.schema.fields)
    rfields = [StructField(renames[c], right.schema[c].dataType, True)
               for c in rcols_src]
    out_fields = lfields + rfields
    names = [f.name for f in out_fields]

    def _placeholder(dt):
        return F.lit(0).cast(dt) if isinstance(dt, NumericType) \
            else F.lit(None).cast(dt)

    # forward(t) == backward(-t): negate the sort time; ties stay
    # inclusive because right rows sort before left rows either way.
    def _sort_t(col):
        return (-col if direction == "forward" else col).cast("long")

    lside = left.select(
        *[F.col(f.name) for f in lfields],
        *[_placeholder(f.dataType).alias(f.name) for f in rfields],
        _sort_t(F.col(time_col)).alias(_T),
        F.lit(1).alias(_SIDE))
    rside = right.select(
        *[(F.col(by) if f.name == by else _placeholder(f.dataType))
          .alias(f.name) for f in lfields],
        *[F.col(c).alias(renames[c]) for c in rcols_src],
        _sort_t(F.col(time_col)).alias(_T),
        F.lit(0).alias(_SIDE))

    u = (lside.unionByName(rside)
         .repartition(F.col(by))
         .sortWithinPartitions(by, _T, _SIDE))

    int_rcols = {f.name for f in rfields
                 if isinstance(f.dataType, IntegralType)}

    def _sweep(batches):
        state: dict = {}  # key -> {rcol: value}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            have = [c for c in rcols if c in pdf.columns]
            if rtime not in pdf.columns:
                if have:
                    raise RuntimeError(
                        f"asof_join: Catalyst pruned {rtime!r} while "
                        f"keeping {have}; select {rtime!r} downstream "
                        "alongside the other right-side columns")
                out = pdf[pdf[_SIDE] == 1]
                yield out.reindex(columns=[n for n in names
                                           if n in pdf.columns])
                continue
            rmask = pdf[_SIDE] == 0
            work = pd.DataFrame({by: pdf[by]})
            for c in have:
                col = pdf[c]
                if c in int_rcols:
                    col = col.astype("Int64")
                work[c] = col.where(rmask)
            if state:
                carry = pd.DataFrame.from_dict(state, orient="index")
                carry[by] = carry.index
                for c in have:
                    if c in int_rcols:
                        carry[c] = carry[c].astype("Int64")
                work = pd.concat([carry[[by] + have], work],
                                 ignore_index=True)
            filled = work.groupby(by, sort=False)[have].ffill()
            n_carry = len(work) - len(pdf)
            filled = filled.iloc[n_carry:].reset_index(drop=True)
            keys = work[by].iloc[n_carry:].reset_index(drop=True)
            lmask = (~rmask).reset_index(drop=True)
            out = pdf.reset_index(drop=True)[
                [f.name for f in lfields]][lmask.values]
            for c in have:
                vals = filled[c][lmask.values]
                out[c] = vals
            yield out.reindex(columns=names)
            # fold this batch's right rows into the carry state
            # (positional slice + reset_index so the by-column groupby
            # aligns; a misaligned-index groupby would silently drop keys)
            rp = work.iloc[n_carry:].reset_index(drop=True)[rmask.values]
            last = rp.groupby(by, sort=False).last()
            for k, row in last.iterrows():
                state[k] = {c: row[c] for c in have}

    out = u.mapInPandas(_sweep, schema=StructType(out_fields))
    if tolerance is not None:
        keep = (F.col(rtime).isNotNull()
                & (F.abs(F.col(time_col) - F.col(rtime))
                   <= F.lit(tolerance)))
        rset = set(rcols)
        out = out.select(*[
            F.when(keep, F.col(c)).alias(c) if c in rset else F.col(c)
            for c in names])
    return out
