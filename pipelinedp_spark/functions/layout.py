"""Z-order (Morton) data layout for multi-column data skipping.

At 100 TB, file-level min/max statistics are the first line of defense:
a query filtering on BOTH user and time only skips files if the layout
clusters both columns at once. Sorting by one column destroys locality
in the other; interleaving the bits of rank-normalized columns (the
Z-order / Morton curve — public technique, used by Delta/Iceberg
OPTIMIZE ZORDER) gives every file a small bounding box in ALL the
curve's dimensions, so multi-predicate scans prune files regardless of
which column they filter on.

Everything here is pure codegen arithmetic (shifts + ors) over
driver-collected exact min/max scalars — no UDFs, no shuffles beyond
the final range partition — and deterministic, so the key computation
is SQL-mirrorable bit-for-bit.

No reference counterpart (net-new per the project north star).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucketize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Order-preserving map of a numeric column onto [0, 2^bits):
    exact-min/max linear bucketing, degenerate (lo == hi) columns all
    land in bucket 0."""
    n = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = F.floor((col.cast("double") - F.lit(float(lo)))
                     / F.lit(float(hi - lo)) * F.lit(float(n + 1)))
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(n)).cast("long")


def zorder_key(buckets: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of the given bucket columns into
    one Morton key (column i contributes bit k at position k*d + i).
    Pure shift/or codegen — ``bits * len(buckets)`` must be <= 63."""
    d = len(buckets)
    if bits * d > 63:
        raise ValueError(f"bits*dims = {bits * d} exceeds a long")
    key = F.lit(0).cast("long")
    for i, b in enumerate(buckets):
        for k in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(b, k).bitwiseAND(F.lit(1)),
                            k * d + i))
    return key


def with_zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 16,
                    out_col: str = "zkey",
                    ranges: Dict[str, Tuple[float, float]] = None
                    ) -> DataFrame:
    """Append the Morton key over ``cols`` (numeric / timestamp).
    Column ranges come from one exact min/max aggregation (a single
    cheap job) unless supplied via ``ranges`` — pass precomputed ranges
    when layout jobs run incrementally so the curve stays stable across
    ingestion batches."""
    dtypes = dict(df.dtypes)

    def _numeric(c: str) -> Column:
        # timestamps/dates can't cast straight to double; micros since
        # epoch preserves order (the only property bucketing needs).
        t = dtypes.get(c, "")
        if t.startswith("timestamp"):
            return F.unix_micros(F.col(c).cast("timestamp")) \
                .cast("double")
        if t == "date":
            return F.unix_date(F.col(c)).cast("double")
        return F.col(c).cast("double")

    exprs: List[Column] = []
    casted = {c: _numeric(c) for c in cols}
    if ranges is None:
        row = df.agg(*[f for c in cols
                       for f in (F.min(casted[c]).alias(f"__lo_{c}"),
                                 F.max(casted[c]).alias(f"__hi_{c}"))]
                     ).collect()[0]
        ranges = {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}
    for c in cols:
        lo, hi = ranges[c]
        if lo is None:                  # all-null column: bucket 0
            lo, hi = 0.0, 0.0
        exprs.append(_bucketize(casted[c], float(lo), float(hi), bits))
    return df.withColumn(out_col, zorder_key(exprs, bits))


def write_zordered(df: DataFrame, path: str, cols: Sequence[str],
                   num_files: int = 200, bits: int = 16,
                   fmt: str = "parquet") -> None:
    """Write ``df`` laid out along the Z-curve over ``cols``:
    range-partition by the Morton key (one skew-aware shuffle — Spark
    samples the key distribution) and sort within partitions, so every
    output file covers a compact curve segment = a small bounding box in
    every curve dimension; then drop the key. The 100 TB payoff is
    file-level min/max pruning for predicates on ANY prefix-free subset
    of ``cols``."""
    keyed = with_zorder_key(df, cols, bits)
    (keyed.repartitionByRange(num_files, F.col("zkey"))
     .sortWithinPartitions("zkey")
     .drop("zkey")
     .write.format(fmt).mode("overwrite").save(path))
