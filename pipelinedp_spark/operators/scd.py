"""Slowly-changing-dimension maintenance (SCD type 2): apply an update
batch to a versioned dimension snapshot — expire the current row of
every key whose tracked attributes changed, append the new version,
keep history immutable. The daily dimension-merge of any warehouse;
at 100 TB it is the MERGE an ACID table format runs, expressed here as
plain equi-joins so it works on raw parquet snapshots too.

Scale shape: one equi-join of the open rows against the update batch
(AQE broadcasts small batches), one anti-join for untouched rows, a
unionByName — no windows, no per-key lists; change detection is a
null-safe column comparison (codegen).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply"]


def scd2_apply(dim: DataFrame,
               updates: DataFrame,
               key_col: str,
               tracked: List[str],
               eff_col: str = "eff_ts",
               valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Apply one update batch (at most one row per key) to an SCD2
    dimension. ``dim`` rows carry (key, tracked..., valid_from,
    valid_to with NULL = open); ``updates`` carry (key, tracked...,
    eff_col). A key whose tracked values all match its open row is a
    no-op; a changed or brand-new key closes the open row (valid_to =
    eff) and appends the new version (valid_from = eff, open)."""
    upd = updates.select(
        F.col(key_col),
        *[F.col(c).alias(f"_u_{c}") for c in tracked],
        F.col(eff_col).alias("_eff"))
    open_rows = dim.filter(F.col(valid_to).isNull())
    closed_rows = dim.filter(F.col(valid_to).isNotNull())

    joined = open_rows.join(upd, key_col, "left")
    same = F.lit(True)
    for c in tracked:
        same = same & F.col(c).eqNullSafe(F.col(f"_u_{c}"))
    changed = F.col("_eff").isNotNull() & ~same

    kept_open = (joined.filter(~changed)
                 .select(*dim.columns))
    expired = (joined.filter(changed)
               .select(*[F.col(c) for c in dim.columns
                         if c != valid_to],
                       F.col("_eff").alias(valid_to))
               .select(*dim.columns))
    new_versions = (joined.filter(changed)
                    .select(F.col(key_col),
                            *[F.col(f"_u_{c}").alias(c)
                              for c in tracked],
                            F.col("_eff").alias(valid_from),
                            F.lit(None).cast("long").alias(valid_to))
                    .select(*dim.columns))
    brand_new = (upd.join(open_rows.select(key_col), key_col,
                          "left_anti")
                 .select(F.col(key_col),
                         *[F.col(f"_u_{c}").alias(c) for c in tracked],
                         F.col("_eff").alias(valid_from),
                         F.lit(None).cast("long").alias(valid_to))
                 .select(*dim.columns))
    return (closed_rows.unionByName(kept_open)
            .unionByName(expired)
            .unionByName(new_versions)
            .unionByName(brand_new))


def apply_changes(base: DataFrame,
                  updates: DataFrame,
                  key_col: str,
                  version_col: str,
                  delete_col: str = "_deleted") -> DataFrame:
    """MERGE-style latest-wins upsert producing the CURRENT snapshot
    (the type-1 companion to `scd2_apply`'s history table): union the
    base rows (version as-is) with the change batch, keep each key's
    highest-version row — a version TIE goes to the change batch (an
    explicit source-priority field right after the version in the
    ordering struct, base=0 / updates=1, makes the rule real rather
    than falling through to arbitrary payload comparison) — and drop
    keys whose winning row is a tombstone (``delete_col`` true).
    Payload columns must be orderable types (no map columns): the
    argmax struct compares them as the final tie-break.

    Plan: ONE unionByName + one max(struct) argmax per key — map-side
    combinable, no window, so a hot key (one entity updated millions of
    times in a batch) never serializes onto a single task. The struct
    packs the full row, so no join-back is needed."""
    if delete_col not in updates.columns:
        updates = updates.withColumn(delete_col, F.lit(False))
    if delete_col not in base.columns:
        base = base.withColumn(delete_col, F.lit(False))
    cols = base.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            f"base and updates schemas differ: {sorted(cols)} vs "
            f"{sorted(updates.columns)}")
    both = (base.select(*cols).withColumn("__src__", F.lit(0))
            .unionByName(
                updates.select(*cols).withColumn("__src__", F.lit(1))))
    payload = [c for c in cols if c != key_col]
    win = both.groupBy(key_col).agg(
        F.max(F.struct(F.col(version_col).alias("__v__"),
                       F.col("__src__").alias("__src__"),
                       *[F.col(c).alias(c) for c in payload]))
        .alias("__w__"))
    out = win.select(key_col,
                     *[F.col(f"__w__.{c}").alias(c) for c in payload])
    return out.filter(~F.col(delete_col)).drop(delete_col)
