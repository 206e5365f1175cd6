"""Skew-handling join primitives: salted inner/left joins for the
hot-key case AQE's skew-join split can't always reach (e.g. a
build-side key so hot that one task still owns it after splitting, or
AQE disabled).

`salted_join` shards the SKEWED (probe) side into `factor` salt
buckets deterministically (hash of a unique column — reproducible
across retries, unlike rand()) and replicates the other side `factor`
times, turning one hot partition into `factor` co-located ones. Cost:
the small side is duplicated `factor`x — use only when the small side
is genuinely small (it usually is: skew means a few giant keys on the
big side) and AQE alone didn't cut it.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(big: DataFrame,
                small: DataFrame,
                on: List[str],
                factor: int = 8,
                how: str = "inner",
                salt_src: Optional[str] = None) -> DataFrame:
    """Join `big` (skewed on `on`) with `small`, salting the hot keys
    across `factor` buckets. `salt_src` names a big-side column whose
    hash spreads rows of one key (defaults to the whole row via all
    columns — pass the row id when you have one, it's cheaper).
    Semantically identical to `big.join(small, on, how)` for inner and
    left joins."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    src = [F.col(salt_src)] if salt_src else [F.col(c) for c in
                                              big.columns]
    salted_big = big.withColumn(
        "__salt__", F.pmod(F.xxhash64(*src), F.lit(factor)).cast("int"))
    replicated = (small.withColumn(
        "__salt__",
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
        .withColumn("__salt__", F.col("__salt__").cast("int")))
    out = salted_big.join(replicated, on + ["__salt__"], how)
    return out.drop("__salt__")
