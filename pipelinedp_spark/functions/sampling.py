"""Deterministic splits and samples for training-data pipelines.

Hash-based: every decision is a pure function of (salt, id), so splits
are reproducible across runs, machines, and engines — no RNG state, no
seed plumbing, and adding data never reassigns existing rows (the
property that makes hash splits the standard for train/val/test).
All expressions are native (md5 + conv), JVM-side, no shuffle.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipelinedp_spark.functions.text import hex_to_long

_DENOM = float(1 << 60)


def hash_uniform(id_col: Column, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1) from md5(salt:id) — 60 bits."""
    h = hex_to_long(
        F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))))
    return h / F.lit(_DENOM)


def split_column(id_col: Column, fractions: Dict[str, float],
                 salt: str = "split") -> Column:
    """A split label column ('train'/'val'/... ) from cumulative
    fraction thresholds over the hash-uniform value. Fractions must sum
    to 1 (the last split absorbs rounding)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = hash_uniform(id_col, salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        # round the cumulative threshold so 0.8 + 0.1 compares as exactly
        # 0.9 (engine-portable boundary)
        acc = round(acc + fractions[name], 12)
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else \
            expr.when(cond, name)
    return (F.lit(names[0]) if expr is None
            else expr.otherwise(names[-1]))


def deterministic_split(df: DataFrame, id_col: str,
                        fractions: Dict[str, float],
                        salt: str = "split",
                        out_col: str = "split") -> DataFrame:
    """Append a reproducible split label keyed on ``id_col``."""
    return df.withColumn(out_col,
                         split_column(F.col(id_col), fractions, salt))


def deterministic_sample(df: DataFrame, id_col: str, fraction: float,
                         salt: str = "sample") -> DataFrame:
    """Keep a reproducible ``fraction`` of rows keyed on ``id_col``."""
    return df.filter(hash_uniform(F.col(id_col), salt) < F.lit(fraction))


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      fractions: Dict, default_fraction: float = 0.0,
                      salt: str = "strata") -> DataFrame:
    """Reproducible per-stratum sampling: keep each row with its
    stratum's fraction (e.g. downsample boilerplate-heavy sources while
    keeping rare ones whole — the standard corpus-mixing move). Strata
    absent from ``fractions`` use ``default_fraction``. Deterministic
    like every sampler here: pure function of (salt, id), no RNG, no
    shuffle; the stratum lookup compiles to a CASE chain (broadcast
    nothing)."""
    u = hash_uniform(F.col(id_col), salt)
    expr = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(stratum)
        expr = F.when(cond, F.lit(float(frac))) if expr is None \
            else expr.when(cond, F.lit(float(frac)))
    thresh = (F.lit(float(default_fraction)) if expr is None
              else expr.otherwise(F.lit(float(default_fraction))))
    return df.filter(u < thresh)


def cap_per_key(df: DataFrame, key_col: str, n: int,
                order_col: str) -> DataFrame:
    """Keep at most ``n`` rows per key, lowest ``order_col`` first — the
    RefinedWeb-style per-domain/per-source cap (bound any one origin's
    share of the corpus). Deterministic given the order column.

    Scale shape: row_number over (key, order) compiles to
    partial+final WindowGroupLimit (map-side top-n per key before the
    shuffle — the same plan the DP contribution bounders rely on), so a
    corpus-hot key never concentrates more than the surviving n rows
    plus local partials on one task."""
    from pyspark.sql import Window
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    return (df.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= int(n))
            .drop("__rn__"))


def temperature_sample(df: DataFrame, key_col: str, id_col: str,
                       total: int, alpha: float = 0.5,
                       salt: str = "temp") -> DataFrame:
    """Temperature-based source mixing (the pretraining-mixture rule:
    sampling weight of source s proportional to n_s^alpha, alpha < 1
    upweights small/rare sources relative to their raw share): draw a
    deterministic sample of ~``total`` docs whose per-source quotas are
    floor(total * n_s^alpha / sum n^alpha), each source contributing its
    quota of lowest-hash docs.

    Deterministic end to end: quotas are a pure function of the source
    counts (no RNG), per-source membership is the md5-uniform order —
    reproducible across runs, engines, partitionings. A source's quota
    is capped at its size (floor + the cap mean the output can be
    slightly under ``total``; exact integer placement across sources is
    `operators.packing`'s prefix-sum territory and deliberately not
    replicated here).

    Scale shape: one map-side-combined count per source, a
    source-count-sized broadcast of the quota table, and ONE
    row_number window per source (partial+final WindowGroupLimit when
    the quota filter is pushed; parallelism = number of sources, which
    is bounded — document corpora have tens of origins, not millions;
    for per-DOMAIN mixing at web scale use `cap_per_key`-style fixed
    caps instead).
    """
    from pyspark.sql import Window
    counts = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("double").alias("__n__"))
    tot_pow = counts.agg(
        F.sum(F.pow(F.col("__n__"), F.lit(float(alpha))))
        .alias("__z__"))
    quotas = (counts.crossJoin(F.broadcast(tot_pow))
              .select(key_col,
                      F.floor(F.lit(float(total))
                              * F.pow(F.col("__n__"), F.lit(float(alpha)))
                              / F.col("__z__")).cast("long")
                      .alias("__quota__")))
    w = Window.partitionBy(key_col).orderBy(
        hash_uniform(F.col(id_col), salt).asc(), F.col(id_col).asc())
    return (df.withColumn("__rn__", F.row_number().over(w))
            .join(F.broadcast(quotas), key_col)
            .filter(F.col("__rn__") <= F.col("__quota__"))
            .drop("__rn__", "__quota__"))


def kmv_distinct_estimate(df: DataFrame, col: str,
                          k: int = 1024) -> DataFrame:
    """K-minimum-values distinct-count estimate (Bar-Yossef et al. 2002,
    the classic mergeable cardinality sketch): hash every value to a
    uniform in [0, 1); if the k-th smallest hash among DISTINCT values
    is h_k, the distinct count is ~ (k - 1) / h_k. The 100 TB use:
    estimate a vocabulary / key cardinality (to size broadcasts,
    shuffles, and dedup passes) without paying a full distinct shuffle's
    memory — the sketch state is k doubles.

    Deterministic (md5-based hashing, no RNG), so the estimate is
    reproducible across runs and engines — exactly SQL-oracle-checkable,
    unlike HLL sketches whose binary state is engine-private.

    Scale shape: hash, distinct, then the GLOBAL k smallest hashes via
    TakeOrderedAndProject (per-partition top-k before one small merge —
    no full sort; the distinct shuffles only the 1-column hash
    projection, and sizing that shuffle is itself what the estimate is
    usually FOR, so pre-reduce with a coarse groupBy when even that is
    too wide).

    Returns ONE row: (k_used, kth_min double, estimate double). When
    fewer than k distinct values exist the exact distinct count is
    returned in `estimate` (and kth_min is the max seen hash).
    """
    h = hash_uniform(F.col(col), salt="kmv")
    smallest = (df.select(h.alias("h")).distinct()
                .orderBy("h").limit(int(k)))
    return smallest.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("h").alias("kth_min"),
        F.round(
            F.when(F.count(F.lit(1)) < k,
                   F.count(F.lit(1)).cast("double"))
            .otherwise((F.lit(float(k)) - 1.0) / F.max("h")), 6)
        .alias("estimate"))


def weighted_sample_topk(df: DataFrame, weight_col: str, k: int,
                         id_col: str, salt: str = "wsample") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (the
    Efraimidis-Spirakis A-ES scheme): each row draws the md5-uniform
    u(id) and gets key = ln(u) / w; the k largest keys are a weighted
    sample without replacement — rows with twice the weight are twice as
    likely to make the cut, yet the result is a pure function of
    (salt, ids, weights): reproducible across runs, engines, and
    partitionings, unlike rand()-based samplers.

    Scale shape: one TakeOrderedAndProject (per-partition top-k, single
    small merge) — no shuffle of the full corpus, no RNG state. Rows
    with non-positive weight are excluded (they have probability 0).
    Ties (impossible for continuous keys, but cheap insurance) break by
    ascending id.
    """
    u = hash_uniform(F.col(id_col), salt=salt)
    key = F.log(u) / F.col(weight_col).cast("double")
    return (df.filter(F.col(weight_col) > 0)
            .withColumn("__wkey__", key)
            .orderBy(F.col("__wkey__").desc(), F.col(id_col).asc())
            .limit(int(k))
            .drop("__wkey__"))
