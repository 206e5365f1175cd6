"""Syntactic-privacy operators: k-anonymity, l-diversity, suppression,
and keyed pseudonymization.

These are the non-DP half of a privacy pipeline — the release checks
regulators and dataset cards actually cite (Sweeney's k-anonymity,
Machanavajjhala's l-diversity) and the reversible-only-with-the-key id
surrogates used before any analytics run. They compose with the DP
engine: pseudonymize ingestion ids, audit quasi-identifier groups, then
run `DPEngine.aggregate` on what remains.

Everything is one hash-partitioned aggregate or a map-only projection —
k-anonymity is literally groupBy(quasi-cols).count, so the 100-TB plan
is a single map-side-combinable shuffle on the quasi-identifier tuple.

Reference parity: the reference has no syntactic-anonymity operators
(its scope is DP aggregation) — net-new per the project north star,
placed here because a PipelineDP user asks for exactly this next.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipelinedp_spark.functions import text as T


def k_anonymity_report(df: DataFrame,
                       quasi_cols: Sequence[str],
                       k: int) -> DataFrame:
    """Per-equivalence-class audit: one row per distinct quasi-identifier
    tuple with its size and whether it meets k. A release is k-anonymous
    iff every row has ``meets_k`` — check `F.min("meets_k")` or feed the
    violating classes to `suppress_small_groups`. One combinable
    aggregate; no second pass."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).alias("group_size"))
            .select(*quasi_cols, "group_size",
                    (F.col("group_size") >= k).alias("meets_k")))


def l_diversity_report(df: DataFrame,
                       quasi_cols: Sequence[str],
                       sensitive_col: str,
                       l: int) -> DataFrame:
    """Distinct-l-diversity audit: per quasi-identifier class, the number
    of DISTINCT sensitive values and whether it meets l (a k-anonymous
    class whose members all share one diagnosis still leaks — the
    homogeneity attack l-diversity guards). count_distinct is the one
    non-combinable piece; Spark plans it as the standard two-phase
    expand, still a single logical pass."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).alias("group_size"),
                 F.countDistinct(sensitive_col).alias("n_sensitive"))
            .select(*quasi_cols, "group_size", "n_sensitive",
                    (F.col("n_sensitive") >= l).alias("meets_l")))


def suppress_small_groups(df: DataFrame,
                          quasi_cols: Sequence[str],
                          k: int) -> DataFrame:
    """Row suppression to k-anonymity: drop every row whose
    quasi-identifier class has fewer than k members. The minimal-
    distortion mechanism when generalization hierarchies aren't
    available; the suppression RATE is the audit number to report
    alongside. Plan: the class-size aggregate re-joins the input on the
    quasi tuple — two hash exchanges on the same key, which AQE plans as
    one co-partitioned join (broadcast when the violating set is
    small). NULL quasi values form their own class (null-safe join
    keys), matching `k_anonymity_report`'s groupBy semantics — the
    audit and the suppressor agree on NULL classes."""
    sizes = (df.groupBy(*quasi_cols)
             .agg(F.count(F.lit(1)).alias("__gs__"))
             .filter(F.col("__gs__") >= k)
             .select(*[F.col(c).alias(f"__q_{c}") for c in quasi_cols]))
    cond = None
    for c in quasi_cols:
        e = df[c].eqNullSafe(sizes[f"__q_{c}"])
        cond = e if cond is None else (cond & e)
    return df.join(sizes, cond, "left_semi")


def generalize_bucket(col: Column, width: float) -> Column:
    """Fixed-width generalization for numeric quasi-identifiers —
    floor(x / width) * width, the [lo, lo+width) bucket label. The
    standard pre-step that turns a high-cardinality column into one
    k-anonymity can hold on."""
    if width <= 0:
        raise ValueError(f"width must be > 0, got {width}")
    return (F.floor(col / F.lit(width)) * F.lit(width))


def pseudonymize(df: DataFrame,
                 id_cols: Sequence[str],
                 salt: str,
                 out_suffix: str = "_pseudo",
                 drop_original: bool = True) -> DataFrame:
    """Replace identifier columns with stable keyed surrogates:
    hex_to_long(md5(salt || id)) — deterministic for a given salt (joins
    across tables pseudonymized with the same salt still work), and the
    engine-portable hash this repo uses everywhere, so downstream
    systems can re-derive the mapping only if they hold the salt.
    Map-only projection; rotate the salt per release to unlink releases
    from each other."""
    if not salt:
        raise ValueError("salt must be non-empty — an unsalted hash is "
                         "a dictionary-attackable pseudonym")
    out = df
    for c in id_cols:
        surrogate = T.hex_to_long(F.md5(F.concat(
            F.lit(salt + ":"), F.col(c).cast("string"))))
        out = out.withColumn(c + out_suffix, surrogate)
        if drop_original:
            out = out.drop(c)
    return out


def pseudonym_collision_audit(df: DataFrame, id_col: str,
                              salt: str) -> DataFrame:
    """One-row sanity check for a pseudonymization run: distinct raw ids
    vs distinct surrogates (a difference means a hash collision folded
    two people together — at 60-bit surrogates expect none until ~2^30
    ids). Single aggregate over the id column."""
    surrogate = T.hex_to_long(F.md5(F.concat(
        F.lit(salt + ":"), F.col(id_col).cast("string"))))
    return df.select(F.col(id_col).alias("__raw__"),
                     surrogate.alias("__p__")).agg(
        F.countDistinct("__raw__").alias("n_ids"),
        F.countDistinct("__p__").alias("n_pseudonyms"),
        (F.countDistinct("__raw__") == F.countDistinct("__p__"))
        .alias("collision_free"))
