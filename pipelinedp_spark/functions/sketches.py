"""Mergeable cardinality / frequency sketches, deterministic by design.

Classic sketches (HyperLogLog, count-min) normally carry engine-private
binary state and RNG-seeded hashing, which makes their output
untestable across engines. These variants derive every hash from md5 —
the estimate is a pure function of the data, reproducible across runs,
partitionings, and engines, so DuckDB can mirror the math exactly.

The 100 TB role: both sketches reduce an arbitrarily large corpus to
KB-scale state with ONE map-side-combined shuffle of a tiny projection
— the cheap first pass that sizes the expensive ones (how many distinct
keys will that dedup shuffle carry? which tokens are heavy enough to
salt?).

No reference counterpart (net-new per project north star; the reference
has no sketch layer at all).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipelinedp_spark.functions.sampling import hash_uniform
from pipelinedp_spark.functions.text import hex_to_long

# Register sums are accumulated as integers scaled by 2**_HLL_SCALE so the
# cross-register floating-point sum (whose result would depend on partition
# visit order in the last ulp) becomes an exact, order-independent BIGINT
# sum. rho > _HLL_SCALE truncates to 0 — the standard HLL truncation, made
# explicit and engine-portable. 1024 registers * 2**50 < 2**63: no overflow.
_HLL_SCALE = 50


def hll_rho(value: Column, salt: str = "hllw") -> Column:
    """Geometric(1/2) 'leading-zeros + 1' draw from an md5 uniform:
    rho = floor(log_{1/2}(u)) + 1, so P(rho >= k) = 2^-(k-1) exactly.
    Derived from the uniform rather than bit-twiddling so one ln/floor
    mirrors bit-identically in SQL engines."""
    # Floor u at 2^-60 (the hash's own granularity): u = 0 is a
    # 2^-60-probability draw whose ln would be -inf in some engines.
    u = F.greatest(hash_uniform(value, salt=salt), F.lit(2.0 ** -60))
    return (F.floor(F.log(u) / F.log(F.lit(0.5))) + 1).cast("int")


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant for m >= 128 registers."""
    if m < 128:
        raise ValueError("use p >= 7 (m >= 128 registers)")
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct_estimate(df: DataFrame, col: str,
                          p: int = 10) -> DataFrame:
    """HyperLogLog distinct-count estimate (Flajolet et al. 2007) with
    m = 2**p registers, deterministic md5 hashing, and the small-range
    linear-counting correction.

    Scale shape: NO distinct pass at all — rho is a function of the
    value, so max(rho) over occurrences equals max over distinct values;
    the only shuffle is a map-side-combined groupBy over <= m register
    rows of a 2-int projection. Sketch state: m small ints (mergeable by
    register-wise max across corpora/engines).

    Returns ONE row: (m, nonzero_registers, raw_estimate, estimate),
    estimates rounded to 6 places.
    """
    m = 1 << int(p)
    alpha = hll_alpha(m)
    v = F.col(col).cast("string")
    reg = (hex_to_long(F.md5(F.concat(F.lit("hllr:"), v))) % m).alias("reg")
    rho = hll_rho(v).alias("rho")
    regs = (df.select(reg, rho)
            .groupBy("reg").agg(F.max("rho").alias("mr")))
    # Exact integer register sum: present registers add 2^(SCALE - mr)
    # (0 when mr > SCALE, via the shift); each of the (m - nonzero)
    # absent registers adds 2^SCALE. All BIGINT — order-independent.
    # (F.shiftright takes only a literal shift; rho <= 61 so the JVM's
    # mod-64 shift semantics never wrap.)
    term = F.expr(f"shiftright(CAST({1 << _HLL_SCALE} AS BIGINT), mr)")
    agg = regs.agg(
        F.count(F.lit(1)).cast("long").alias("nz"),
        F.sum(term).cast("long").alias("present_scaled"))
    denom_scaled = (F.col("present_scaled")
                    + (F.lit(m) - F.col("nz"))
                    * F.lit(1 << _HLL_SCALE).cast("long"))
    raw = (F.lit(alpha * m * m)
           / (denom_scaled.cast("double") / F.lit(float(1 << _HLL_SCALE))))
    zeros = F.lit(m) - F.col("nz")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        F.col("nz").alias("nonzero_registers"),
        F.round(raw, 6).alias("raw_estimate"),
        F.round(est, 6).alias("estimate"))


def cms_counters(df: DataFrame, col: str, depth: int = 4,
                 width: int = 1024) -> DataFrame:
    """Count-min sketch counters (Cormode & Muthukrishnan 2005): depth
    independent md5 hash rows of `width` buckets; counter[j][b] = number
    of occurrences hashing to bucket b under hash j.

    Scale shape: one explode to depth rows per occurrence (a 2-int
    projection) and one map-side-combined groupBy to <= depth*width
    counter rows — corpus size never appears in the state. Counters are
    integers (exact, mergeable by +).

    Returns (j, bucket, cnt).
    """
    v = F.col(col).cast("string")
    pairs = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 (hex_to_long(F.md5(F.concat(F.lit(f"cms{j}:"), v)))
                  % width).alias("bucket"))
        for j in range(int(depth))
    ])
    return (df.select(F.explode(pairs).alias("p"))
            .select("p.j", "p.bucket")
            .groupBy("j", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def cms_estimate(counters: DataFrame, items: DataFrame, col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-query the sketch: estimated count of each distinct item =
    min over the depth rows of its bucket counters (an upper bound on
    the true count; never an underestimate).

    Scale shape: the counter table is <= depth*width rows — broadcast;
    the probe side computes its depth buckets inline and takes an
    integer min per item. Missing counters read as 0 (item never seen).

    Returns (col, est_count).
    """
    v = F.col(col).cast("string")
    probes = items.select(v.alias(col)).distinct().select(
        col,
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     (hex_to_long(F.md5(F.concat(F.lit(f"cms{j}:"),
                                                 F.col(col))))
                      % width).alias("bucket"))
            for j in range(int(depth))
        ])).alias("p")).select(col, "p.j", "p.bucket")
    joined = probes.join(F.broadcast(counters), ["j", "bucket"], "left")
    return (joined.groupBy(col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                 .alias("est_count")))
