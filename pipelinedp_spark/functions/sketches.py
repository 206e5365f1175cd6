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
from typing import Dict, Tuple

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


def hll_distinct_estimate_by(df: DataFrame, col: str,
                             group_cols: list, p: int = 10) -> DataFrame:
    """Grouped `hll_distinct_estimate`: one HLL row PER GROUP (e.g.
    distinct users per time window) — same register math, the groupBy
    key simply extends the register shuffle key, so the whole thing is
    still two map-side-combined aggregations.

    Returns group_cols + (m, nonzero_registers, raw_estimate, estimate).
    """
    m = 1 << int(p)
    alpha = hll_alpha(m)
    v = F.col(col).cast("string")
    reg = (hex_to_long(F.md5(F.concat(F.lit("hllr:"), v))) % m).alias("reg")
    rho = hll_rho(v).alias("rho")
    regs = (df.select(*group_cols, reg, rho)
            .groupBy(*group_cols, "reg").agg(F.max("rho").alias("mr")))
    term = F.expr(f"shiftright(CAST({1 << _HLL_SCALE} AS BIGINT), mr)")
    agg = regs.groupBy(*group_cols).agg(
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
        *group_cols,
        F.lit(m).cast("long").alias("m"),
        F.col("nz").alias("nonzero_registers"),
        F.round(raw, 6).alias("raw_estimate"),
        F.round(est, 6).alias("estimate"))


def hll_reg_rho_py(value: str, p: int) -> Tuple[int, int]:
    """Driver/UDF-side twin of the (register, rho) draw — byte-identical
    to the column expressions (md5 over 'hllr:'/'hllw:' salted strings,
    60-bit uniforms, the same ln/floor rho), so streaming state merged
    in Python agrees exactly with batch registers."""
    import hashlib
    import math
    m = 1 << int(p)
    reg = int(hashlib.md5(f"hllr:{value}".encode()).hexdigest()[:15],
              16) % m
    u = int(hashlib.md5(f"hllw:{value}".encode()).hexdigest()[:15],
            16) / float(1 << 60)
    u = max(u, 2.0 ** -60)
    rho = int(math.floor(math.log(u) / math.log(0.5))) + 1
    return reg, rho


def hll_estimate_py(max_rhos: Dict[int, int], p: int) -> Tuple[float, float]:
    """Driver/UDF-side twin of the estimate formula (same integer-scaled
    register sum, bias constant, and linear-counting branch, with the
    identical floating-point operation order). Returns
    (raw_estimate, estimate), both rounded to 6 places."""
    import math
    m = 1 << int(p)
    alpha = hll_alpha(m)
    nz = len(max_rhos)
    present_scaled = sum((1 << _HLL_SCALE) >> mr if mr <= _HLL_SCALE
                         else 0 for mr in max_rhos.values())
    denom_scaled = present_scaled + (m - nz) * (1 << _HLL_SCALE)
    raw = (alpha * m * m) / (denom_scaled / float(1 << _HLL_SCALE))
    zeros = m - nz
    if raw <= 2.5 * m and zeros > 0:
        est = float(m) * math.log(float(m) / float(zeros))
    else:
        est = raw
    return round(raw, 6), round(est, 6)


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

    The register sum is exact integer arithmetic: present registers add
    2^(SCALE - mr) (0 when mr > SCALE, via the shift); each absent
    register adds 2^SCALE. All BIGINT — order-independent, unlike a
    floating sum over registers whose last ulp would depend on
    partition visit order.
    """
    return hll_distinct_estimate_by(df, col, [], p)


def kmv_overlap_estimate(df_a: DataFrame, df_b: DataFrame, col: str,
                         k: int = 512) -> DataFrame:
    """Set-operation estimates between two corpora's value sets from
    their KMV sketches (the theta-sketch idea, Dasgupta et al. 2016,
    specialized to the fixed-k minhash form): hash both sides with the
    SAME salt as `sampling.kmv_distinct_estimate`, take the k smallest
    distinct hashes of the UNION, and within that uniform sample count
    how many values occur on both sides — an unbiased Jaccard
    estimator, which with the union-cardinality estimate (k-1)/h_k
    yields intersection size. The 100 TB use: "how much vocabulary do
    these two sources share?" before paying for a cross-corpus dedup.

    Scale shape: per side one distinct over a 1-column hash projection,
    one k-row TakeOrderedAndProject after a full-outer merge of the two
    hash sets on the hash itself; state is k (hash, flags) rows.
    Deterministic (md5), so exactly SQL-oracle-checkable.

    Returns ONE row: (k_used, kth_min, union_est, jaccard_est,
    intersection_est), estimates rounded to 6 places. When the union
    has < k distinct values everything is exact.
    """
    ha = (df_a.select(hash_uniform(F.col(col), salt="kmv").alias("h"))
          .distinct().withColumn("in_a", F.lit(1)))
    hb = (df_b.select(hash_uniform(F.col(col), salt="kmv").alias("h"))
          .distinct().withColumn("in_b", F.lit(1)))
    merged = (ha.join(hb, "h", "full_outer")
              .select("h",
                      F.coalesce("in_a", F.lit(0)).alias("in_a"),
                      F.coalesce("in_b", F.lit(0)).alias("in_b")))
    smallest = merged.orderBy("h").limit(int(k))
    ku = F.count(F.lit(1)).cast("long")
    union_est = F.when(ku < k, ku.cast("double")) \
        .otherwise((F.lit(float(k)) - 1.0) / F.max("h"))
    jac = (F.sum(F.col("in_a") * F.col("in_b")).cast("double")
           / ku.cast("double"))
    return smallest.agg(
        ku.alias("k_used"),
        F.max("h").alias("kth_min"),
        F.round(union_est, 6).alias("union_est"),
        F.round(jac, 6).alias("jaccard_est"),
        F.round(jac * union_est, 6).alias("intersection_est"))


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
