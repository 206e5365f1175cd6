"""Distributed k-means (Lloyd's) over an embedding column.

`similarity.train_ivf_centroids` is the SAMPLE path: driver-side numpy
over a bounded sample, used to train quantizers. This module is the
FULL-CORPUS path — when the corpus is too skewed for a sample to
represent (topic clustering for data curation, cluster-balanced
mixture weights, SemDeDup cell assignment at web scale), every row
must vote in the centroid update. Reference scope: PipelineDP has no
clustering; this is net-new LLM-pipeline surface (cluster-based
curation as in SemDeDup, Abbas et al. 2023).

Scale shape (the 100 TB posture):
- Assignment is PURE CODEGEN: k dot-product folds per row
  (`aggregate(zip_with(v, cent, *), 0.0, +)`) with the k×d centroid
  matrix inlined as literals — no Python, no join, no shuffle.
- The centroid update is one `posexplode` → `groupBy(cluster, pos)`
  sum/count — map-side combinable, so each iteration shuffles at most
  `num_partitions × k × d` tiny rows regardless of corpus size.
- The per-iteration driver materialization is the k×d stat table
  (bounded model-table collect, same class as the DSIR weight table).
- The quantized projection is localCheckpoint'd ONCE so iterations
  re-read a materialized two-column table instead of re-scanning and
  re-quantizing the source parquet per iteration. On a real cluster
  at 100 TB, write that projection to storage instead and raise
  `iters` only as convergence requires.

Determinism contract (what makes a distributed iterative fit
oracle-checkable): inputs are quantized to integers
(`floor(x * quant_scale + 0.5)` — identical in Spark and DuckDB, no
HALF_UP/HALF_EVEN divergence), so centroid-update sums are EXACT
64-bit integer arithmetic in any partition order; means are one
correctly-rounded long/long double division; assignment scores are
sequential left-to-right folds (Spark `aggregate` ≡ DuckDB
`list_dot_product`), bit-identical on both engines. Overflow bound:
`quant_scale * max|x| * largest_cluster_count < 2^62` — with the
default 2^20 scale and unit-normish embeddings that allows ~4e12 rows
per cluster; raise `quant_scale` only with that bound in mind.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["kmeans_fit", "kmeans_assign_expr", "kmeans_assign",
           "cluster_balanced_sample", "centroids_table",
           "kmeans_partial_sums", "centroids_from_sums",
           "leakage_safe_split"]


def _score_structs(vd: Column, centroids: Sequence[Sequence[float]]
                   ) -> List[Column]:
    """One (score, -cluster) struct per centroid. Score is the
    argmin-euclidean surrogate `dot(v, c) - 0.5 * ||c||^2`; the
    ||c||^2 constant is folded driver-side with the same sequential
    order DuckDB's `list_dot_product(c, c)` uses, so both engines see
    bit-identical operands."""
    out = []
    for c, cent in enumerate(centroids):
        lit_cent = F.array(*[F.lit(float(x)) for x in cent])
        dot = F.aggregate(
            F.zip_with(vd, lit_cent, lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x)
        normsq = 0.0
        for x in cent:
            normsq += float(x) * float(x)
        out.append(F.struct(
            (dot - F.lit(0.5 * normsq)).alias("s"),
            F.lit(-c).alias("nc")))
    return out


def kmeans_assign_expr(vd: Column,
                       centroids: Sequence[Sequence[float]]) -> Column:
    """Nearest-centroid cluster id as a pure column expression
    (codegen; ties break to the LOWEST cluster id via max over
    (score, -cluster) structs)."""
    if len(centroids) == 1:
        return F.lit(0).cast("long")
    best = F.greatest(*_score_structs(vd, centroids))
    return (-best["nc"]).cast("long")


def _quantize(vec_col: Column, quant_scale: int) -> Column:
    return F.transform(
        vec_col.cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(quant_scale)) + F.lit(0.5))
        .cast("long"))


def kmeans_fit(df: DataFrame,
               k: int = 8,
               iters: int = 3,
               id_col: str = "vec_id",
               vec_col: str = "embedding",
               quant_scale: int = 1 << 20,
               ) -> Tuple[List[List[float]], List[int]]:
    """Lloyd's k-means on the full corpus; returns
    (centroids, cluster_sizes) where centroids is a k×d list of
    floats IN QUANTIZED UNITS (divide by `quant_scale` for the
    original scale) and cluster_sizes is the final-iteration member
    count per cluster (0 for a cluster that emptied — its centroid is
    carried unchanged, the standard Lloyd treatment).

    Init is the k lowest-id vectors — reproducible across runs and
    partition layouts (TakeOrderedAndProject, no full sort). For
    k-means++-quality init at scale, pass the corpus through
    `similarity.train_ivf_centroids` on a sample first and seed a
    follow-up refinement; this function's contract is exact
    determinism, not init quality.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    base = (df.select(F.col(id_col).alias("_id"),
                      _quantize(F.col(vec_col), quant_scale).alias("_vq"))
            .localCheckpoint())
    init_rows = sorted(base.orderBy("_id").limit(k).collect(),
                       key=lambda r: r["_id"])
    if len(init_rows) < k:
        raise ValueError(f"k={k} but corpus has only {len(init_rows)} rows")
    cents: List[List[float]] = [[float(v) for v in r["_vq"]]
                                for r in init_rows]
    sizes = [0] * k
    vd = F.transform(F.col("_vq"), lambda x: x.cast("double"))
    for _ in range(iters):
        assigned = base.select(
            kmeans_assign_expr(vd, cents).alias("_cluster"), "_vq")
        stats = (assigned
                 .select("_cluster", F.posexplode("_vq")
                         .alias("_pos", "_val"))
                 .groupBy("_cluster", "_pos")
                 .agg(F.sum("_val").alias("_s"),
                      F.count(F.lit(1)).alias("_n"))
                 .collect())
        by_cluster: dict = {}
        counts = [0] * k
        for r in stats:
            by_cluster.setdefault(r["_cluster"], {})[r["_pos"]] = \
                (r["_s"], r["_n"])
            counts[r["_cluster"]] = r["_n"]
        for c in range(k):
            if c in by_cluster:
                d = by_cluster[c]
                cents[c] = [d[p][0] / d[p][1] for p in range(len(d))]
        sizes = counts
    return cents, sizes


def kmeans_assign(df: DataFrame,
                  centroids: Sequence[Sequence[float]],
                  id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  quant_scale: int = 1 << 20) -> DataFrame:
    """(id, cluster) for every row against fixed centroids (in
    quantized units, i.e. straight from `kmeans_fit`). Pure codegen —
    the serving-side companion to the fit."""
    vd = F.transform(_quantize(F.col(vec_col), quant_scale),
                     lambda x: x.cast("double"))
    return df.select(F.col(id_col),
                     kmeans_assign_expr(vd, centroids).alias("cluster"))


def cluster_balanced_sample(df: DataFrame,
                            k: int = 8,
                            iters: int = 2,
                            per_cluster: int = 10,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            quant_scale: int = 1 << 20,
                            centroids: Optional[Sequence[Sequence[float]]]
                            = None) -> DataFrame:
    """Cluster-balanced corpus subset (the cluster-then-sample curation
    move: cap every topic at `per_cluster` rows so the head topic of a
    web crawl cannot drown the tail): k-means assignment against
    `centroids` (fit here when not passed), then the per-cluster
    deterministic top-`per_cluster` in portable-hash order — a
    content-independent shuffle order that is reproducible across
    engines and partition layouts, unlike rand().

    Scale shape: assignment is codegen (no shuffle); the per-cluster
    cap compiles to WindowGroupLimit, whose partial map-side pass keeps
    at most `per_cluster` rows per partition per cluster before the
    k-way final — a hot cluster never funnels the corpus through one
    task. Returns (id, cluster, rank)."""
    from pyspark.sql import Window

    from pipelinedp_spark.functions.text import hex_to_long

    if centroids is None:
        centroids, _ = kmeans_fit(df, k=k, iters=iters, id_col=id_col,
                                  vec_col=vec_col,
                                  quant_scale=quant_scale)
    asg = kmeans_assign(df, centroids, id_col=id_col, vec_col=vec_col,
                        quant_scale=quant_scale)
    order = hex_to_long(F.md5(F.col(id_col).cast("string")))
    w = (Window.partitionBy("cluster")
         .orderBy(order.asc(), F.col(id_col).asc()))
    return (asg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= per_cluster)
            .select(F.col(id_col), F.col("cluster"),
                    F.col("rank").cast("long").alias("rank")))


def centroids_table(spark: SparkSession,
                    centroids: Sequence[Sequence[float]],
                    sizes: Optional[Sequence[int]] = None,
                    round_dp: int = 6) -> DataFrame:
    """Materialize fit output as a (cluster, pos, centroid[, members])
    DataFrame via a VALUES scan (k×d rows — tiny; avoids the
    multi-second createDataFrame path)."""
    rows = []
    for c, cent in enumerate(centroids):
        for p, v in enumerate(cent):
            cell = f"({c}, {p}, {round(float(v), round_dp)!r}"
            if sizes is not None:
                cell += f", {int(sizes[c])}"
            rows.append(cell + ")")
    cols = "cluster, pos, centroid" + (", members" if sizes is not None
                                       else "")
    return spark.sql(
        f"SELECT CAST(cluster AS BIGINT) AS cluster, "
        f"CAST(pos AS BIGINT) AS pos, "
        f"CAST(centroid AS DOUBLE) AS centroid"
        + (", CAST(members AS BIGINT) AS members"
           if sizes is not None else "")
        + f" FROM VALUES {', '.join(rows)} AS t({cols})")


def kmeans_partial_sums(df: DataFrame,
                        centroids: Sequence[Sequence[float]],
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        quant_scale: int = 1 << 20) -> DataFrame:
    """Mergeable update state for one Lloyd step against FIXED
    centroids: (cluster, pos, s, n) integer sums. Because the sums are
    exact 64-bit integers, partials from any corpus split merge
    associatively (`groupBy(cluster, pos).sum`) to exactly the
    full-corpus state — the sketch-style contract that lets incremental
    snapshots, per-datacenter shards, or stream micro-batches maintain
    one model without re-reading history. Feed the merged table to
    `centroids_from_sums`."""
    vq = _quantize(F.col(vec_col), quant_scale)
    vd = F.transform(vq, lambda x: x.cast("double"))
    return (df.select(kmeans_assign_expr(vd, centroids).alias("cluster"),
                      vq.alias("_vq"))
            .select("cluster", F.posexplode("_vq").alias("pos", "_v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("_v").alias("s"),
                 F.count(F.lit(1)).alias("n")))


def centroids_from_sums(sum_rows,
                        centroids: Sequence[Sequence[float]]
                        ) -> Tuple[List[List[float]], List[int]]:
    """One Lloyd update from (cluster, pos, s, n) rows (collected
    partial-sum state, possibly merged across shards/batches): mean
    per dimension, previous centroid carried for empty clusters.
    Identical arithmetic to `kmeans_fit`'s in-loop update."""
    k = len(centroids)
    by_cluster: dict = {}
    counts = [0] * k
    for r in sum_rows:
        c, p = int(r["cluster"]), int(r["pos"])
        by_cluster.setdefault(c, {})[p] = (int(r["s"]), int(r["n"]))
        counts[c] = int(r["n"])
    out = [list(map(float, cent)) for cent in centroids]
    for c in range(k):
        if c in by_cluster:
            d = by_cluster[c]
            out[c] = [d[p][0] / d[p][1] for p in range(len(d))]
    return out, counts


def leakage_safe_split(df: DataFrame,
                       cluster_col: str,
                       fractions: Optional[dict] = None,
                       salt: str = "split") -> DataFrame:
    """Train/val/test assignment that can never leak near-duplicates
    across splits: the split is a deterministic hash of the CLUSTER id
    (near-dup component, k-means cell, URL domain — whatever grouping
    defines "same content"), so an entire cluster lands in one split.
    Row-hash splits put one near-dup copy in train and its twin in
    eval — silently inflating eval scores; this is the standard fix.

    Pure codegen (md5-derived uniform in [0,1) on the cluster id, same
    portable-hash idiom as `functions.sampling`); adds a `split`
    column. Fractions must sum to 1 (default 80/10/10)."""
    from pipelinedp_spark.functions.text import hex_to_long

    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = (hex_to_long(F.md5(F.concat(
        F.lit(salt + ":"), F.col(cluster_col).cast("string"))))
        / F.lit(float(1 << 60)))
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.withColumn("split", expr)
