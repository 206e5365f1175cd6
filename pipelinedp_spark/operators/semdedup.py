"""SemDeDup-style semantic deduplication over an embedding column.

Following Abbas et al., "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" (arXiv:2303.09540): k-means-cluster the
embedding space with a coarse quantizer, then compare vectors ONLY within
their cluster and drop any vector whose cosine similarity to an
earlier-id cluster member meets the threshold (keep-first policy — the
deterministic analogue of the paper's keep-farthest-from-centroid rule,
chosen so a SQL oracle can mirror the result exactly).

Scale shape (the whole point of the clustering step):
- The quantizer trains once on a deterministic driver-side sample
  (`sample_corpus_matrix`, bounded) and is broadcast via closure — at
  100 TB you train it offline and pass `centroids` in.
- Cell assignment is one Arrow-batched numpy pass, no shuffle.
- The pairwise stage shuffles once on `cell` and does an in-cluster
  normalized mat-mul per group (`applyInPandas`) — O(m^2) floats per
  cluster but vectorized, never a row-level self-join. Cluster size is
  controlled by `num_clusters`: SemDeDup at production scale uses tens of
  thousands of clusters so m stays ~corpus/num_clusters. A cluster
  exceeding `max_cluster_rows` raises with sizing advice rather than
  silently quadratic-ing.

No reference counterpart (net-new LLM-pipeline operator per the project
north star; reference repo = OpenMined/PipelineDP, which has no
embedding ops).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pipelinedp_spark.operators.similarity import (sample_corpus_matrix,
                                                   train_ivf_centroids)


def assign_cells_udf(centroids: "np.ndarray"):
    """Arrow-batched argmax-cosine cell assignment. Ties break to the
    lowest cell index (np.argmax picks the first maximum), matching the
    SQL mirror's ``ORDER BY dot DESC, cell ASC`` row_number rule.
    Argmax over the raw vector equals argmax over the normalized vector
    (positive scaling), so no normalization is needed here."""
    cts = np.asarray(centroids, dtype="float64")

    @pandas_udf("int")
    def _cell(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="int32")
        v = np.stack(vec.to_numpy()).astype("float64")
        return pd.Series((v @ cts.T).argmax(axis=1).astype("int32"))

    return _cell


def semantic_dedup(df: DataFrame,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   num_clusters: int = 16,
                   cosine_threshold: float = 0.7,
                   seed: int = 7,
                   centroids: Optional["np.ndarray"] = None,
                   sample_size: int = 10_000,
                   max_cluster_rows: int = 500_000) -> DataFrame:
    """Mark semantic duplicates: ``is_dup`` is true iff some same-cluster
    vector with a smaller id has round(cosine, 6) >= cosine_threshold.

    Returns (id_col, cell, is_dup) — filter ``~is_dup`` for the kept set.
    Pass ``centroids`` (shape (num_clusters, dim)) to reuse a quantizer
    trained offline; otherwise one is trained on the lowest-id sample
    exactly like `similarity.ivf_topk`.
    """
    if centroids is None:
        x = sample_corpus_matrix(df, id_col, vec_col, sample_size)
        centroids = train_ivf_centroids(x, num_clusters, seed)

    src = df.select(F.col(id_col).cast("long").alias("_id"),
                    F.col(vec_col).cast("array<double>").alias("_vec"))
    cells = src.withColumn("cell",
                           assign_cells_udf(centroids)(F.col("_vec")))

    out_schema = f"{id_col} long, cell int, is_dup boolean"
    thr = float(cosine_threshold)
    cap = int(max_cluster_rows)

    def _mark(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > cap:
            raise ValueError(
                f"cluster {int(pdf['cell'].iloc[0])} has {len(pdf)} rows "
                f"> max_cluster_rows={cap}; raise num_clusters so "
                "clusters stay small enough for the in-cluster mat-mul")
        pdf = pdf.sort_values("_id")
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        cos = np.round(unit @ unit.T, 6)
        # Strictly-lower triangle: does any earlier (smaller-id) member
        # meet the threshold?
        hit = np.tril(cos >= thr, k=-1).any(axis=1)
        return pd.DataFrame({id_col: ids,
                             "cell": pdf["cell"].to_numpy(),
                             "is_dup": hit})

    return (cells.groupBy("cell")
            .applyInPandas(_mark, schema=out_schema))


def semantic_pairs(df: DataFrame,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   num_clusters: int = 16,
                   cosine_threshold: float = 0.7,
                   seed: int = 7,
                   centroids: Optional["np.ndarray"] = None,
                   sample_size: int = 10_000,
                   max_cluster_rows: int = 500_000) -> DataFrame:
    """Within-cluster near-dup PAIRS (id_a < id_b, round(cos,6) >= tau)
    — the edge list `semantic_dedup` prunes with and the input to
    `graph.connected_components` for semantic cluster ids. Same
    quantizer, same in-cluster mat-mul shape."""
    if centroids is None:
        x = sample_corpus_matrix(df, id_col, vec_col, sample_size)
        centroids = train_ivf_centroids(x, num_clusters, seed)

    src = df.select(F.col(id_col).cast("long").alias("_id"),
                    F.col(vec_col).cast("array<double>").alias("_vec"))
    cells = src.withColumn("cell",
                           assign_cells_udf(centroids)(F.col("_vec")))
    thr = float(cosine_threshold)
    cap = int(max_cluster_rows)
    out_schema = "id_a long, id_b long, cosine double"

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > cap:
            raise ValueError(
                f"cluster {int(pdf['cell'].iloc[0])} has {len(pdf)} rows "
                f"> max_cluster_rows={cap}; raise num_clusters")
        pdf = pdf.sort_values("_id")
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        cos = np.round(unit @ unit.T, 6)
        keep = np.triu(cos >= thr, k=1)
        ai, bj = np.nonzero(keep)
        return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bj],
                             "cosine": cos[ai, bj]})

    return (cells.groupBy("cell")
            .applyInPandas(_pairs, schema=out_schema))
