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
  thousands of clusters so m stays ~corpus/num_clusters.
- Oversize clusters are AUTO-SPLIT before the pairwise stage: a cheap
  map-side-combinable count finds cells over `max_cluster_rows`, and only
  those cells are re-quantized with per-cell sub-centroids trained on a
  bounded per-cell sample (`refine_oversize_cells`), up to
  `auto_split_rounds` rounds. Under-cap cells keep their ids untouched,
  so the common path is byte-identical to no refinement. A cell still
  over cap after all rounds (e.g. one point repeated > cap times —
  unsplittable) raises with sizing advice rather than silently
  quadratic-ing. Splitting is semantics-affecting in the same way
  `num_clusters` is: vectors moved to different sub-cells are no longer
  compared, i.e. dedup gets coarser exactly where the space is densest.

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


def refine_oversize_cells(cells: DataFrame,
                          max_cluster_rows: int,
                          seed: int = 7,
                          sub_k: int = 16,
                          sample_per_cell: int = 2048,
                          max_rounds: int = 3,
                          id_col: str = "_id",
                          vec_col: str = "_vec") -> DataFrame:
    """Split cells larger than ``max_cluster_rows`` by re-quantizing ONLY
    those cells with per-cell sub-centroids, repeating up to
    ``max_rounds`` times. Input/output: (id_col, vec_col, cell int).

    Scale shape per round:
    - One map-side-combinable groupBy("cell").count() finds over-cap
      cells; the collected list is <= total_rows / max_cluster_rows ids.
    - The per-cell training sample is a partial+final WindowGroupLimit
      (row_number <= sample_per_cell), so the driver collect is bounded
      by n_over_cells * sample_per_cell rows.
    - Sub-cell assignment is one Arrow-batched pass; under-cap rows pass
      through with their cell id unchanged (zero-round input returns the
      exact input plan — the common path costs one count agg only).
    - New cell ids start above the current max id, so they never collide
      with surviving cells.

    Rounds that make no progress (an unsplittable cell: > cap copies of
    one point) exit early; callers treat any remaining over-cap cell as
    an error (see `semantic_dedup`).
    """
    from pyspark.sql import Window

    cap = int(max_cluster_rows)
    for rnd in range(int(max_rounds)):
        counts = cells.groupBy("cell").agg(
            F.count(F.lit(1)).alias("_n")).collect()
        over = sorted(int(r["cell"]) for r in counts if r["_n"] > cap)
        if not over:
            return cells
        # Only now that a split is certain: materialize the input so the
        # sample window and the re-assignment below don't each re-run the
        # upstream assignment chain (the happy path above stays lazy —
        # it costs one count agg on the un-checkpointed plan).
        if rnd == 0:
            cells = cells.localCheckpoint(eager=True)
        base = max(int(r["cell"]) for r in counts) + 1

        w = Window.partitionBy("cell").orderBy(id_col)
        sample_pdf = (cells.filter(F.col("cell").isin(over))
                      .withColumn("_rn", F.row_number().over(w))
                      .filter(F.col("_rn") <= int(sample_per_cell))
                      .select("cell", vec_col).toPandas())
        sub_centroids = {}
        new_base = {}
        for i, c in enumerate(over):
            mat = np.stack(sample_pdf.loc[sample_pdf["cell"] == c, vec_col]
                           .to_numpy()).astype("float64")
            sub_centroids[c] = train_ivf_centroids(
                mat, int(sub_k), seed + 1 + rnd)
            new_base[c] = base + i * int(sub_k)

        @pandas_udf("int")
        def _recell(cell: pd.Series, vec: pd.Series) -> pd.Series:
            out = cell.to_numpy(dtype="int64").copy()
            for c, cts in sub_centroids.items():
                m = out == c
                if not m.any():
                    continue
                v = np.stack(vec[m].to_numpy()).astype("float64")
                out[m] = new_base[c] + (v @ cts.T).argmax(axis=1)
            return pd.Series(out.astype("int32"))

        refined = cells.withColumn(
            "cell", _recell(F.col("cell"), F.col(vec_col)))
        # Materialize: the next round's count (and the final pairwise
        # stage) must not re-run this round's assignment chain.
        cells = refined.localCheckpoint(eager=True)
        # No progress (every over-cap cell landed whole in one sub-cell —
        # unsplittable, e.g. > cap copies of one point): further rounds
        # are futile; the caller's cap check reports the oversize cell.
        parent_n = {int(r["cell"]): r["_n"] for r in counts}
        new_counts = {int(r["cell"]): r["_n"] for r in cells.groupBy(
            "cell").agg(F.count(F.lit(1)).alias("_n")).collect()}
        if all(any(new_counts.get(new_base[c] + j, 0) == parent_n[c]
                   for j in range(int(sub_k))) for c in over):
            return cells
    return cells


def semantic_dedup(df: DataFrame,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   num_clusters: int = 16,
                   cosine_threshold: float = 0.7,
                   seed: int = 7,
                   centroids: Optional["np.ndarray"] = None,
                   sample_size: int = 10_000,
                   max_cluster_rows: int = 500_000,
                   auto_split_rounds: int = 3) -> DataFrame:
    """Mark semantic duplicates: ``is_dup`` is true iff some same-cluster
    vector with a smaller id has round(cosine, 6) >= cosine_threshold.

    Returns (id_col, cell, is_dup) — filter ``~is_dup`` for the kept set.
    Pass ``centroids`` (shape (num_clusters, dim)) to reuse a quantizer
    trained offline; otherwise one is trained on the lowest-id sample
    exactly like `similarity.ivf_topk`. Cells over ``max_cluster_rows``
    are re-quantized into sub-cells first (`refine_oversize_cells`,
    ``auto_split_rounds`` rounds; 0 disables and oversize cells raise).
    """
    if centroids is None:
        x = sample_corpus_matrix(df, id_col, vec_col, sample_size)
        centroids = train_ivf_centroids(x, num_clusters, seed)

    src = df.select(F.col(id_col).cast("long").alias("_id"),
                    F.col(vec_col).cast("array<double>").alias("_vec"))
    cells = src.withColumn("cell",
                           assign_cells_udf(centroids)(F.col("_vec")))
    if auto_split_rounds:
        cells = refine_oversize_cells(cells, max_cluster_rows, seed,
                                      max_rounds=auto_split_rounds)

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
                   max_cluster_rows: int = 500_000,
                   auto_split_rounds: int = 3) -> DataFrame:
    """Within-cluster near-dup PAIRS (id_a < id_b, round(cos,6) >= tau)
    — the edge list `semantic_dedup` prunes with and the input to
    `graph.connected_components` for semantic cluster ids. Same
    quantizer, same in-cluster mat-mul shape, same oversize-cell
    auto-split."""
    if centroids is None:
        x = sample_corpus_matrix(df, id_col, vec_col, sample_size)
        centroids = train_ivf_centroids(x, num_clusters, seed)

    src = df.select(F.col(id_col).cast("long").alias("_id"),
                    F.col(vec_col).cast("array<double>").alias("_vec"))
    cells = src.withColumn("cell",
                           assign_cells_udf(centroids)(F.col("_vec")))
    if auto_split_rounds:
        cells = refine_oversize_cells(cells, max_cluster_rows, seed,
                                      max_rounds=auto_split_rounds)
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
