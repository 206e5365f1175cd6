"""Connected components over near-dup pair graphs.

Turns pairwise near-duplicate edges (dedup.*_pairs outputs) into cluster
assignments: every document gets the minimum doc id reachable through the
edge graph — the canonical "keep one representative per duplicate
cluster" step of a training-data pipeline.

Algorithm: iterative min-label propagation. Each round joins current
labels across edges and takes the elementwise minimum; a round is one
hash join + one map-side-combinable groupBy, and the loop stops when no
label changes. Rounds needed = graph diameter, which for near-dup
clusters (dense cliques glued by a few bridges) is small single digits;
`max_iter` bounds the worst case. All state lives in DataFrames — the
driver holds only the per-round changed-count scalar.

No reference counterpart (net-new per project north star; the classic
alternatives are the large-star/small-star MapReduce formulation —
Kiveris et al., "Connected Components in MapReduce and Beyond" — which
converges in fewer rounds but with heavier rounds; min-label is the right
trade at near-dup cluster diameters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame,
                         src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component is
    the minimum node id in the connected component. Deterministic."""
    # localCheckpoint (not just persist) every round: iterative self-joins
    # otherwise grow the logical plan exponentially — the planner, not the
    # data, becomes the bottleneck (observed driver OOM on plan strings).
    both = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
            .unionByName(edges.select(F.col(dst).alias("u"),
                                      F.col(src).alias("v")))
            .distinct()
            .localCheckpoint())
    spark = edges.sparkSession
    # Size the per-round shuffles to the edge count: a pair graph is far
    # smaller than the corpus it came from, and at the session default
    # (sized for the big tables) fixed task-launch overhead dominates the
    # ~5 jobs per round (measured 6.4s -> 3.7s at 543k edges). Scoped to
    # this function's own actions and restored after.
    n_edges = both.count()
    target = int(min(max(n_edges // 500_000 + 1, 8), 2000))
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(target))
    labels = (both.groupBy("u")
              .agg(F.least(F.min("v"), F.col("u")).alias("lbl"))
              .select(F.col("u").alias("node"), "lbl")
              .localCheckpoint())
    def prop_step(lbls: DataFrame) -> DataFrame:
        # candidate label for each node: min over neighbors' labels
        prop = (both.join(lbls, both.v == lbls.node)
                .groupBy("u").agg(F.min("lbl").alias("nlbl")))
        return (lbls.join(prop, lbls.node == prop.u, "left")
                .select(F.col("node"),
                        F.least(F.col("lbl"),
                                F.coalesce(F.col("nlbl"), F.col("lbl")))
                        .alias("lbl")))

    def jump(lbls: DataFrame) -> DataFrame:
        # pointer jumping: follow the label's own label, halving the
        # remaining chain length.
        parent = lbls.select(F.col("node").alias("lbl"),
                             F.col("lbl").alias("lbl2"))
        return (lbls.join(parent, "lbl", "left")
                .select(F.col("node"),
                        F.least(F.col("lbl"),
                                F.coalesce(F.col("lbl2"), F.col("lbl")))
                        .alias("lbl")))

    try:
        for _ in range(max_iter):
            # Two propagation steps + one jump per checked round: the
            # convergence count and lineage checkpoint carry a fixed
            # scheduling cost, so advancing ~3 chain steps between checks
            # cuts wall time ~2x on diameter-8 graphs.
            new_labels = jump(prop_step(prop_step(labels))) \
                .localCheckpoint()
            changed = (new_labels.alias("n")
                       .join(labels.alias("o"), "node")
                       .filter(F.col("n.lbl") != F.col("o.lbl")).count())
            labels = new_labels
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                f"rounds (graph diameter exceeds max_iter; raise max_iter)")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    both.unpersist()
    return labels.select(F.col("node"), F.col("lbl").alias("component"))


def near_dup_clusters(docs: DataFrame, pairs: DataFrame,
                      id_col: str = "doc_id",
                      src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """(id, cluster_id) for EVERY document: members of a near-dup
    component share its minimum doc id; untouched docs are their own
    cluster. The keep-set is `cluster_id == id`."""
    comp = connected_components(pairs, src, dst)
    return (docs.select(F.col(id_col))
            .join(comp, docs[id_col] == comp.node, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("component"), F.col(id_col))
                    .alias("cluster_id")))
