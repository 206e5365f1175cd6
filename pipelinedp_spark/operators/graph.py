"""Connected components over near-dup pair graphs.

Turns pairwise near-duplicate edges (dedup.*_pairs outputs) into cluster
assignments: every document gets the minimum doc id reachable through the
edge graph — the canonical "keep one representative per duplicate
cluster" step of a training-data pipeline.

Algorithm: iterative min-label propagation with a FRONTIER: after round
1 only labels that changed in the previous round are joined across the
edges (standard label-propagation optimization — information flows only
when a label drops), so per-round join input collapses with the frontier
(on near-dup graphs, typically after round 1). A pointer-jumping step
per round halves remaining chain lengths. The loop stops when no label
changes; rounds needed ~ graph diameter, `max_iter` bounds the worst
case. All state lives in DataFrames — the driver holds only the
per-round changed-count scalar.

Thread-safety note: the loop tunes the session-global
``spark.sql.shuffle.partitions`` to the edge count for its own ~5 jobs
per round and restores it in ``finally``; a concurrent query issued on
the SAME SparkSession from another thread during the loop would run
with the graph-sized setting. Use a dedicated session for concurrent
workloads (per-query scoping is not available for this conf on Spark 4).

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
    spark = edges.sparkSession
    # Size the shuffles to the edge count: a pair graph is far smaller
    # than the corpus it came from, and at the session default (sized for
    # the big tables) fixed task-launch overhead dominates the ~3 jobs per
    # round. Start at the floor so even the edge-table distinct runs small
    # (measured setup 1.9s -> 0.7s at 543k edges), then retarget upward
    # once the true edge count is known. scoped_conf restores the session
    # value on any exit; see plans/conf.py for the concurrency caveat.
    from pipelinedp_spark.plans import scoped_conf
    parts = "spark.sql.shuffle.partitions"
    with scoped_conf(spark, **{parts: "8"}):
        both = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
                .unionByName(edges.select(F.col(dst).alias("u"),
                                          F.col(src).alias("v")))
                .distinct()
                .localCheckpoint())
        n_edges = both.count()
    target = int(min(max(n_edges // 500_000 + 1, 8), 2000))
    with scoped_conf(spark, **{parts: str(target)}):
        labels = (both.groupBy("u")
                  .agg(F.least(F.min("v"), F.col("u")).alias("lbl"))
                  .select(F.col("u").alias("node"), "lbl")
                  .localCheckpoint())

    def prop_step(lbls: DataFrame, fresh: DataFrame) -> DataFrame:
        # candidate label for each node: min over FRESH neighbor labels
        # only — neighbors whose label didn't change last round already
        # contributed in the round they last dropped (least() is monotone).
        prop = (both.join(fresh.select(F.col("node").alias("fn"),
                                       F.col("lbl").alias("flbl")),
                          both.v == F.col("fn"))
                .groupBy("u").agg(F.min("flbl").alias("nlbl")))
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

    frontier = labels  # round 1: every node is fresh
    with scoped_conf(spark, **{parts: str(target)}):
        for _ in range(max_iter):
            stepped = jump(prop_step(labels, frontier))
            # Single checkpoint carries labels AND the changed flag; the
            # count and next round's frontier read the materialized rows.
            joined = (stepped.alias("n")
                      .join(labels.alias("o"), "node")
                      .select(F.col("node"), F.col("n.lbl").alias("lbl"),
                              (F.col("n.lbl") != F.col("o.lbl"))
                              .alias("chg"))
                      .localCheckpoint())
            changed = joined.filter(F.col("chg")).count()
            labels = joined.select("node", "lbl")
            frontier = joined.filter(F.col("chg")).select("node", "lbl")
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                f"rounds (graph diameter exceeds max_iter; raise max_iter)")
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


def keep_best_representative(docs: DataFrame, clusters: DataFrame,
                             quality_col: str,
                             id_col: str = "doc_id") -> DataFrame:
    """Pick each near-dup cluster's surviving document by QUALITY
    instead of min-id (production dedup keeps the best copy — longest,
    highest quality score — not the lowest id): given (id, cluster_id)
    from `near_dup_clusters` and a numeric quality column on ``docs``,
    returns (id_col, cluster_id, is_kept) with exactly one kept row per
    cluster (argmax quality, ties to the smallest id).

    One shuffle on cluster_id for the argmax (a single max(struct)
    aggregation — map-side combinable, no window, so a corpus-hot
    cluster never serializes onto one task) and one join back.
    """
    labeled = clusters.join(
        docs.select(F.col(id_col), F.col(quality_col)), id_col)
    best = labeled.groupBy("cluster_id").agg(
        F.max(F.struct(F.col(quality_col).alias("q"),
                       (-F.col(id_col)).alias("nid"))).alias("__b__"))
    return (labeled.join(best, "cluster_id")
            .select(id_col, "cluster_id",
                    (F.col(id_col) == -F.col("__b__.nid"))
                    .alias("is_kept")))
