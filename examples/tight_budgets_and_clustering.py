"""Round-3 features tour: PLD budget accounting, quantile-tree
percentiles, and near-dup clustering.

    python examples/tight_budgets_and_clustering.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
import pipelinedp_spark as pds  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("tight-budgets-and-clustering")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    # --- PLD accounting: tighter noise for multi-metric pipelines ------
    for name, acct in (("naive", pds.NaiveBudgetAccountant(1.0, 1e-6)),
                       ("pld", pds.PLDBudgetAccountant(1.0, 1e-6))):
        engine = pds.DPEngine(acct, noise_mode="zero")
        params = pds.AggregateParams(
            metrics=[pds.Metrics.COUNT, pds.Metrics.SUM,
                     pds.Metrics.MEAN],
            noise_kind=pds.NoiseKind.GAUSSIAN,
            max_partitions_contributed=3,
            max_contributions_per_partition=5,
            min_value=0.0, max_value=500_000.0)
        res = engine.aggregate(
            orders, params,
            pds.DataFrameExtractors("o_custkey", "o_orderpriority",
                                    "o_totalprice"),
            public_partitions=["1-URGENT", "2-HIGH", "3-MEDIUM"])
        acct.compute_budgets()
        res.dataframe().count()
        extra = (f" (base noise std {acct.base_noise_std:.3f}, "
                 f"certified eps {acct.composed_epsilon():.3f})"
                 if name == "pld" else "")
        print(f"{name} accountant ran 3 metrics{extra}")

    # --- quantile tree: percentiles without picking a bin count --------
    acct = pds.NaiveBudgetAccountant(1.0, 1e-6)
    engine = pds.DPEngine(acct, noise_mode="zero")
    params = pds.AggregateParams(
        metrics=[pds.Metrics.PERCENTILE(50), pds.Metrics.PERCENTILE(99)],
        max_partitions_contributed=3,
        max_contributions_per_partition=5,
        min_value=0.0, max_value=500_000.0,
        percentile_algorithm="tree")
    res = engine.aggregate(
        orders, params,
        pds.DataFrameExtractors("o_custkey", "o_orderpriority",
                                "o_totalprice"),
        public_partitions=["1-URGENT", "2-HIGH"])
    acct.compute_budgets()
    res.dataframe().show()

    # --- near-dup clustering: pairs -> components -> keep set ----------
    from pipelinedp_spark.operators import dedup, graph
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.simhash_pairs(docs, max_hamming=3)
    clusters = graph.near_dup_clusters(docs, pairs)
    keep = clusters.filter(F.col("cluster_id") == F.col("doc_id"))
    print(f"documents: {docs.count()}, keep-set after near-dup "
          f"clustering: {keep.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
