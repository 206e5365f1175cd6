"""Round-4 additions tour: passage-overlap containment dedup and
VARIANCE utility analysis.

1. Winnowing fingerprints (MOSS): find documents that share COPIED
   PASSAGES — partial overlap that whole-document MinHash misses.
2. VARIANCE utility analysis: pick contribution bounds for a DP variance
   release by expected error, before spending any privacy budget.
3. Streaming DP variance over event-time windows.

    python examples/containment_and_variance_analysis.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
import pipelinedp_spark as pds  # noqa: E402
import pipelinedp_spark.analysis as A  # noqa: E402
from pipelinedp_spark.operators import dedup  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("containment-and-variance-analysis")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # -- 1. containment: who copied whose passage? ----------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.winnow_containment_pairs(docs, min_containment=0.5)
    print("== passage-overlap pairs (winnowing, containment >= 0.5) ==")
    pairs.orderBy(F.desc("containment")).show(10)

    # -- 2. which bounds give the least expected error? ------------------
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    params = pds.AggregateParams(
        metrics=[pds.Metrics.VARIANCE],
        max_partitions_contributed=1, max_contributions_per_partition=1,
        min_value=0.0, max_value=500.0)
    grid = A.MultiParameterConfiguration(
        max_partitions_contributed=[1, 2, 4],
        max_contributions_per_partition=[2, 5, 20])
    reports = A.UtilityAnalysisEngine(epsilon=4.0, delta=1e-6).analyze(
        ev, params,
        pds.DataFrameExtractors("user_id", "event_type", "value"),
        grid, public_partitions=["click", "signup", "error",
                                 "view", "purchase"])
    print("== VARIANCE expected error per candidate configuration ==")
    for rep in reports:
        e = rep.metric_errors[0]
        i = rep.configuration_index
        print(f"  config {i}: l0={grid.max_partitions_contributed[i]} "
              f"linf={grid.max_contributions_per_partition[i]} "
              f"rmse={e.rmse:.3f} |bias|={e.expected_abs_bias:.3f}")
    best = min(reports, key=lambda r: r.metric_errors[0].rmse)
    print(f"  -> best: config {best.configuration_index}")

    # -- 3. run the actual DP variance with the chosen bounds ------------
    i = best.configuration_index
    # The sf0.001 demo slice has only ~15 users; the release is dominated
    # by Linf-subsampling variability on the heavy-tailed values (the
    # analysis models thinning deterministically, so its rmse understates
    # small-sample effects at this scale), hence the demo-sized budget.
    acct = pds.NaiveBudgetAccountant(50.0, 1e-6)
    engine = pds.DPEngine(acct)
    res = engine.aggregate(
        ev,
        pds.AggregateParams(
            metrics=[pds.Metrics.VARIANCE],
            max_partitions_contributed=grid.max_partitions_contributed[i],
            max_contributions_per_partition=(
                grid.max_contributions_per_partition[i]),
            min_value=0.0, max_value=500.0),
        pds.DataFrameExtractors("user_id", "event_type", "value"),
        public_partitions=["click", "signup", "error", "view", "purchase"])
    acct.compute_budgets()
    print("== DP variance per event type (secure noise) ==")
    res.dataframe().show()
    spark.stop()


if __name__ == "__main__":
    main()
