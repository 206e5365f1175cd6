"""The privacy-wrapper API: several DP actions sharing one budget.

Analogue of the reference's movie-ratings Spark demo
(reference: examples/movie_view_ratings/run_on_spark.py): wrap the
DataFrame once, declare multiple DP aggregations, compute budgets once,
then materialize.

    python examples/private_dataframe_demo.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import pipelinedp_spark as pds  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("private-dataframe-demo")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    accountant = pds.NaiveBudgetAccountant(total_epsilon=3.0,
                                           total_delta=1e-5)
    private = pds.make_private(lineitem, accountant, "l_suppkey")

    counts = private.count(pds.CountParams(
        partition_key="l_returnflag",
        max_partitions_contributed=3,
        max_contributions_per_partition=10,
        public_partitions=["A", "N", "R"]))
    sums = private.sum(pds.SumParams(
        partition_key="l_returnflag",
        value_column="l_quantity",
        min_sum_per_partition=0.0, max_sum_per_partition=100.0,
        max_partitions_contributed=3,
        max_contributions_per_partition=10,
        public_partitions=["A", "N", "R"]))

    accountant.compute_budgets()  # two-phase protocol: budgets fixed once
    counts.dataframe().orderBy("l_returnflag").show()
    sums.dataframe().orderBy("l_returnflag").show()
    spark.stop()


if __name__ == "__main__":
    main()
