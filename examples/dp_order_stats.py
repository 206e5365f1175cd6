"""DP order statistics with the declarative QueryBuilder API.

Analogue of the reference's restaurant-visits demo
(reference: examples/restaurant_visits/run_on_dataframes.py): DP count,
sum, and mean of order totals per order priority, privacy unit = customer,
with private partition selection.

    python examples/dp_order_stats.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import pipelinedp_spark as pds  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("dp-order-stats")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    query = (pds.QueryBuilder(orders, "o_custkey")
             .groupby("o_orderpriority",
                      max_groups_contributed=3,
                      max_contributions_per_group=5)
             .count()
             .sum("o_totalprice", min_value=0.0, max_value=500_000.0)
             .mean("o_totalprice", min_value=0.0, max_value=500_000.0)
             .build_query())

    print(query.explain(pds.Budget(epsilon=5.0, delta=1e-5)))
    result = query.run_query(pds.Budget(epsilon=5.0, delta=1e-5))
    result.orderBy("o_orderpriority").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
