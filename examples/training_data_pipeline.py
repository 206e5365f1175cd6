"""End-to-end training-data cleaning pipeline over the documents table:

  text stats -> quality filter -> language filter -> exact dedup ->
  MinHash near-dup removal -> cleaned corpus stats

Every stage is a native DataFrame transform; the whole pipeline is one
lazy plan until the final action.

    python examples/training_data_pipeline.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from pipelinedp_spark.functions import text as T  # noqa: E402
from pipelinedp_spark.operators import dedup  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("training-data-pipeline")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    scored = docs.select(
        "doc_id", "text",
        T.quality_score(F.col("text")).alias("quality"),
        T.language_id(F.col("text")).alias("lang"))
    kept = scored.filter((F.col("quality") > 0.2) & (F.col("lang") == "en"))

    survivors = dedup.exact_dedup(kept).select("doc_id")
    kept = kept.join(survivors, "doc_id", "left_semi")

    near_dups = dedup.minhash_lsh_pairs(kept, jaccard_threshold=0.8)
    drop = near_dups.select(F.col("id_b").alias("doc_id")).distinct()
    cleaned = kept.join(drop, "doc_id", "left_anti")

    n1 = cleaned.count()
    print(f"documents: {n0} -> {n1} "
          f"({n0 - n1} removed by quality/lang/dup filters)")
    cleaned.select(F.avg("quality").alias("avg_quality")).show()
    spark.stop()


if __name__ == "__main__":
    main()
