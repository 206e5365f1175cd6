"""Prepare a pretraining data drop from the documents table:

  stratified corpus mixing -> benchmark decontamination ->
  near-dup removal -> deterministic train/val split ->
  concat-and-chunk sequence packing (2048-token sequences)

Every stage is a native DataFrame transform; decontamination broadcasts
the eval set's gram hashes, packing uses the distributed prefix sum.

    python examples/prepare_training_run.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from pipelinedp_spark.functions.sampling import (  # noqa: E402
    deterministic_split, stratified_sample)
from pipelinedp_spark.operators import dedup  # noqa: E402
from pipelinedp_spark.operators.decontam import decontaminate  # noqa: E402
from pipelinedp_spark.operators.packing import pack_sequences  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("prepare-training-run")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. corpus mixing: keep rare languages whole, downsample English
    mixed = stratified_sample(docs, "doc_id", "lang", {"en": 0.8},
                              default_fraction=1.0)

    # 2. decontaminate against a held-out eval slice (id % 97 == 0)
    evald = docs.filter(F.col("doc_id") % 97 == 0)
    train_pool = mixed.filter(F.col("doc_id") % 97 != 0)
    clean = decontaminate(train_pool, evald, n=5)

    # 3. drop exact duplicates (keep lowest doc_id per fingerprint)
    keep = dedup.exact_dedup(clean).select("doc_id")
    clean = clean.join(keep, "doc_id", "left_semi")

    # 4. reproducible split, then pack ONLY the train partition
    labeled = deterministic_split(clean, "doc_id",
                                  {"train": 0.95, "val": 0.05})
    train = labeled.filter(F.col("split") == "train")
    packed = pack_sequences(train.select("doc_id", "text"), seq_len=2048)

    stats = packed.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        (F.max(F.col("start_seq") + F.col("n_seqs"))).alias("sequences"))
    r = stats.collect()[0]
    print(f"input docs: {n0}")
    print(f"packed train docs: {r['docs']}  tokens: {r['tokens']}  "
          f"2048-token sequences: {r['sequences']}")
    spark.stop()


if __name__ == "__main__":
    main()
