"""CorpusPipeline facade tour: the whole training-data flow as one
chain on the sample documents table —

  exact dedup -> MinHash near-dedup -> PII scrub -> perplexity band ->
  stratified language mixing -> DSIR selection toward English ->
  sequence packing + train/val/test split + a DP release of the final
  per-language token counts.

    python examples/corpus_pipeline_tour.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
import pipelinedp_spark as pds  # noqa: E402
from pipelinedp_spark.corpus import CorpusPipeline  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("corpus-pipeline-tour")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    p = CorpusPipeline(docs)
    n0 = p.count()

    cleaned = (p.exact_dedup()
               .near_dedup(jaccard_threshold=0.7)
               .scrub_pii()
               .quality_band(0.02, 0.98))
    n1 = cleaned.count()

    mixed = (cleaned.stratified("lang", {"en": 0.8})
             .dsir_select(docs.filter(F.col("lang") == "en"),
                          keep_fraction=0.6))
    n2 = mixed.count()

    packed = mixed.pack(seq_len=2048).df
    n_seqs = packed.agg(F.max(F.col("start_seq")
                              + F.col("n_seqs"))).collect()[0][0]
    split_counts = {r["split"]: r["count"] for r in
                    mixed.split().groupBy("split").count().collect()}

    dp = mixed.dp_token_stats(
        pds.Budget(2.0), "lang", ["en", "de", "fr", "es", "zh"],
        max_tokens_per_doc=200.0, noise_mode="secure").collect()

    print(f"corpus {n0} -> cleaned {n1} -> mixed {n2} docs")
    print(f"packed into ~{n_seqs} sequences of 2048 tokens")
    print("splits:", split_counts)
    print("DP per-language release (eps=2):")
    for r in sorted(dp, key=lambda r: r["lang"]):
        print(f"  {r['lang']}: n_docs~{r['n_docs']:.1f} "
              f"tokens~{r['dp_tokens']:.0f}")
    spark.stop()


if __name__ == "__main__":
    main()
