"""Target-flavored data selection over the documents corpus:

  quality gate (unigram-LM perplexity band + linear classifier)
  -> duplicated-span audit (ExactSubstr-style cut ranges)
  -> DSIR importance weights vs an English target
  -> deterministic importance resampling
  -> BM25 spot-check retrieval over the selected set
  -> sliding-window chunking for a RAG index

Every stage is a native DataFrame transform; the classifier and the
DSIR ratio table are broadcast model artifacts trained driver-side on
bounded samples.

    python examples/data_selection_pipeline.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from pipelinedp_spark.operators import mixing  # noqa: E402
from pipelinedp_spark.operators.dedup import duplicate_spans  # noqa: E402
from pipelinedp_spark.operators.packing import chunk_documents  # noqa: E402
from pipelinedp_spark.operators.quality import unigram_perplexity  # noqa: E402
from pipelinedp_spark.operators.retrieval import bm25_topk  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("data-selection-pipeline")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. LM-quality band: drop the extreme-perplexity tails (junk at the
    # top, boilerplate at the bottom).
    ppl = unigram_perplexity(docs)
    lo, hi = ppl.approxQuantile("ppl", [0.05, 0.95], 0.0)
    quality = docs.join(
        ppl.filter(F.col("ppl").between(lo, hi)).select("doc_id"),
        "doc_id")

    # 2. Linear classifier scores (train on (lang == 'en') labels from
    # the lowest-id sample, score everything, keep confident rows).
    sample = mixing.collect_sample_features(
        docs, label_expr=(F.col("lang") == "en"), num_buckets=1024)
    w, b = mixing.train_linear_classifier(sample, num_buckets=1024)
    scores = mixing.classifier_scores(quality, w, b, num_buckets=1024)

    # 3. Span audit: how much exactly-duplicated 8-gram mass survives?
    spans = duplicate_spans(quality, k=8)
    cut_tokens = (spans.select(
        F.sum(F.col("span_end") - F.col("span_start")).alias("t"))
        .collect()[0]["t"]) or 0

    # 4. DSIR weights vs the English subset + deterministic resampling.
    weights = mixing.dsir_log_weights(
        quality, quality.filter(F.col("lang") == "en"))
    selected = mixing.importance_resample(weights, keep_fraction=0.5)
    final = quality.join(selected.select("doc_id"), "doc_id")

    # 5. BM25 spot-check over the selected corpus.
    q = spark.sql("SELECT * FROM VALUES (0, 'hash join merge'), "
                  "(1, 'scan filter column') AS t(query_id, query_text)")
    hits = bm25_topk(final, q, k=5)

    # 6. RAG chunks of the final selection.
    chunks = chunk_documents(final, chunk_tokens=64, overlap=16)

    print(f"corpus: {n0} docs; quality band kept {quality.count()}")
    print(f"duplicated-span audit: {spans.count()} cut ranges, "
          f"{cut_tokens} tokens")
    print("classifier score range:",
          scores.agg(F.min("score"), F.max("score")).collect()[0])
    print(f"DSIR selection kept {final.count()} docs")
    print("bm25 top hits:")
    for r in hits.orderBy("query_id", "rank").collect():
        print("  ", r["query_id"], r["doc_id"], r["rank"], r["score"])
    print(f"chunks for RAG index: {chunks.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
