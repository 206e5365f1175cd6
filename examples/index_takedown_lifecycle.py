"""Round-10 additions tour: the full persisted-index lifecycle with
EXACT takedowns (right-to-be-forgotten / licensing removals) — the
operation a 100-TB corpus index must support without a rebuild.

1. BM25 inverted index: build half the corpus, APPEND the rest
   (postings + df segments land bucket-aligned; n_docs/total_dl/avgdl
   refresh exactly), serve with the stopword guard, then REMOVE a doc
   subset — tombstones + NEGATIVE df segments keep served scores
   bit-identical to an index never containing them.
2. The same takedown on the exact-dedup fingerprint store: removed
   reference docs stop deduping future ingest batches.
3. compact_store applies every tombstone physically (and merges
   per-append small files / df segments); results invariant.

    python examples/index_takedown_lifecycle.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from pipelinedp_spark.operators import dedup, retrieval  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(300)

    # -- 1. BM25: build + append + serve ------------------------------
    retrieval.build_bm25_index(docs.filter(F.col("doc_id") % 2 == 0),
                               "demo_bm25", num_buckets=4)
    retrieval.build_bm25_index(docs.filter(F.col("doc_id") % 2 == 1),
                               "demo_bm25", mode="append")
    q = spark.sql("SELECT 0 AS query_id, 'hash join merge' AS query_text")
    print("after append (stopword guard on):")
    retrieval.bm25_topk_from_index(q, "demo_bm25", k=5,
                                   max_df_ratio=0.99).show()

    # -- takedown: remove every fifth document, scores stay EXACT -----
    gone = docs.filter(F.col("doc_id") % 5 == 0)
    retrieval.remove_from_bm25_index(gone, "demo_bm25")
    print("after takedown of doc_id % 5 == 0 (logical, O(removed)):")
    retrieval.bm25_topk_from_index(q, "demo_bm25", k=5).show()

    # -- 2. exact store: removed refs stop deduping -------------------
    dedup.build_exact_store(docs, "demo_fp", num_buckets=4)
    batch = docs.select((F.col("doc_id") + 10_000).alias("doc_id"),
                        "text")
    print("copies surviving dedup before takedown:",
          dedup.incremental_exact_dedup(batch, "demo_fp").count())
    dedup.remove_from_exact_store(gone, "demo_fp")
    print("after takedown (removed docs' copies admissible again):",
          dedup.incremental_exact_dedup(batch, "demo_fp").count())

    # -- 3. compaction applies tombstones physically ------------------
    dedup.compact_store(spark, "demo_bm25", "bm25")
    dedup.compact_store(spark, "demo_fp", "exact")
    print("post-compaction tombstone tables exist:",
          spark.catalog.tableExists("demo_bm25_tombstones"),
          spark.catalog.tableExists("demo_fp_tombstones"))
    print("served results invariant after physical apply:")
    retrieval.bm25_topk_from_index(q, "demo_bm25", k=5).show()

    for t in ("demo_bm25_postings", "demo_bm25_terms", "demo_bm25_meta",
              "demo_fp_fps", "demo_fp_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()


if __name__ == "__main__":
    main()
