"""Embedding-corpus curation tour: the full vector-side toolchain on
the sample embeddings table —

  distributed k-means fit (exact, layout-invariant) ->
  cluster-balanced subset (topic caps) -> PCA dim-reduction
  (gram partials + driver eigh, codegen projection) -> int8 scalar
  quantization (4x storage) -> two-stage IVF-PQ + exact-cosine
  re-rank retrieval over the curated set -> streaming drift monitor
  over the same centroids.

    python examples/embedding_curation_pipeline.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from pipelinedp_spark.functions import embeddings as E         # noqa: E402
from pipelinedp_spark.operators import clustering as C         # noqa: E402
from pipelinedp_spark.operators import similarity as S         # noqa: E402
from pipelinedp_spark.streaming.dp_streaming import (          # noqa: E402
    streaming_cluster_counts)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = (SparkSession.builder.master("local[4]")
             .appName("embedding-curation")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    print(f"corpus: {emb.count()} vectors x "
          f"{len(emb.select('embedding').first()[0])} dims")

    # 1. Topic structure: full-corpus Lloyd's (assignment is codegen;
    #    updates are map-side-combinable integer sums).
    cents, sizes = C.kmeans_fit(emb, k=8, iters=3)
    print("cluster sizes:", sizes)

    # 2. Cluster-balanced subset: cap every topic so the head topic
    #    cannot drown the tail (portable-hash order = reproducible).
    subset = C.cluster_balanced_sample(emb, centroids=cents,
                                       per_cluster=30)
    curated = emb.join(subset.select("vec_id"), "vec_id")
    print("curated rows:", curated.count())

    # 3. PCA: corpus touched once for gram partials, eigh on the
    #    driver-side dim x dim matrix, projection folds are codegen.
    comps, mean_dots, eigvals = E.pca_components(emb, k=4)
    var_total = sum(eigvals)
    print("top-4 PCA explained-variance shares:",
          [round(v / var_total, 3) for v in eigvals])

    # 4. Int8 scalar quantization: the 4x storage cut before indexing.
    params = E.int8_quantize_params(emb)
    codes = curated.select(
        "vec_id", E.int8_quantize_expr(F.col("embedding"), params)
        .alias("codes"))
    print("int8 codes sample:", codes.first()["codes"][:8])

    # 5. Serving: IVF-PQ shortlist + exact-cosine re-rank.
    queries = (emb.filter(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")))
    hits = S.ivf_pq_rerank_topk(curated, queries, k=5,
                                num_cells=8, nprobe=2)
    hits.orderBy("query_id", "rank").show(15, truncate=False)

    # 6. Drift monitor: the SAME centroids on a stream (stateless
    #    assignment; availableNow drains the backlog and stops).
    src = "/tmp/emb_curation_stream_demo"
    emb.limit(200).repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    q = (streaming_cluster_counts(stream, cents)
         .writeStream.format("memory").queryName("drift")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    print("drift counts (first 200 arrivals):")
    spark.sql("SELECT * FROM drift ORDER BY cluster").show()

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
