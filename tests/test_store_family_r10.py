"""Round-10 store-family tests: BM25 index append mode (scalar refresh,
df segment merge), compact_store 'bm25'/'ann' kinds, and a planted
hot-bucket skew stress for the bucketed store joins.

Reference repo (OpenMined/PipelineDP) has no store/index counterpart —
these are net-new LLM-pipeline operators; tests follow the compaction
round-trip pattern of tests/test_plan_shapes_r9.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _drop(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


BM25_TABLES = ("_postings", "_terms", "_meta")


def _bm25_results(spark, store):
    from pipelinedp_spark.operators import retrieval
    q = spark.sql(
        "SELECT * FROM VALUES (0, 'hash join merge'), "
        "(1, 'scan filter column'), (2, 'adaptive shuffle') "
        "AS t(query_id, query_text)")
    return sorted(
        (r["query_id"], r["doc_id"], r["rank"], r["score"])
        for r in retrieval.bm25_topk_from_index(q, store, k=10).collect())


class TestBM25Append:
    def test_append_equals_build_once(self, spark):
        """Build from half the corpus, append the rest: scores, ranks
        and tie-breaks must equal the build-once index exactly —
        including the refreshed n_docs/avgdl scalars and df sums for
        terms spanning both halves."""
        from pipelinedp_spark.operators import retrieval

        docs = _docs(spark).limit(200)
        first = docs.filter(F.col("doc_id") % 2 == 0)
        second = docs.filter(F.col("doc_id") % 2 == 1)

        retrieval.build_bm25_index(docs, "r10bm_once", num_buckets=4)
        retrieval.build_bm25_index(first, "r10bm_inc", num_buckets=4)
        retrieval.build_bm25_index(second, "r10bm_inc", mode="append")
        try:
            once = _bm25_results(spark, "r10bm_once")
            inc = _bm25_results(spark, "r10bm_inc")
            assert once and once == inc
            m_once = spark.table("r10bm_once_meta").collect()[0]
            m_inc = spark.table("r10bm_inc_meta").collect()[0]
            assert m_once["n_docs"] == m_inc["n_docs"]
            assert m_once["total_dl"] == m_inc["total_dl"]
            assert m_once["avgdl"] == m_inc["avgdl"]
            # df segments: terms in both halves carry two rows that the
            # reader sums back to the build-once df
            seg = (spark.table("r10bm_inc_terms").groupBy("term")
                   .agg(F.sum("df").alias("df_seg")))
            whole = (spark.table("r10bm_once_terms")
                     .withColumnRenamed("df", "df_once"))
            mismatched = (seg.join(whole, "term", "full")
                          .filter(F.col("df_seg").isNull()
                                  | F.col("df_once").isNull()
                                  | (F.col("df_seg") != F.col("df_once"))))
            assert mismatched.count() == 0
        finally:
            _drop(spark, *(f"r10bm_once{s}" for s in BM25_TABLES),
                  *(f"r10bm_inc{s}" for s in BM25_TABLES))

    def test_append_respects_store_bucket_count(self, spark):
        """Append must inherit the store's bucket spec from meta even
        when the caller passes a different num_buckets."""
        from pipelinedp_spark.operators import retrieval

        docs = _docs(spark).limit(60)
        retrieval.build_bm25_index(docs.filter(F.col("doc_id") < 1000),
                                   "r10bm_bk", num_buckets=4)
        retrieval.build_bm25_index(docs.filter(F.col("doc_id") >= 1000),
                                   "r10bm_bk", num_buckets=16,
                                   mode="append")
        try:
            ddl = spark.sql(
                "SHOW CREATE TABLE r10bm_bk_postings").collect()[0][0]
            assert "4 BUCKETS" in ddl
            assert int(spark.table("r10bm_bk_meta")
                       .collect()[0]["num_buckets"]) == 4
        finally:
            _drop(spark, *(f"r10bm_bk{s}" for s in BM25_TABLES))

    def test_empty_corpus_builds_queryable_index(self, spark):
        """An empty reference bootstraps the incremental flow (same
        contract as the dedup stores): build empty, query empty,
        append the real corpus later."""
        from pipelinedp_spark.operators import retrieval

        docs = _docs(spark).limit(50)
        retrieval.build_bm25_index(docs.filter(F.lit(False)),
                                   "r10bm_mt", num_buckets=4)
        try:
            m = spark.table("r10bm_mt_meta").collect()[0]
            assert m["n_docs"] == 0 and m["avgdl"] == 0.0
            assert _bm25_results(spark, "r10bm_mt") == []
            retrieval.build_bm25_index(docs, "r10bm_mt", mode="append")
            assert _bm25_results(spark, "r10bm_mt")
        finally:
            _drop(spark, *(f"r10bm_mt{s}" for s in BM25_TABLES))
