"""Plan-shape assertions for the round-5 batch-2 operators: the 100 TB
posture (shuffle counts, broadcasts, no nested-loop joins) pinned as
plan properties."""

from pyspark.sql import functions as F

from pipelinedp_spark import plans as P
from pipelinedp_spark.operators.dedup import duplicate_spans
from pipelinedp_spark.operators.mixing import (classifier_scores,
                                               dsir_log_weights)
from pipelinedp_spark.operators.quality import unigram_perplexity
from pipelinedp_spark.operators.retrieval import bm25_topk

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_duplicate_spans_skew_safe_first_occurrence(spark):
    """Span dedup finds first occurrences with a map-side-combinable
    min(struct) aggregate + equi-join on the span hash — NOT a
    row_number window (a corpus-hot span would land whole on one
    window task) and NOT a pair self-join (the classic substring-dedup
    blow-up)."""
    out = duplicate_spans(_docs(spark), k=8)
    plan = P.explain_str(out)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert P.has_partial_aggregation(out)
    # No row_number window keyed on the span hash: the remaining
    # windows are the per-doc interval merge (bounded partitions).
    assert "row_number" not in plan, plan
    assert P.count_shuffles(out) <= 4


def test_unigram_perplexity_broadcasts_vocab(spark):
    out = unigram_perplexity(_docs(spark))
    assert P.has_broadcast_join(out)
    assert P.has_partial_aggregation(out)
    plan = P.explain_str(out)
    assert "NestedLoop" not in plan


def test_bm25_broadcasts_query_terms_no_cartesian(spark):
    q = spark.sql("SELECT * FROM VALUES (0, 'hash join merge') "
                  "AS t(query_id, query_text)")
    out = bm25_topk(_docs(spark), q, k=5)
    assert P.has_broadcast_join(out)
    plan = P.explain_str(out)
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_dsir_broadcasts_ratio_table(spark):
    docs = _docs(spark)
    out = dsir_log_weights(docs, docs.filter(F.col("lang") == "en"),
                           num_buckets=512)
    assert P.has_broadcast_join(out)
    assert P.has_partial_aggregation(out)


def test_classifier_scores_single_scan_word_count_shape(spark):
    import numpy as np
    w = np.zeros(256)
    w[3] = 1.0
    out = classifier_scores(_docs(spark), w, 0.0, num_buckets=256)
    assert P.has_broadcast_join(out)
    # feature groupBy + final doc groupBy; broadcast adds no shuffle
    assert P.count_shuffles(out) <= 2
