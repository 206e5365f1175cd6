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


# ---------------------------------------------------------------------------
# Round-6 operators: plan posture pinned
# ---------------------------------------------------------------------------

def test_weighted_sample_is_take_ordered(spark):
    """The Efraimidis-Spirakis sample must compile to a partial top-k +
    single small merge, never a full global sort."""
    from pipelinedp_spark.functions.sampling import weighted_sample_topk
    out = weighted_sample_topk(_docs(spark), "n_chars", 50, "doc_id")
    plan = P.explain_str(out)
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_kmv_sketch_is_take_ordered_over_one_column(spark):
    from pipelinedp_spark.functions.sampling import kmv_distinct_estimate
    docs = _docs(spark)
    grams = docs.select(F.explode(F.split("text", " ")).alias("g"))
    out = kmv_distinct_estimate(grams, "g", k=256)
    plan = P.explain_str(out)
    assert "TakeOrderedAndProject" in plan
    # distinct shuffles only the 1-column hash projection
    assert P.count_shuffles(out) <= 3


def test_zorder_key_is_pure_projection(spark):
    """The Morton key adds ZERO shuffles beyond the one min/max agg that
    produces the range scalars (collected before the plan is built)."""
    from pipelinedp_spark.functions.layout import with_zorder_key
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = with_zorder_key(ev, ["user_id", "value"], bits=16)
    assert P.count_shuffles(out) == 0
    assert "pythonUDF" not in P.explain_str(out).lower()


def test_gram_dup_rate_sample_filter_precedes_shuffle(spark):
    """The 1/mod gram-value sample must run BEFORE the gram groupBy so
    the shuffle carries only the sampled occurrences."""
    from pipelinedp_spark.operators.dedup import gram_dup_rate_estimate
    import re
    out = gram_dup_rate_estimate(_docs(spark), n=8, sample_mod=4)
    plan = P.explain_str(out)
    # formatted explain numbers physical nodes in dataflow order
    nodes = {int(m.group(1)): m.group(2) for m in
             re.finditer(r"^\((\d+)\) (\w+)", plan, re.M)}
    first_filter = min(n for n, op in nodes.items() if op == "Filter")
    first_exchange = min(n for n, op in nodes.items()
                         if op == "Exchange")
    assert first_filter < first_exchange
    assert P.has_partial_aggregation(out)


def test_ngram_novelty_size_adaptive_join(spark):
    """The operator never FORCES a broadcast of the gram-DF table (it
    grows with corpus vocabulary); the localCheckpoint gives the planner
    its true size, so a small table may still auto-broadcast — the
    invariant is no nested-loop/cartesian and combinable aggs."""
    from pipelinedp_spark.operators.quality import ngram_novelty
    out = ngram_novelty(_docs(spark), n=5)
    plan = P.explain_str(out)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert P.has_partial_aggregation(out)
