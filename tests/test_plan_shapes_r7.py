"""Plan-shape assertions for the round-7 operators: the 100 TB posture
(broadcasts, WindowGroupLimit top-k, codegen gram extraction, no
nested-loop joins) pinned as plan properties."""

from pyspark.sql import functions as F

from pipelinedp_spark import plans as P
from pipelinedp_spark.operators.dedup import sentence_dedup
from pipelinedp_spark.operators.langid import language_id_ngram
from pipelinedp_spark.operators.quality import gopher_quality_filter
from pipelinedp_spark.operators.retrieval import (pmi_collocations,
                                                  tfidf_keywords)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_language_id_broadcasts_profiles_codegen_grams(spark):
    """The ~3k-row profile table must broadcast (never shuffle the
    exploded gram stream for the join), the gram extraction must be
    Generate nodes over integer sequences (no interpreted
    higher-order-lambda path), and the per-(doc, lang) sum must have a
    map-side partial."""
    out = language_id_ngram(_docs(spark))
    plan = P.explain_str(out)
    assert P.has_broadcast_join(out)
    assert P.has_partial_aggregation(out)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # codegen path: explode(sequence(...)), not transform/lambda
    assert "lambdafunction" not in plan.lower()


def test_gopher_filter_one_corpus_shuffle_family(spark):
    """Every rule except top-2-gram is per-row codegen: the plan's only
    corpus-scale shuffles belong to the top-gram word-count + argmax
    family, and the final rule join is an equi-join."""
    out = gopher_quality_filter(_docs(spark))
    plan = P.explain_str(out)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert P.has_partial_aggregation(out)


def test_tfidf_topk_is_window_group_limit(spark):
    """The per-doc top-k must compile to WindowGroupLimit (partial +
    final), never a full sort of the scored terms."""
    out = tfidf_keywords(_docs(spark), k=5)
    plan = P.explain_str(out)
    assert "WindowGroupLimit" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_pmi_global_topk_is_take_ordered(spark):
    """orderBy().limit(k) must compile to TakeOrderedAndProject — the
    min_count survivors are never globally sorted."""
    out = pmi_collocations(_docs(spark), k=10, min_count=2)
    plan = P.explain_str(out)
    assert "TakeOrderedAndProject" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert P.has_partial_aggregation(out)


def test_sentence_dedup_hash_only_counting_no_windows(spark):
    """Sentence counting shuffles the 60-bit hash (never sentence
    text), the rebuild is a groupBy (no window — a corpus-hot sentence
    never single-tasks), and removal is an equi-join."""
    out = sentence_dedup(_docs(spark), min_docs=2)
    plan = P.explain_str(out)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "row_number" not in plan
    assert P.has_partial_aggregation(out)
    assert P.count_shuffles(out) <= 5


def test_funnel_no_windows_no_nested_loop(spark):
    """Funnel steps must be aggregations + equi-joins — no window
    functions (a hot user never single-tasks) and no nested-loop
    joins."""
    from pipelinedp_spark.operators.funnel import funnel_users
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .withColumn("ts", F.expr("unix_micros(cast(ts as timestamp))")))
    tabs = funnel_users(ev, ["view", "click", "purchase"],
                        checkpoint=False)
    for t in tabs:
        plan = P.explain_str(t)
        assert "Window" not in plan
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_retention_broadcasts_cohort_sizes(spark):
    """The cohort-size join must broadcast and both aggs must map-side
    combine."""
    from pipelinedp_spark.operators.funnel import retention_cohorts
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .withColumn("ts", F.expr("unix_micros(cast(ts as timestamp))")))
    out = retention_cohorts(ev)
    plan = P.explain_str(out)
    assert P.has_broadcast_join(out)
    assert P.has_partial_aggregation(out)
    assert "Window" not in plan


def test_textrank_iteration_no_nested_loop(spark):
    """Each TextRank iteration is an equi-join + combinable groupBy;
    the final top-k compiles to TakeOrderedAndProject."""
    from pipelinedp_spark.operators.retrieval import textrank_keywords
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = textrank_keywords(docs, iters=2, k=5, min_count=2,
                            checkpoint=False)
    plan = P.explain_str(out)
    assert "TakeOrderedAndProject" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert P.has_partial_aggregation(out)
