"""Tests for the fluent CorpusPipeline facade."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from pipelinedp_spark.corpus import CorpusPipeline


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_exact_then_near_dedup_chain(spark):
    run = " ".join(f"t{i}" for i in range(30))
    texts = [run,                      # kept
             run,                      # exact dup -> dropped
             run + " tail",            # near dup -> dropped
             " ".join(f"u{i}" for i in range(30))]  # kept
    out = (CorpusPipeline(_docs(spark, texts))
           .exact_dedup()
           .near_dedup(jaccard_threshold=0.7)
           .df)
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 3]


def test_dedup_against_reference(spark):
    ref = _docs(spark, ["shared reference document text here"])
    new = spark.createDataFrame(
        [(10, "shared reference document text here"),
         (11, "completely novel words")],
        "doc_id long, text string")
    out = CorpusPipeline(new).dedup_against(ref).df
    assert [r["doc_id"] for r in out.collect()] == [11]


def test_quality_and_pii_stages(spark):
    texts = ["contact me at bob@example.com please",
             "plain words with nothing sensitive"]
    out = CorpusPipeline(_docs(spark, texts)).scrub_pii().df.collect()
    joined = " ".join(r["text"] for r in out)
    assert "bob@example.com" not in joined
    assert "[EMAIL]" in joined


def test_sample_and_stratified_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"text {i}", "en" if i % 2 else "fr") for i in range(400)],
        "doc_id long, text string, lang string")
    p = CorpusPipeline(df)
    a = sorted(r["doc_id"] for r in p.sample(0.5).df.collect())
    b = sorted(r["doc_id"] for r in p.sample(0.5).df.collect())
    assert a == b and 120 < len(a) < 280
    s = p.stratified("lang", {"en": 0.0}, default_fraction=1.0).df
    assert s.filter(F.col("lang") == "en").count() == 0
    assert s.filter(F.col("lang") == "fr").count() == 200


def test_chunk_switches_text_column(spark):
    p = CorpusPipeline(_docs(spark, [" ".join(f"t{i}" for i in range(10))]))
    c = p.chunk(chunk_tokens=4, overlap=0)
    assert c.text_col == "chunk"
    assert c.count() == 3
    # chainable after chunking: quality_filter runs on the chunk column
    assert c.quality_filter(min_score=0.0).count() == 3


def test_split_terminal(spark):
    out = CorpusPipeline(_docs(spark, [f"d {i}" for i in range(50)])).split()
    got = {r["split"] for r in out.collect()}
    assert got <= {"train", "val", "test"}
    assert out.count() == 50


def test_dsir_select_and_classifier_filter(spark):
    from pipelinedp_spark.operators.mixing import (collect_sample_features,
                                                   train_linear_classifier)
    en = [f"alpha beta gamma delta run {i}" for i in range(10)]
    de = [f"zug bahn strasse haus nummer {i}" for i in range(10)]
    df = spark.createDataFrame(
        [(i, t, "en" if i < 10 else "de")
         for i, t in enumerate(en + de)],
        "doc_id long, text string, lang string")
    p = CorpusPipeline(df)
    sel = p.dsir_select(df.filter(F.col("lang") == "en"),
                        keep_fraction=0.5, num_buckets=1 << 12).df
    en_kept = sel.filter(F.col("lang") == "en").count()
    de_kept = sel.filter(F.col("lang") == "de").count()
    assert en_kept > de_kept

    sample = collect_sample_features(df, F.col("lang") == "en",
                                     num_buckets=256)
    w, b = train_linear_classifier(sample, num_buckets=256)
    cls = p.classifier_filter(w, b, min_score=0.5, num_buckets=256).df
    assert cls.filter(F.col("lang") == "de").count() == 0
    assert cls.filter(F.col("lang") == "en").count() == 10


def test_decontaminate_stage(spark):
    docs = _docs(spark, ["one two three four five six seven",
                         "totally different safe words here now"])
    evals = spark.createDataFrame(
        [(0, "one two three four five six seven")],
        "doc_id long, text string")
    out = CorpusPipeline(docs).decontaminate(evals).df
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_dp_token_stats_zero_noise_matches_truth(spark):
    import pipelinedp_spark as pds
    df = spark.createDataFrame(
        [(i, "w " * (i % 5 + 1), "en" if i % 2 else "fr")
         for i in range(40)],
        "doc_id long, text string, lang string")
    out = (CorpusPipeline(df)
           .dp_token_stats(pds.Budget(1.0), "lang", ["en", "fr"],
                           max_tokens_per_doc=100.0, noise_mode="zero")
           .collect())
    got = {r["lang"]: (r["n_docs"], r["dp_tokens"]) for r in out}
    assert got["en"][0] == 20 and got["fr"][0] == 20
    # "w " * k splits to k+1 tokens (trailing empty string counts).
    true_en = sum((i % 5 + 1) + 1 for i in range(40) if i % 2)
    assert got["en"][1] == pytest.approx(true_en)


def test_quality_band_empty_corpus_is_noop(spark):
    out = (CorpusPipeline(_docs(spark, []))
           .quality_band(0.05, 0.95).df)
    assert out.count() == 0


def test_line_dedup_paragraph_filter_token_budget_stages(spark):
    docs = _docs(spark, ["COOKIE\nalpha beta gamma delta",
                         "COOKIE\nepsilon zeta eta",
                         "theta iota\nqqz wwk"])
    out = CorpusPipeline(docs).line_dedup(min_docs=2).df
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got[0] == "alpha beta gamma delta"
    assert got[1] == "epsilon zeta eta"
    assert got[2] == "theta iota\nqqz wwk"

    # paragraph filter drops the rare-token paragraph in doc 2
    common = "alpha beta alpha beta"
    docs2 = _docs(spark, [common, common, f"{common}\nqqz wwk yyv"])
    out2 = CorpusPipeline(docs2).paragraph_filter(max_ppl=12.0).df
    got2 = {r["doc_id"]: r["text"] for r in out2.collect()}
    assert got2[2] == common and got2[0] == common

    # budget: keep longest docs while cumulative tokens <= 7
    docs3 = _docs(spark, ["a b c d", "e f g", "h i"])
    out3 = CorpusPipeline(docs3).token_budget(7).df
    assert sorted(r["doc_id"] for r in out3.collect()) == [0, 1]


def test_normalize_stage(spark):
    docs = _docs(spark, ["\t A\x07B \r\n c  "])
    out = CorpusPipeline(docs).normalize(lowercase=True).df
    assert out.collect()[0]["text"] == "ab\nc"


def test_token_budget_out_of_bounds_id_raises(spark):
    # The fold-into-one-key order assumes 0 <= id < 2^40; an
    # out-of-range id must raise at execution, not produce a silently
    # wrong order key.
    from pyspark.sql import Row
    docs = spark.createDataFrame(
        [Row(doc_id=1 << 41, text="a b c"), Row(doc_id=1, text="d e")])
    with pytest.raises(Exception, match="2\\^40"):
        CorpusPipeline(docs).token_budget(100).df.collect()
    neg = spark.createDataFrame(
        [Row(doc_id=-5, text="a b c")])
    with pytest.raises(Exception, match="2\\^40"):
        CorpusPipeline(neg).token_budget(100).df.collect()
    # In-bounds ids still work through the guarded expression.
    ok = spark.createDataFrame(
        [Row(doc_id=(1 << 40) - 1, text="a b c d"), Row(doc_id=3, text="e f")])
    assert sorted(r["doc_id"] for r in
                  CorpusPipeline(ok).token_budget(6).df.collect()) == [
        3, (1 << 40) - 1]


def test_sentence_dedup_stage(spark):
    docs = _docs(spark, ["Buy now. alpha beta.",
                         "Buy now. gamma delta.",
                         "epsilon zeta."])
    out = CorpusPipeline(docs).sentence_dedup(min_docs=2).df
    got = {r["doc_id"]: r["text"].strip() for r in out.collect()}
    assert got[0] == "alpha beta."
    assert got[1] == "gamma delta."
    assert got[2] == "epsilon zeta."


def test_embedding_stages_chain(spark):
    """embed -> semantic_dedup -> cluster_balance: the embedding column
    attaches, semantic dups drop, topics cap, schema survives."""
    from pipelinedp_spark.corpus import CorpusPipeline
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = CorpusPipeline(docs).embed(dim=16)
    assert "embedding" in p.df.columns
    n0 = p.df.count()
    p2 = p.semantic_dedup(threshold=0.99, num_clusters=4)
    assert 0 < p2.df.count() <= n0
    p3 = p2.cluster_balance(k=4, per_cluster=30)
    assert 0 < p3.df.count() <= min(p2.df.count(), 4 * 30)
    assert set(docs.columns) < set(p3.df.columns)


def test_pipeline_pii_audit_exact_substr_and_decon_spans(spark):
    from pipelinedp_spark.corpus import CorpusPipeline
    boiler = ("This exact disclaimer paragraph repeats verbatim across "
              "many documents tonight, ok?")
    bench = ("What is the airspeed velocity of an unladen swallow in "
             "standardized benchmark units?")
    rows = [
        (0, "mail me a@b.io now. " + boiler),
        (1, "other words here... " + boiler + " tail prose"),
        (2, "quiz leak follows: " + bench),
        (3, "totally clean document with unique content only okay"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    evals = spark.createDataFrame([(0, bench)], "doc_id long, text string")
    out = (CorpusPipeline(df)
           .pii_audit_scrub()
           .exact_substr_dedup(min_len=60)
           .decontaminate_spans(evals, min_len=60)
           .df)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert len(got) == 4                       # no doc dropped
    assert "[EMAIL]" in got[0]
    assert boiler in got[0]                    # first occurrence kept
    assert boiler not in got[1]                # later copy cut
    assert "tail prose" in got[1]
    assert bench not in got[2]                 # benchmark span cut
    assert got[2].startswith("quiz leak follows:")
    assert got[3].endswith("unique content only okay")
