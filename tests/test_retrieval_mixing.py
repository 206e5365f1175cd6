"""Tests for BM25 retrieval and DSIR importance weighting."""

import math

import pytest

from pyspark.sql import functions as F

from pipelinedp_spark.operators.mixing import (dsir_log_weights,
                                               hashed_ngram_features)
from pipelinedp_spark.operators.retrieval import (bm25_topk, doc_lengths,
                                                  term_frequencies)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _queries(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "query_id long, query_text string")


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def test_term_frequencies_and_doc_lengths(spark):
    tf = term_frequencies(_docs(spark, ["a a b", "b"]))
    got = {(r["doc_id"], r["term"]): r["tf"] for r in tf.collect()}
    assert got == {(0, "a"): 2, (0, "b"): 1, (1, "b"): 1}
    dl = {r["doc_id"]: r["dl"] for r in doc_lengths(tf).collect()}
    assert dl == {0: 3, 1: 1}


def test_bm25_matches_hand_computation(spark):
    docs = _docs(spark, ["cat dog", "cat cat cat dog", "fish"])
    out = bm25_topk(docs, _queries(spark, ["cat"]), k=3).collect()
    # N=3, df(cat)=2, idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    # avgdl = (2+4+1)/3
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    avgdl = 7 / 3

    def s(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    got = {r["doc_id"]: (r["rank"], r["score"]) for r in out}
    assert set(got) == {0, 1}            # 'fish' doc never scores
    assert got[1][0] == 1 and got[0][0] == 2
    assert got[1][1] == pytest.approx(round(s(3, 4), 6), abs=1e-6)
    assert got[0][1] == pytest.approx(round(s(1, 2), 6), abs=1e-6)


def test_bm25_rare_term_outranks_common(spark):
    docs = _docs(spark, ["x common", "y common", "z common", "x rare"])
    out = bm25_topk(docs, _queries(spark, ["rare common"]), k=4).collect()
    top = min(out, key=lambda r: r["rank"])
    assert top["doc_id"] == 3            # the only doc with 'rare'


def test_bm25_repeated_query_terms_not_double_counted(spark):
    docs = _docs(spark, ["cat dog", "dog cat"])
    a = bm25_topk(docs, _queries(spark, ["cat"]), k=2).collect()
    b = bm25_topk(docs, _queries(spark, ["cat cat cat"]), k=2).collect()
    assert sorted((r["doc_id"], r["score"]) for r in a) == \
        sorted((r["doc_id"], r["score"]) for r in b)


def test_bm25_topk_limit(spark):
    docs = _docs(spark, [f"tok filler{i}" for i in range(20)])
    out = bm25_topk(docs, _queries(spark, ["tok"]), k=5).collect()
    assert len(out) == 5
    assert sorted(r["rank"] for r in out) == [1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------

def test_hashed_ngram_features_counts_bigrams(spark):
    f = hashed_ngram_features(_docs(spark, ["a b a b"]), num_buckets=1 << 20)
    rows = f.collect()
    # bigrams: "a b", "b a", "a b" -> one bucket with c=2, one with c=1
    assert sorted(r["c"] for r in rows) == [1, 2]


def test_hashed_ngram_features_short_doc_whole_text(spark):
    f = hashed_ngram_features(_docs(spark, ["solo"]), num_buckets=64)
    rows = f.collect()
    assert len(rows) == 1 and rows[0]["c"] == 1


def test_dsir_target_like_docs_score_higher(spark):
    target_like = "alpha beta gamma delta"
    off_target = "omega psi chi phi"
    raw = _docs(spark, [target_like, off_target,
                        "alpha beta something else"])
    target = _docs(spark, [target_like, "alpha beta gamma"])
    out = {r["doc_id"]: r["logw"]
           for r in dsir_log_weights(raw, target,
                                     num_buckets=1 << 14).collect()}
    assert out[0] > out[2] > out[1]


def test_dsir_weight_value_matches_model(spark):
    # One shared bigram between raw doc and target; verify the closed form.
    raw = _docs(spark, ["a b"])
    target = _docs(spark, ["a b"])
    B, alpha = 16, 1.0
    out = dsir_log_weights(raw, target, num_buckets=B).collect()
    # tot_r = tot_t = 1 gram; bucket has c_r = c_t = 1.
    expected = math.log((1 + alpha) / (1 + alpha * B)) \
        - math.log((1 + alpha) / (1 + alpha * B))
    assert out[0]["logw"] == pytest.approx(expected, abs=1e-6)
    assert out[0]["n_feats"] == 1


# ---------------------------------------------------------------------------
# Linear quality classifier
# ---------------------------------------------------------------------------

def test_classifier_separates_token_disjoint_classes(spark):
    from pipelinedp_spark.operators.mixing import (classifier_scores,
                                                   collect_sample_features,
                                                   train_linear_classifier)
    pos = [f"good text sample number {i} quality words" for i in range(10)]
    neg = [f"bad noise junk entry {i} garbage tokens" for i in range(10)]
    docs = _docs(spark, pos + neg)
    sample = collect_sample_features(
        docs, label_expr=(F.col("doc_id") < 10), num_buckets=256)
    w, b = train_linear_classifier(sample, num_buckets=256)
    scores = {r["doc_id"]: r["score"]
              for r in classifier_scores(docs, w, b,
                                         num_buckets=256).collect()}
    assert min(scores[i] for i in range(10)) > \
        max(scores[i] for i in range(10, 20))


def test_collect_sample_features_matches_duckdb_features(spark):
    """The Spark sample collector and a DuckDB recomputation must agree
    exactly (md5 buckets are engine-portable) — this is what lets the
    driver query train via either engine and get identical weights."""
    import duckdb
    from pipelinedp_spark.operators.mixing import collect_sample_features
    texts = ["alpha beta gamma", "beta gamma delta epsilon", "solo"]
    docs = _docs(spark, texts)
    got = collect_sample_features(docs, label_expr=(F.col("doc_id") == 0),
                                  num_buckets=64, sample_size=10)
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO d VALUES (?, ?)", [i, t])
    rows = con.execute("""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM d),
g AS (SELECT doc_id,
             unnest(CASE WHEN len(tk) >= 2
                         THEN [tk[i] || ' ' || tk[i+1]
                               for i in range(1, len(tk))]
                         ELSE [array_to_string(tk, ' ')] END) AS gram
      FROM t)
SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT % 64, COUNT(*)
FROM g GROUP BY 1, 2 ORDER BY 1, 2""").fetchall()
    want = {}
    for doc_id, bucket, c in rows:
        want.setdefault(doc_id, {})[bucket] = c
    assert {d: feats for d, feats, _ in got} == want
    assert [y for _, _, y in got] == [1, 0, 0]


def test_train_linear_classifier_deterministic():
    from pipelinedp_spark.operators.mixing import train_linear_classifier
    sample = [(0, {1: 2, 3: 1}, 1), (1, {5: 4}, 0), (2, {1: 1, 5: 1}, 1)]
    w1, b1 = train_linear_classifier(sample, num_buckets=8)
    w2, b2 = train_linear_classifier(sample, num_buckets=8)
    assert (w1 == w2).all() and b1 == b2


# ---------------------------------------------------------------------------
# Importance resampling
# ---------------------------------------------------------------------------

def test_importance_resample_keeps_expected_fraction(spark):
    from pipelinedp_spark.operators.mixing import importance_resample
    # Uniform weights -> keep probability == keep_fraction for every doc.
    df = spark.createDataFrame([(i, 0.0) for i in range(2000)],
                               "doc_id long, logw double")
    kept = importance_resample(df, keep_fraction=0.3).count()
    assert 0.25 * 2000 < kept < 0.35 * 2000


def test_importance_resample_prefers_heavy_docs(spark):
    from pipelinedp_spark.operators.mixing import importance_resample
    import math
    rows = [(i, math.log(9.0)) for i in range(200)] + \
        [(i, math.log(1.0 / 9.0)) for i in range(200, 400)]
    df = spark.createDataFrame(rows, "doc_id long, logw double")
    kept = importance_resample(df, keep_fraction=0.3).collect()
    heavy = sum(1 for r in kept if r["doc_id"] < 200)
    light = len(kept) - heavy
    assert heavy > 3 * max(light, 1)


def test_importance_resample_deterministic(spark):
    from pipelinedp_spark.operators.mixing import importance_resample
    df = spark.createDataFrame([(i, (i % 7) / 3.0) for i in range(300)],
                               "doc_id long, logw double")
    a = sorted(r["doc_id"] for r in importance_resample(df).collect())
    b = sorted(r["doc_id"] for r in importance_resample(df).collect())
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# Edge cases
# ---------------------------------------------------------------------------

def test_bm25_query_with_unknown_terms_only_returns_empty(spark):
    from pipelinedp_spark.operators.retrieval import bm25_topk
    docs = _docs(spark, ["cat dog", "dog bird"])
    out = bm25_topk(docs, _queries(spark, ["zzz qqq"]), k=3)
    assert out.count() == 0


def test_bm25_mixed_known_unknown_terms_scores_known_only(spark):
    from pipelinedp_spark.operators.retrieval import bm25_topk
    docs = _docs(spark, ["cat dog", "dog bird"])
    a = bm25_topk(docs, _queries(spark, ["cat zzz"]), k=3).collect()
    b = bm25_topk(docs, _queries(spark, ["cat"]), k=3).collect()
    assert sorted((r["doc_id"], r["score"]) for r in a) == \
        sorted((r["doc_id"], r["score"]) for r in b)


def test_dsir_empty_target_gives_uniform_floor(spark):
    import math
    from pipelinedp_spark.operators.mixing import dsir_log_weights
    raw = _docs(spark, ["a b", "c d"])
    target = _docs(spark, []).filter("doc_id > 0")  # empty frame
    B = 32
    out = dsir_log_weights(raw, target, num_buckets=B).collect()
    # Every bucket: c_t=0, c_r=1, tot_r=2, tot_t=0 ->
    # lr = ln(1/B) - ln(2/(2+B)) identical for all docs.
    lr = math.log(1.0 / B) - math.log(2.0 / (2.0 + B))
    for r in out:
        assert r["logw"] == pytest.approx(lr, abs=1e-6)


def test_unigram_perplexity_single_doc_is_vocab_size_like(spark):
    from pipelinedp_spark.operators.quality import unigram_perplexity
    # All-distinct tokens: every c_t = 1, so ppl == N exactly.
    df = _docs(spark, ["u v w x y"])
    out = unigram_perplexity(df).collect()[0]
    assert out["ppl"] == pytest.approx(5.0, abs=1e-6)


def test_importance_resample_empty_input_returns_empty(spark):
    from pipelinedp_spark.operators.mixing import importance_resample
    df = spark.createDataFrame([], "doc_id long, logw double")
    assert importance_resample(df, keep_fraction=0.3).count() == 0


def test_tfidf_keywords_hand_values(spark):
    from pipelinedp_spark.operators.retrieval import tfidf_keywords
    import math
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a c")], "doc_id long, text string")
    rows = {(r["doc_id"], r["term"]): (r["rank"], r["score"])
            for r in tfidf_keywords(df, k=5).collect()}
    # idf(a) = ln(2/2) = 0; idf(b) = idf(c) = ln 2
    assert rows[(0, "b")] == (1, round(math.log(2), 6))
    assert rows[(0, "a")] == (2, 0.0)
    assert rows[(1, "c")] == (1, round(math.log(2), 6))
    assert rows[(1, "a")] == (2, 0.0)


def test_tfidf_keywords_k_and_min_df(spark):
    from pipelinedp_spark.operators.retrieval import tfidf_keywords
    df = spark.createDataFrame(
        [(0, "q w e r t y"), (1, "q q")], "doc_id long, text string")
    out = tfidf_keywords(df, k=2).collect()
    assert all(r["rank"] <= 2 for r in out)
    assert len([r for r in out if r["doc_id"] == 0]) == 2
    # min_df=2 keeps only terms in both docs (just 'q')
    only_q = tfidf_keywords(df, k=5, min_df=2).collect()
    assert {r["term"] for r in only_q} == {"q"}


def test_pmi_collocations_hand_values(spark):
    from pipelinedp_spark.operators.retrieval import pmi_collocations
    import math
    df = spark.createDataFrame(
        [(0, "x y x y")], "doc_id long, text string")
    rows = {r["gram"]: (r["c"], r["pmi"]) for r in
            pmi_collocations(df, k=10, min_count=1).collect()}
    # pairs: (x,y) twice, (y,x) once; T=3; c_x = c_y = 2
    assert rows["x y"] == (2, round(math.log(2 * 3 / 4), 6))
    assert rows["y x"] == (1, round(math.log(1 * 3 / 4), 6))
    # ordering: pmi desc
    ordered = [r["gram"] for r in
               pmi_collocations(df, k=10, min_count=1).collect()]
    assert ordered == ["x y", "y x"]


def test_pmi_collocations_min_count_and_limit(spark):
    from pipelinedp_spark.operators.retrieval import pmi_collocations
    df = spark.createDataFrame(
        [(0, "a b a b a b c d")], "doc_id long, text string")
    out = pmi_collocations(df, k=1, min_count=2)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["gram"] in ("a b", "b a")


def test_rrf_fuse_scores_ranks_and_missing_lists(spark):
    """RRF: fused score = sum of 1/(60+rank) over the lists a doc
    appears in; docs missing from one list still fuse (n_lists=1);
    ties break by ascending doc id."""
    from pipelinedp_spark.operators.retrieval import rrf_fuse
    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, doc_id long, rank long")
    dense = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id long, doc_id long, rank long")
    out = {r["doc_id"]: (r["rank"], r["rrf_score"], r["n_lists"])
           for r in rrf_fuse([lex, dense], k=10).collect()}
    # doc 11: 1/62 + 1/61; doc 10: 1/61; doc 13: 1/62; doc 12: 1/63
    assert out[11] == (1, round(1 / 62 + 1 / 61, 6), 2)
    assert out[10] == (2, round(1 / 61, 6), 1)
    assert out[13] == (3, round(1 / 62, 6), 1)
    assert out[12] == (4, round(1 / 63, 6), 1)


def test_rrf_fuse_tie_breaks_by_doc_id(spark):
    from pipelinedp_spark.operators.retrieval import rrf_fuse
    a = spark.createDataFrame([(0, 5, 1), (0, 3, 2)],
                              "query_id long, doc_id long, rank long")
    b = spark.createDataFrame([(0, 3, 1), (0, 5, 2)],
                              "query_id long, doc_id long, rank long")
    rows = rrf_fuse([a, b], k=10).collect()
    # symmetric ranks -> identical scores; doc 3 wins rank 1 by id
    assert [(r["doc_id"], r["rank"]) for r in
            sorted(rows, key=lambda r: r["rank"])] == [(3, 1), (5, 2)]
