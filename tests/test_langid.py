"""Accuracy gate for character n-gram language ID (incl. CJK/unsegmented
scripts, where the stopword heuristic returns 'unknown')."""

import pytest
from pyspark.sql import functions as F

from pipelinedp_spark.operators.langid import (LANG_SEEDS,
                                               language_id_ngram,
                                               language_profiles)

# Planted sentences DIFFERENT from the seed texts.
PLANTS = {
    "en": ("I think that we should go to the market in the morning "
           "and buy some bread with the other people."),
    "es": ("Nosotros vamos a la ciudad para comprar comida y después "
           "volvemos a casa con los niños pequeños."),
    "de": ("Ich möchte morgen in die Schule gehen und danach mit "
           "meinen Freunden Fußball spielen."),
    "fr": ("Nous allons au marché pour acheter des légumes et ensuite "
           "nous rentrons à la maison avec les enfants."),
    "it": ("Noi andiamo alla città per comprare del pane e poi "
           "torniamo a casa con gli amici della scuola."),
    "pt": ("Nós vamos à cidade para comprar pão e depois voltamos "
           "para casa com as crianças da escola."),
    "nl": ("Wij gaan morgen naar de markt om brood te kopen en daarna "
           "gaan wij naar huis met de kinderen."),
    "ru": ("Мы идем в магазин чтобы купить хлеб и потом возвращаемся "
           "домой вместе с детьми."),
    "zh": "我们明天去市场买一些水果和蔬菜然后回家吃饭。",
    "ja": "私たちは明日市場へ行って果物を買います。それから家に帰ります。",
    "ko": "우리는 내일 시장에 가서 과일을 사고 집으로 돌아갑니다.",
    "th": "พรุ่งนี้เราจะไปตลาดเพื่อซื้อผลไม้และกลับบ้าน",
    "ar": "نحن نذهب إلى السوق لشراء الخبز ثم نعود إلى البيت مع الأطفال.",
}


def test_profiles_shape():
    prof = language_profiles()
    langs = {r[0] for r in prof}
    assert langs == set(LANG_SEEDS)
    assert all(len(g) in (1, 2, 3) and w > 0 for _, g, w in prof)
    # no pure-whitespace grams
    assert all(g.strip() != "" for _, g, _ in prof)


def test_language_id_ngram_accuracy_gate(spark):
    rows = [(i, lang, text)
            for i, (lang, text) in enumerate(sorted(PLANTS.items()))]
    df = spark.createDataFrame(rows, "doc_id long, truth string, "
                                     "text string")
    got = language_id_ngram(df)
    joined = {r["truth"]: r["lang"] for r in
              df.join(got, "doc_id").collect()}
    wrong = {t: p for t, p in joined.items() if t != p}
    assert not wrong, f"misclassified: {wrong}"


def test_language_id_ngram_zero_hit_default(spark):
    df = spark.createDataFrame(
        [(0, "\U0001F680\U0001F680"), (1, None), (2, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["lang"], r["score"]) for r in
           language_id_ngram(df).collect()}
    assert got[0] == ("unknown", 0.0)
    assert got[1] == ("unknown", 0.0)
    assert got[2] == ("unknown", 0.0)


def test_language_id_ngram_deterministic_and_scored(spark):
    df = spark.createDataFrame([(0, PLANTS["en"])],
                               "doc_id long, text string")
    a = language_id_ngram(df).collect()[0]
    b = language_id_ngram(df).collect()[0]
    assert a == b
    assert a["score"] > 0
