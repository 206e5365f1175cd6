"""Deterministic-sketch tests: HyperLogLog, count-min, Bloom
decontamination — accuracy bounds, structural guarantees (CMS never
underestimates; Bloom never false-negative), mergeability, and
determinism across partitionings."""

import pytest
from pyspark.sql import functions as F

from pipelinedp_spark.functions.sketches import (cms_counters, cms_estimate,
                                                 hll_alpha, hll_distinct_estimate)
from pipelinedp_spark.operators.decontam import (bloom_filter_table,
                                                 decontaminate,
                                                 decontaminate_bloom)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20000).select(
        F.concat(F.lit("item-"), F.col("id")).alias("v"))


def test_hll_estimate_within_expected_error(spark, ids):
    # Standard error for m=1024 is ~1.04/sqrt(1024) = 3.25%; allow 4 sigma.
    row = hll_distinct_estimate(ids, "v", p=10).collect()[0]
    assert row["m"] == 1024
    assert abs(row["estimate"] - 20000) / 20000 < 0.13


def test_hll_duplicates_do_not_change_estimate(spark, ids):
    # rho is a function of the value: occurrences never move registers.
    dup = ids.union(ids).union(ids)
    a = hll_distinct_estimate(ids, "v", p=10).collect()[0]["estimate"]
    b = hll_distinct_estimate(dup, "v", p=10).collect()[0]["estimate"]
    assert a == b


def test_hll_small_range_linear_counting_is_near_exact(spark):
    small = spark.range(0, 150).select(
        F.concat(F.lit("x-"), F.col("id")).alias("v"))
    row = hll_distinct_estimate(small, "v", p=10).collect()[0]
    # Linear counting at n << m is very tight.
    assert abs(row["estimate"] - 150) / 150 < 0.05


def test_hll_deterministic_across_partitionings(spark, ids):
    a = hll_distinct_estimate(ids.repartition(1), "v", p=10).collect()[0]
    b = hll_distinct_estimate(ids.repartition(13), "v", p=10).collect()[0]
    assert a == b


def test_hll_alpha_guard():
    with pytest.raises(ValueError):
        hll_alpha(64)


def test_cms_never_underestimates_and_heavy_hitters_tight(spark):
    # Skewed stream: token t-i appears (i+1)^2 times for i in 0..99.
    rows = spark.range(0, 100).select(
        F.concat(F.lit("t-"), F.col("id")).alias("tok"),
        ((F.col("id") + 1) * (F.col("id") + 1)).alias("n"))
    stream = rows.select(
        F.explode(F.expr("sequence(1, n)")).alias("_"), "tok")
    counters = cms_counters(stream, "tok", depth=4, width=1024)
    est = cms_estimate(counters, rows, "tok", depth=4, width=1024)
    joined = {r["tok"]: r["est_count"]
              for r in est.collect()}
    exact = {f"t-{i}": (i + 1) ** 2 for i in range(100)}
    for tok, true in exact.items():
        assert joined[tok] >= true          # structural: upper bound
    # The heaviest token collides with at most eps*N extra mass w.h.p.
    total = sum(exact.values())
    assert joined["t-99"] - exact["t-99"] <= 0.02 * total


def test_cms_counters_mergeable_by_sum(spark):
    half1 = spark.range(0, 500).select(
        F.concat(F.lit("w-"), F.col("id") % 37).alias("tok"))
    half2 = spark.range(500, 1000).select(
        F.concat(F.lit("w-"), F.col("id") % 37).alias("tok"))
    both = half1.union(half2)
    merged = (cms_counters(half1, "tok").union(cms_counters(half2, "tok"))
              .groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt")))
    direct = cms_counters(both, "tok")
    a = {(r["j"], r["bucket"]): r["cnt"] for r in merged.collect()}
    b = {(r["j"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert a == b


def _doc_frame(spark):
    rows = [(i, f"alpha beta gamma delta epsilon zeta token{i} "
                f"eta theta iota kappa") for i in range(40)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bloom_matches_exact_decontaminate(spark):
    docs = _doc_frame(spark)
    evald = docs.filter(F.col("doc_id") % 5 == 0)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    a = sorted(r["doc_id"] for r in
               decontaminate(train, evald, n=3).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in
               decontaminate_bloom(train, evald, n=3)
               .select("doc_id").collect())
    assert a == b


def test_bloom_tiny_filter_still_exact(spark):
    # Saturate a 128-bit filter: false-positive rate ~1, so the exact
    # confirm join does all the work — output must still match.
    docs = _doc_frame(spark)
    evald = docs.filter(F.col("doc_id") % 5 == 0)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    a = sorted(r["doc_id"] for r in
               decontaminate(train, evald, n=3).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in
               decontaminate_bloom(train, evald, n=3, m_bits=128,
                                   num_hashes=2)
               .select("doc_id").collect())
    assert a == b


def test_bloom_word_table_is_bounded(spark):
    docs = _doc_frame(spark)
    tbl = bloom_filter_table(docs, n=3, m_bits=1 << 12, num_hashes=5)
    assert tbl.count() <= (1 << 12) // 64
