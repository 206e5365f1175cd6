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


def test_hll_grouped_matches_per_group_global(spark):
    df = spark.range(0, 6000).select(
        (F.col("id") % 3).alias("g"),
        F.concat(F.lit("u-"), (F.col("id") % 997)).alias("v"))
    from pipelinedp_spark.functions.sketches import hll_distinct_estimate_by
    grouped = {r["g"]: r["estimate"]
               for r in hll_distinct_estimate_by(df, "v", ["g"], p=8)
               .collect()}
    for g in range(3):
        solo = hll_distinct_estimate(
            df.filter(F.col("g") == g), "v", p=8).collect()[0]["estimate"]
        assert grouped[g] == solo


def test_hll_python_twin_matches_dataframe(spark):
    from pipelinedp_spark.functions.sketches import (hll_estimate_py,
                                                     hll_reg_rho_py)
    vals = [f"item-{i}" for i in range(5000)]
    sketch = {}
    for v in vals:
        reg, rho = hll_reg_rho_py(v, 8)
        if rho > sketch.get(reg, 0):
            sketch[reg] = rho
    raw, est = hll_estimate_py(sketch, 8)
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    row = hll_distinct_estimate(df, "v", p=8).collect()[0]
    assert row["raw_estimate"] == raw
    assert row["estimate"] == est
    assert row["nonzero_registers"] == len(sketch)


def test_kmv_overlap_planted_sets(spark):
    from pipelinedp_spark.functions.sketches import kmv_overlap_estimate
    a = spark.range(0, 10000).select(
        F.concat(F.lit("w-"), F.col("id")).alias("v"))
    b = spark.range(5000, 15000).select(
        F.concat(F.lit("w-"), F.col("id")).alias("v"))
    row = kmv_overlap_estimate(a, b, "v", k=512).collect()[0]
    # True: union 15000, jaccard 1/3, intersection 5000.
    assert abs(row["union_est"] - 15000) / 15000 < 0.2
    assert abs(row["jaccard_est"] - 1 / 3) < 0.1
    assert abs(row["intersection_est"] - 5000) / 5000 < 0.3


def test_kmv_overlap_exact_when_small(spark):
    from pipelinedp_spark.functions.sketches import kmv_overlap_estimate
    a = spark.range(0, 100).select(
        F.concat(F.lit("w-"), F.col("id")).alias("v"))
    b = spark.range(60, 160).select(
        F.concat(F.lit("w-"), F.col("id")).alias("v"))
    # Union 0..159 = 160 distinct, intersection 60..99 = 40.
    row = kmv_overlap_estimate(a, b, "v", k=512).collect()[0]
    assert row["k_used"] == 160
    assert row["union_est"] == 160.0
    assert row["intersection_est"] == pytest.approx(40.0, abs=1e-6)


def test_streaming_hll_matches_batch_mirror(spark, tmp_path):
    """Streaming per-window HLL == batch hll_distinct_estimate_by over
    the same windows (register merge is order/trigger-invariant)."""
    import datetime as dt
    from pipelinedp_spark.functions.sketches import hll_distinct_estimate_by
    from pipelinedp_spark.streaming.dp_streaming import streaming_distinct_hll
    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(hours=h, minutes=i % 60), f"u{i % (20 + h)}")
            for h in range(3) for i in range(200)]
    df = spark.createDataFrame(rows, ["ts", "user"])
    src = str(tmp_path / "hll_src")
    df.write.parquet(src)
    stream = spark.readStream.schema("ts timestamp, user string") \
        .parquet(src)
    out = streaming_distinct_hll(stream, value_col="user",
                                 timestamp_col="ts",
                                 window_duration="1 hour", p=8)
    q = (out.writeStream.format("memory").queryName("hll_stream_t")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.table("hll_stream_t")
           .groupBy("window_start")
           .agg(F.last("estimate").alias("estimate"),
                F.last("nonzero_registers").alias("nz")))
    batch = hll_distinct_estimate_by(
        df.select(F.date_trunc("hour", "ts").alias("window_start"),
                  "user"),
        "user", ["window_start"], p=8)
    g = {r["window_start"]: (r["estimate"], r["nz"]) for r in got.collect()}
    b = {r["window_start"]: (r["estimate"], r["nonzero_registers"])
         for r in batch.collect()}
    assert g == b and len(g) == 3


def test_temperature_sample_quotas_and_determinism(spark):
    from pipelinedp_spark.functions.sampling import temperature_sample
    # Sources with sizes 100 / 400 / 1600: alpha=0.5 gives quota weights
    # 10:20:40 (sqrt), upweighting the small source vs raw 1:4:16.
    df = spark.range(0, 2100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, "small")
        .when(F.col("id") < 500, "mid").otherwise("big").alias("source"))
    out = temperature_sample(df, "source", "doc_id", total=140, alpha=0.5)
    got = {r["source"]: r["cnt"] for r in
           out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert got == {"small": 20, "mid": 40, "big": 80}
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               temperature_sample(df.repartition(7), "source", "doc_id",
                                  total=140, alpha=0.5).collect())
    assert a == b


def test_temperature_sample_alpha_one_is_proportional(spark):
    from pipelinedp_spark.functions.sampling import temperature_sample
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, "a").otherwise("b").alias("source"))
    out = temperature_sample(df, "source", "doc_id", total=30, alpha=1.0)
    got = {r["source"]: r["cnt"] for r in
           out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert got == {"a": 10, "b": 20}
