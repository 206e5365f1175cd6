"""Dataflow-primitive and PrivateDataFrame API tests.

Backend-parity strategy mirrors the reference's primitive contract tests
(reference: tests/spark_rdd_backend_test.py:28-60 pattern, re-expressed for
DataFrames).
"""

import pytest
from pyspark.sql import functions as F

import pipelinedp_spark as pds
from pipelinedp_spark import backend as B


@pytest.fixture
def kv(spark):
    return spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 10), ("c", 5)],
        "k string, v int")


def test_map_and_values(kv):
    out = B.map_rows(kv, F.col("k"), (F.col("v") * 2).alias("v"))
    assert sorted(r["v"] for r in out.collect()) == [2, 4, 6, 10, 20]
    assert B.keys(kv, "k").columns == ["k"]
    assert B.values(kv, "v").columns == ["v"]


def test_flat_map(spark):
    df = spark.createDataFrame([("x", [1, 2]), ("y", [3])],
                               "k string, arr array<int>")
    out = B.flat_map(df, F.col("arr"), "v", keep=["k"])
    assert sorted((r["k"], r["v"]) for r in out.collect()) == \
        [("x", 1), ("x", 2), ("y", 3)]


def test_group_by_key(kv):
    out = {r["k"]: sorted(r["v"]) for r in
           B.group_by_key(kv, "k", "v").collect()}
    assert out == {"a": [1, 2, 3], "b": [10], "c": [5]}


def test_filter_by_key(kv, spark):
    keys_df = spark.createDataFrame([("a",), ("c",)], "k string")
    out = B.filter_by_key(kv, keys_df, "k")
    assert sorted(r["k"] for r in out.collect()) == ["a", "a", "a", "c"]


def test_filter_by_key_sharded(kv, spark):
    keys_df = spark.createDataFrame([("b",)], "k string")
    out = B.filter_by_key_sharded(kv, keys_df, "k", sharding_factor=4)
    assert [r["v"] for r in out.collect()] == [10]


def test_sample_fixed_per_key(kv):
    out = B.sample_fixed_per_key(kv, "k", 2)
    counts = {r["k"]: r["count"] for r in
              B.count_per_element(out, "k").collect()}
    assert counts == {"a": 2, "b": 1, "c": 1}
    # Sampled values are a subset of the originals.
    a_vals = {r["v"] for r in out.filter(F.col("k") == "a").collect()}
    assert a_vals <= {1, 2, 3} and len(a_vals) == 2


def test_sum_count_minmax_per_key(kv):
    sums = {r["k"]: r["v"] for r in B.sum_per_key(kv, "k", "v").collect()}
    assert sums == {"a": 6, "b": 10, "c": 5}
    mm = {r["k"]: (r["min"], r["max"]) for r in
          B.min_max_per_key(kv, "k", "v").collect()}
    assert mm["a"] == (1, 3)


def test_combine_per_key(kv):
    out = B.combine_per_key(
        kv, "k", [F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")])
    row = {r["k"]: (r["s"], r["n"]) for r in out.collect()}
    assert row == {"a": (6, 3), "b": (10, 1), "c": (5, 1)}


def test_flatten_distinct_size(kv, spark):
    other = spark.createDataFrame([("a", 1)], "k string, v int")
    both = B.flatten(kv, other)
    assert both.count() == 6
    assert B.distinct(both).count() == 5
    assert B.size(kv).collect()[0]["size"] == 5


def test_side_input(kv, spark):
    side = spark.createDataFrame([(2,)], "threshold int")
    out = B.filter_with_side_input(
        kv, side, lambda s: F.col("v") >= s["threshold"])
    assert sorted(r["v"] for r in out.collect()) == [2, 3, 5, 10]


def test_reshuffle_and_annotate(kv):
    assert B.reshuffle(kv, 4).rdd.getNumPartitions() == 4
    assert B.annotate(kv, budget="x").collect() == kv.collect()


# ---------------------------------------------------------------------------
# PrivateDataFrame
# ---------------------------------------------------------------------------


def test_private_dataframe_sum_flow(spark):
    rows = [(u, "d1" if u % 2 else "d2", float(u % 5)) for u in range(40)]
    df = spark.createDataFrame(rows, "uid int, day string, spend double")
    acct = pds.NaiveBudgetAccountant(total_epsilon=2.0, total_delta=1e-6)
    pdf = pds.make_private(df, acct, "uid")
    pdf = pdf.with_column("spend2", F.col("spend") * 2)
    result = pdf.sum(pds.SumParams(
        partition_key="day", max_partitions_contributed=1,
        max_contributions_per_partition=1, value_column="spend2",
        min_value=0.0, max_value=8.0, public_partitions=["d1", "d2"]))
    acct.compute_budgets()
    out = result.dataframe()
    assert set(out.columns) == {"day", "sum"}
    assert out.count() == 2


def test_private_dataframe_two_actions_split_budget(spark):
    rows = [(u, "g", 1.0) for u in range(30)]
    df = spark.createDataFrame(rows, "uid int, pk string, v double")
    acct = pds.NaiveBudgetAccountant(total_epsilon=1.0, total_delta=1e-6)
    pdf = pds.make_private(df, acct, "uid")
    r1 = pdf.count(pds.CountParams(
        partition_key="pk", max_partitions_contributed=1,
        max_contributions_per_partition=1, public_partitions=["g"]))
    r2 = pdf.privacy_id_count(pds.PrivacyIdCountParams(
        partition_key="pk", max_partitions_contributed=1,
        max_contributions_per_partition=1, public_partitions=["g"]))
    acct.compute_budgets()
    assert r1.dataframe().collect()[0]["count"] != 0
    assert r2.dataframe().collect()[0]["privacy_id_count"] != 0


def test_private_dataframe_guards(spark):
    df = spark.createDataFrame([(1, "a")], "uid int, pk string")
    acct = pds.NaiveBudgetAccountant(1.0, 1e-6)
    pdf = pds.make_private(df, acct, "uid")
    with pytest.raises(ValueError, match="privacy unit"):
        pdf.select("pk")
    with pytest.raises(ValueError, match="privacy unit"):
        pdf.with_column("uid", F.lit(1))
    with pytest.raises(ValueError):
        pds.make_private(df, acct, "nope")


def test_private_dataframe_select_partitions(spark):
    rows = [(u, "big") for u in range(200)] + [(9999, "tiny")]
    df = spark.createDataFrame(rows, "uid int, pk string")
    acct = pds.NaiveBudgetAccountant(1.0, 1e-6)
    pdf = pds.make_private(df, acct, "uid")
    res = pdf.select_partitions(
        pds.SelectPartitionsParams(max_partitions_contributed=1), "pk")
    acct.compute_budgets()
    kept = [r["pk"] for r in res.dataframe().collect()]
    assert "big" in kept and "tiny" not in kept


def test_to_list_and_to_collection(kv, spark):
    out = B.to_list(kv, "v").collect()
    assert len(out) == 1
    assert sorted(out[0]["v"]) == [1, 2, 3, 5, 10]
    lifted = B.to_collection(spark, [("z", 7)], "k string, v int")
    assert lifted.collect()[0]["v"] == 7


def test_flat_map_with_side_input(kv, spark):
    # Reference flat_map_with_side_inputs: compose the broadcast singleton
    # side input with an explode whose array depends on it.
    side = spark.createDataFrame([(2,)], "reps int")
    with_side = B.with_singleton_side_input(kv, side, "side")
    out = B.flat_map(
        with_side,
        F.transform(F.sequence(F.lit(1), F.col("side.reps")),
                    lambda i: F.col("v") * i),
        "v_scaled", keep=["k"])
    rows = sorted((r["k"], r["v_scaled"]) for r in out.collect())
    # every v appears once at x1 and once at x2
    assert rows.count(("a", 2)) == 2  # v=1 scaled x2 and v=2 scaled x1
    assert ("b", 20) in rows and ("c", 10) in rows
    assert len(rows) == 10


def test_private_dataframe_params_carry_bounds_flags(spark):
    # Reference parity: the per-metric params expose
    # contribution_bounds_already_enforced + pre_threshold and the
    # wrapper forwards them to the engine's AggregateParams.
    import pipelinedp_spark as pds
    from pipelinedp_spark.private_dataframe import CountParams, make_private
    rows = [(u, "g") for u in range(30)]
    df = spark.createDataFrame(rows, "uid int, pk string")
    acct = pds.NaiveBudgetAccountant(1.0, 1e-6)
    pdf = make_private(df, acct, "uid")
    res = pdf.count(CountParams(
        partition_key="pk", max_partitions_contributed=1,
        max_contributions_per_partition=1,
        public_partitions=["g"],
        contribution_bounds_already_enforced=True,
        pre_threshold=5))
    acct.compute_budgets()
    out = res.dataframe().collect()
    assert len(out) == 1  # runs end-to-end with both flags set
