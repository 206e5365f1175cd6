"""Round-11 store-plumbing contracts: append validation fails loudly on
knobs missing from an older meta row (instead of silently skipping the
corruption guard), and reader-side tombstone broadcasts are size-guarded
(a jumbo takedown falls back to a plain anti-join instead of
force-broadcasting a corpus-scale table)."""

import pytest
from pyspark.sql import functions as F

from pipelinedp_spark import store


def _drop(spark, *names):
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_begin_build_rejects_missing_validated_knob(spark):
    _drop(spark, "plumb_meta_meta")
    # a store whose meta predates a knob newer code validates
    store.write_meta(spark, "plumb_meta", num_buckets=4, k=3)
    m = store.begin_build(spark, "plumb_meta", "append", (),
                          validate={"k": 3})
    assert int(m["num_buckets"]) == 4
    with pytest.raises(ValueError, match="predates knob"):
        store.begin_build(spark, "plumb_meta", "append", (),
                          validate={"k": 3, "max_bucket_size": 200})
    with pytest.raises(ValueError, match="would corrupt"):
        store.begin_build(spark, "plumb_meta", "append", (),
                          validate={"k": 5})
    _drop(spark, "plumb_meta_meta")


def test_tombstones_broadcast_hint_is_size_guarded(spark):
    _drop(spark, "plumb_ts_tombstones")
    assert store.tombstones(spark, "plumb_ts") is None
    spark.range(10).select(F.col("id")) \
        .write.mode("overwrite").format("parquet") \
        .bucketBy(2, "id").sortBy("id").saveAsTable("plumb_ts_tombstones")
    small = store.tombstones(spark, "plumb_ts")
    big = store.tombstones(spark, "plumb_ts", broadcast_rows=5)
    # the hint shows up as ResolvedHint/broadcast in the analyzed plan
    assert "broadcast" in small._jdf.queryExecution().analyzed() \
        .toString().lower()
    assert "broadcast" not in big._jdf.queryExecution().analyzed() \
        .toString().lower()
    # both still anti-join correctly
    probe = spark.range(20).select(F.col("id"))
    assert probe.join(small, "id", "left_anti").count() == 10
    assert probe.join(big, "id", "left_anti").count() == 10
    _drop(spark, "plumb_ts_tombstones")
