"""Generate an sf1 dataset (10x sf0.1) by replicating the driver's sf0.1
tables with per-replica key offsets.

TESTDATA.md stops at sf0.1 (~600k lineitem rows); the 2x bench gate and
the scaling-slope question ("would this plan survive a 100x scale-up?")
need at least one persisted decade step.  This script derives sf1 from
the read-only sf0.1 parquet without touching /root/testdata:

* Fact/dim tables (lineitem, orders, customer, supplier, part, events)
  are replicated REPLICAS times with every key column offset by
  ``rep * (max_key + 1)`` so referential integrity holds within each
  replica and keys never collide across replicas.  Value distributions
  are preserved exactly.
* ``region`` / ``nation`` are fixed-size dims and copied as-is.
* ``documents``: every whitespace token gets a ``_r{rep}`` suffix for
  rep > 0.  Cross-replica shingle overlap is therefore ZERO, so the
  planted duplicate families stay confined to their replica and dedup
  output (pairs, clusters) scales LINEARLY with sf -- replicating text
  verbatim would instead grow each dup family 10x and the pair count
  ~100x, which would make every dedup query look super-linear for data
  reasons rather than engine reasons.
* ``embeddings``: element-wise deterministic sign flip per replica
  (pattern = parity of xxhash64(rep, index)).  A sign flip is an
  isometry -- norms and all in-replica cosines are preserved exactly,
  so the near-dup structure replicates linearly -- while cross-replica
  cosines are scrambled to noise.

Output: /root/repo/testdata_sf1/{table}.parquet (gitignored; ~150 MB).
Regenerate any time with ``python scripts/gen_sf1.py``; bench.py calls
``ensure_sf1()`` lazily.
"""

from __future__ import annotations

import os

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "testdata_sf1")
REPLICAS = 10

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# table -> columns to offset by rep * (global max over the SOURCE table + 1).
# The offset base for a foreign key is the max of the referenced table's
# primary key so child and parent shift identically.
_KEY_COLS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {"o_orderkey": ("orders", "o_orderkey"),
               "o_custkey": ("customer", "c_custkey")},
    "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                 "l_partkey": ("part", "p_partkey"),
                 "l_suppkey": ("supplier", "s_suppkey")},
    "events": {"event_id": ("events", "event_id"),
               "user_id": ("events", "user_id")},
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}


def _max_keys(spark) -> dict:
    """(table, col) -> max value + 1, for every referenced key."""
    from pyspark.sql import functions as F
    needed = {}
    for cols in _KEY_COLS.values():
        for table, col in cols.values():
            needed.setdefault((table, col), None)
    out = {}
    for table, col in needed:
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        out[(table, col)] = df.agg(F.max(col)).first()[0] + 1
    return out


def _replicate(df, key_offsets, rep_col_exprs=None, replicas=REPLICAS):
    """Explode df x replicas, offsetting key cols; rep_col_exprs maps
    column name -> fn(col, rep_col) for custom per-replica transforms."""
    from pyspark.sql import functions as F
    rep = F.explode(F.array(*[F.lit(i) for i in range(replicas)])).alias(
        "__rep__")
    df = df.select("*", rep)
    r = F.col("__rep__")
    exprs = []
    for field in df.schema.fields:
        name = field.name
        if name == "__rep__":
            continue
        c = F.col(name)
        if name in key_offsets:
            c = (c + r.cast("bigint") * F.lit(key_offsets[name])).alias(name)
        elif rep_col_exprs and name in rep_col_exprs:
            c = rep_col_exprs[name](c, r).alias(name)
        else:
            c = c.alias(name)
        exprs.append(c)
    return df.select(*exprs)


def generate(spark, replicas=REPLICAS, dst=DST, tables=None) -> str:
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    maxes = _max_keys(spark)

    # The sf0.1 parquet files are single-partition; repartition on read so
    # the 10x explode + transform + write runs on all cores instead of one.
    _parts = {"lineitem": 16, "orders": 8, "events": 8, "documents": 8,
              "embeddings": 4, "customer": 4, "part": 2, "supplier": 1}

    for table in (tables or TABLES):
        out = os.path.join(dst, f"{table}.parquet")
        src_df = spark.read.parquet(f"{SRC}/{table}.parquet")
        if table in ("region", "nation"):
            dst_df = src_df
        else:
            src_df = src_df.repartition(_parts.get(table, 4))
            offsets = {col: maxes[ref]
                       for col, ref in _KEY_COLS[table].items()}
            custom = None
            if table == "documents":
                # rep 0 keeps the original text; rep > 0 suffixes every
                # token, killing cross-replica shingle overlap.
                def _suffix_text(c, r):
                    suffixed = F.concat_ws(
                        " ",
                        F.transform(
                            F.split(c, " "),
                            lambda w: F.concat(w, F.lit("_r"),
                                               r.cast("string"))))
                    return F.when(r == 0, c).otherwise(suffixed)

                custom = {"text": _suffix_text}
            elif table == "embeddings":
                def _sign_flip(c, r):
                    # parity of xxhash64(rep, position) as +-1; rep 0
                    # stays identity so sf0.1 is a strict subset.
                    def flip(x, i):
                        sign = F.when(
                            (F.pmod(F.xxhash64(r, i), F.lit(2)) == 0)
                            | (r == 0), F.lit(1.0)).otherwise(F.lit(-1.0))
                        return (x * sign).cast("float")
                    return F.transform(c, flip)
                custom = {"embedding": _sign_flip}
            dst_df = _replicate(src_df, offsets, custom,
                                replicas=replicas)
            if table == "documents":
                dst_df = dst_df.withColumn("n_chars", F.length("text"))
        dst_df.write.mode("overwrite").parquet(out)
    return dst


def ensure_sf1(spark) -> str:
    """Generate sf1 iff missing; returns the directory."""
    marker = os.path.join(DST, "embeddings.parquet")
    if os.path.isdir(marker):
        return DST
    return generate(spark)


DST10 = os.path.join(os.path.dirname(DST), "testdata_sf10")


def ensure_sf10_documents(spark) -> str:
    """documents-only sf10 (100 replicas of sf0.1) for the second-decade
    scaling probe of the top document-heavy queries; ~1 GB, generated
    lazily, gitignored like sf1."""
    marker = os.path.join(DST10, "documents.parquet")
    if os.path.isdir(marker):
        return DST10
    return generate(spark, replicas=100, dst=DST10,
                    tables=["documents"])


def ensure_sf10_dp(spark) -> str:
    """orders/events sf10 (plus the tiny dims the DP queries join) for
    the second-decade probe of the DP-engine bounding pipeline and the
    events-window paths (VERDICT r9 task 5); ~250 MB, generated lazily,
    gitignored like sf1."""
    marker = os.path.join(DST10, "events.parquet")
    if os.path.isdir(marker):
        # lazy top-up: documents joined the sf10 set in round 12 (the
        # multimodal_video_frames second-decade probe reads it)
        if not os.path.isdir(os.path.join(DST10, "documents.parquet")):
            generate(spark, replicas=100, dst=DST10,
                     tables=["documents"])
        return DST10
    return generate(spark, replicas=100, dst=DST10,
                    tables=["region", "nation", "customer", "orders",
                            "events", "documents"])


if __name__ == "__main__":
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    print(generate(spark))
    spark.stop()
