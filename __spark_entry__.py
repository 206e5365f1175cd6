"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Correctness-gate queries run the REAL engine pipelines in deterministic mode
(zero noise — the reference's own noise-off test strategy) with bounding
parameters whose semantics are exactly SQL-expressible:
  - Linf count caps      -> least(count(*), linf) per (pid, pk)
  - per-partition clips  -> greatest(least(sum, hi), lo) per (pid, pk)
  - partition selection  -> HAVING count(distinct pid) >= threshold
L0 caps are set non-binding in oracle-checked queries (random cross-partition
sampling is not SQL-reproducible); dedicated unit tests cover binding L0.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import pipelinedp_spark as pds
from pipelinedp_spark import dp_computations as dpc


_T_CACHE: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Cache the reader PLAN (not data) per live session: every
    # spark.read.parquet call costs ~70-100 ms of driver-side file
    # listing + footer schema read, and the bench's sub-second queries
    # open 1-3 tables each. The testdata dirs are immutable, and the
    # applicationId key survives bench.py's session recycling (a new
    # session gets a new app id; stale entries just stop being hit).
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key in _T_CACHE:
        return _T_CACHE[key]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts", "").startswith("timestamp"):
        # events.ts arrives as parquet TIMESTAMP (NTZ).  Downstream queries
        # and operators key on integer time arithmetic, so normalize to
        # microseconds-since-epoch (UTC) longs — the same representation the
        # DuckDB oracles use via epoch_us().
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")))
    _T_CACHE[key] = df
    return df


# ---------------------------------------------------------------------------
# Flagship query
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """DP count + sum + mean of order totals per order priority, privacy unit
    = customer, with private partition selection — the engine's flagship
    vertical on sf0.001."""
    orders = _t(spark, "/root/testdata/sf0.001", "orders")
    query = (pds.QueryBuilder(orders, "o_custkey")
             .groupby("o_orderpriority", max_groups_contributed=3,
                      max_contributions_per_group=5)
             .count()
             .sum("o_totalprice", min_value=0.0, max_value=500000.0)
             .mean("o_totalprice", min_value=0.0, max_value=500000.0)
             .build_query())
    return query.run_query(pds.Budget(epsilon=10.0, delta=1e-5))


# ---------------------------------------------------------------------------
# Correctness-gate queries (deterministic mode) + DuckDB oracles
# ---------------------------------------------------------------------------


def _dp_count_public(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP count per order priority, public partitions, Linf cap = 3 binding,
    L0 non-binding, zero noise."""
    orders = _t(spark, sf_dir, "orders")
    pub = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    query = (pds.QueryBuilder(orders, "o_custkey")
             .groupby("o_orderpriority", max_groups_contributed=5,
                      max_contributions_per_group=3, public_keys=pub)
             .count()
             .privacy_id_count()
             .build_query())
    return query.run_query(pds.Budget(1.0, 1e-6), noise_mode="zero")


_DP_COUNT_PUBLIC_SQL = """
WITH pub(o_orderpriority) AS (
    VALUES ('1-URGENT'), ('2-HIGH'), ('3-MEDIUM'), ('4-NOT SPECIFIED'),
           ('5-LOW')),
per_user AS (
    SELECT o_custkey, o_orderpriority,
           LEAST(COUNT(*), 3) AS capped_cnt
    FROM orders GROUP BY o_custkey, o_orderpriority),
agg AS (
    SELECT o_orderpriority,
           CAST(SUM(capped_cnt) AS DOUBLE) AS count,
           CAST(COUNT(*) AS DOUBLE) AS privacy_id_count
    FROM per_user GROUP BY o_orderpriority)
SELECT pub.o_orderpriority,
       COALESCE(agg.count, 0.0) AS count,
       COALESCE(agg.privacy_id_count, 0.0) AS privacy_id_count
FROM pub LEFT JOIN agg USING (o_orderpriority)
ORDER BY o_orderpriority
"""


def _dp_count_dedup_corpus(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Composition showcase: EXACT dedup feeds a DP release in one
    lazy plan — survivors (min doc_id per normalized fingerprint, via
    `dedup.exact_dedup`) joined back to their rows, then a DP count +
    privacy-id count per language with privacy unit = SOURCE (the
    crawl feed), Linf cap 4 binding, public language partitions, zero
    noise for the oracle. The pattern a real release runs: dedup the
    corpus, then publish per-language volume stats with source-level
    DP. Catalyst fuses both stages — the dedup's groupBy feeds the
    bounding window without materialization."""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    keep = dedup.exact_dedup(docs).select("doc_id")
    survivors = docs.join(keep, "doc_id").select(
        "doc_id", "lang", "source")
    query = (pds.QueryBuilder(survivors, "source")
             .groupby("lang", max_groups_contributed=5,
                      max_contributions_per_group=4,
                      public_keys=["de", "en", "es", "fr", "zh"])
             .count()
             .privacy_id_count()
             .build_query())
    return query.run_query(pds.Budget(1.0, 1e-6), noise_mode="zero")


_DP_COUNT_DEDUP_SQL = """
WITH pub(lang) AS (
    VALUES ('de'), ('en'), ('es'), ('fr'), ('zh')),
fp AS (
    SELECT doc_id, lang, source,
           md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))
               AS fingerprint
    FROM documents),
keep AS (
    SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fingerprint),
survivors AS (
    SELECT f.lang, f.source FROM fp f JOIN keep k USING (doc_id)),
per_source AS (
    SELECT source, lang, LEAST(COUNT(*), 4) AS capped_cnt
    FROM survivors GROUP BY source, lang),
agg AS (
    SELECT lang,
           CAST(SUM(capped_cnt) AS DOUBLE) AS count,
           CAST(COUNT(*) AS DOUBLE) AS privacy_id_count
    FROM per_source GROUP BY lang)
SELECT pub.lang,
       COALESCE(agg.count, 0.0) AS count,
       COALESCE(agg.privacy_id_count, 0.0) AS privacy_id_count
FROM pub LEFT JOIN agg USING (lang)
ORDER BY lang
"""


def _dp_sum_clip_per_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP sum of lineitem quantity per return flag; per-partition clip of each
    supplier's per-flag quantity sum to [0, 100]; zero noise."""
    li = _t(spark, sf_dir, "lineitem")
    query = (pds.QueryBuilder(li, "l_suppkey")
             .groupby("l_returnflag", max_groups_contributed=3,
                      max_contributions_per_group=1_000_000,
                      public_keys=["A", "N", "R"])
             .sum("l_quantity", min_sum_per_partition=0.0,
                  max_sum_per_partition=100.0, name="sum_qty")
             .build_query())
    return query.run_query(pds.Budget(1.0), noise_mode="zero")


_DP_SUM_CLIP_SQL = """
WITH pub(l_returnflag) AS (VALUES ('A'), ('N'), ('R')),
per_user AS (
    SELECT l_suppkey, l_returnflag,
           GREATEST(LEAST(SUM(l_quantity), 100.0), 0.0) AS clipped
    FROM lineitem GROUP BY l_suppkey, l_returnflag),
agg AS (
    SELECT l_returnflag, CAST(SUM(clipped) AS DOUBLE) AS sum_qty
    FROM per_user GROUP BY l_returnflag)
SELECT pub.l_returnflag, COALESCE(agg.sum_qty, 0.0) AS sum_qty
FROM pub LEFT JOIN agg USING (l_returnflag)
ORDER BY l_returnflag
"""


def _dp_sum_clip_per_contribution(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """DP sum per return flag with per-contribution clipping of quantity to
    [5, 30]; Linf cap non-binding (max rows per (supp, flag) < cap); zero
    noise."""
    li = _t(spark, sf_dir, "lineitem")
    query = (pds.QueryBuilder(li, "l_suppkey")
             .groupby("l_returnflag", max_groups_contributed=3,
                      max_contributions_per_group=1_000_000,
                      public_keys=["A", "N", "R"])
             .sum("l_quantity", min_value=5.0, max_value=30.0,
                  name="sum_qty_clipped")
             .build_query())
    return query.run_query(pds.Budget(1.0), noise_mode="zero")


_DP_SUM_CONTRIB_SQL = """
WITH pub(l_returnflag) AS (VALUES ('A'), ('N'), ('R')),
agg AS (
    SELECT l_returnflag,
           CAST(SUM(GREATEST(LEAST(l_quantity, 30.0), 5.0)) AS DOUBLE)
               AS sum_qty_clipped
    FROM lineitem GROUP BY l_returnflag)
SELECT pub.l_returnflag, COALESCE(agg.sum_qty_clipped, 0.0) AS sum_qty_clipped
FROM pub LEFT JOIN agg USING (l_returnflag)
ORDER BY l_returnflag
"""


def _dp_mean_public(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP mean of event value per event type, clip [0, 50], caps non-binding,
    zero noise. Rounded to 6dp for stable hashing."""
    ev = _t(spark, sf_dir, "events")
    pub = ["click", "error", "purchase", "signup", "view"]
    query = (pds.QueryBuilder(ev, "user_id")
             .groupby("event_type", max_groups_contributed=10,
                      max_contributions_per_group=1_000_000, public_keys=pub)
             .mean("value", min_value=0.0, max_value=50.0, name="mean_value")
             .build_query())
    out = query.run_query(pds.Budget(1.0, 1e-6), noise_mode="zero")
    return out.select(
        "event_type",
        F.round(F.col("mean_value"), 6).alias("mean_value"))


_DP_MEAN_SQL = """
WITH pub(event_type) AS (
    VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view')),
agg AS (
    SELECT event_type,
           25.0 + SUM(GREATEST(LEAST(value, 50.0), 0.0) - 25.0)
                  / GREATEST(1.0, COUNT(*)) AS mean_raw
    FROM events GROUP BY event_type)
SELECT pub.event_type,
       CAST(ROUND(COALESCE(agg.mean_raw, 25.0), 6) AS DOUBLE) AS mean_value
FROM pub LEFT JOIN agg USING (event_type)
ORDER BY event_type
"""


def _dp_variance_public(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP variance of clipped event value per event type, zero noise."""
    ev = _t(spark, sf_dir, "events")
    pub = ["click", "error", "purchase", "signup", "view"]
    query = (pds.QueryBuilder(ev, "user_id")
             .groupby("event_type", max_groups_contributed=10,
                      max_contributions_per_group=1_000_000, public_keys=pub)
             .variance("value", min_value=0.0, max_value=50.0,
                       name="var_value")
             .build_query())
    out = query.run_query(pds.Budget(1.0, 1e-6), noise_mode="zero")
    return out.select(
        "event_type",
        F.round(F.col("var_value"), 6).alias("var_value"))


_DP_VARIANCE_SQL = """
WITH pub(event_type) AS (
    VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view')),
agg AS (
    SELECT event_type,
           SUM(POW(GREATEST(LEAST(value, 50.0), 0.0) - 25.0, 2))
               / GREATEST(1.0, COUNT(*))
           - POW(SUM(GREATEST(LEAST(value, 50.0), 0.0) - 25.0)
                 / GREATEST(1.0, COUNT(*)), 2) AS var_raw
    FROM events GROUP BY event_type)
SELECT pub.event_type,
       CAST(ROUND(COALESCE(agg.var_raw, 0.0), 6) AS DOUBLE) AS var_value
FROM pub LEFT JOIN agg USING (event_type)
ORDER BY event_type
"""


def _dp_multi_sum_public(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two DP sums (quantity, extendedprice) over different columns sharing
    ONE contribution-bounding pass, plus count; per-partition clips binding,
    zero noise."""
    li = _t(spark, sf_dir, "lineitem")
    query = (pds.QueryBuilder(li, "l_suppkey")
             .groupby("l_returnflag", max_groups_contributed=3,
                      max_contributions_per_group=1_000_000,
                      public_keys=["A", "N", "R"])
             .count()
             .sum("l_quantity", min_sum_per_partition=0.0,
                  max_sum_per_partition=100.0, name="sum_qty")
             .sum("l_extendedprice", min_sum_per_partition=0.0,
                  max_sum_per_partition=50000.0, name="sum_price")
             .build_query())
    out = query.run_query(pds.Budget(1.0), noise_mode="zero")
    return out.select("l_returnflag", "count",
                      F.round("sum_qty", 4).alias("sum_qty"),
                      F.round("sum_price", 4).alias("sum_price"))


_DP_MULTI_SUM_SQL = """
WITH pub(l_returnflag) AS (VALUES ('A'), ('N'), ('R')),
per_user AS (
    SELECT l_suppkey, l_returnflag,
           COUNT(*) AS cnt,
           GREATEST(LEAST(SUM(l_quantity), 100.0), 0.0) AS qty,
           GREATEST(LEAST(SUM(l_extendedprice), 50000.0), 0.0) AS price
    FROM lineitem GROUP BY 1, 2),
agg AS (
    SELECT l_returnflag,
           CAST(SUM(cnt) AS DOUBLE) AS count,
           CAST(ROUND(SUM(qty), 4) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(price), 4) AS DOUBLE) AS sum_price
    FROM per_user GROUP BY 1)
SELECT pub.l_returnflag, COALESCE(agg.count, 0.0) AS count,
       COALESCE(agg.sum_qty, 0.0) AS sum_qty,
       COALESCE(agg.sum_price, 0.0) AS sum_price
FROM pub LEFT JOIN agg USING (l_returnflag)
ORDER BY 1
"""


def _dp_percentile_public(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP percentiles (50, 90) of clipped event value per event type via the
    256-bin histogram sketch; caps non-binding, zero noise."""
    ev = _t(spark, sf_dir, "events")
    pub = ["click", "error", "purchase", "signup", "view"]
    query = (pds.QueryBuilder(ev, "user_id")
             .groupby("event_type", max_groups_contributed=10,
                      max_contributions_per_group=1_000_000, public_keys=pub)
             .percentile("value", 50, min_value=0.0, max_value=50.0)
             .percentile("value", 90, min_value=0.0, max_value=50.0)
             .build_query())
    out = query.run_query(pds.Budget(1.0, 1e-6), noise_mode="zero")
    return out.select(
        "event_type",
        F.round(F.col("percentile_50"), 6).alias("percentile_50"),
        F.round(F.col("percentile_90"), 6).alias("percentile_90"))


def _gen_percentile_sql(nbins: int) -> str:
    """Histogram-crossing percentile mirror at a given bin resolution.
    Also the oracle for the quantile-tree path: a zero-noise tree descent
    over exact counts selects the same leaf and interpolates the same
    within-leaf rank as crossing the leaf-resolution (16^4-bin) histogram
    directly."""
    return f"""
WITH pub(event_type) AS (
    VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view')),
b AS (
  SELECT event_type,
         LEAST({nbins - 1},
               FLOOR(GREATEST(LEAST(value, 50.0), 0.0) / (50.0/{nbins})))
             AS bin,
         CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM events GROUP BY 1, 2),
c AS (
  SELECT event_type, bin, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS tot
  FROM b),
p AS (SELECT UNNEST([50.0, 90.0]) AS p),
sel AS (
  SELECT event_type, p.p AS p,
         MIN_BY(0.0 + (50.0/{nbins}) *
                (bin + ((p.p/100.0*tot) - (cum - cnt)) / cnt), bin) AS val
  FROM c, p
  WHERE cnt > 0 AND cum >= p.p/100.0*tot
  GROUP BY 1, 2)
SELECT pub.event_type,
       CAST(ROUND(COALESCE(MAX(CASE WHEN p = 50.0 THEN val END), 0.0), 6)
            AS DOUBLE) AS percentile_50,
       CAST(ROUND(COALESCE(MAX(CASE WHEN p = 90.0 THEN val END), 0.0), 6)
            AS DOUBLE) AS percentile_90
FROM pub LEFT JOIN sel USING (event_type)
GROUP BY 1 ORDER BY 1
"""


_DP_PERCENTILE_SQL = _gen_percentile_sql(256)


def _dp_percentile_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP percentiles via the QUANTILE TREE sketch (height-4 branching-16
    hierarchical histogram, reference combiners.py:629-719 semantics).
    Zero noise: the descent over exact counts selects the same leaf and
    within-leaf rank as crossing the 16^4-bin histogram directly, so the
    oracle is the leaf-resolution histogram mirror."""
    from pipelinedp_spark import quantile_tree as qt
    ev = _t(spark, sf_dir, "events")
    pub = ["click", "error", "purchase", "signup", "view"]
    acct = pds.NaiveBudgetAccountant(1.0, 1e-6)
    engine = pds.DPEngine(acct, noise_mode="zero")
    params = pds.AggregateParams(
        metrics=[pds.Metrics.PERCENTILE(50), pds.Metrics.PERCENTILE(90)],
        max_partitions_contributed=10,
        max_contributions_per_partition=1_000_000,
        min_value=0.0, max_value=50.0,
        percentile_algorithm="tree")
    res = engine.aggregate(
        ev, params, pds.DataFrameExtractors("user_id", "event_type",
                                            "value"),
        public_partitions=pub)
    acct.compute_budgets()
    return res.dataframe().select(
        "event_type",
        F.round(F.col("percentile_50"), 6).alias("percentile_50"),
        F.round(F.col("percentile_90"), 6).alias("percentile_90"))


def _dp_count_pld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP count driven end-to-end by the PLD budget accountant (privacy-
    loss-distribution composition; reference budget_accounting.py:479-747
    semantics). Zero noise makes the released values budget-independent,
    so the oracle is the plain bounded count — what the query checks is
    that the engine runs against PLD-assigned mechanism specs."""
    orders = _t(spark, sf_dir, "orders")
    acct = pds.PLDBudgetAccountant(1.0, 1e-6)
    engine = pds.DPEngine(acct, noise_mode="zero")
    # L0 cap = 5 is non-binding (5 priorities exist) so zero-noise output
    # is deterministic; the Linf count cap of 5 binds deterministically.
    params = pds.AggregateParams(
        metrics=[pds.Metrics.COUNT, pds.Metrics.PRIVACY_ID_COUNT],
        max_partitions_contributed=5,
        max_contributions_per_partition=5)
    res = engine.aggregate(
        orders, params,
        pds.DataFrameExtractors("o_custkey", "o_orderpriority", None),
        public_partitions=["1-URGENT", "2-HIGH", "3-MEDIUM",
                           "4-NOT SPECIFIED", "5-LOW"])
    acct.compute_budgets()
    return res.dataframe().select(
        "o_orderpriority", F.col("count"),
        F.col("privacy_id_count"))


_DP_COUNT_PLD_SQL = """
WITH pub(o_orderpriority) AS (
    VALUES ('1-URGENT'), ('2-HIGH'), ('3-MEDIUM'), ('4-NOT SPECIFIED'),
           ('5-LOW')),
per_user AS (
  SELECT o_custkey, o_orderpriority, LEAST(COUNT(*), 5) AS capped
  FROM orders GROUP BY 1, 2),
agg AS (
  SELECT o_orderpriority,
         CAST(SUM(capped) AS DOUBLE) AS count,
         CAST(COUNT(*) AS DOUBLE) AS privacy_id_count
  FROM per_user GROUP BY 1)
SELECT pub.o_orderpriority,
       COALESCE(count, 0.0) AS count,
       COALESCE(privacy_id_count, 0.0) AS privacy_id_count
FROM pub LEFT JOIN agg USING (o_orderpriority)
ORDER BY 1
"""


def _dp_vector_sum_public(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP vector sum of L2-clipped embeddings grouped by vec_id % 7, privacy
    unit vec_id % 57; caps non-binding, clip binding (max_norm=1), zero
    noise. Output exploded to (pk, pos, val) rows for stable hashing."""
    emb = _t(spark, sf_dir, "embeddings")
    df = emb.select((F.col("vec_id") % 57).alias("uid"),
                    (F.col("vec_id") % 7).alias("grp"),
                    F.col("embedding"))
    query = (pds.QueryBuilder(df, "uid")
             .groupby("grp", max_groups_contributed=7,
                      max_contributions_per_group=1000,
                      public_keys=list(range(7)))
             .vector_sum("embedding", max_norm=1.0, vector_size=64,
                         norm_kind=pds.NormKind.L2, name="vs")
             .build_query())
    out = query.run_query(pds.Budget(1.0, 1e-6), noise_mode="zero")
    return out.select("grp", F.posexplode("vs").alias("pos", "val")) \
        .select(F.col("grp").cast("long").alias("grp"),
                F.col("pos").cast("long").alias("pos"),
                F.round(F.col("val"), 6).alias("val"))


_DP_VECTOR_SUM_SQL = """
WITH v AS (
  SELECT vec_id % 7 AS grp, embedding::DOUBLE[] AS e FROM embeddings),
clipped AS (
  SELECT grp,
         CASE WHEN sqrt(list_dot_product(e, e)) > 1.0
              THEN list_transform(e, x -> x * (1.0 / sqrt(
                       list_dot_product(e, e))))
              ELSE e END AS e
  FROM v),
ex AS (
  SELECT grp, UNNEST(e) AS val,
         generate_subscripts(e, 1) - 1 AS pos
  FROM clipped),
agg AS (SELECT grp, pos, SUM(val) AS val FROM ex GROUP BY 1, 2)
SELECT CAST(grp AS BIGINT) AS grp, CAST(pos AS BIGINT) AS pos,
       CAST(ROUND(val, 6) AS DOUBLE) AS val
FROM agg ORDER BY grp, pos
"""


def _dp_vector_mean_public(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP vector MEAN (private embedding centroids per group): noisy
    L2-clipped vector sum divided by a separately released noisy
    contribution count — the `Metrics.VECTOR_MEAN` engine path (net-new
    beyond the reference's VECTOR_SUM). Caps non-binding, clip binding,
    zero noise; output exploded to (grp, pos, val) rows."""
    emb = _t(spark, sf_dir, "embeddings")
    df = emb.select((F.col("vec_id") % 57).alias("uid"),
                    (F.col("vec_id") % 7).alias("grp"),
                    F.col("embedding"))
    query = (pds.QueryBuilder(df, "uid")
             .groupby("grp", max_groups_contributed=7,
                      max_contributions_per_group=1000,
                      public_keys=list(range(7)))
             .vector_mean("embedding", max_norm=1.0, vector_size=64,
                          norm_kind=pds.NormKind.L2, name="vm")
             .build_query())
    out = query.run_query(pds.Budget(1.0, 1e-6), noise_mode="zero")
    return out.select("grp", F.posexplode("vm").alias("pos", "val")) \
        .select(F.col("grp").cast("long").alias("grp"),
                F.col("pos").cast("long").alias("pos"),
                F.round(F.col("val"), 6).alias("val"))


_DP_VECTOR_MEAN_SQL = """
WITH v AS (
  SELECT vec_id % 7 AS grp, embedding::DOUBLE[] AS e FROM embeddings),
clipped AS (
  SELECT grp,
         CASE WHEN sqrt(list_dot_product(e, e)) > 1.0
              THEN list_transform(e, x -> x * (1.0 / sqrt(
                       list_dot_product(e, e))))
              ELSE e END AS e
  FROM v),
n AS (SELECT grp, CAST(COUNT(*) AS DOUBLE) AS cnt FROM clipped
      GROUP BY 1),
ex AS (
  SELECT grp, UNNEST(e) AS val,
         generate_subscripts(e, 1) - 1 AS pos
  FROM clipped),
agg AS (SELECT grp, pos, SUM(val) AS val FROM ex GROUP BY 1, 2)
SELECT CAST(agg.grp AS BIGINT) AS grp, CAST(pos AS BIGINT) AS pos,
       CAST(ROUND(val / GREATEST(cnt, 1.0), 6) AS DOUBLE) AS val
FROM agg JOIN n USING (grp) ORDER BY grp, pos
"""


def _dp_partition_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Private partition selection via Laplace thresholding, zero noise:
    keep order dates whose distinct-customer count clears the threshold."""
    orders = _t(spark, sf_dir, "orders")
    df = orders.withColumn("o_month", F.date_format("o_orderdate", "yyyy-MM"))
    query = (pds.QueryBuilder(df, "o_custkey")
             .groupby("o_month", max_groups_contributed=25,
                      max_contributions_per_group=1_000_000,
                      partition_selection_strategy=pds.
                      PartitionSelectionStrategy.LAPLACE_THRESHOLDING)
             .privacy_id_count()
             .build_query())
    return query.run_query(pds.Budget(30.0, 1e-4), noise_mode="zero")


def _laplace_threshold_for(eps: float, delta: float, l0: int) -> float:
    # Same closed form the engine uses; the oracle inlines the number.
    _, threshold = dpc.laplace_thresholding(eps, delta, l0)
    return threshold


def _dp_partition_selection_sql() -> str:
    threshold = _laplace_threshold_for(15.0, 1e-4, 25)
    return f"""
WITH per_user AS (
    SELECT DISTINCT o_custkey, strftime(o_orderdate, '%Y-%m') AS o_month
    FROM orders),
agg AS (
    SELECT o_month, COUNT(*) AS n FROM per_user GROUP BY o_month)
SELECT o_month, CAST(n AS DOUBLE) AS privacy_id_count
FROM agg WHERE n >= {threshold}
ORDER BY o_month
"""


def _dp_select_partitions_tg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select_partitions with the TRUNCATED_GEOMETRIC mechanism, zero-noise
    mode: keep iff the optimal mechanism's keep-probability reaches 0.5."""
    orders = _t(spark, sf_dir, "orders")
    df = orders.withColumn("o_month", F.date_format("o_orderdate", "yyyy-MM"))
    acct = pds.NaiveBudgetAccountant(3.0, 1e-5)
    engine = pds.DPEngine(acct, noise_mode="zero")
    res = engine.select_partitions(
        df, pds.SelectPartitionsParams(max_partitions_contributed=25),
        pds.DataFrameExtractors("o_custkey", "o_month", None))
    acct.compute_budgets()
    return res.dataframe()


def _tg_cutoff(eps: float, delta: float, l0: int) -> int:
    import numpy as np
    probs = dpc.truncated_geometric_probabilities(eps, delta, l0)
    above = np.nonzero(probs >= 0.5)[0]
    return int(above[0]) if len(above) else len(probs)


def _dp_select_partitions_tg_sql() -> str:
    cutoff = _tg_cutoff(3.0, 1e-5, 25)
    return f"""
WITH per_user AS (
    SELECT DISTINCT o_custkey, strftime(o_orderdate, '%Y-%m') AS o_month
    FROM orders),
agg AS (SELECT o_month, COUNT(*) AS n FROM per_user GROUP BY 1)
SELECT o_month FROM agg WHERE n >= {cutoff} ORDER BY o_month
"""


def _dp_gaussian_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Private partition selection via GAUSSIAN thresholding (reference:
    pipeline_dp/partition_selection.py:51-90), zero noise: keep months
    whose distinct-customer count clears the Gaussian threshold (half the
    selection delta funds noise, half the threshold)."""
    orders = _t(spark, sf_dir, "orders")
    df = orders.withColumn("o_month", F.date_format("o_orderdate", "yyyy-MM"))
    query = (pds.QueryBuilder(df, "o_custkey")
             .groupby("o_month", max_groups_contributed=25,
                      max_contributions_per_group=1_000_000,
                      partition_selection_strategy=pds.
                      PartitionSelectionStrategy.GAUSSIAN_THRESHOLDING)
             .privacy_id_count()
             .build_query())
    return query.run_query(pds.Budget(30.0, 1e-4), noise_mode="zero")


def _dp_gaussian_threshold_sql() -> str:
    # Naive accountant: eps split across the 2 specs; the selection spec is
    # the only delta consumer and gets the full delta.
    _, threshold = dpc.gaussian_thresholding(15.0, 1e-4, 25)
    return f"""
WITH per_user AS (
    SELECT DISTINCT o_custkey, strftime(o_orderdate, '%Y-%m') AS o_month
    FROM orders),
agg AS (
    SELECT o_month, COUNT(*) AS n FROM per_user GROUP BY o_month)
SELECT o_month, CAST(n AS DOUBLE) AS privacy_id_count
FROM agg WHERE n >= {threshold!r}
ORDER BY o_month
"""


def _dp_select_weighted_gaussian(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """select_partitions via WEIGHTED Gaussian thresholding (reference:
    pipeline_dp/dp_engine.py:664-714, partition_selection.py:92-99), zero
    noise: each (customer, month) carries weight 1/sqrt(#months of the
    customer) so every customer has total L2 weight 1; keep months whose
    weight sum clears the threshold. L0 cap (25) is non-binding so the
    per-customer month counts are SQL-exact."""
    orders = _t(spark, sf_dir, "orders")
    df = orders.withColumn("o_month", F.date_format("o_orderdate", "yyyy-MM"))
    acct = pds.NaiveBudgetAccountant(3.0, 1e-5)
    engine = pds.DPEngine(acct, noise_mode="zero")
    res = engine.select_partitions(
        df,
        pds.SelectPartitionsParams(
            max_partitions_contributed=25,
            partition_selection_strategy=pds.PartitionSelectionStrategy.
            WEIGHTED_GAUSSIAN_THRESHOLDING),
        pds.DataFrameExtractors("o_custkey", "o_month", None))
    acct.compute_budgets()
    return res.dataframe()


def _dp_select_weighted_gaussian_sql() -> str:
    _, threshold = dpc.weighted_gaussian_thresholding(3.0, 1e-5, 25)
    return f"""
WITH per AS (
    SELECT DISTINCT o_custkey, strftime(o_orderdate, '%Y-%m') AS o_month
    FROM orders),
cnt AS (
    SELECT o_custkey, COUNT(*) AS np FROM per GROUP BY o_custkey),
w AS (
    SELECT per.o_month, SUM(1.0 / SQRT(cnt.np)) AS ws
    FROM per JOIN cnt USING (o_custkey)
    GROUP BY per.o_month)
SELECT o_month FROM w WHERE ws >= {threshold!r} ORDER BY o_month
"""


def _dp_post_agg_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation thresholding: the noised privacy-id count doubles as
    the partition-selection signal (no separate selection budget); zero
    noise keeps months whose exact count clears the threshold."""
    orders = _t(spark, sf_dir, "orders")
    df = orders.withColumn("o_month", F.date_format("o_orderdate", "yyyy-MM"))
    acct = pds.NaiveBudgetAccountant(20.0, 1e-4)
    engine = pds.DPEngine(acct, noise_mode="zero")
    params = pds.AggregateParams(
        metrics=[pds.Metrics.PRIVACY_ID_COUNT],
        max_partitions_contributed=25,
        max_contributions_per_partition=1,
        post_aggregation_thresholding=True)
    res = engine.aggregate(df, params,
                           pds.DataFrameExtractors("o_custkey", "o_month",
                                                   None))
    acct.compute_budgets()
    return res.dataframe()


def _post_agg_threshold_sql() -> str:
    # Mirror the engine: full budget on one Laplace-thresholding spec;
    # threshold from thresholding_from_std at delta/2.
    eps, delta, l0 = 20.0, 1e-4, 25
    sens = dpc.privacy_id_count_sensitivities(l0)
    std = dpc.noise_std(pds.NoiseKind.LAPLACE, eps, delta / 2, sens)
    threshold = dpc.thresholding_from_std(pds.NoiseKind.LAPLACE, std,
                                          delta / 2, l0)
    return f"""
WITH per_user AS (
    SELECT DISTINCT o_custkey, strftime(o_orderdate, '%Y-%m') AS o_month
    FROM orders),
agg AS (SELECT o_month, COUNT(*) AS n FROM per_user GROUP BY 1)
SELECT o_month, CAST(n AS DOUBLE) AS privacy_id_count
FROM agg WHERE n >= {threshold}
ORDER BY o_month
"""


def _dp_count_max_contributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1-style bounding (max_contributions caps a user's TOTAL rows across
    all partitions); cap set non-binding so the oracle is exact; zero
    noise."""
    orders = _t(spark, sf_dir, "orders")
    pub = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    acct = pds.NaiveBudgetAccountant(1.0, 1e-6)
    engine = pds.DPEngine(acct, noise_mode="zero")
    params = pds.AggregateParams(
        metrics=[pds.Metrics.COUNT, pds.Metrics.PRIVACY_ID_COUNT],
        max_contributions=100_000)
    res = engine.aggregate(df=orders, params=params,
                           extractors=pds.DataFrameExtractors(
                               "o_custkey", "o_orderpriority", None),
                           public_partitions=pub)
    acct.compute_budgets()
    return res.dataframe()


_DP_MAX_CONTRIB_SQL = """
WITH pub(o_orderpriority) AS (
    VALUES ('1-URGENT'), ('2-HIGH'), ('3-MEDIUM'), ('4-NOT SPECIFIED'),
           ('5-LOW')),
agg AS (
    SELECT o_orderpriority,
           CAST(COUNT(*) AS DOUBLE) AS count,
           CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS privacy_id_count
    FROM orders GROUP BY 1)
SELECT pub.o_orderpriority,
       COALESCE(agg.count, 0.0) AS count,
       COALESCE(agg.privacy_id_count, 0.0) AS privacy_id_count
FROM pub LEFT JOIN agg USING (o_orderpriority)
ORDER BY 1
"""


def _dp_count_no_cross_bounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """perform_cross_partition_contribution_bounding=False: L0 = 2 would be
    BINDING (customers span up to 5 priorities) but the L0 sampling step is
    skipped, so the zero-noise output is the exact Linf-capped count —
    deterministic precisely because cross-partition sampling is off. L0
    stays in the sensitivity, pinned by the output_noise_stddev column
    (= (l0*linf/eps)*sqrt(2) for Laplace)."""
    orders = _t(spark, sf_dir, "orders")
    pub = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    acct = pds.NaiveBudgetAccountant(1.0, 1e-6)
    engine = pds.DPEngine(acct, noise_mode="zero")
    params = pds.AggregateParams(
        metrics=[pds.Metrics.COUNT],
        max_partitions_contributed=2,
        max_contributions_per_partition=3,
        perform_cross_partition_contribution_bounding=False,
        output_noise_stddev=True)
    res = engine.aggregate(df=orders, params=params,
                           extractors=pds.DataFrameExtractors(
                               "o_custkey", "o_orderpriority", None),
                           public_partitions=pub)
    acct.compute_budgets()
    return res.dataframe()


_DP_NO_CROSS_BOUNDING_SQL = """
WITH pub(o_orderpriority) AS (
    VALUES ('1-URGENT'), ('2-HIGH'), ('3-MEDIUM'), ('4-NOT SPECIFIED'),
           ('5-LOW')),
per_user AS (
    SELECT o_custkey, o_orderpriority,
           LEAST(COUNT(*), 3) AS capped_cnt
    FROM orders GROUP BY o_custkey, o_orderpriority),
agg AS (
    SELECT o_orderpriority,
           CAST(SUM(capped_cnt) AS DOUBLE) AS count
    FROM per_user GROUP BY o_orderpriority)
SELECT pub.o_orderpriority,
       COALESCE(agg.count, 0.0) AS count,
       (6.0 / 1.0) * SQRT(2.0) AS count_noise_stddev
FROM pub LEFT JOIN agg USING (o_orderpriority)
ORDER BY o_orderpriority
"""


def _dp_count_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite (2-column) partition key with private Laplace-thresholding
    selection; zero noise."""
    orders = _t(spark, sf_dir, "orders")
    query = (pds.QueryBuilder(orders, "o_custkey")
             .groupby(["o_orderpriority", "o_orderstatus"],
                      max_groups_contributed=15,
                      max_contributions_per_group=1_000_000,
                      partition_selection_strategy=pds.
                      PartitionSelectionStrategy.LAPLACE_THRESHOLDING)
             .privacy_id_count()
             .build_query())
    return query.run_query(pds.Budget(30.0, 1e-4), noise_mode="zero")


def _dp_count_composite_key_sql() -> str:
    _, threshold = dpc.laplace_thresholding(15.0, 1e-4, 15)
    return f"""
WITH per_user AS (
    SELECT DISTINCT o_custkey, o_orderpriority, o_orderstatus FROM orders),
agg AS (
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM per_user GROUP BY 1, 2)
SELECT o_orderpriority, o_orderstatus, CAST(n AS DOUBLE) AS privacy_id_count
FROM agg WHERE n >= {threshold}
ORDER BY 1, 2
"""


def _dp_private_l0_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP choice of max_partitions_contributed via the exponential
    mechanism (`DPEngine.calculate_private_contribution_bounds`,
    reference pipeline_dp/private_contribution_bounds.py:27-195) in
    zero-noise mode, where the mechanism degenerates to the score
    argmax: score(k) = -(0.5 * P * laplace_std(k) + 0.5 *
    sum_bins max(min(bin_lower, B) - k, 0) * count) over candidates
    1..B, B = min(150, P); pid = user_id, pk = (event_type, day).
    The oracle replays the L0 histogram (3-significant-digit log
    binning), the candidate scores, and the argmax in SQL. Output:
    the chosen bound plus the inputs that determine it."""
    ev = _t(spark, sf_dir, "events")
    day_us = 86_400_000_000
    ev = ev.withColumn(
        "day", F.floor(F.col("ts") / F.lit(day_us)).cast("long"))
    acct = pds.NaiveBudgetAccountant(1.0, 1e-6)
    engine = pds.DPEngine(acct, noise_mode="zero")
    params = pds.CalculatePrivateContributionBoundsParams(
        aggregation_noise_kind=pds.NoiseKind.LAPLACE,
        aggregation_eps=1.0, aggregation_delta=0.0,
        calculation_eps=1.0,
        max_partitions_contributed_upper_bound=150)
    bounds = engine.calculate_private_contribution_bounds(
        ev, params, pds.DataFrameExtractors("user_id",
                                            ["event_type", "day"]))
    n_partitions = ev.select("event_type", "day").distinct().count()
    return spark.sql(
        f"SELECT CAST({bounds.max_partitions_contributed} AS BIGINT)"
        f"       AS max_partitions_contributed,"
        f"       CAST({n_partitions} AS BIGINT) AS n_partitions")


_DP_PRIVATE_L0_BOUNDS_SQL = """
WITH ev AS (
    SELECT user_id, event_type,
           CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
    FROM events),
l0 AS (
    SELECT user_id,
           COUNT(DISTINCT event_type || '|' || CAST(day AS VARCHAR))
               AS n
    FROM ev GROUP BY user_id),
binned AS (
    SELECT CAST(FLOOR(n / POW(10, GREATEST(FLOOR(LOG10(n)) - 2, 0)))
                * POW(10, GREATEST(FLOOR(LOG10(n)) - 2, 0)) AS BIGINT)
               AS lower,
           COUNT(*) AS cnt
    FROM l0 GROUP BY 1),
np AS (
    SELECT COUNT(DISTINCT event_type || '|' || CAST(day AS VARCHAR))
               AS p
    FROM ev),
cands AS (
    SELECT UNNEST(range(1, LEAST(150, p) + 1)) AS k FROM np),
scores AS (
    SELECT c.k,
           -(0.5 * np.p * sqrt(2) * c.k / 1.0
             + 0.5 * (SELECT COALESCE(SUM(GREATEST(
                          LEAST(b.lower, LEAST(150, np.p)) - c.k, 0)
                          * b.cnt), 0)
                      FROM binned b)) AS score
    FROM cands c, np)
SELECT (SELECT k FROM scores ORDER BY score DESC, k ASC LIMIT 1)
           AS max_partitions_contributed,
       (SELECT p FROM np) AS n_partitions
"""


def _dp_windowed_count_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP count of events per (event_type, tumbling 1-day event-time
    window) with private Laplace-thresholding partition selection — the
    batch mirror of the Structured Streaming DP aggregation (same window
    semantics, same bounding). Linf cap = 5 binding; L0 = 100 non-binding;
    zero noise. `ts` is micros-since-epoch (normalized by `_t`)."""
    ev = _t(spark, sf_dir, "events")
    day_us = 86_400_000_000
    ev = ev.withColumn(
        "day", F.floor(F.col("ts") / F.lit(day_us)).cast("long"))
    query = (pds.QueryBuilder(ev, "user_id")
             .groupby(["event_type", "day"], max_groups_contributed=100,
                      max_contributions_per_group=5,
                      partition_selection_strategy=pds.
                      PartitionSelectionStrategy.LAPLACE_THRESHOLDING)
             .count()
             .build_query())
    return query.run_query(pds.Budget(60.0, 1e-4), noise_mode="zero")


def _dp_windowed_count_events_sql() -> str:
    threshold = _laplace_threshold_for(30.0, 1e-4, 100)
    return f"""
WITH ev AS (
    SELECT user_id, event_type,
           CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
    FROM events),
per_user AS (
    SELECT user_id, event_type, day, LEAST(COUNT(*), 5) AS capped
    FROM ev GROUP BY 1, 2, 3),
agg AS (
    SELECT event_type, day,
           CAST(SUM(capped) AS DOUBLE) AS count,
           COUNT(*) AS n_users
    FROM per_user GROUP BY 1, 2)
SELECT event_type, day, count
FROM agg WHERE n_users >= {threshold}
ORDER BY 1, 2
"""


def _dp_session_count_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mirror of streaming.dp_streaming_session_count: DP count of
    closed user sessions (30-min gap) per tumbling day, sessions
    attributed to the day containing their END (last event + gap,
    exclusive boundary — the chained-window assignment Structured
    Streaming implements), per-user cap 3 sessions/day, Laplace
    window selection on the user count, zero noise. Same threshold
    formula as the streaming operator (eps/2 pid budget, delta/2 split
    half noise / half threshold)."""
    from pipelinedp_spark.operators.sessions import sessionize
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    gap_us = 1800 * 10**6
    day_us = 86_400_000_000
    s = sessionize(ev, "ts", "user_id", gap_us)
    sess = (s.groupBy("user_id", "session_id")
            .agg((F.max("ts") + F.lit(gap_us)).alias("end_us")))
    sess = sess.withColumn(
        "day", F.floor((F.col("end_us") - 1) / F.lit(day_us)).cast("long"))
    per_user = (sess.groupBy("user_id", "day")
                .agg(F.least(F.count(F.lit(1)), F.lit(3)).alias("capped")))
    agg = per_user.groupBy("day").agg(
        F.sum("capped").cast("double").alias("session_count"),
        F.count(F.lit(1)).alias("__n__"))
    threshold = _streaming_pid_threshold(60.0, 1e-4, 100)
    return (agg.filter(F.col("__n__") >= threshold)
            .select("day", "session_count",
                    F.col("__n__").cast("double").alias("privacy_id_count")))


def _streaming_pid_threshold(eps: float, delta: float, l0: int) -> float:
    # Exactly streaming._pid_threshold_filter's formula at (eps/2, delta/2):
    # noise std at (eps/2, delta/4), threshold delta/4.
    std = dpc.noise_std(pds.NoiseKind.LAPLACE, eps / 2, delta / 4,
                        dpc.privacy_id_count_sensitivities(l0))
    return dpc.thresholding_from_std(pds.NoiseKind.LAPLACE, std, delta / 4,
                                     l0)


def _dp_session_count_events_sql() -> str:
    threshold = _streaming_pid_threshold(60.0, 1e-4, 100)
    return f"""
WITH x AS (SELECT user_id, epoch_us(ts) AS t FROM events),
d AS (
  SELECT user_id, t,
         CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                   > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM x),
s AS (
  SELECT user_id, t,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM d),
sess AS (
  SELECT user_id, sid, MAX(t) + 1800000000 AS end_us
  FROM s GROUP BY user_id, sid),
sd AS (
  SELECT user_id,
         CAST(FLOOR((end_us - 1) / 86400000000) AS BIGINT) AS day
  FROM sess),
pu AS (
  SELECT user_id, day, LEAST(COUNT(*), 3) AS capped
  FROM sd GROUP BY user_id, day),
agg AS (
  SELECT day, CAST(SUM(capped) AS DOUBLE) AS session_count,
         COUNT(*) AS n
  FROM pu GROUP BY day)
SELECT day, session_count, CAST(n AS DOUBLE) AS privacy_id_count
FROM agg WHERE n >= {threshold!r}
ORDER BY day
"""


def _doc_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep over documents: quality + language
    filter -> exact-dup removal (keep lowest doc_id per fingerprint,
    carry dup_count) -> token-budget cut via a distributed two-pass
    prefix sum (`operators.running.running_sum`), keeping docs in doc_id
    order while the cumulative BPE-token count stays within budget."""
    from pipelinedp_spark.functions import text as TX
    from pipelinedp_spark.operators.running import running_sum
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    scored = docs.select(
        "doc_id",
        TX.bpe_token_count(t).cast("long").alias("n_bpe_tokens"),
        TX.quality_score(t).alias("quality"),
        TX.language_id(t).alias("lang_pred"),
        TX.rolling_fingerprint(t).alias("fingerprint"))
    filtered = scored.filter((F.col("quality") >= 0.3)
                             & (F.col("lang_pred") == "en"))
    # Keep-lowest-per-fingerprint as ONE hash aggregation (min_by struct +
    # count): map-side combinable, no window sort.
    kept = (filtered.groupBy("fingerprint")
            .agg(F.min_by(F.struct("doc_id", "n_bpe_tokens", "quality"),
                          F.col("doc_id")).alias("_s"),
                 F.count(F.lit(1)).alias("dup_count"))
            .select("_s.*", "dup_count"))
    budgeted = running_sum(kept, "doc_id", "n_bpe_tokens",
                           out_col="cum_tokens")
    return (budgeted.filter(F.col("cum_tokens") <= 5000)
            .select("doc_id", "n_bpe_tokens", "quality", "dup_count",
                    "cum_tokens"))


_DOC_PREP_PIPELINE_SQL = """
WITH tok AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
scored AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
             AS n_bpe_tokens,
         ROUND((CASE WHEN len(t) < 50 THEN len(t) / 50.0
                     WHEN len(t) > 10000 THEN 10000.0 / len(t)
                     ELSE 1.0 END)
               * (len(list_distinct(t)) / GREATEST(len(t), 1)), 6)
             AS quality,
         CASE
           WHEN len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                ['the','a','and','of','to','in','is','it'])) >=
                GREATEST(
                  len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                      ['the','a','and','of','to','in','is','it'])),
                  len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                      ['el','la','de','que','y','los','un','por'])),
                  len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                      ['der','die','und','das','ist','ein','nicht'])),
                  len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                      ['le','la','et','les','des','un','est','pas'])), 1)
           THEN 'en' ELSE 'other'
         END AS lang_pred,
         md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))
             AS fingerprint
  FROM tok),
filtered AS (
  SELECT * FROM scored WHERE quality >= 0.3 AND lang_pred = 'en'),
kept AS (
  SELECT doc_id, n_bpe_tokens, quality,
         COUNT(*) OVER (PARTITION BY fingerprint) AS dup_count,
         ROW_NUMBER() OVER (PARTITION BY fingerprint
                            ORDER BY doc_id) AS rn
  FROM filtered),
budgeted AS (
  SELECT doc_id, n_bpe_tokens, quality, dup_count,
         SUM(n_bpe_tokens) OVER (ORDER BY doc_id) AS cum_tokens
  FROM kept WHERE rn = 1)
SELECT doc_id, n_bpe_tokens, quality, CAST(dup_count AS BIGINT) AS dup_count,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM budgeted WHERE cum_tokens <= 5000
"""


def _asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the user's most recent prior-or-equal
    click (as-of backward join per user). `ts` is micros-since-epoch longs
    on the Spark side; the oracle compares via epoch_us."""
    from pipelinedp_spark.operators.asof import asof_join
    ev = _t(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts", "value"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", "value"))
    out = asof_join(purchases, clicks, time_col="ts", by="user_id")
    return out.select(
        "event_id", "user_id",
        F.col("ts").alias("ts_us"),
        F.col("ts_right").alias("ts_right_us"),
        F.col("value_right").alias("last_click_value"))


_ASOF_JOIN_EVENTS_SQL = """
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS ts_us,
       epoch_us(c.ts) AS ts_right_us,
       c.value AS last_click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def _asof_join_tolerance_events(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """As-of backward join with a 6-hour tolerance (pandas merge_asof
    semantics): clicks older than the tolerance null out instead of
    matching — the staleness guard real feature-lookup pipelines need.
    Same plan as asof_join_events plus one column projection."""
    from pipelinedp_spark.operators.asof import asof_join
    tol_us = 6 * 3600 * 10**6
    ev = _t(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts", "value"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", "value"))
    out = asof_join(purchases, clicks, time_col="ts", by="user_id",
                    tolerance=tol_us)
    return out.select(
        "event_id", "user_id",
        F.col("ts").alias("ts_us"),
        F.col("ts_right").alias("ts_right_us"),
        F.col("value_right").alias("last_click_value"))


_ASOF_TOLERANCE_SQL = """
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS ts_us,
       CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 21600000000
            THEN epoch_us(c.ts) END AS ts_right_us,
       CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 21600000000
            THEN c.value END AS last_click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def _multimodal_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container path: deterministic MP4/ISO-BMFF boxes per
    doc (hand-packed ftyp + moov/mvhd/trak, alternating mvhd version
    0/1) -> opaque binary column -> real box-walk parse
    (operators.multimodal.parse_mp4_metadata). The oracle recomputes
    duration_us straight from the generating arithmetic, so a box-size,
    version-offset, or timescale bug in the walker breaks the match."""
    import struct as st
    import pandas as pd
    from pipelinedp_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def box(btype, payload):
        return st.pack(">I", 8 + len(payload)) + btype + payload

    def gen(it):
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                timescale = 1000 + (d % 7) * 100
                duration = (d % 1000 + 1) * timescale
                n_tracks = 1 + d % 3
                ftyp = box(b"ftyp", b"isom" + st.pack(">I", 0))
                if d % 2 == 0:
                    mvhd = box(b"mvhd", bytes([0, 0, 0, 0]) + bytes(8)
                               + st.pack(">II", timescale, duration)
                               + bytes(80))
                else:
                    mvhd = box(b"mvhd", bytes([1, 0, 0, 0]) + bytes(16)
                               + st.pack(">I", timescale)
                               + st.pack(">Q", duration) + bytes(80))
                traks = b"".join(box(b"trak", bytes(16))
                                 for _ in range(n_tracks))
                payloads.append(ftyp + box(b"moov", mvhd + traks))
            yield pd.DataFrame({"doc_id": ids, "video": payloads})

    vids = docs.mapInPandas(gen, "doc_id long, video binary")
    out = MM.extract_video_metadata(vids, "video")
    return out.select("doc_id", F.col("meta.brand").alias("brand"),
                      F.col("meta.duration_us").alias("duration_us"),
                      F.col("meta.n_tracks").alias("n_tracks"))


_MULTIMODAL_MP4_SQL = """
SELECT doc_id,
       'isom' AS brand,
       CAST((doc_id % 1000 + 1) * (1000 + (doc_id % 7) * 100)
            * 1000000 // (1000 + (doc_id % 7) * 100) AS BIGINT)
           AS duration_us,
       CAST(1 + doc_id % 3 AS INT) AS n_tracks
FROM documents ORDER BY doc_id
"""


_RJ_BASE_US = 1_704_067_200 * 10**6      # 2024-01-01 UTC in micros
_RJ_STEP_US = 36 * 3600 * 10**6          # interval spacing: 36h
_RJ_LEN_US = 90 * 3600 * 10**6           # interval length: 90h (overlap)


def _range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked range join: each event matched to every (overlapping)
    90-hour maintenance window derived from the nation table. The chunk
    width equals the window spacing, so the nested-loop non-equi join
    becomes a hash equi-join on the chunk id."""
    from pipelinedp_spark.operators.ranges import range_join
    ev = _t(spark, sf_dir, "events").select("event_id", "ts")
    iv = (_t(spark, sf_dir, "nation")
          .select("n_nationkey")
          .withColumn("w_start", (F.lit(_RJ_BASE_US)
                                  + F.col("n_nationkey") * _RJ_STEP_US)
                      .cast("long"))
          .withColumn("w_end", (F.col("w_start") + _RJ_LEN_US)
                      .cast("long")))
    out = range_join(ev, "ts", iv, "w_start", "w_end",
                     chunk=_RJ_STEP_US)
    return out.select("event_id", "n_nationkey")


_RANGE_JOIN_EVENTS_SQL = f"""
SELECT e.event_id, n.n_nationkey
FROM events e
JOIN nation n
  ON epoch_us(e.ts) BETWEEN {_RJ_BASE_US} + n.n_nationkey * {_RJ_STEP_US}
                        AND {_RJ_BASE_US} + n.n_nationkey * {_RJ_STEP_US}
                            + {_RJ_LEN_US}
"""


def _range_join_keyed_events(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Keyed range join: each event matched only to ITS nation's
    maintenance window (equality on the derived key composes into the
    chunked equi-join's hash key, so selectivity improves — no post-join
    filter needed for the key)."""
    from pipelinedp_spark.operators.ranges import range_join
    ev = (_t(spark, sf_dir, "events")
          .select("event_id", "ts",
                  (F.col("event_id") % 25).alias("k")))
    iv = (_t(spark, sf_dir, "nation")
          .select(F.col("n_nationkey").alias("k"), "n_nationkey")
          .withColumn("w_start", (F.lit(_RJ_BASE_US)
                                  + F.col("n_nationkey") * _RJ_STEP_US)
                      .cast("long"))
          .withColumn("w_end", (F.col("w_start") + _RJ_LEN_US)
                      .cast("long")))
    out = range_join(ev, "ts", iv, "w_start", "w_end",
                     chunk=_RJ_STEP_US, key="k")
    return out.select("event_id", "n_nationkey")


_RANGE_JOIN_KEYED_SQL = f"""
SELECT e.event_id, n.n_nationkey
FROM events e
JOIN nation n
  ON e.event_id % 25 = n.n_nationkey
 AND epoch_us(e.ts) BETWEEN {_RJ_BASE_US} + n.n_nationkey * {_RJ_STEP_US}
                        AND {_RJ_BASE_US} + n.n_nationkey * {_RJ_STEP_US}
                            + {_RJ_LEN_US}
"""


def _dedup_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup: treating docs with doc_id % 3 == 0
    as the already-ingested reference corpus, keep only NEW docs whose
    normalized-text fingerprint is absent from it. Reference side
    reduces to distinct fingerprints before the anti-join."""
    from pipelinedp_spark.operators.dedup import cross_corpus_dedup
    docs = _t(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    new = docs.filter(F.col("doc_id") % 3 != 0)
    return cross_corpus_dedup(new, ref).select("doc_id", "fingerprint")


_DEDUP_CROSS_CORPUS_SQL = """
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))
             AS fingerprint
  FROM documents)
SELECT doc_id, fingerprint
FROM fp
WHERE doc_id % 3 <> 0
  AND fingerprint NOT IN (SELECT fingerprint FROM fp WHERE doc_id % 3 = 0)
ORDER BY doc_id
"""


def _stream_exact_store_mirror(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Batch mirror of `streaming.streaming_exact_dedup_store` with
    exact two-trigger-PLUS-REPLAY semantics, driving the REAL
    foreachBatch body (`ingest_exact_batch_idempotent`): the store
    starts EMPTY; trigger 0 ingests docs with doc_id % 3 == 0
    (within-batch first occurrence per fingerprint, anti-join the
    empty store, fingerprints appended); trigger 1 ingests the rest,
    deduped against trigger 0's accumulated store; then trigger 1
    REPLAYS (at-least-once delivery) and must be fully suppressed by
    the ingest-log guard — a leak would append its sink output twice
    and break the oracle equality. Output = survivors per trigger
    tagged by batch — proving the cross-batch store contract AND
    exactly-once, not just final state."""
    from pipelinedp_spark.operators import dedup
    from pipelinedp_spark.streaming.dp_streaming import (
        ingest_exact_batch_idempotent)
    docs = _t(spark, sf_dir, "documents")
    dedup.build_exact_store(docs.limit(0), "stream_exact_r9",
                            num_buckets=4)
    outs: list = []
    batches = [docs.filter(F.col("doc_id") % 3 == 0),
               docs.filter(F.col("doc_id") % 3 != 0)]
    for b, batch in enumerate(batches):
        applied = ingest_exact_batch_idempotent(
            batch, "stream_exact_r9", b,
            sink=lambda surv, b=b: outs.append(surv.select(
                F.lit(b).cast("long").alias("batch"), "doc_id",
                "fingerprint")))
        if not applied:
            raise AssertionError("fresh batch wrongly skipped")
    replayed = ingest_exact_batch_idempotent(
        batches[1], "stream_exact_r9", 1,
        sink=lambda surv: outs.append(surv))
    if replayed or len(outs) != 2:
        raise AssertionError("exact-store ingest-log guard broke")
    result = outs[0].unionByName(outs[1]).localCheckpoint()
    for t in ("stream_exact_r9_fps", "stream_exact_r9_meta",
              "stream_exact_r9_ingest_log"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return result


_STREAM_EXACT_STORE_MIRROR_SQL = """
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))
             AS fingerprint
  FROM documents),
b0 AS (
  SELECT fingerprint, MIN(doc_id) AS doc_id
  FROM fp WHERE doc_id % 3 = 0 GROUP BY fingerprint),
b1 AS (
  SELECT fingerprint, MIN(doc_id) AS doc_id
  FROM fp WHERE doc_id % 3 <> 0 GROUP BY fingerprint)
SELECT CAST(0 AS BIGINT) AS batch, doc_id, fingerprint FROM b0
UNION ALL
SELECT CAST(1 AS BIGINT) AS batch, doc_id, fingerprint
FROM b1 WHERE fingerprint NOT IN (SELECT fingerprint FROM b0)
"""


def _stream_near_dup_store_mirror(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Batch mirror of `streaming.streaming_near_dup_store` with exact
    two-trigger semantics (store starts EMPTY; trigger 0 = docs with
    doc_id % 3 == 0, trigger 1 = the rest): within each trigger,
    MinHash+LSH near-dups (k=3, Jaccard >= 0.7) lose to the smaller
    id; survivors anti-match the accumulated store and append their
    fingerprints. Output = surviving (batch, doc_id). The oracle
    replays bands, both within-trigger pair sets, and the cross-trigger
    store match in SQL. Drives the REAL foreachBatch body
    (`ingest_near_dup_batch_idempotent`), then REPLAYS trigger 1 — the
    ingest-log guard must suppress it or the sink doubles and the
    oracle equality breaks."""
    from pipelinedp_spark.operators import dedup
    from pipelinedp_spark.streaming.dp_streaming import (
        ingest_near_dup_batch_idempotent)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dedup.build_minhash_store(docs.limit(0), "stream_nd_r9",
                              num_buckets=4)
    outs: list = []
    batches = [docs.filter(F.col("doc_id") % 3 == 0),
               docs.filter(F.col("doc_id") % 3 != 0)]
    for b, batch in enumerate(batches):
        applied = ingest_near_dup_batch_idempotent(
            batch, "stream_nd_r9", b, jaccard_threshold=0.7,
            sink=lambda surv, b=b: outs.append(surv.select(
                F.lit(b).cast("long").alias("batch"), "doc_id")))
        if not applied:
            raise AssertionError("fresh batch wrongly skipped")
    replayed = ingest_near_dup_batch_idempotent(
        batches[1], "stream_nd_r9", 1, jaccard_threshold=0.7,
        sink=lambda surv: outs.append(surv))
    if replayed or len(outs) != 2:
        raise AssertionError("near-dup-store ingest-log guard broke")
    result = outs[0].unionByName(outs[1]).localCheckpoint()
    for t in ("stream_nd_r9_bands", "stream_nd_r9_shingles",
              "stream_nd_r9_meta", "stream_nd_r9_ingest_log"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return result


_STREAM_ND_STORE_MIRROR_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                       for i in range(1, len(t) - 1)])
                   ELSE [array_to_string(t, ' ')] END AS shingles
       FROM tok),
hm AS (
  SELECT doc_id, shingles,
         [('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647
          for s in shingles] AS hs
  FROM sh),
sig AS (
  SELECT doc_id, shingles,
         [list_min([(((1103515245 * (i + 1) + 12345) % 2147483647) * h
                     + ((2654435761 * i + 97) % 2147483647)) % 2147483647
                    for h in hs])
          for i in range(0, 8)] AS sig
  FROM hm),
bands AS (
  SELECT doc_id,
         UNNEST(range(0, 2)) AS band_idx,
         UNNEST([md5(CAST(sig[1] AS VARCHAR) || '|' || CAST(sig[2] AS VARCHAR)
                     || '|' || CAST(sig[3] AS VARCHAR) || '|'
                     || CAST(sig[4] AS VARCHAR)),
                 md5(CAST(sig[5] AS VARCHAR) || '|' || CAST(sig[6] AS VARCHAR)
                     || '|' || CAST(sig[7] AS VARCHAR) || '|'
                     || CAST(sig[8] AS VARCHAR))])
             AS band_hash
  FROM sig),
cand_pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id),
jac AS (
  SELECT p.id_a, p.id_b,
         ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
               (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles))), 6)
             AS j
  FROM cand_pairs p
  JOIN sh sa ON sa.doc_id = p.id_a
  JOIN sh sb ON sb.doc_id = p.id_b),
losers0 AS (
  SELECT DISTINCT id_b FROM jac
  WHERE j >= 0.7 AND id_a % 3 = 0 AND id_b % 3 = 0),
surv0 AS (
  SELECT doc_id FROM documents
  WHERE doc_id % 3 = 0 AND doc_id NOT IN (SELECT id_b FROM losers0)),
losers1 AS (
  SELECT DISTINCT id_b FROM jac
  WHERE j >= 0.7 AND id_a % 3 <> 0 AND id_b % 3 <> 0),
within1 AS (
  SELECT doc_id FROM documents
  WHERE doc_id % 3 <> 0 AND doc_id NOT IN (SELECT id_b FROM losers1)),
crossdrop AS (
  SELECT DISTINCT w.doc_id
  FROM within1 w
  JOIN jac ON (jac.id_a = w.doc_id AND jac.id_b IN
               (SELECT doc_id FROM surv0))
           OR (jac.id_b = w.doc_id AND jac.id_a IN
               (SELECT doc_id FROM surv0))
  WHERE jac.j >= 0.7)
SELECT CAST(0 AS BIGINT) AS batch, doc_id FROM surv0
UNION ALL
SELECT CAST(1 AS BIGINT) AS batch, doc_id FROM within1
WHERE doc_id NOT IN (SELECT doc_id FROM crossdrop)
"""


def _dedup_exact_incremental(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Exact dedup against a PERSISTED fingerprint store
    (`dedup.build_exact_store` + `incremental_exact_dedup`): docs with
    doc_id % 5 == 0 are indexed once as a bucketed distinct-fingerprint
    table; the remaining docs anti-join it with zero store-side
    shuffle. Residue 5 distinguishes the result from
    `dedup_cross_corpus`'s residue-3 split; store dropped after
    checkpointing."""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 5 == 0)
    new = docs.filter(F.col("doc_id") % 5 != 0)
    dedup.build_exact_store(ref, "exact_store_r9")
    out = (dedup.incremental_exact_dedup(new, "exact_store_r9")
           .select("doc_id", "fingerprint").localCheckpoint())
    for t in ("exact_store_r9_fps", "exact_store_r9_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


_DEDUP_EXACT_INCR_SQL = """
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))
             AS fingerprint
  FROM documents)
SELECT doc_id, fingerprint
FROM fp
WHERE doc_id % 5 <> 0
  AND fingerprint NOT IN (SELECT fingerprint FROM fp WHERE doc_id % 5 = 0)
ORDER BY doc_id
"""


def _sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user (1-hour gap): event count and duration
    per session — the batch mirror of the streaming session windows."""
    from pipelinedp_spark.operators.sessions import session_stats
    ev = (_t(spark, sf_dir, "events")
          .select("user_id", F.col("ts").alias("t_us")))
    gap_us = 3600 * 10**6
    out = session_stats(ev, "t_us", "user_id", gap_us)
    return out.select("user_id", "session_id", "n_events",
                      F.col("dur").alias("dur_us"))


_SESSIONIZE_EVENTS_SQL = """
WITH x AS (SELECT user_id, epoch_us(ts) AS t FROM events),
d AS (
  SELECT user_id, t,
         CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                   > 3600000000 THEN 1 ELSE 0 END AS brk
  FROM x),
s AS (
  SELECT user_id, t,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM d)
SELECT user_id, CAST(sid AS BIGINT) AS session_id, COUNT(*) AS n_events,
       (MAX(t) - MIN(t)) AS dur_us
FROM s GROUP BY user_id, sid
"""


def _token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary stats: top-50 tokens by document frequency
    (ties broken by token). Explode distinct tokens -> one map-side
    combinable groupBy -> partial+final window top-k."""
    from pyspark.sql import Window
    from pipelinedp_spark.functions import text as TX
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.array_distinct(TX.tokens(F.col("text"))))
        .alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    w = Window.orderBy(F.col("doc_freq").desc(), F.col("token").asc())
    return (counts.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 50))


_TOKEN_TOPK_SQL = """
WITH tok AS (
  SELECT unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents),
counts AS (
  SELECT token, COUNT(*) AS doc_freq FROM tok GROUP BY token),
ranked AS (
  SELECT token, doc_freq,
         ROW_NUMBER() OVER (ORDER BY doc_freq DESC, token ASC) AS rank
  FROM counts)
SELECT token, doc_freq, rank FROM ranked WHERE rank <= 50
"""


def _doc_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split of documents keyed on
    md5(salt:doc_id) — reproducible across runs and engines, no RNG."""
    from pipelinedp_spark.functions.sampling import deterministic_split
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return deterministic_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})


_DOC_SPLIT_SQL = """
WITH u AS (
  SELECT doc_id,
         ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))
             ::BIGINT / 1152921504606846976.0 AS v
  FROM documents)
SELECT doc_id,
       CASE WHEN v < 0.8 THEN 'train'
            WHEN v < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM u
"""


def _doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum corpus mixing: keep all docs of rare
    languages, 25% of 'en' (the boilerplate-heavy majority). Pure
    md5-hash decision per row — no RNG, no shuffle, engine-portable."""
    from pipelinedp_spark.functions.sampling import stratified_sample
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(docs, "doc_id", "lang",
                             {"en": 0.25}, default_fraction=1.0)


_DOC_STRATIFIED_SQL = """
WITH u AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('strata:' || CAST(doc_id AS VARCHAR)), 1, 15))
             ::BIGINT / 1152921504606846976.0 AS v
  FROM documents)
SELECT doc_id, lang
FROM u
WHERE v < CASE WHEN lang = 'en' THEN 0.25 ELSE 1.0 END
"""


def _multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL end-to-end binary image path: a deterministic grayscale pixel
    pattern per doc -> real 24-bit BMP encoding (struct, bottom-up rows,
    4-byte row padding) -> opaque binary column -> real decode
    (operators.multimodal.decode_bmp) -> exact integer luma stats. The
    oracle recomputes the stats straight from the generating formula, so a
    header/padding/row-order bug in EITHER codec breaks the match. Widths
    5..8 exercise all four row-padding residues."""
    import numpy as np
    import pandas as pd
    from pipelinedp_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                h, w = 4 + d % 3, 5 + d % 4
                i, j = np.meshgrid(np.arange(h), np.arange(w),
                                   indexing="ij")
                px = ((d + 7 * i + 13 * j) % 256).astype(np.uint8)
                payloads.append(MM.encode_bmp(px))
            yield pd.DataFrame({"doc_id": ids, "image": payloads})

    imgs = docs.mapInPandas(gen, "doc_id long, image binary")
    return MM.image_pixel_stats(imgs, "image").select(
        "doc_id", "px_width", "px_height", "px_sum", "px_min", "px_max")


_MULTIMODAL_BMP_SQL = """
WITH px AS (
  SELECT d.doc_id, (d.doc_id + 7 * gi.i + 13 * gj.j) % 256 AS v
  FROM documents d,
       generate_series(0, 5) gi(i),
       generate_series(0, 7) gj(j)
  WHERE gi.i < 4 + d.doc_id % 3 AND gj.j < 5 + d.doc_id % 4)
SELECT doc_id,
       CAST(5 + doc_id % 4 AS INT) AS px_width,
       CAST(4 + doc_id % 3 AS INT) AS px_height,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(MIN(v) AS INT) AS px_min,
       CAST(MAX(v) AS INT) AS px_max
FROM px GROUP BY doc_id
"""


def _multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL end-to-end binary audio path: deterministic int16 PCM samples
    per doc -> real RIFF/WAVE encoding -> opaque binary column -> real
    decode (operators.multimodal.decode_wav) -> exact integer amplitude
    stats + integer-microsecond duration, all recomputed by the oracle from
    the generating formula. Varying sample counts exercise the data-chunk
    size field; varying rates exercise the fmt chunk."""
    import numpy as np
    import pandas as pd
    from pipelinedp_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                n = 64 + d % 64
                rate = 8000 * (1 + d % 3)
                samples = ((d * 31 + np.arange(n) * 17) % 4096
                           - 2048).astype(np.int16)
                payloads.append(MM.encode_wav(samples, int(rate)))
            yield pd.DataFrame({"doc_id": ids, "audio": payloads})

    wavs = docs.mapInPandas(gen, "doc_id long, audio binary")
    return MM.audio_pcm_stats(wavs, "audio").select(
        "doc_id", "sample_rate", "n_samples", "amp_sum", "amp_min",
        "amp_max", "duration_us")


_MULTIMODAL_WAV_SQL = """
WITH s AS (
  SELECT d.doc_id, (d.doc_id * 31 + g.k * 17) % 4096 - 2048 AS v
  FROM documents d, generate_series(0, 127) g(k)
  WHERE g.k < 64 + d.doc_id % 64)
SELECT doc_id,
       CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
       CAST(64 + doc_id % 64 AS BIGINT) AS n_samples,
       CAST(SUM(v) AS BIGINT) AS amp_sum,
       CAST(MIN(v) AS BIGINT) AS amp_min,
       CAST(MAX(v) AS BIGINT) AS amp_max,
       CAST((64 + doc_id % 64) * 1000000
            // (8000 * (1 + doc_id % 3)) AS BIGINT) AS duration_us
FROM s GROUP BY doc_id
"""


# The round driver records only the FIRST 50 `queries()` entries in its
# CORRECTNESS_r{N}.json artifact (observed: r04-r06 all capped at 50 while
# this module grew past that). To keep every query's driver-recorded oracle
# row tracking its CURRENT implementation, new queries lead and the rest
# rotate oldest-record-first each round.
# `scripts/check_correctness.py` (same compare logic) covers the full set
# regardless of order and writes the complete CORRECTNESS_LOCAL.json.
_DRIVER_ARTIFACT_FIRST = [
    # new round-11 queries first (must land inside the 50-row cap)
    "dp_private_l0_bounds",
    "multimodal_phash_takedown",
    # round-11 rotation, ordered by STALENESS (latest driver record
    # per name): the driver records only the first 50 queries()
    # entries per round. These 45 names were last recorded in
    # CORRECTNESS_r07 and the final 3 are the alphabetically
    # first of the r08-era records — zero overlap with r10 AND r09
    # (VERDICT r10 task 7).
    "customer_scd2",
    "doc_code_detect",
    "doc_contamination_score",
    "doc_corpus_diff",
    "doc_domain_cap",
    "doc_gopher_filter",
    "doc_language_id",
    "doc_language_mix",
    "doc_length_buckets",
    "doc_nfc_normalize",
    "doc_normalize_text",
    "doc_pmi_collocations",
    "doc_readability",
    "doc_sentence_dedup",
    "doc_source_quality_report",
    "doc_tar_shards",
    "doc_textrank_keywords",
    "doc_tfidf_keywords",
    "dp_cluster_counts",
    "emb_cluster_balanced_sample",
    "emb_cluster_purity",
    "emb_covariance",
    "emb_hard_negatives",
    "emb_int8_recall",
    "emb_int8_roundtrip",
    "emb_kmeans_centroids",
    "emb_mmr_rerank",
    "emb_pca_project",
    "emb_triplets",
    "events_attribution",
    "events_funnel",
    "events_json_profile",
    "events_json_stats",
    "events_retention",
    "events_session_funnel",
    "events_time_to_convert",
    "events_transitions",
    "events_window_anomaly",
    "lineitem_order_stats",
    "multimodal_exif",
    "multimodal_mp3_meta",
    "part_fuzzy_match",
    "sim_ivf_pq_rerank_topk",
    "stream_cluster_assign_mirror",
    "stream_sentence_dedup_mirror",
    "bpe_train_merges",
    "customer_upsert",
    "dedup_clusters",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = _query_registry()
    front = [n for n in _DRIVER_ARTIFACT_FIRST if n in reg]
    rest = [n for n in reg if n not in set(front)]
    return {n: reg[n] for n in (*front, *rest)}


def _query_registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "doc_text_stats": _doc_text_stats,
        "dedup_exact": _dedup_exact,
        "dedup_minhash_lsh": _dedup_minhash_lsh,
        "dedup_minhash_prod": _dedup_minhash_prod,
        "dedup_jaccard": _dedup_jaccard,
        "dedup_clusters": _dedup_clusters,
        "dedup_simhash": _dedup_simhash,
        "sim_cosine_topk": _sim_cosine_topk,
        "sim_lsh_topk": _sim_lsh_topk,
        "sim_ivf_topk": _sim_ivf_topk,
        "emb_near_dup": _emb_near_dup,
        "emb_near_dup_exact": _emb_near_dup_exact,
        "dp_count_public": _dp_count_public,
        "dp_count_dedup_corpus": _dp_count_dedup_corpus,
        "dp_sum_clip_per_partition": _dp_sum_clip_per_partition,
        "dp_sum_clip_per_contribution": _dp_sum_clip_per_contribution,
        "dp_multi_sum_public": _dp_multi_sum_public,
        "dp_mean_public": _dp_mean_public,
        "dp_variance_public": _dp_variance_public,
        "dp_percentile_public": _dp_percentile_public,
        "dp_percentile_tree": _dp_percentile_tree,
        "dp_count_pld": _dp_count_pld,
        "dp_vector_sum_public": _dp_vector_sum_public,
        "dp_partition_selection": _dp_partition_selection,
        "dp_select_partitions_tg": _dp_select_partitions_tg,
        "dp_gaussian_threshold": _dp_gaussian_threshold,
        "dp_select_weighted_gaussian": _dp_select_weighted_gaussian,
        "dp_post_agg_threshold": _dp_post_agg_threshold,
        "dp_count_max_contributions": _dp_count_max_contributions,
        "dp_count_no_cross_bounding": _dp_count_no_cross_bounding,
        "dp_count_composite_key": _dp_count_composite_key,
        "dp_windowed_count_events": _dp_windowed_count_events,
        "dp_private_l0_bounds": _dp_private_l0_bounds,
        "dp_session_count_events": _dp_session_count_events,
        "doc_prep_pipeline": _doc_prep_pipeline,
        "asof_join_events": _asof_join_events,
        "range_join_events": _range_join_events,
        "sessionize_events": _sessionize_events,
        "token_topk": _token_topk,
        "doc_split": _doc_split,
        "multimodal_bmp_decode": _multimodal_bmp_decode,
        "multimodal_wav_decode": _multimodal_wav_decode,
        "utility_analysis_count_sum": _utility_analysis_count_sum,
        "utility_analysis_variance": _utility_analysis_variance,
        "analysis_histograms": _analysis_histograms,
        "doc_containment": _doc_containment,
        "multimodal_png_decode": _multimodal_png_decode,
        "dp_count_join_nation": _dp_count_join_nation,
        "dp_windowed_variance_events": _dp_windowed_variance_events,
        "doc_quality_signals": _doc_quality_signals,
        "doc_pii_scrub": _doc_pii_scrub,
        "bpe_train_merges": _bpe_train_merges,
        "bpe_encode": _bpe_encode,
        "sim_pq_topk": _sim_pq_topk,
        "sim_ivf_pq_topk": _sim_ivf_pq_topk,
        "sim_ann_store": _sim_ann_store,
        "dp_variance_selected": _dp_variance_selected,
        "dp_windowed_percentile_events": _dp_windowed_percentile_events,
        "doc_decontaminate": _doc_decontaminate,
        "doc_pack_sequences": _doc_pack_sequences,
        "tpch_q1_pricing": _tpch_q1_pricing,
        "tpch_q3_priority": _tpch_q3_priority,
        "tpch_q5_local_supplier": _tpch_q5_local_supplier,
        "tpch_q18_large_orders": _tpch_q18_large_orders,
        "tpch_q10_returned_items": _tpch_q10_returned_items,
        "tpch_q16_supplier_variety": _tpch_q16_supplier_variety,
        "events_rolling_features": _events_rolling_features,
        "doc_exact_substr_cut": _doc_exact_substr_cut,
        "doc_c4_filter": _doc_c4_filter,
        "emb_matryoshka_recall": _emb_matryoshka_recall,
        "doc_jsonl_roundtrip": _doc_jsonl_roundtrip,
        "doc_fix_mojibake": _doc_fix_mojibake,
        "doc_release_manifest": _doc_release_manifest,
        "doc_chat_render": _doc_chat_render,
        "doc_preference_pairs": _doc_preference_pairs,
        "dedup_lsh_plan": _dedup_lsh_plan,
        "events_dau_wau": _events_dau_wau,
        "customer_upsert": _customer_upsert,
        "stream_upsert_mirror": _stream_upsert_mirror,
        "doc_head_coverage": _doc_head_coverage,
        "doc_stratified_sample": _doc_stratified_sample,
        "asof_join_tolerance_events": _asof_join_tolerance_events,
        "range_join_keyed_events": _range_join_keyed_events,
        "dedup_cross_corpus": _dedup_cross_corpus,
        "multimodal_mp4_meta": _multimodal_mp4_meta,
        "emb_semantic_dedup": _emb_semantic_dedup,
        "stream_semdedup_mirror": _stream_semdedup_mirror,
        "doc_duplicate_spans": _doc_duplicate_spans,
        "doc_duplicate_spans_exact": _doc_duplicate_spans_exact,
        "doc_pii_audit": _doc_pii_audit,
        "doc_decontaminate_spans": _doc_decontaminate_spans,
        "events_k_anonymity": _events_k_anonymity,
        "events_pseudonymize": _events_pseudonymize,
        "doc_leakage_safe_split": _doc_leakage_safe_split,
        "events_parse_quarantine": _events_parse_quarantine,
        "events_salted_join": _events_salted_join,
        "doc_unigram_ppl": _doc_unigram_ppl,
        "doc_bm25_topk": _doc_bm25_topk,
        "doc_dsir_weights": _doc_dsir_weights,
        "doc_quality_classifier": _doc_quality_classifier,
        "doc_chunk_windows": _doc_chunk_windows,
        "doc_dsir_resample": _doc_dsir_resample,
        "emb_semantic_clusters": _emb_semantic_clusters,
        "doc_corpus_report": _doc_corpus_report,
        "dp_corpus_token_count": _dp_corpus_token_count,
        "multimodal_audio_features": _multimodal_audio_features,
        "dedup_cross_corpus_near": _dedup_cross_corpus_near,
        "dedup_incremental": _dedup_incremental,
        "doc_decontam_incremental": _doc_decontam_incremental,
        "doc_hybrid_rrf": _doc_hybrid_rrf,
        "doc_bm25_incremental": _doc_bm25_incremental,
        "doc_bm25_append": _doc_bm25_append,
        "stream_bm25_store_mirror": _stream_bm25_store_mirror,
        "doc_bm25_takedown": _doc_bm25_takedown,
        "sim_ann_takedown": _sim_ann_takedown,
        "dedup_exact_incremental": _dedup_exact_incremental,
        "stream_exact_store_mirror": _stream_exact_store_mirror,
        "stream_ann_store_mirror": _stream_ann_store_mirror,
        "multimodal_phash_incremental": _multimodal_phash_incremental,
        "multimodal_phash_takedown": _multimodal_phash_takedown,
        "stream_near_dup_store_mirror": _stream_near_dup_store_mirror,
        "doc_bigram_ppl": _doc_bigram_ppl,
        "stream_near_dup_mirror": _stream_near_dup_mirror,
        "doc_hash_embeddings": _doc_hash_embeddings,
        "doc_semantic_dedup_text": _doc_semantic_dedup_text,
        "dp_windowed_percentile_tree_events":
            _dp_windowed_percentile_tree_events,
        "doc_gram_novelty": _doc_gram_novelty,
        "doc_source_quota": _doc_source_quota,
        "doc_dup_rate_estimate": _doc_dup_rate_estimate,
        "events_zorder_key": _events_zorder_key,
        "doc_vocab_estimate": _doc_vocab_estimate,
        "doc_weighted_sample": _doc_weighted_sample,
        "dp_trending_bigrams": _dp_trending_bigrams,
        "dp_vector_mean_public": _dp_vector_mean_public,
        "doc_vocab_hll": _doc_vocab_hll,
        "token_freq_cms": _token_freq_cms,
        "doc_decontaminate_bloom": _doc_decontaminate_bloom,
        "events_windowed_hll": _events_windowed_hll,
        "vocab_overlap_kmv": _vocab_overlap_kmv,
        "doc_temperature_mix": _doc_temperature_mix,
        "multimodal_phash_dedup": _multimodal_phash_dedup,
        "multimodal_audio_dedup": _multimodal_audio_dedup,
        "doc_line_dedup": _doc_line_dedup,
        "multimodal_video_frames": _multimodal_video_frames,
        "doc_url_canonicalize": _doc_url_canonicalize,
        "multimodal_video_dedup": _multimodal_video_dedup,
        "multimodal_resize_stats": _multimodal_resize_stats,
        "dedup_keep_best": _dedup_keep_best,
        "doc_paragraph_filter": _doc_paragraph_filter,
        "stream_line_dedup_mirror": _stream_line_dedup_mirror,
        "doc_token_budget": _doc_token_budget,
        "doc_wet_roundtrip": _doc_wet_roundtrip,
        "doc_tar_shards": _doc_tar_shards,
        "multimodal_exif": _multimodal_exif,
        "multimodal_mp3_meta": _multimodal_mp3_meta,
        "doc_domain_cap": _doc_domain_cap,
        "doc_corpus_diff": _doc_corpus_diff,
        "doc_contamination_score": _doc_contamination_score,
        "doc_normalize_text": _doc_normalize_text,
        "doc_language_id": _doc_language_id,
        "doc_nfc_normalize": _doc_nfc_normalize,
        "doc_gopher_filter": _doc_gopher_filter,
        "doc_tfidf_keywords": _doc_tfidf_keywords,
        "doc_pmi_collocations": _doc_pmi_collocations,
        "doc_code_detect": _doc_code_detect,
        "doc_language_mix": _doc_language_mix,
        "doc_sentence_dedup": _doc_sentence_dedup,
        "stream_sentence_dedup_mirror": _stream_sentence_dedup_mirror,
        "sim_ivf_pq_rerank_topk": _sim_ivf_pq_rerank_topk,
        "emb_kmeans_centroids": _emb_kmeans_centroids,
        "emb_cluster_balanced_sample": _emb_cluster_balanced_sample,
        "emb_int8_roundtrip": _emb_int8_roundtrip,
        "emb_covariance": _emb_covariance,
        "emb_pca_project": _emb_pca_project,
        "doc_length_buckets": _doc_length_buckets,
        "stream_cluster_assign_mirror": _stream_cluster_assign_mirror,
        "emb_hard_negatives": _emb_hard_negatives,
        "emb_cluster_purity": _emb_cluster_purity,
        "emb_triplets": _emb_triplets,
        "dp_cluster_counts": _dp_cluster_counts,
        "emb_int8_recall": _emb_int8_recall,
        "emb_mmr_rerank": _emb_mmr_rerank,
        "events_funnel": _events_funnel,
        "events_retention": _events_retention,
        "events_json_stats": _events_json_stats,
        "doc_textrank_keywords": _doc_textrank_keywords,
        "events_json_profile": _events_json_profile,
        "events_time_to_convert": _events_time_to_convert,
        "events_window_anomaly": _events_window_anomaly,
        "doc_readability": _doc_readability,
        "doc_source_quality_report": _doc_source_quality_report,
        "events_attribution": _events_attribution,
        "events_transitions": _events_transitions,
        "part_fuzzy_match": _part_fuzzy_match,
        "lineitem_order_stats": _lineitem_order_stats,
        "events_session_funnel": _events_session_funnel,
        "customer_scd2": _customer_scd2,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "doc_text_stats": _DOC_TEXT_STATS_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "dedup_minhash_lsh": _DEDUP_MINHASH_SQL,
        "dedup_minhash_prod": _gen_minhash_prod_sql(),
        "dedup_jaccard": _DEDUP_JACCARD_SQL,
        "dedup_clusters": _gen_dedup_clusters_sql(),
        "dedup_simhash": _DEDUP_SIMHASH_SQL,
        "sim_cosine_topk": _SIM_COSINE_TOPK_SQL,
        "sim_lsh_topk": _SIM_LSH_TOPK_SQL,
        "sim_ivf_topk": _gen_ivf_topk_sql(),
        "emb_near_dup": _EMB_NEAR_DUP_SQL,
        "emb_near_dup_exact": _EMB_NEAR_DUP_EXACT_SQL,
        "dp_count_public": _DP_COUNT_PUBLIC_SQL,
        "dp_sum_clip_per_partition": _DP_SUM_CLIP_SQL,
        "dp_sum_clip_per_contribution": _DP_SUM_CONTRIB_SQL,
        "dp_multi_sum_public": _DP_MULTI_SUM_SQL,
        "dp_mean_public": _DP_MEAN_SQL,
        "dp_variance_public": _DP_VARIANCE_SQL,
        "dp_percentile_public": _DP_PERCENTILE_SQL,
        "dp_percentile_tree": _gen_percentile_sql(16 ** 4),
        "dp_count_pld": _DP_COUNT_PLD_SQL,
        "dp_vector_sum_public": _DP_VECTOR_SUM_SQL,
        "dp_partition_selection": _dp_partition_selection_sql(),
        "dp_select_partitions_tg": _dp_select_partitions_tg_sql(),
        "dp_gaussian_threshold": _dp_gaussian_threshold_sql(),
        "dp_select_weighted_gaussian": _dp_select_weighted_gaussian_sql(),
        "dp_post_agg_threshold": _post_agg_threshold_sql(),
        "dp_count_max_contributions": _DP_MAX_CONTRIB_SQL,
        "dp_count_no_cross_bounding": _DP_NO_CROSS_BOUNDING_SQL,
        "dp_count_composite_key": _dp_count_composite_key_sql(),
        "dp_windowed_count_events": _dp_windowed_count_events_sql(),
        "dp_private_l0_bounds": _DP_PRIVATE_L0_BOUNDS_SQL,
        "dp_session_count_events": _dp_session_count_events_sql(),
        "doc_prep_pipeline": _DOC_PREP_PIPELINE_SQL,
        "asof_join_events": _ASOF_JOIN_EVENTS_SQL,
        "range_join_events": _RANGE_JOIN_EVENTS_SQL,
        "sessionize_events": _SESSIONIZE_EVENTS_SQL,
        "token_topk": _TOKEN_TOPK_SQL,
        "doc_split": _DOC_SPLIT_SQL,
        "multimodal_bmp_decode": _MULTIMODAL_BMP_SQL,
        "multimodal_wav_decode": _MULTIMODAL_WAV_SQL,
        "utility_analysis_count_sum": _UTILITY_ANALYSIS_COUNT_SUM_SQL,
        "utility_analysis_variance": _UTILITY_ANALYSIS_VARIANCE_SQL,
        "analysis_histograms": _ANALYSIS_HISTOGRAMS_SQL,
        "doc_containment": _DOC_CONTAINMENT_SQL,
        "multimodal_png_decode": _MULTIMODAL_PNG_SQL,
        "dp_count_join_nation": _DP_COUNT_JOIN_NATION_SQL,
        "dp_windowed_variance_events": _DP_WINDOWED_VARIANCE_SQL,
        "doc_quality_signals": _DOC_QUALITY_SIGNALS_SQL,
        "doc_pii_scrub": _doc_pii_scrub_sql(),
        "sim_pq_topk": _gen_pq_topk_sql(),
        "sim_ivf_pq_topk": _gen_ivf_pq_topk_sql(),
        "sim_ann_store": _gen_ivf_pq_topk_sql(nprobe=3, k=8),
        "dp_count_dedup_corpus": _DP_COUNT_DEDUP_SQL,
        "dp_variance_selected": _dp_variance_selected_sql(),
        "dp_windowed_percentile_events": _dp_windowed_percentile_events_sql(),
        "doc_decontaminate": _DOC_DECONTAMINATE_SQL,
        "doc_pack_sequences": _DOC_PACK_SQL,
        "tpch_q1_pricing": _TPCH_Q1_SQL,
        "tpch_q3_priority": _TPCH_Q3_SQL,
        "tpch_q5_local_supplier": _TPCH_Q5_SQL,
        "tpch_q18_large_orders": _TPCH_Q18_SQL,
        "tpch_q10_returned_items": _TPCH_Q10_SQL,
        "tpch_q16_supplier_variety": _TPCH_Q16_SQL,
        "events_rolling_features": _EVENTS_ROLLING_SQL,
        "doc_exact_substr_cut": _DOC_EXACT_SUBSTR_CUT_SQL,
        "doc_c4_filter": _DOC_C4_FILTER_SQL,
        "emb_matryoshka_recall": _EMB_MATRYOSHKA_SQL,
        "doc_jsonl_roundtrip": _DOC_JSONL_SQL,
        "doc_fix_mojibake": _gen_fix_mojibake_sql(),
        "doc_release_manifest": _DOC_RELEASE_MANIFEST_SQL,
        "doc_chat_render": _DOC_CHAT_RENDER_SQL,
        "doc_preference_pairs": _DOC_PREFERENCE_PAIRS_SQL,
        "dedup_lsh_plan": _DEDUP_LSH_PLAN_SQL,
        "events_dau_wau": _EVENTS_DAU_WAU_SQL,
        "customer_upsert": _CUSTOMER_UPSERT_SQL,
        "stream_upsert_mirror": _STREAM_UPSERT_MIRROR_SQL,
        "doc_head_coverage": _DOC_HEAD_COVERAGE_SQL,
        "doc_stratified_sample": _DOC_STRATIFIED_SQL,
        "asof_join_tolerance_events": _ASOF_TOLERANCE_SQL,
        "range_join_keyed_events": _RANGE_JOIN_KEYED_SQL,
        "dedup_cross_corpus": _DEDUP_CROSS_CORPUS_SQL,
        "multimodal_mp4_meta": _MULTIMODAL_MP4_SQL,
        "emb_semantic_dedup": _gen_semantic_dedup_sql(),
        "stream_semdedup_mirror": _gen_stream_semdedup_sql(),
        "doc_duplicate_spans": _DOC_DUP_SPANS_SQL,
        "doc_duplicate_spans_exact": _DOC_DUP_SPANS_EXACT_SQL,
        "doc_pii_audit": _gen_pii_audit_sql(),
        "doc_decontaminate_spans": _DOC_DECON_SPANS_SQL,
        "events_k_anonymity": _EVENTS_K_ANONYMITY_SQL,
        "events_pseudonymize": _EVENTS_PSEUDONYMIZE_SQL,
        "doc_leakage_safe_split": _DOC_LEAKAGE_SPLIT_SQL,
        "events_parse_quarantine": _EVENTS_PARSE_QUARANTINE_SQL,
        "events_salted_join": _EVENTS_SALTED_JOIN_SQL,
        "doc_unigram_ppl": _gen_unigram_ppl_sql(),
        "doc_bm25_topk": _gen_bm25_sql(),
        "doc_dsir_weights": _gen_dsir_sql(),
        "doc_quality_classifier": _gen_quality_classifier_sql(),
        "doc_chunk_windows": _DOC_CHUNK_SQL,
        "doc_dsir_resample": _gen_dsir_resample_sql(),
        "emb_semantic_clusters": _gen_semantic_clusters_sql(),
        "doc_corpus_report": _DOC_CORPUS_REPORT_SQL,
        "dp_corpus_token_count": _DP_CORPUS_TOKEN_SQL,
        "multimodal_audio_features": _MULTIMODAL_AUDIO_FEATURES_SQL,
        "dedup_cross_corpus_near": _DEDUP_CROSS_NEAR_SQL,
        "dedup_incremental": _DEDUP_INCREMENTAL_SQL,
        "doc_decontam_incremental": _DOC_DECONTAM_INCR_SQL,
        "doc_hybrid_rrf": _gen_hybrid_rrf_sql(),
        "doc_bm25_incremental": _gen_bm25_sql(k=15),
        "doc_bm25_append": _gen_bm25_sql(k=12),
        "stream_bm25_store_mirror": _gen_bm25_sql(k=9),
        "doc_bm25_takedown": _gen_bm25_sql(k=13, where="doc_id % 5 <> 0"),
        "sim_ann_takedown": _gen_ivf_pq_topk_sql(
            nprobe=3, k=7, corpus_where="vec_id % 4 <> 0"),
        "dedup_exact_incremental": _DEDUP_EXACT_INCR_SQL,
        "stream_exact_store_mirror": _STREAM_EXACT_STORE_MIRROR_SQL,
        "stream_ann_store_mirror": _gen_ivf_pq_topk_sql(nprobe=4, k=6),
        "multimodal_phash_incremental": _MULTIMODAL_PHASH_INCR_SQL,
        "multimodal_phash_takedown": _MULTIMODAL_PHASH_TAKEDOWN_SQL,
        "stream_near_dup_store_mirror": _STREAM_ND_STORE_MIRROR_SQL,
        "doc_bigram_ppl": _gen_bigram_ppl_sql(),
        "stream_near_dup_mirror": _STREAM_NEAR_DUP_MIRROR_SQL,
        "doc_hash_embeddings": _DOC_HASH_EMB_SQL,
        "doc_semantic_dedup_text": _gen_semantic_dedup_text_sql(),
        "bpe_encode": _gen_bpe_encode_sql(),
        "bpe_train_merges": _gen_bpe_train_sql(),
        "dp_windowed_percentile_tree_events": _DP_WINDOWED_PCT_TREE_SQL,
        "doc_gram_novelty": _DOC_GRAM_NOVELTY_SQL,
        "doc_source_quota": _DOC_SOURCE_QUOTA_SQL,
        "doc_dup_rate_estimate": _DOC_DUP_RATE_SQL,
        "events_zorder_key": _gen_zorder_sql(),
        "doc_vocab_estimate": _DOC_VOCAB_ESTIMATE_SQL,
        "doc_weighted_sample": _DOC_WEIGHTED_SAMPLE_SQL,
        "dp_trending_bigrams": _gen_trending_bigrams_sql(),
        "dp_vector_mean_public": _DP_VECTOR_MEAN_SQL,
        "doc_vocab_hll": _DOC_VOCAB_HLL_SQL,
        "token_freq_cms": _TOKEN_FREQ_CMS_SQL,
        "doc_decontaminate_bloom": _DOC_DECONTAM_BLOOM_SQL,
        "events_windowed_hll": _EVENTS_WINDOWED_HLL_SQL,
        "vocab_overlap_kmv": _VOCAB_OVERLAP_KMV_SQL,
        "doc_temperature_mix": _DOC_TEMPERATURE_MIX_SQL,
        "multimodal_phash_dedup": _MULTIMODAL_PHASH_SQL,
        "multimodal_audio_dedup": _MULTIMODAL_AUDIO_DEDUP_SQL,
        "doc_line_dedup": _DOC_LINE_DEDUP_SQL,
        "multimodal_video_frames": _MULTIMODAL_VIDEO_FRAMES_SQL,
        "doc_url_canonicalize": _DOC_URL_CANONICALIZE_SQL,
        "multimodal_video_dedup": _MULTIMODAL_VIDEO_DEDUP_SQL,
        "multimodal_resize_stats": _MULTIMODAL_RESIZE_STATS_SQL,
        "dedup_keep_best": _gen_dedup_keep_best_sql(),
        "doc_paragraph_filter": _gen_paragraph_filter_sql(),
        "stream_line_dedup_mirror": _STREAM_LINE_DEDUP_MIRROR_SQL,
        "doc_token_budget": _DOC_TOKEN_BUDGET_SQL,
        "doc_wet_roundtrip": _DOC_WET_ROUNDTRIP_SQL,
        "doc_tar_shards": _DOC_TAR_SHARDS_SQL,
        "multimodal_exif": _MULTIMODAL_EXIF_SQL,
        "multimodal_mp3_meta": _MULTIMODAL_MP3_META_SQL,
        "doc_domain_cap": _DOC_DOMAIN_CAP_SQL,
        "doc_corpus_diff": _DOC_CORPUS_DIFF_SQL,
        "doc_contamination_score": _DOC_CONTAMINATION_SCORE_SQL,
        "doc_normalize_text": _DOC_NORMALIZE_TEXT_SQL,
        "doc_language_id": _gen_language_id_sql(),
        "doc_nfc_normalize": _DOC_NFC_NORMALIZE_SQL,
        "doc_gopher_filter": _DOC_GOPHER_FILTER_SQL,
        "doc_tfidf_keywords": _DOC_TFIDF_KEYWORDS_SQL,
        "doc_pmi_collocations": _DOC_PMI_COLLOCATIONS_SQL,
        "doc_code_detect": _gen_code_detect_sql(),
        "doc_language_mix": _gen_language_mix_sql(),
        "doc_sentence_dedup": _DOC_SENTENCE_DEDUP_SQL,
        "stream_sentence_dedup_mirror": _STREAM_SENTENCE_DEDUP_MIRROR_SQL,
        "sim_ivf_pq_rerank_topk": _gen_ivf_pq_rerank_sql(),
        "emb_kmeans_centroids": _gen_kmeans_sql(),
        "emb_cluster_balanced_sample": _gen_cluster_balanced_sql(),
        "emb_int8_roundtrip": _EMB_INT8_ROUNDTRIP_SQL,
        "emb_covariance": _EMB_COVARIANCE_SQL,
        "emb_pca_project": _gen_pca_sql(),
        "doc_length_buckets": _DOC_LENGTH_BUCKETS_SQL,
        "stream_cluster_assign_mirror": _gen_stream_cluster_sql(),
        "emb_hard_negatives": _EMB_HARD_NEGATIVES_SQL,
        "emb_cluster_purity": _gen_cluster_purity_sql(),
        "emb_triplets": _EMB_TRIPLETS_SQL,
        "dp_cluster_counts": _gen_dp_cluster_counts_sql(),
        "emb_int8_recall": _EMB_INT8_RECALL_SQL,
        "emb_mmr_rerank": _gen_mmr_sql(),
        "events_funnel": _EVENTS_FUNNEL_SQL,
        "events_retention": _EVENTS_RETENTION_SQL,
        "events_json_stats": _EVENTS_JSON_STATS_SQL,
        "doc_textrank_keywords": _gen_textrank_sql(),
        "events_json_profile": _EVENTS_JSON_PROFILE_SQL,
        "events_time_to_convert": _EVENTS_TIME_TO_CONVERT_SQL,
        "events_window_anomaly": _EVENTS_WINDOW_ANOMALY_SQL,
        "doc_readability": _DOC_READABILITY_SQL,
        "doc_source_quality_report": _gen_source_quality_sql(),
        "events_attribution": _EVENTS_ATTRIBUTION_SQL,
        "events_transitions": _EVENTS_TRANSITIONS_SQL,
        "part_fuzzy_match": _PART_FUZZY_MATCH_SQL,
        "lineitem_order_stats": _LINEITEM_ORDER_STATS_SQL,
        "events_session_funnel": _EVENTS_SESSION_FUNNEL_SQL,
        "customer_scd2": _CUSTOMER_SCD2_SQL,
    }


# ---------------------------------------------------------------------------
# LLM-pipeline operators: text analysis, dedup, similarity
# ---------------------------------------------------------------------------


def _doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis over documents: token counts, lexical diversity,
    quality score, language-ID heuristic, exact-dup fingerprint."""
    from pipelinedp_spark.functions import text as TX
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(t).cast("long").alias("n_tokens"),
        TX.bpe_token_count(t).cast("long").alias("n_bpe_tokens"),
        TX.distinct_token_count(t).cast("long").alias("n_distinct"),
        F.round(TX.type_token_ratio(t), 6).alias("ttr"),
        TX.avg_token_length(t).alias("avg_tok_len"),
        TX.quality_score(t).alias("quality"),
        TX.language_id(t).alias("lang_pred"),
        TX.rolling_fingerprint(t).alias("fingerprint"))


_DOC_TEXT_STATS_SQL = """
WITH tok AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
SELECT doc_id,
       len(t) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
           AS n_bpe_tokens,
       len(list_distinct(t)) AS n_distinct,
       ROUND(len(list_distinct(t)) / GREATEST(len(t), 1), 6) AS ttr,
       list_aggregate([length(x) for x in t], 'sum')
           / GREATEST(len(t), 1) AS avg_tok_len,
       ROUND((CASE WHEN len(t) < 50 THEN len(t) / 50.0
                   WHEN len(t) > 10000 THEN 10000.0 / len(t)
                   ELSE 1.0 END)
             * (len(list_distinct(t)) / GREATEST(len(t), 1)), 6) AS quality,
       CASE
         WHEN len(list_intersect(list_distinct(string_split(lower(text), ' ')),
              ['the','a','and','of','to','in','is','it'])) >=
              GREATEST(
                len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                    ['the','a','and','of','to','in','is','it'])),
                len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                    ['el','la','de','que','y','los','un','por'])),
                len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                    ['der','die','und','das','ist','ein','nicht'])),
                len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                    ['le','la','et','les','des','un','est','pas'])), 1)
         THEN 'en'
         WHEN len(list_intersect(list_distinct(string_split(lower(text), ' ')),
              ['el','la','de','que','y','los','un','por'])) >=
              GREATEST(
                len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                    ['el','la','de','que','y','los','un','por'])),
                len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                    ['der','die','und','das','ist','ein','nicht'])),
                len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                    ['le','la','et','les','des','un','est','pas'])), 1)
         THEN 'es'
         WHEN len(list_intersect(list_distinct(string_split(lower(text), ' ')),
              ['der','die','und','das','ist','ein','nicht'])) >=
              GREATEST(
                len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                    ['der','die','und','das','ist','ein','nicht'])),
                len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                    ['le','la','et','les','des','un','est','pas'])), 1)
         THEN 'de'
         WHEN len(list_intersect(list_distinct(string_split(lower(text), ' ')),
              ['le','la','et','les','des','un','est','pas'])) >= 1
         THEN 'fr'
         ELSE 'unknown'
       END AS lang_pred,
       md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fingerprint
FROM tok
"""


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs)


_DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS doc_id,
       md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fingerprint,
       COUNT(*) AS dup_count
FROM documents
GROUP BY 2
"""


_SHINGLE_CTE = """
tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                       for i in range(1, len(t) - 1)])
                   ELSE [array_to_string(t, ' ')] END AS shingles
       FROM tok)
"""


def _dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.7)


def _dedup_minhash_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs at PRODUCTION signature width (64
    hashes, 8 bands of 8 — the recall regime real pipelines run at
    threshold ~0.7-0.8, pinned by
    test_minhash_lsh_recall_production_settings). Same plan as
    `dedup_minhash_lsh`: the signature pass is one Arrow numpy grid per
    doc (cost linear in num_hashes, zero extra shuffles), so widening
    8 -> 64 must NOT change the shuffle count — this query exists to
    keep that claim benched, not just unit-tested."""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, num_hashes=64, rows_per_band=8,
                                   jaccard_threshold=0.7)


def _gen_minhash_prod_sql(num_hashes: int = 64, rpb: int = 8,
                          thr: float = 0.7) -> str:
    """SQL mirror of `_dedup_minhash_prod` — the 8-hash oracle's
    structure generated for any signature width (coefficients are the
    same LCG family, computed inline from the band index). Static SQL:
    no data-dependent literals, smokeable at any sf."""
    nb = num_hashes // rpb
    bands_md5 = ",\n                 ".join(
        "md5(" + " || '|' || ".join(
            f"CAST(sig[{b * rpb + r + 1}] AS VARCHAR)"
            for r in range(rpb)) + ")"
        for b in range(nb))
    return f"""
WITH {_SHINGLE_CTE},
hm AS (
  SELECT doc_id, shingles,
         [('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647
          for s in shingles] AS hs
  FROM sh),
sig AS (
  SELECT doc_id, shingles,
         [list_min([(((1103515245 * (i + 1) + 12345) % 2147483647) * h
                     + ((2654435761 * i + 97) % 2147483647)) % 2147483647
                    for h in hs])
          for i in range(0, {num_hashes})] AS sig
  FROM hm),
bands AS (
  SELECT doc_id,
         UNNEST(range(0, {nb})) AS band_idx,
         UNNEST([{bands_md5}])
             AS band_hash
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id)
SELECT c.id_a, c.id_b,
       ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
             (len(sa.shingles) + len(sb.shingles)
              - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.id_a
JOIN sh sb ON sb.doc_id = c.id_b
WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
      (len(sa.shingles) + len(sb.shingles)
       - len(list_intersect(sa.shingles, sb.shingles))) >= {thr}
"""


_DEDUP_MINHASH_SQL = f"""
WITH {_SHINGLE_CTE},
hm AS (
  SELECT doc_id, shingles,
         [('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647
          for s in shingles] AS hs
  FROM sh),
sig AS (
  SELECT doc_id, shingles,
         [list_min([(((1103515245 * (i + 1) + 12345) % 2147483647) * h
                     + ((2654435761 * i + 97) % 2147483647)) % 2147483647
                    for h in hs])
          for i in range(0, 8)] AS sig
  FROM hm),
bands AS (
  SELECT doc_id,
         UNNEST(range(0, 2)) AS band_idx,
         UNNEST([md5(CAST(sig[1] AS VARCHAR) || '|' || CAST(sig[2] AS VARCHAR)
                     || '|' || CAST(sig[3] AS VARCHAR) || '|'
                     || CAST(sig[4] AS VARCHAR)),
                 md5(CAST(sig[5] AS VARCHAR) || '|' || CAST(sig[6] AS VARCHAR)
                     || '|' || CAST(sig[7] AS VARCHAR) || '|'
                     || CAST(sig[8] AS VARCHAR))])
             AS band_hash
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id)
SELECT c.id_a, c.id_b,
       ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
             (len(sa.shingles) + len(sb.shingles)
              - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.id_a
JOIN sh sb ON sb.doc_id = c.id_b
WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
      (len(sa.shingles) + len(sb.shingles)
       - len(list_intersect(sa.shingles, sb.shingles))) >= 0.7
"""


def _dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a shingle inverted index
    with the deterministic stop-shingle rule (doc freq > 200 excluded
    from candidate discovery); Jaccard over full shingle sets."""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(docs, jaccard_threshold=0.7)


_DEDUP_JACCARD_SQL = f"""
WITH {_SHINGLE_CTE},
inv AS (
  SELECT doc_id, UNNEST(shingles) AS s FROM sh),
kept AS (
  SELECT doc_id, s FROM inv
  QUALIFY COUNT(*) OVER (PARTITION BY s) <= 200),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id)
SELECT c.id_a, c.id_b,
       ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
             (len(sa.shingles) + len(sb.shingles)
              - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.id_a
JOIN sh sb ON sb.doc_id = c.id_b
WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
      (len(sa.shingles) + len(sb.shingles)
       - len(list_intersect(sa.shingles, sb.shingles))) >= 0.7
"""


def _dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER assignment: simhash pairs -> iterative min-label
    connected components -> every doc labeled with its component's min
    doc id (the keep-one-representative step). The oracle computes the
    same transitive closure with a recursive CTE over the identical pair
    set."""
    from pipelinedp_spark.operators import dedup, graph
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.simhash_pairs(docs, max_hamming=3)
    return graph.near_dup_clusters(docs, pairs)


def _gen_dedup_clusters_sql() -> str:
    pair_sql = _DEDUP_SIMHASH_SQL.replace("ORDER BY 1, 2", "")
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({pair_sql})
),
und AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT und.u, reach.lbl FROM und JOIN reach ON reach.node = und.v
)
SELECT node AS doc_id, MIN(lbl) AS cluster_id
FROM reach GROUP BY node ORDER BY 1
"""


def _dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    out = dedup.simhash_pairs(docs, max_hamming=3)
    return out.withColumn("hamming", F.col("hamming").cast("long"))


_DEDUP_SIMHASH_SQL = """
WITH tok AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents),
th AS (
  SELECT doc_id, UNNEST(toks) AS token FROM tok),
hashes AS (
  SELECT doc_id,
         ('0x' || substr(md5(token), 1, 15))::BIGINT AS h
  FROM th),
votes AS (
  SELECT doc_id, b.b AS bit,
         SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM hashes, (SELECT UNNEST(range(0, 60)) AS b) b
  GROUP BY doc_id, b.b),
fp AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
             AS simhash
  FROM votes GROUP BY doc_id),
blocks AS (
  SELECT doc_id, simhash, UNNEST(range(0, 4)) AS block_idx,
         UNNEST([(simhash >> 0) & 32767, (simhash >> 15) & 32767,
                 (simhash >> 30) & 32767, (simhash >> 45) & 32767])
             AS block_val
  FROM fp),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM blocks a JOIN blocks b
    ON a.block_idx = b.block_idx AND a.block_val = b.block_val
   AND a.doc_id < b.doc_id)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
"""


def _sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for 5 fixed query vectors."""
    from pipelinedp_spark.operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    out = similarity.cosine_topk(emb, q, k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


_SIM_COSINE_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(e.embedding::DOUBLE[], q.qv) /
         (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
          * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
  FROM embeddings e CROSS JOIN q),
ranked AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank,
         cosine
  FROM scored)
SELECT query_id, vec_id, rank, ROUND(cosine, 6) AS cosine
FROM ranked WHERE rank <= 10
"""


def _sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate LSH-bucketed top-k (scale path). Oracle-checked: the
    md5-derived hyperplanes are data-independent constants, so the SQL
    mirror injects them as DOUBLE[] literals (`_gen_lsh_topk_sql`)."""
    from pipelinedp_spark.operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    out = similarity.lsh_topk(emb, q, k=10, num_planes=6)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _plane_lit(row) -> str:
    """A hyperplane row as a full-precision DuckDB DOUBLE[] literal."""
    return "[" + ", ".join(repr(float(x)) for x in row) + "]::DOUBLE[]"


def _gen_lsh_topk_sql(num_planes: int = 6, dim: int = 64,
                      k: int = 10) -> str:
    """SQL mirror of `similarity.lsh_topk`: same md5-derived planes
    (injected as literals), same sign-bit bucket id, same bucket-equality
    join and (cosine DESC, vec_id ASC) ranking."""
    from pipelinedp_spark.operators.similarity import _plane_matrix
    planes = _plane_matrix(num_planes, dim, lambda p, d: f"{p}:{d}")
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {_plane_lit(planes[p])}) > 0 "
        f"THEN {1 << p} ELSE 0 END)" for p in range(num_planes))
    return f"""
WITH sig AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, ({bucket}) AS bucket
  FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM sig
      WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, c.vec_id,
         list_dot_product(c.v, q.qv) /
         (sqrt(list_dot_product(c.v, c.v))
          * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
  FROM sig c JOIN q USING (bucket)),
ranked AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank,
         cosine
  FROM scored)
SELECT query_id, vec_id, rank, ROUND(cosine, 6) AS cosine
FROM ranked WHERE rank <= {k}
"""


def _gen_emb_near_dup_sql(num_bands: int = 8, ppb: int = 5, dim: int = 64,
                          thresh: float = 0.45,
                          max_bucket: int = 2000) -> str:
    """SQL mirror of `dedup.embedding_near_dup_pairs`: per-band sign-bit
    buckets from the same literal-injected planes, bucket-size cap,
    bucket-equality self-join, cosine verify at 6dp."""
    from pipelinedp_spark.operators.similarity import _plane_matrix
    planes = _plane_matrix(num_bands * ppb, dim,
                           lambda p, d: f"{p // ppb}:{p % ppb}:{d}")
    selects = []
    for b in range(num_bands):
        bucket = " + ".join(
            f"(CASE WHEN list_dot_product(v, "
            f"{_plane_lit(planes[b * ppb + j])}) > 0 "
            f"THEN {1 << j} ELSE 0 END)" for j in range(ppb))
        selects.append(f"SELECT vec_id, v, {b} AS band_idx, "
                       f"({bucket}) AS bucket FROM base")
    exploded = "\nUNION ALL\n".join(selects)
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS ({exploded}),
filt AS (
  SELECT * FROM sig
  QUALIFY COUNT(*) OVER (PARTITION BY band_idx, bucket) <= {max_bucket}),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
  FROM filt a JOIN filt b
    ON a.band_idx = b.band_idx AND a.bucket = b.bucket
   AND a.vec_id < b.vec_id)
SELECT DISTINCT id_a, id_b, cosine FROM pairs WHERE cosine >= {thresh}
"""


_SIM_LSH_TOPK_SQL = _gen_lsh_topk_sql(num_planes=6, dim=64, k=10)
_EMB_NEAR_DUP_SQL = _gen_emb_near_dup_sql(num_bands=8, ppb=5, dim=64,
                                          thresh=0.45, max_bucket=2000)


def _sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means coarse quantizer) approximate top-k. Deterministic:
    the quantizer trains on the lowest-10k-id sample with a fixed seed, so
    the oracle generator (`_gen_ivf_topk_sql`) re-trains bit-identical
    centroids from the same parquet with numpy and mirrors cell assignment
    + probing + scoring in SQL."""
    from pipelinedp_spark.operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    out = similarity.ivf_topk(emb, q, k=10, num_cells=8, nprobe=2)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _gen_ivf_topk_sql(num_cells: int = 8, nprobe: int = 2, k: int = 10,
                      seed: int = 7,
                      sf_dir: str = "/root/testdata/sf0.01") -> str:
    """SQL mirror of `similarity.ivf_topk` for the driver's sf0.01 oracle
    run: trains the same centroids (same deterministic sample, same
    seeded k-means, shared `train_ivf_centroids`) directly from parquet
    with pyarrow/numpy, injects them as literals, and mirrors argmax cell
    assignment, nprobe probing, and (cosine DESC, vec_id ASC) ranking.
    Cell argmax on the raw vector equals argmax on the normalized vector
    (positive scaling), so the SQL skips normalization."""
    import numpy as np
    import pyarrow.parquet as pq
    from pipelinedp_spark.operators.similarity import train_ivf_centroids
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    t = t.sort_values("vec_id").head(10_000)
    x = np.stack(t["embedding"].to_numpy()).astype("float64")
    cents = train_ivf_centroids(x, num_cells, seed)
    cell_rows = ", ".join(f"({c}, {_plane_lit(cents[c])})"
                          for c in range(len(cents)))
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cells(cell, cv) AS (VALUES {cell_rows}),
ass AS (
  SELECT vec_id, v, cell FROM (
    SELECT vec_id, v, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY list_dot_product(v, cv) DESC,
                                       cell ASC) AS rn
    FROM base CROSS JOIN cells) WHERE rn = 1),
q AS (
  SELECT vec_id AS query_id, v AS qv, cell FROM (
    SELECT vec_id, v, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY list_dot_product(v, cv) DESC,
                                       cell ASC) AS rn
    FROM base CROSS JOIN cells WHERE vec_id < 5) WHERE rn <= {nprobe}),
scored AS (
  SELECT q.query_id, c.vec_id,
         list_dot_product(c.v, q.qv) /
         (sqrt(list_dot_product(c.v, c.v))
          * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
  FROM ass c JOIN q USING (cell)),
ranked AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank,
         cosine
  FROM scored)
SELECT query_id, vec_id, rank, ROUND(cosine, 6) AS cosine
FROM ranked WHERE rank <= {k}
"""


def _emb_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force embedding near-dup pairs (oracle-checkable
    baseline for the LSH variant)."""
    from pipelinedp_spark.operators import dedup
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dup_exact(emb, cosine_threshold=0.45)


_EMB_NEAR_DUP_EXACT_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                    a.embedding::DOUBLE[]))
              * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]))), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
            (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                   a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]))), 6) >= 0.45
"""


def _emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via banded hyperplane LSH. Oracle-checked:
    the md5-derived planes are data-independent constants, injected into
    the SQL mirror as literals (`_gen_emb_near_dup_sql`)."""
    from pipelinedp_spark.operators import dedup
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dup_pairs(emb, cosine_threshold=0.45)


# ---------------------------------------------------------------------------
# Analysis layer: oracle-checked utility analysis + dataset histograms.
# With PUBLIC partitions the utility closed forms (reference:
# analysis/per_partition_combiners.py + cross_partition_combiners.py
# semantics) are exactly SQL-expressible: p = least(1, l0/n_partitions),
# bias/variance sums per partition, Laplace std = sqrt(2) * l1 / eps.
# ---------------------------------------------------------------------------


def _utility_analysis_count_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UtilityAnalysisEngine over a 2-config grid on lineitem: expected
    COUNT and SUM error (rmse, |bias|, dropped ratio) per configuration
    under the Bernoulli-keep model, public partitions."""
    import pipelinedp_spark.analysis as A
    li = _t(spark, sf_dir, "lineitem")
    params = pds.AggregateParams(
        metrics=[pds.Metrics.COUNT, pds.Metrics.SUM],
        max_partitions_contributed=1, max_contributions_per_partition=1,
        min_value=0.0, max_value=50.0)
    conf = A.MultiParameterConfiguration(
        max_partitions_contributed=[2, 3],
        max_contributions_per_partition=[100, 400],
        min_sum_per_partition=[0.0, 0.0],
        max_sum_per_partition=[2000.0, 10000.0])
    reports = A.UtilityAnalysisEngine(epsilon=4.0, delta=0.0).analyze(
        li, params,
        pds.DataFrameExtractors("l_suppkey", "l_returnflag", "l_quantity"),
        conf, public_partitions=["A", "N", "R"])
    rows = []
    for rep in reports:
        for me in rep.metric_errors:
            rows.append((rep.configuration_index, me.metric.value,
                         round(me.rmse, 6), round(me.expected_abs_bias, 6),
                         round(me.ratio_data_dropped, 6)))
    rows.sort()
    return spark.createDataFrame(
        rows, "conf int, metric string, rmse double, abs_bias double, "
              "dropped double")


# eps=4 over 2 metrics -> eps_m = 2 per mechanism; Laplace std =
# sqrt(2)*l1/eps_m with l1 = l0*linf (count) / l0*max(|lo|,|hi|) (sum,
# per-partition clip regime).
_UTILITY_ANALYSIS_COUNT_SUM_SQL = """
WITH pre AS (
  SELECT l_suppkey AS pid, l_returnflag AS pk,
         COUNT(*)::DOUBLE AS cnt, SUM(l_quantity)::DOUBLE AS s
  FROM lineitem GROUP BY 1, 2),
pre2 AS (SELECT *, COUNT(*) OVER (PARTITION BY pid)::DOUBLE AS np FROM pre),
conf(conf, l0, linf, lo, hi) AS (
  VALUES (0, 2.0, 100.0, 0.0, 2000.0), (1, 3.0, 400.0, 0.0, 10000.0)),
j AS (
  SELECT conf, l0, linf, lo, hi, pk, cnt, s,
         LEAST(1.0, l0 / np) AS p,
         LEAST(cnt, linf) AS cc,
         GREATEST(LEAST(s, hi), lo) AS cs
  FROM pre2 CROSS JOIN conf),
per_pk AS (
  SELECT conf, l0, linf, lo, hi, pk,
         SUM(cnt) AS true_cnt, SUM(s) AS true_sum,
         SUM(p * cc - cnt) AS cb, SUM(p * (1 - p) * cc * cc) AS cv,
         SUM(p * cs - s) AS sb, SUM(p * (1 - p) * cs * cs) AS sv
  FROM j GROUP BY 1, 2, 3, 4, 5, 6),
stds AS (
  SELECT *, sqrt(2.0) * l0 * linf / 2.0 AS cstd,
            sqrt(2.0) * l0 * GREATEST(abs(lo), abs(hi)) / 2.0 AS sstd
  FROM per_pk),
agg AS (
  SELECT conf,
         sqrt(avg(cb * cb + cv + cstd * cstd)) AS count_rmse,
         avg(abs(cb)) AS count_bias,
         sum(-cb) / sum(true_cnt) AS count_dropped,
         sqrt(avg(sb * sb + sv + sstd * sstd)) AS sum_rmse,
         avg(abs(sb)) AS sum_bias,
         sum(-sb) / sum(abs(true_sum)) AS sum_dropped
  FROM stds GROUP BY 1)
SELECT conf, 'count' AS metric, ROUND(count_rmse, 6) AS rmse,
       ROUND(count_bias, 6) AS abs_bias, ROUND(count_dropped, 6) AS dropped
FROM agg
UNION ALL
SELECT conf, 'sum', ROUND(sum_rmse, 6), ROUND(sum_bias, 6),
       ROUND(sum_dropped, 6)
FROM agg
ORDER BY conf, metric
"""


def _utility_analysis_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANCE utility analysis on events (net-new metric): delta-method
    rmse and |bias| per configuration, full (C, S, Q) sampling covariance,
    public partitions."""
    import pipelinedp_spark.analysis as A
    ev = _t(spark, sf_dir, "events")
    params = pds.AggregateParams(
        metrics=[pds.Metrics.VARIANCE],
        max_partitions_contributed=1, max_contributions_per_partition=1,
        min_value=0.0, max_value=500.0)
    conf = A.MultiParameterConfiguration(
        max_partitions_contributed=[2, 4],
        max_contributions_per_partition=[3, 10])
    reports = A.UtilityAnalysisEngine(epsilon=6.0, delta=0.0).analyze(
        ev, params,
        pds.DataFrameExtractors("user_id", "event_type", "value"),
        conf, public_partitions=["click", "signup", "error",
                                 "view", "purchase"])
    rows = [(rep.configuration_index,
             round(rep.metric_errors[0].rmse, 6),
             round(rep.metric_errors[0].expected_abs_bias, 6))
            for rep in reports]
    rows.sort()
    return spark.createDataFrame(rows,
                                 "conf int, rmse double, abs_bias double")


# Single metric + public partitions -> eps_m = 6; each of the three
# variance mechanisms gets eps_m/3 = 2. mid = 250, half-range h = 250.
_UTILITY_ANALYSIS_VARIANCE_SQL = """
WITH pre AS (
  SELECT user_id AS pid, event_type AS pk,
         COUNT(*)::DOUBLE AS cnt, SUM(value)::DOUBLE AS s,
         SUM(value * value)::DOUBLE AS q
  FROM events GROUP BY 1, 2),
pre2 AS (SELECT *, COUNT(*) OVER (PARTITION BY pid)::DOUBLE AS np FROM pre),
conf(conf, l0, linf) AS (VALUES (0, 2.0, 3.0), (1, 4.0, 10.0)),
j AS (
  SELECT conf, l0, linf, pk, cnt,
         LEAST(1.0, l0 / np) AS p,
         LEAST(cnt, linf) AS cc,
         (s - cnt * 250.0) AS ns,
         (q - 2 * 250.0 * s + cnt * 250.0 * 250.0) AS nq,
         LEAST(cnt, linf) / cnt AS r
  FROM pre2 CROSS JOIN conf),
per_pk AS (
  SELECT conf, l0, linf, pk,
         SUM(cnt) AS c, SUM(ns) AS sn, SUM(nq) AS qn,
         SUM(p * cc - cnt) AS bc,
         SUM(p * ns * r - ns) AS bs,
         SUM(p * nq * r - nq) AS bq,
         SUM(p * (1 - p) * cc * cc) AS vc,
         SUM(p * (1 - p) * ns * r * ns * r) AS vs,
         SUM(p * (1 - p) * nq * r * nq * r) AS vq,
         SUM(p * (1 - p) * cc * ns * r) AS ccs,
         SUM(p * (1 - p) * cc * nq * r) AS ccq,
         SUM(p * (1 - p) * ns * r * nq * r) AS csq
  FROM j GROUP BY 1, 2, 3, 4),
g AS (
  SELECT *,
         (-qn / (c * c) + 2 * sn * sn / (c * c * c)) AS fc,
         (-2 * sn / (c * c)) AS fs,
         (1.0 / c) AS fq,
         sqrt(2.0) * l0 * linf / 2.0 AS stdc,
         sqrt(2.0) * l0 * linf * 250.0 / 2.0 AS stds,
         sqrt(2.0) * l0 * linf * 250.0 * 250.0 / 2.0 AS stdq
  FROM per_pk),
e AS (
  SELECT conf,
         (fc * bc + fs * bs + fq * bq) AS bias,
         fc * fc * (vc + stdc * stdc) + fs * fs * (vs + stds * stds)
           + fq * fq * (vq + stdq * stdq)
           + 2 * fc * fs * ccs + 2 * fc * fq * ccq + 2 * fs * fq * csq
           AS var
  FROM g)
SELECT conf, ROUND(sqrt(avg(bias * bias + var)), 6) AS rmse,
       ROUND(avg(abs(bias)), 6) AS abs_bias
FROM e GROUP BY conf ORDER BY conf
"""


def _analysis_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset contribution histograms (reference log binning: keep the 3
    most-significant digits) for L0 / Linf / count-per-partition over
    lineitem keyed by (l_suppkey, l_returnflag)."""
    import pipelinedp_spark.analysis as A
    li = _t(spark, sf_dir, "lineitem")
    h = A.compute_dataset_histograms(
        li, pds.DataFrameExtractors("l_suppkey", "l_returnflag",
                                    "l_quantity"))
    rows = []
    for hist in (h.l0_contributions_histogram,
                 h.linf_contributions_histogram,
                 h.count_per_partition_histogram):
        for b in hist.bins:
            rows.append((hist.name.value, int(b.lower), int(b.upper),
                         int(b.count), float(b.sum), float(b.max),
                         float(b.min)))
    return spark.createDataFrame(
        rows, "hist string, lower long, upper long, bin_count long, "
              "bin_sum double, bin_max double, bin_min double")


_ANALYSIS_HISTOGRAMS_SQL = """
WITH per AS (
  SELECT l_suppkey AS pid, l_returnflag AS pk, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2),
u AS (
  SELECT 'l0_contributions' AS h, COUNT(*)::BIGINT AS v
  FROM per GROUP BY pid
  UNION ALL
  SELECT 'linf_contributions', cnt FROM per
  UNION ALL
  SELECT 'count_per_partition', SUM(cnt)::BIGINT FROM per GROUP BY pk),
b AS (
  SELECT h, v,
         CAST(FLOOR(v / POWER(10, GREATEST(FLOOR(LOG10(v)) - 2, 0)))
              * POWER(10, GREATEST(FLOOR(LOG10(v)) - 2, 0)) AS BIGINT)
             AS lower
  FROM u)
SELECT h AS hist, lower,
       lower + CAST(POWER(10, GREATEST(LENGTH(CAST(lower AS VARCHAR)) - 3,
                                       0)) AS BIGINT) AS upper,
       COUNT(*)::BIGINT AS bin_count, SUM(v)::DOUBLE AS bin_sum,
       MAX(v)::DOUBLE AS bin_max, MIN(v)::DOUBLE AS bin_min
FROM b GROUP BY 1, 2 ORDER BY 1, 2
"""


def _doc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-overlap pairs via MOSS-style winnowing fingerprints
    (k=5-gram hashes, window w=4): catches copied passages that
    whole-document similarity misses. The hash (md5-derived 60-bit
    bigint) and both rolling windows mirror exactly into SQL."""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.winnow_containment_pairs(docs, min_containment=0.5)


_DOC_CONTAINMENT_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
gr AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 5
              THEN [array_to_string(t[i:i+4], ' ')
                    for i in range(1, len(t) - 3)]
              ELSE [array_to_string(t, ' ')] END AS grams
  FROM tok),
hs AS (
  SELECT doc_id,
         [('0x' || substr(md5(g), 1, 15))::BIGINT for g in grams] AS h
  FROM gr),
fp AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(h) >= 4
              THEN [list_min(h[j:j+3]) for j in range(1, len(h) - 2)]
              ELSE [list_min(h)] END) AS fps
  FROM hs),
inv AS (SELECT doc_id, UNNEST(fps) AS f FROM fp),
kept AS (
  SELECT doc_id, f FROM inv
  QUALIFY COUNT(*) OVER (PARTITION BY f) <= 200),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY 1),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS shared
  FROM kept a JOIN kept b ON a.f = b.f AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT s.id_a, s.id_b, s.shared,
       ROUND(s.shared::DOUBLE / LEAST(na.n, nb.n), 6) AS containment
FROM shared s
JOIN sizes na ON na.doc_id = s.id_a
JOIN sizes nb ON nb.doc_id = s.id_b
WHERE ROUND(s.shared::DOUBLE / LEAST(na.n, nb.n), 6) >= 0.5
ORDER BY 1, 2
"""


def _multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL end-to-end PNG path: a deterministic RGB pixel pattern per doc
    -> real PNG encoding (zlib-deflated scanlines, CRC chunks) -> opaque
    binary column -> real decode (operators.multimodal.decode_png: inflate
    + scanline unfilter) -> exact integer luma stats. The oracle recomputes
    the stats from the generating formula, so a chunk/deflate/unfilter bug
    in either codec breaks the match."""
    import numpy as np
    import pandas as pd
    from pipelinedp_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                h, w = 3 + d % 4, 4 + d % 5
                i, j = np.meshgrid(np.arange(h), np.arange(w),
                                   indexing="ij")
                base = d + 3 * i + 5 * j
                rgb = np.stack([(base + 11 * c) % 256 for c in range(3)],
                               axis=-1).astype(np.uint8)
                payloads.append(MM.encode_png(rgb))
            yield pd.DataFrame({"doc_id": ids, "image": payloads})

    imgs = docs.mapInPandas(gen, "doc_id long, image binary")
    return MM.image_pixel_stats(imgs, "image").select(
        "doc_id", "px_width", "px_height", "px_sum", "px_min", "px_max")


_MULTIMODAL_PNG_SQL = """
WITH px AS (
  SELECT d.doc_id,
         (299 * ((d.doc_id + 3 * gi.i + 5 * gj.j) % 256)
          + 587 * ((d.doc_id + 3 * gi.i + 5 * gj.j + 11) % 256)
          + 114 * ((d.doc_id + 3 * gi.i + 5 * gj.j + 22) % 256)) // 1000
             AS luma
  FROM documents d,
       generate_series(0, 6) gi(i),
       generate_series(0, 8) gj(j)
  WHERE gi.i < 3 + d.doc_id % 4 AND gj.j < 4 + d.doc_id % 5)
SELECT doc_id,
       CAST(4 + doc_id % 5 AS INT) AS px_width,
       CAST(3 + doc_id % 4 AS INT) AS px_height,
       CAST(SUM(luma) AS BIGINT) AS px_sum,
       CAST(MIN(luma) AS INT) AS px_min,
       CAST(MAX(luma) AS INT) AS px_max
FROM px GROUP BY doc_id
"""


def _dp_count_join_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP star-schema query: count + privacy-id count + clipped quantity
    sum of lineitems per CUSTOMER NATION, privacy unit = customer. The
    fact table reaches the DP engine through a 3-hop join
    (lineitem -> orders -> customer -> broadcast(nation)); Catalyst
    broadcasts the dims and pushes the column pruning into all four
    scans, showing the DP pipeline composes with ordinary star-schema
    analytics. Per-contribution clip of quantity to [0, 25] binding,
    Linf/L0 non-binding, zero noise."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .select("o_custkey", "n_name", "l_quantity"))
    pub = sorted(r["n_name"] for r in n.select("n_name").collect())
    query = (pds.QueryBuilder(joined, "o_custkey")
             .groupby("n_name", max_groups_contributed=25,
                      max_contributions_per_group=1_000_000,
                      public_keys=pub)
             .count()
             .privacy_id_count()
             .sum("l_quantity", min_value=0.0, max_value=25.0,
                  name="sum_qty")
             .build_query())
    return query.run_query(pds.Budget(3.0, 1e-6), noise_mode="zero")


_DP_COUNT_JOIN_NATION_SQL = """
WITH j AS (
  SELECT o.o_custkey AS cust, n.n_name, l.l_quantity
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey),
per_user AS (
  SELECT cust, n_name, COUNT(*) AS cnt, COUNT(*) AS pid_one,
         SUM(LEAST(GREATEST(l_quantity, 0.0), 25.0)) AS s
  FROM j GROUP BY cust, n_name),
agg AS (
  SELECT n_name,
         CAST(SUM(cnt) AS DOUBLE) AS count,
         CAST(COUNT(*) AS DOUBLE) AS privacy_id_count,
         CAST(SUM(s) AS DOUBLE) AS sum_qty
  FROM per_user GROUP BY n_name)
SELECT n.n_name,
       COALESCE(agg.count, 0.0) AS count,
       COALESCE(agg.privacy_id_count, 0.0) AS privacy_id_count,
       COALESCE(agg.sum_qty, 0.0) AS sum_qty
FROM (SELECT DISTINCT n_name FROM nation) n
LEFT JOIN agg USING (n_name)
ORDER BY n.n_name
"""


def _dp_windowed_variance_events(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """DP variance of event values per (event_type, tumbling 1-day
    event-time window) — the batch mirror of
    streaming.dp_streaming_variance (same window semantics, same
    three-mechanism construction). Per-contribution clip to [0, 500]
    (non-binding: values stay inside), Linf/L0 non-binding, public
    window grid, zero noise."""
    ev = _t(spark, sf_dir, "events")
    day_us = 86_400_000_000
    ev = ev.withColumn(
        "day", F.floor(F.col("ts") / F.lit(day_us)).cast("long"))
    pub = [(r["event_type"], r["day"]) for r in
           ev.select("event_type", "day").distinct().collect()]
    query = (pds.QueryBuilder(ev, "user_id")
             .groupby(["event_type", "day"], max_groups_contributed=100,
                      max_contributions_per_group=1_000_000,
                      public_keys=pub)
             .variance("value", min_value=0.0, max_value=500.0,
                       name="var_value")
             .build_query())
    out = query.run_query(pds.Budget(3.0, 1e-6), noise_mode="zero")
    return out.select("event_type", "day",
                      F.round("var_value", 6).alias("var_value"))


_DP_WINDOWED_VARIANCE_SQL = """
WITH ev AS (
    SELECT user_id, event_type, value,
           CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
    FROM events)
SELECT event_type, day,
       ROUND(SUM(value * value) / COUNT(*)
             - (SUM(value) / COUNT(*)) ^ 2, 6) AS var_value
FROM ev GROUP BY 1, 2
ORDER BY 1, 2
"""


def _doc_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/boilerplate signals per document: the
    duplicate 5-gram character fraction (shuffle-free all-minus-distinct
    identity), the top 2-gram character fraction (word-count shape +
    per-doc argmax), and the symbol-to-word ratio."""
    from pipelinedp_spark.functions import text as TX
    from pipelinedp_spark.operators.quality import top_ngram_char_fraction
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        TX.duplicate_ngram_char_fraction(F.col("text"), 5)
        .alias("dup_5gram_frac"),
        TX.symbol_word_ratio(F.col("text")).alias("symbol_word_ratio"))
    top = top_ngram_char_fraction(docs, ns=(2,))
    return base.join(top, "doc_id")


_DOC_QUALITY_SIGNALS_SQL = """
WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t
             FROM documents),
g5 AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 5
              THEN [array_to_string(t[i:i+4], ' ')
                    for i in range(1, len(t) - 3)]
              ELSE [array_to_string(t, ' ')] END AS g
  FROM tok),
dup5 AS (
  SELECT doc_id,
         CASE WHEN list_aggregate([length(x) for x in g], 'sum') > 0
              THEN ROUND(
                (list_aggregate([length(x) for x in g], 'sum')
                 - list_aggregate([length(x) for x in list_distinct(g)],
                                  'sum'))::DOUBLE
                / list_aggregate([length(x) for x in g], 'sum'), 6)
              ELSE 0.0 END AS dup_5gram_frac
  FROM g5),
g2 AS (
  SELECT doc_id,
         UNNEST(CASE WHEN len(t) >= 2
                     THEN [t[i] || ' ' || t[i+1]
                           for i in range(1, len(t))]
                     ELSE [array_to_string(t, ' ')] END) AS g
  FROM tok),
cnt2 AS (
  SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2),
tot2 AS (
  SELECT doc_id, SUM(cnt * length(g)) AS total FROM cnt2 GROUP BY 1),
top2 AS (
  SELECT doc_id, g, cnt FROM cnt2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY cnt DESC, g ASC) = 1),
sym AS (
  SELECT doc_id,
         CASE WHEN len(t) > 0
              THEN ROUND(
                (length(text) - length(replace(text, '#', ''))
                 + len(regexp_extract_all(text, '\\.\\.\\.')))::DOUBLE
                / len(t), 6)
              ELSE 0.0 END AS symbol_word_ratio
  FROM tok)
SELECT d.doc_id, dup5.dup_5gram_frac, sym.symbol_word_ratio,
       ROUND((top2.cnt * length(top2.g))::DOUBLE / tot2.total, 6)
           AS top_2gram_frac
FROM documents d
JOIN dup5 USING (doc_id)
JOIN sym USING (doc_id)
JOIN top2 USING (doc_id)
JOIN tot2 USING (doc_id)
ORDER BY d.doc_id
"""


def _doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII hygiene end-to-end: deterministic synthetic PII (e-mail, IPv4,
    SSN derived from doc_id) is appended to each document, then counted
    and scrubbed with the engine's shared Java/RE2-compatible patterns
    (functions.text.PII_PATTERNS); the oracle re-runs the identical
    regexes in DuckDB and compares match counts + an md5 of the scrubbed
    text."""
    from pipelinedp_spark.functions import text as TX
    docs = _t(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@ex"),
        (F.col("doc_id") % 7).cast("string"), F.lit(".org from 10.0.0."),
        (F.col("doc_id") % 200).cast("string"), F.lit(" ssn 123-45-6789"))
    return docs.select(
        "doc_id",
        TX.pii_count(injected, "email").cast("long").alias("n_email"),
        TX.pii_count(injected, "ip").cast("long").alias("n_ip"),
        TX.pii_count(injected, "ssn").cast("long").alias("n_ssn"),
        F.md5(TX.scrub_pii(injected)).alias("scrub_md5"))


def _doc_pii_scrub_sql() -> str:
    from pipelinedp_spark.functions.text import PII_PATTERNS, _PII_ORDER
    scrub = "t"
    for kind in _PII_ORDER:
        pattern, repl = PII_PATTERNS[kind]
        scrub = f"regexp_replace({scrub}, '{pattern}', '{repl}', 'g')"
    email, ip, ssn = (PII_PATTERNS[k][0] for k in ("email", "ip", "ssn"))
    return f"""
WITH inj AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@ex' || (doc_id % 7)
              || '.org from 10.0.0.' || (doc_id % 200)
              || ' ssn 123-45-6789' AS t
  FROM documents)
SELECT doc_id,
       len(regexp_extract_all(t, '{email}'))::BIGINT AS n_email,
       len(regexp_extract_all(t, '{ip}'))::BIGINT AS n_ip,
       len(regexp_extract_all(t, '{ssn}'))::BIGINT AS n_ssn,
       md5({scrub}) AS scrub_md5
FROM inj ORDER BY doc_id
"""


def _bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge training on the documents corpus (iterative
    pair-count/argmax/rewrite over the word-frequency table — corpus
    touched once, per-iteration cost is vocabulary-sized). Deterministic
    tie-break, so output is stable; the oracle bakes the merge table
    produced by the INDEPENDENT pure-Python trainer
    (`_gen_bpe_train_sql`), and tests/test_bpe.py additionally pins the
    algorithm against a from-first-principles reference."""
    from pipelinedp_spark.operators.bpe import train_bpe_merges
    docs = _t(spark, sf_dir, "documents")
    merges = train_bpe_merges(docs, num_merges=20)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string")


def _bpe_word_counts_from_parquet(sf_dir: str) -> "dict[str, int]":
    """Shared trainer input for the bpe_encode query and its oracle:
    the corpus word-frequency table via DuckDB (engine-portable — Spark
    tokenization is the same split-on-space). Handles both single-file
    tables and Spark-written directory tables (the generated sf1 set)."""
    import os

    import duckdb
    path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    rows = duckdb.sql(f"""
SELECT w, COUNT(*) AS c FROM (
  SELECT unnest(string_split(text, ' ')) AS w
  FROM read_parquet('{path}'))
WHERE w <> '' GROUP BY w""").fetchall()
    return {w: c for w, c in rows}


def _bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING with a fixed merge table — the SQL-checkable half of
    the BPE pair (training is iterative, rows-only: `bpe_train_merges`).
    Merges train driver-side on the corpus word-frequency table
    (`train_bpe_merges_local`, same algorithm + tie-break as the
    distributed trainer, which tests pin against a reference impl); the
    encode itself is the Arrow-batched `apply_bpe` mapInPandas over the
    corpus. The oracle bakes per-word expected encodings computed by an
    INDEPENDENT sequential-merge encoder, so the min-rank greedy encoder
    is cross-checked end-to-end."""
    from pipelinedp_spark.operators.bpe import (apply_bpe,
                                                train_bpe_merges_local)
    merges = train_bpe_merges_local(
        _bpe_word_counts_from_parquet(sf_dir), num_merges=20)
    docs = _t(spark, sf_dir, "documents")
    enc = apply_bpe(docs.select("doc_id", "text"), merges)
    return enc.select(
        "doc_id",
        F.size("bpe_tokens").cast("long").alias("n_subwords"),
        F.md5(F.concat_ws(" ", F.col("bpe_tokens"))).alias("enc_md5"))


def _gen_bpe_encode_sql(sf_dir: str = "/root/testdata/sf0.01",
                        num_merges: int = 20) -> str:
    """Oracle for `bpe_encode`: trains the same merges from the same
    word-count table, but encodes every vocabulary word with the
    sequential-order encoder (`encode_word_sequential` — an independent
    formulation of BPE application), bakes (word -> encoding, n_subwords)
    as a VALUES table, and reassembles per-document encodings in SQL
    with an ordinality join."""
    from pipelinedp_spark.operators.bpe import (encode_word_sequential,
                                                train_bpe_merges_local)
    wc = _bpe_word_counts_from_parquet(sf_dir)
    merges = train_bpe_merges_local(wc, num_merges=num_merges)
    def q(s: str) -> str:
        return s.replace("'", "''")
    vals = ", ".join(
        f"('{q(w)}', '{q(' '.join(encode_word_sequential(w, merges)))}', "
        f"{len(encode_word_sequential(w, merges))})"
        for w in sorted(wc))
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
w AS (SELECT doc_id,
             unnest([{{'i': i, 'word': tk[i]}}
                     for i in range(1, len(tk) + 1)]) AS u
      FROM t),
pos AS (SELECT doc_id, u.i AS i, u.word AS word FROM w
        WHERE u.word <> ''),
e(word, enc, n) AS (VALUES {vals}),
j AS (SELECT pos.doc_id, pos.i, e.enc, e.n
      FROM pos JOIN e USING (word))
SELECT d.doc_id,
       COALESCE(SUM(j.n), 0)::BIGINT AS n_subwords,
       md5(COALESCE(string_agg(j.enc, ' ' ORDER BY j.i), '')) AS enc_md5
FROM documents d LEFT JOIN j ON d.doc_id = j.doc_id
GROUP BY d.doc_id
"""


def _gen_bpe_train_sql(sf_dir: str = "/root/testdata/sf0.01",
                       num_merges: int = 20) -> str:
    """Oracle for `bpe_train_merges`: the INDEPENDENT pure-Python
    sequential trainer (`train_bpe_merges_local`, Counter-based — a
    different formulation from the distributed pair-count/argmax/
    fold-rewrite loop) runs on DuckDB-derived word counts and its merge
    table is baked as a VALUES literal, upgrading the query from the
    registry's one rows-only check to full schema+hash parity."""
    from pipelinedp_spark.operators.bpe import train_bpe_merges_local
    merges = train_bpe_merges_local(
        _bpe_word_counts_from_parquet(sf_dir), num_merges=num_merges)

    def q(s: str) -> str:
        return s.replace("'", "''")
    vals = ", ".join(f"({i}, '{q(a)}', '{q(b)}')"
                     for i, (a, b) in enumerate(merges))
    return (f'SELECT CAST(rank AS INTEGER) AS rank, "left", "right" '
            f'FROM (VALUES {vals}) AS t(rank, "left", "right")')


def _sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (asymmetric distance over m=4 x 16
    codebooks). Deterministic: codebooks train on the lowest-10k-id
    sample with a fixed seed, so the oracle generator re-trains
    bit-identical codebooks with numpy, injects them as literals, and
    mirrors code assignment (argmin, idx tie-break) and the per-subspace
    dot-product-identity distances in SQL."""
    from pipelinedp_spark.operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    out = similarity.pq_topk(emb, q, k=10, m=4, ksub=16)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _gen_pq_topk_sql(m: int = 4, ksub: int = 16, k: int = 10,
                     seed: int = 7,
                     sf_dir: str = "/root/testdata/sf0.01") -> str:
    """SQL mirror of `similarity.pq_topk` for the sf0.01 oracle run:
    re-trains the same PQ codebooks from the same deterministic parquet
    sample, injects them as literals, assigns codes by per-subspace
    argmin of |v - c|^2 = v.v - 2 v.c + c.c (idx ASC tie-break), and
    sums the query's per-subspace table entries for the coded ADC
    distance."""
    import numpy as np
    import duckdb
    from pipelinedp_spark.operators.similarity import train_pq_codebooks

    sample = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"ORDER BY vec_id LIMIT 10000").fetchnumpy()["embedding"]
    x = np.stack([np.asarray(v, dtype="float64") for v in sample])
    cb = train_pq_codebooks(x, m, ksub, seed)
    sub = x.shape[1] // m
    rows = ", ".join(
        f"({j}, {i}, [{', '.join(repr(float(c)) for c in cb[j, i])}])"
        for j in range(m) for i in range(ksub))
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cb(sub, idx, c) AS (VALUES {rows}),
subs AS (SELECT DISTINCT sub FROM cb),
subv AS (
  SELECT vec_id, sub, v[sub * {sub} + 1 : (sub + 1) * {sub}] AS vs
  FROM base CROSS JOIN subs),
codes AS (
  SELECT vec_id, sub, idx FROM (
    SELECT s.vec_id, s.sub, cb.idx,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id, s.sub
             ORDER BY list_dot_product(s.vs, s.vs)
                      - 2 * list_dot_product(s.vs, cb.c)
                      + list_dot_product(cb.c, cb.c) ASC,
                      cb.idx ASC) AS rn
    FROM subv s JOIN cb ON cb.sub = s.sub) WHERE rn = 1),
tbl AS (
  SELECT q.vec_id AS query_id, s.sub, cb.idx,
         list_dot_product(s.vs, s.vs)
         - 2 * list_dot_product(s.vs, cb.c)
         + list_dot_product(cb.c, cb.c) AS d
  FROM base q
  JOIN subv s ON s.vec_id = q.vec_id
  JOIN cb ON cb.sub = s.sub
  WHERE q.vec_id < 5),
scored AS (
  SELECT t.query_id, c.vec_id, SUM(t.d) AS adist
  FROM codes c JOIN tbl t ON t.sub = c.sub AND t.idx = c.idx
  GROUP BY 1, 2),
ranked AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adist ASC, vec_id ASC) AS rank,
         adist
  FROM scored)
SELECT query_id, vec_id, rank, ROUND(adist, 6) AS adist
FROM ranked WHERE rank <= {k}
"""


def _sim_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: coarse k-means cells prune to nprobe cells per query, PQ
    codes score the survivors by asymmetric distance — the production
    ANN layout. Both quantizers deterministic (same lowest-10k-id
    sample, fixed seed); the oracle re-trains both and mirrors cell
    argmax, code argmin, and the table-sum distances in SQL."""
    from pipelinedp_spark.operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    out = similarity.ivf_pq_topk(emb, q, k=10, num_cells=8, nprobe=2,
                                 m=4, ksub=16)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _sim_ann_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search served from a PERSISTED vector index
    (`similarity.build_ann_index` + `ann_search_from_index`): the
    embeddings encode once into a codes table PARTITIONED BY cell plus
    persisted quantizer models; the search prunes the scan to the
    queries' nprobe=3 partitions and never re-encodes the corpus.
    Results are exactly `ivf_pq_topk` at the same models (k=8/nprobe=3
    distinguish the rows from sim_ivf_pq_topk's k=10/nprobe=2); the
    oracle re-trains both quantizers and replays the whole scoring in
    SQL. Store tables dropped after checkpointing."""
    from pipelinedp_spark.operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    similarity.build_ann_index(emb, "ann_idx_r9", num_cells=8, m=4,
                               ksub=16)
    out = (similarity.ann_search_from_index(q, "ann_idx_r9", k=8,
                                            nprobe=3)
           .withColumn("rank", F.col("rank").cast("long"))
           .localCheckpoint())
    for t in ("ann_idx_r9_codes", "ann_idx_r9_centroids",
              "ann_idx_r9_codebooks", "ann_idx_r9_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


def _stream_ann_store_mirror(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Batch mirror of `streaming.streaming_ann_ingest` with exact
    two-trigger semantics: the index bootstraps EMPTY with persisted
    quantizer models (trained on the standard deterministic sample);
    trigger 0 ingests embeddings with vec_id % 3 == 0, trigger 1 the
    rest — each append refreshes the model tables and encodes with the
    PERSISTED models, exactly the foreachBatch body. The post-ingest
    `ann_search_from_index` (k=6/nprobe=4 distinguish the rows from
    the sim_* siblings) must therefore equal a whole-corpus IVF-PQ
    scoring — the oracle replays it in SQL with the same retrained
    quantizer literals. Store tables dropped after checkpointing."""
    from pipelinedp_spark.operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    x = similarity.sample_corpus_matrix(emb, "vec_id", "embedding",
                                        10_000)
    cents = similarity.train_ivf_centroids(x, 8, 7)
    cb = similarity.train_pq_codebooks(x, 4, 16, 7)
    similarity.build_ann_index(emb.limit(0), "ann_idx_r10s",
                               num_cells=8, m=4, ksub=16,
                               centroids=cents, codebooks=cb)
    from pipelinedp_spark.streaming.dp_streaming import (
        ingest_ann_batch_idempotent)
    batches = (emb.filter(F.col("vec_id") % 3 == 0),
               emb.filter(F.col("vec_id") % 3 != 0))
    # the REAL foreachBatch body of streaming_ann_ingest, plus an
    # at-least-once REPLAY of trigger 1: without the ingest-log guard
    # the replay appends duplicate code rows that occupy extra top-k
    # slots (row_number ranks the copies adjacently) and the oracle
    # equality below breaks — the serve IS the idempotence proof.
    applied0 = ingest_ann_batch_idempotent(batches[0], "ann_idx_r10s", 0)
    applied1 = ingest_ann_batch_idempotent(batches[1], "ann_idx_r10s", 1)
    replayed = ingest_ann_batch_idempotent(batches[1], "ann_idx_r10s", 1)
    if not (applied0 and applied1 and not replayed):
        raise AssertionError("ann ingest-log guard broke")
    out = (similarity.ann_search_from_index(q, "ann_idx_r10s", k=6,
                                            nprobe=4)
           .withColumn("rank", F.col("rank").cast("long"))
           .localCheckpoint())
    for t in ("ann_idx_r10s_codes", "ann_idx_r10s_centroids",
              "ann_idx_r10s_codebooks", "ann_idx_r10s_meta",
              "ann_idx_r10s_ingest_log"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


def _gen_ivf_pq_topk_sql(num_cells: int = 8, nprobe: int = 2, m: int = 4,
                         ksub: int = 16, k: int = 10, seed: int = 7,
                         sf_dir: str = "/root/testdata/sf0.01",
                         corpus_where: str = "TRUE") -> str:
    """SQL mirror of `similarity.ivf_pq_topk`: both quantizers re-trained
    from the same parquet sample, centroid AND codebook literals
    injected; candidates = corpus cells joined to each query's nprobe
    cells; distances = PQ table sums (identical CTE structure to the ivf
    and pq oracles, composed)."""
    import numpy as np
    import duckdb
    from pipelinedp_spark.operators.similarity import (train_ivf_centroids,
                                                       train_pq_codebooks)

    sample = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"ORDER BY vec_id LIMIT 10000").fetchnumpy()["embedding"]
    x = np.stack([np.asarray(v, dtype="float64") for v in sample])
    cents = train_ivf_centroids(x, num_cells, seed)
    cb = train_pq_codebooks(x, m, ksub, seed)
    sub = x.shape[1] // m
    cell_rows = ", ".join(
        f"({i}, [{', '.join(repr(float(c)) for c in cents[i])}])"
        for i in range(len(cents)))
    cb_rows = ", ".join(
        f"({j}, {i}, [{', '.join(repr(float(c)) for c in cb[j, i])}])"
        for j in range(m) for i in range(ksub))
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cells(cell, cv) AS (VALUES {cell_rows}),
cb(sub, idx, c) AS (VALUES {cb_rows}),
subs AS (SELECT DISTINCT sub FROM cb),
ass AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY list_dot_product(v, cv) DESC,
                                       cell ASC) AS rn
    FROM base CROSS JOIN cells WHERE {corpus_where}) WHERE rn = 1),
qcells AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY list_dot_product(v, cv) DESC,
                                       cell ASC) AS rn
    FROM base CROSS JOIN cells WHERE vec_id < 5) WHERE rn <= {nprobe}),
subv AS (
  SELECT vec_id, sub, v[sub * {sub} + 1 : (sub + 1) * {sub}] AS vs
  FROM base CROSS JOIN subs),
codes AS (
  SELECT vec_id, sub, idx FROM (
    SELECT s.vec_id, s.sub, cb.idx,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id, s.sub
             ORDER BY list_dot_product(s.vs, s.vs)
                      - 2 * list_dot_product(s.vs, cb.c)
                      + list_dot_product(cb.c, cb.c) ASC,
                      cb.idx ASC) AS rn
    FROM subv s JOIN cb ON cb.sub = s.sub) WHERE rn = 1),
tbl AS (
  SELECT s.vec_id AS query_id, s.sub, cb.idx,
         list_dot_product(s.vs, s.vs)
         - 2 * list_dot_product(s.vs, cb.c)
         + list_dot_product(cb.c, cb.c) AS d
  FROM subv s JOIN cb ON cb.sub = s.sub
  WHERE s.vec_id < 5),
cand AS (
  SELECT q.query_id, a.vec_id
  FROM ass a JOIN qcells q USING (cell)),
scored AS (
  SELECT cand.query_id, cand.vec_id, SUM(t.d) AS adist
  FROM cand
  JOIN codes c ON c.vec_id = cand.vec_id
  JOIN tbl t ON t.query_id = cand.query_id AND t.sub = c.sub
            AND t.idx = c.idx
  GROUP BY 1, 2),
ranked AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adist ASC, vec_id ASC) AS rank,
         adist
  FROM scored)
SELECT query_id, vec_id, rank, ROUND(adist, 6) AS adist
FROM ranked WHERE rank <= {k}
"""


def _dp_variance_selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP variance under PRIVATE Laplace-thresholding partition selection
    (variance was otherwise only oracle-checked on public partitions):
    per (event_type, day) windows, the ~53.5 threshold at this budget
    keeps roughly half of the 42-67-user partitions, so the selection
    path is genuinely exercised. Zero noise; per-contribution clip to
    [0, 500] non-binding."""
    ev = _t(spark, sf_dir, "events")
    day_us = 86_400_000_000
    ev = ev.withColumn(
        "day", F.floor(F.col("ts") / F.lit(day_us)).cast("long"))
    query = (pds.QueryBuilder(ev, "user_id")
             .groupby(["event_type", "day"], max_groups_contributed=100,
                      max_contributions_per_group=1_000_000,
                      partition_selection_strategy=pds.
                      PartitionSelectionStrategy.LAPLACE_THRESHOLDING)
             .variance("value", min_value=0.0, max_value=500.0,
                       name="var_value")
             .build_query())
    out = query.run_query(pds.Budget(50.0, 1e-4), noise_mode="zero")
    return out.select("event_type", F.col("day").cast("long").alias("day"),
                      F.round("var_value", 6).alias("var_value"))


def _dp_windowed_percentile_events(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Batch mirror of streaming.dp_streaming_percentile: DP percentiles
    (50, 90) of event value per (event_type, tumbling 1-day window)
    under PRIVATE Laplace-thresholding window selection — the windowed
    analogue of dp_percentile_public, closing the streaming-percentile
    oracle gap. 256-bin histogram over [0, 500] (non-binding clip),
    zero noise."""
    ev = _t(spark, sf_dir, "events")
    day_us = 86_400_000_000
    ev = ev.withColumn(
        "day", F.floor(F.col("ts") / F.lit(day_us)).cast("long"))
    query = (pds.QueryBuilder(ev, "user_id")
             .groupby(["event_type", "day"], max_groups_contributed=100,
                      max_contributions_per_group=1_000_000,
                      partition_selection_strategy=pds.
                      PartitionSelectionStrategy.LAPLACE_THRESHOLDING)
             .percentile("value", 50, min_value=0.0, max_value=500.0)
             .percentile("value", 90, min_value=0.0, max_value=500.0)
             .build_query())
    out = query.run_query(pds.Budget(50.0, 1e-4), noise_mode="zero")
    return out.select(
        "event_type", F.col("day").cast("long").alias("day"),
        F.round(F.col("percentile_50"), 6).alias("percentile_50"),
        F.round(F.col("percentile_90"), 6).alias("percentile_90"))


def _dp_windowed_percentile_events_sql() -> str:
    threshold = _laplace_threshold_for(25.0, 1e-4, 100)
    nbins = 256
    return f"""
WITH ev AS (
    SELECT user_id, event_type, value,
           CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
    FROM events),
sel AS (
    SELECT event_type, day
    FROM ev GROUP BY 1, 2
    HAVING COUNT(DISTINCT user_id) >= {threshold}),
b AS (
  SELECT event_type, day,
         LEAST({nbins - 1},
               FLOOR(GREATEST(LEAST(value, 500.0), 0.0)
                     / (500.0/{nbins}))) AS bin,
         CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM ev JOIN sel USING (event_type, day)
  GROUP BY 1, 2, 3),
c AS (
  SELECT event_type, day, bin, cnt,
         SUM(cnt) OVER (PARTITION BY event_type, day ORDER BY bin)
             AS cum,
         SUM(cnt) OVER (PARTITION BY event_type, day) AS tot
  FROM b),
p AS (SELECT UNNEST([50.0, 90.0]) AS p),
vals AS (
  SELECT event_type, day, p.p AS p,
         MIN_BY(0.0 + (500.0/{nbins}) *
                (bin + ((p.p/100.0*tot) - (cum - cnt)) / cnt), bin)
             AS val
  FROM c, p
  WHERE cnt > 0 AND cum >= p.p/100.0*tot
  GROUP BY 1, 2, 3)
SELECT event_type, day,
       CAST(ROUND(MAX(CASE WHEN p = 50.0 THEN val END), 6) AS DOUBLE)
           AS percentile_50,
       CAST(ROUND(MAX(CASE WHEN p = 90.0 THEN val END), 6) AS DOUBLE)
           AS percentile_90
FROM vals GROUP BY 1, 2 ORDER BY 1, 2
"""


def _dp_windowed_percentile_tree_events(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """Batch mirror of streaming.dp_streaming_percentile with
    ``percentile_algorithm="tree"``: the per-(event_type, day) median of
    per-user day averages via the reference h=4/b=16 quantile tree
    (leaf resolution 16^4 over [0, 500]), zero noise — exercising the
    SAME `_streaming_percentile_tree` plan the stream runs (exact
    per-(window, leaf) counts + Arrow-batched noisy descent), with the
    batch groupBy standing in for the stateful aggregation. The oracle
    reproduces the zero-noise descent in closed form: first leaf whose
    cumulative count crosses rank = 0.5 * total, with within-leaf linear
    interpolation — the flat equivalent of the nested first-crossing
    descent."""
    from pipelinedp_spark.aggregate_params import NoiseKind
    from pipelinedp_spark.streaming.dp_streaming import (
        _streaming_percentile_tree)
    ev = _t(spark, sf_dir, "events")
    day_us = 86_400_000_000
    per_user = (ev.withColumn(
        "day", F.floor(F.col("ts") / F.lit(day_us)).cast("long"))
        .groupBy(F.col("user_id").alias("__pid__"),
                 F.struct(F.col("event_type"), F.col("day"))
                 .alias("window"))
        .agg(F.avg(F.greatest(F.least(F.col("value"), F.lit(500.0)),
                              F.lit(0.0))).alias("__uval__")))
    out = _streaming_percentile_tree(
        per_user, do_threshold=False, epsilon_per_window=1.0,
        delta_per_window=0.0, min_value=0.0, max_value=500.0,
        percentile=50.0, l0_per_window=1,
        noise_kind=NoiseKind.LAPLACE, noise_mode="zero")
    return out.select(
        F.col("window.event_type").alias("event_type"),
        F.col("window.day").cast("long").alias("day"),
        F.round(F.col("percentile_value"), 6).alias("p50_tree"),
        F.col("n_users").cast("long").alias("n_users"))


_DP_WINDOWED_PCT_TREE_SQL = """
WITH ev AS (
    SELECT user_id, event_type,
           CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
           GREATEST(LEAST(value, 500.0), 0.0) AS v
    FROM events),
ub AS (
    SELECT user_id, event_type, day, AVG(v) AS uval
    FROM ev GROUP BY 1, 2, 3),
lf AS (
    SELECT event_type, day,
           CAST(LEAST(65535, GREATEST(0,
                FLOOR(uval / (500.0 / 65536)))) AS BIGINT) AS leaf,
           CAST(COUNT(*) AS DOUBLE) AS cnt
    FROM ub GROUP BY 1, 2, 3),
c AS (
    SELECT event_type, day, leaf, cnt,
           SUM(cnt) OVER (PARTITION BY event_type, day ORDER BY leaf)
               AS cum,
           SUM(cnt) OVER (PARTITION BY event_type, day) AS tot
    FROM lf)
SELECT event_type, day,
       CAST(ROUND(MIN_BY((500.0 / 65536)
                         * (leaf + ((0.5 * tot) - (cum - cnt)) / cnt),
                         leaf), 6) AS DOUBLE) AS p50_tree,
       CAST(ANY_VALUE(tot) AS BIGINT) AS n_users
FROM c
WHERE cum >= 0.5 * tot
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _doc_gram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document 5-gram novelty (`quality.ngram_novelty`): per doc,
    the fraction of its distinct word 5-grams with corpus-wide document
    frequency 1 — the cross-doc originality signal the within-doc
    repetition rules can't see. One explode, one combinable gram-DF
    groupBy (checkpointed), one gram-keyed shuffle join."""
    from pipelinedp_spark.operators.quality import ngram_novelty
    docs = _t(spark, sf_dir, "documents")
    return ngram_novelty(docs, n=5)


_DOC_GRAM_NOVELTY_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(
             CASE WHEN len(t) >= 5
                  THEN [array_to_string(t[i:i+4], ' ')
                        for i in range(1, len(t) - 3)]
                  ELSE [array_to_string(t, ' ')] END)) AS gram
  FROM tok),
df AS (SELECT gram, COUNT(*) AS d FROM g GROUP BY 1)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       ROUND(SUM(CASE WHEN df.d = 1 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
FROM g JOIN df USING (gram)
GROUP BY 1 ORDER BY 1
"""


def _events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (user_id, ts) — the multi-column
    data-skipping layout (`functions/layout.py`): interleaved bits of
    exact-min/max-bucketized columns, pure shift/or codegen. At 100 TB
    this key drives `write_zordered` so file min/max stats prune scans
    filtering on EITHER column; here the key itself is oracle-checked
    bit-for-bit (the SQL mirror re-derives the same buckets and
    interleave)."""
    from pipelinedp_spark.functions.layout import with_zorder_key
    ev = _t(spark, sf_dir, "events")
    return (with_zorder_key(ev, ["user_id", "ts"], bits=16)
            .select("event_id", "zkey"))


def _gen_zorder_sql(bits: int = 16) -> str:
    terms = []
    for i, b in enumerate(("bu", "bt")):
        for k in range(bits):
            terms.append(f"((({b} >> {k}) & 1) << {k * 2 + i})")
    expr = " | ".join(terms)
    n = (1 << bits) - 1
    scale = float(1 << bits)
    return f"""
WITH rng AS (
  SELECT MIN(CAST(user_id AS DOUBLE)) AS lou,
         MAX(CAST(user_id AS DOUBLE)) AS hiu,
         MIN(CAST(epoch_us(ts) AS DOUBLE)) AS lot,
         MAX(CAST(epoch_us(ts) AS DOUBLE)) AS hit
  FROM events),
b AS (
  SELECT event_id,
         CASE WHEN hiu <= lou THEN 0 ELSE
           CAST(LEAST({n}, GREATEST(0,
             FLOOR((CAST(user_id AS DOUBLE) - lou) / (hiu - lou)
                   * {scale!r}))) AS BIGINT) END AS bu,
         CASE WHEN hit <= lot THEN 0 ELSE
           CAST(LEAST({n}, GREATEST(0,
             FLOOR((CAST(epoch_us(ts) AS DOUBLE) - lot) / (hit - lot)
                   * {scale!r}))) AS BIGINT) END AS bt
  FROM events, rng)
SELECT event_id, CAST({expr} AS BIGINT) AS zkey
FROM b ORDER BY event_id
"""


def _dp_trending_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP trending terms: occurrence counts per word BIGRAM with PRIVATE
    Laplace-thresholding selection over the bigram space — the release
    shape for "what phrases are trending" over a sensitive corpus: the
    document is the privacy unit, the partition key is text-derived
    (exploded bigrams, not a column), and rare bigrams (few supporting
    docs) are suppressed by DP selection rather than a public list.
    Caps (L0=120 distinct bigrams/doc, Linf=50 occurrences) are
    non-binding at every test SF, zero noise, so the oracle reproduces
    the surviving set and counts exactly."""
    docs = _t(spark, sf_dir, "documents")
    from pipelinedp_spark.functions import text as TX
    t = TX.tokens(F.col("text"))
    pairs = (docs.select(
        "doc_id",
        F.explode(F.arrays_zip(
            F.slice(t, 1, F.size(t) - 1).alias("v"),
            F.slice(t, 2, F.size(t) - 1).alias("w"))).alias("p"))
        .select("doc_id",
                F.concat_ws(" ", F.col("p.v"), F.col("p.w"))
                .alias("bigram")))
    query = (pds.QueryBuilder(pairs, "doc_id")
             .groupby("bigram", max_groups_contributed=120,
                      max_contributions_per_group=50,
                      partition_selection_strategy=pds.
                      PartitionSelectionStrategy.LAPLACE_THRESHOLDING)
             .count(name="n_occurrences")
             .build_query())
    return query.run_query(pds.Budget(100.0, 1e-4), noise_mode="zero")


def _gen_trending_bigrams_sql() -> str:
    threshold = _laplace_threshold_for(50.0, 1e-4, 120)
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
p AS (
  SELECT doc_id,
         unnest([tk[i] || ' ' || tk[i+1]
                 for i in range(1, len(tk))]) AS bigram
  FROM t),
agg AS (
  SELECT bigram, CAST(COUNT(*) AS DOUBLE) AS n_occurrences,
         COUNT(DISTINCT doc_id) AS df
  FROM p GROUP BY 1)
SELECT bigram, n_occurrences
FROM agg WHERE df >= {threshold!r}
ORDER BY bigram
"""


def _doc_vocab_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-cardinality estimate (`sampling.kmv_distinct_estimate`,
    k=256) over the corpus's word 5-grams — the deterministic, engine-
    portable sketch for sizing shuffles/broadcasts before running them.
    One row out."""
    from pipelinedp_spark.functions.sampling import kmv_distinct_estimate
    from pipelinedp_spark.functions import text as TX
    docs = _t(spark, sf_dir, "documents")
    grams = docs.select(
        F.explode(TX._word_ngrams(F.col("text"), 5)).alias("gram"))
    return kmv_distinct_estimate(grams, "gram", k=256)


_DOC_VOCAB_ESTIMATE_SQL = """
WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT unnest(CASE WHEN len(t) >= 5
                     THEN [array_to_string(t[i:i+4], ' ')
                           for i in range(1, len(t) - 3)]
                     ELSE [array_to_string(t, ' ')] END) AS gram
  FROM tok),
h AS (SELECT DISTINCT
        ('0x' || substr(md5('kmv:' || gram), 1, 15))::BIGINT
            / 1152921504606846976.0 AS h
      FROM g),
s AS (SELECT h FROM h ORDER BY h LIMIT 256)
SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
       MAX(h) AS kth_min,
       ROUND(CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE (256.0 - 1.0) / MAX(h) END, 6) AS estimate
FROM s
"""


def _doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (`sampling.weighted_sample_topk`, Efraimidis-Spirakis keys over
    md5 uniforms): 50 docs drawn proportionally to length — the
    reproducible corpus-subsetting move (no RNG state, identical across
    engines/partitionings). TakeOrderedAndProject shape."""
    from pipelinedp_spark.functions.sampling import weighted_sample_topk
    docs = _t(spark, sf_dir, "documents")
    return weighted_sample_topk(docs, "n_chars", 50, "doc_id") \
        .select("doc_id", "n_chars")


_DOC_WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, n_chars FROM documents
WHERE n_chars > 0
ORDER BY ln(('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)),
             1, 15))::BIGINT / 1152921504606846976.0)
         / CAST(n_chars AS DOUBLE) DESC,
         doc_id ASC
LIMIT 50
"""


def _doc_dup_rate_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled duplicate 8-gram mass estimate
    (`dedup.gram_dup_rate_estimate`): the pre-pass planning statistic
    for span dedup — grams Bernoulli-sampled BY VALUE (md5 bucket % 4),
    so the estimator is unbiased and the shuffle carries 1/4 of the gram
    occurrences. One row out."""
    from pipelinedp_spark.operators.dedup import gram_dup_rate_estimate
    docs = _t(spark, sf_dir, "documents")
    return gram_dup_rate_estimate(docs, n=8, sample_mod=4)


_DOC_DUP_RATE_SQL = """
WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT unnest(CASE WHEN len(t) >= 8
                     THEN [array_to_string(t[i:i+7], ' ')
                           for i in range(1, len(t) - 6)]
                     ELSE [array_to_string(t, ' ')] END) AS gram
  FROM tok),
s AS (SELECT gram FROM g
      WHERE ('0x' || substr(md5(gram), 1, 15))::BIGINT % 4 = 0),
c AS (SELECT gram, COUNT(*) AS o FROM s GROUP BY 1)
SELECT CAST(COALESCE(SUM(o), 0) AS BIGINT) AS sampled_grams,
       CAST(COUNT(*) AS BIGINT) AS distinct_grams,
       CAST(COALESCE(SUM(o - 1), 0) AS BIGINT) AS dup_occurrences,
       CASE WHEN COALESCE(SUM(o), 0) > 0
            THEN ROUND(SUM(o - 1) / CAST(SUM(o) AS DOUBLE), 6)
            ELSE 0.0 END AS dup_rate
FROM c
"""


def _doc_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style per-origin cap (`sampling.cap_per_key`): keep at
    most 15 lowest-id docs per source, bounding any one origin's corpus
    share (binding at every test SF: sources hold 25+ docs each).
    Compiles to partial+final WindowGroupLimit — map-side top-n, hot
    sources never concentrate on one task."""
    from pipelinedp_spark.functions.sampling import cap_per_key
    docs = _t(spark, sf_dir, "documents")
    return cap_per_key(docs, "source", 15, "doc_id") \
        .select("doc_id", "source")


_DOC_SOURCE_QUOTA_SQL = """
SELECT doc_id, source FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) <= 15
ORDER BY doc_id
"""


def _doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix-C style 5-gram overlap):
    docs with doc_id % 97 == 0 act as the eval set; every remaining doc
    sharing a word 5-gram with it is flagged with its occurrence count.
    Eval grams broadcast; corpus side is one explode + broadcast
    semi-join + map-side-combined per-doc count."""
    from pipelinedp_spark.operators.decontam import contamination_hits
    docs = _t(spark, sf_dir, "documents")
    evald = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return (contamination_hits(train, evald, n=3)
            .select("doc_id", F.col("n_hits").cast("long").alias("n_hits")))


_DOC_DECONTAMINATE_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
gr AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN [array_to_string(t[i:i+2], ' ')
                    for i in range(1, len(t) - 1)]
              ELSE [array_to_string(t, ' ')] END AS grams
  FROM tok),
ev AS (
  SELECT DISTINCT ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
  FROM gr, UNNEST(grams) AS u(g)
  WHERE doc_id % 97 = 0),
corpus AS (
  SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
  FROM gr, UNNEST(grams) AS u(g)
  WHERE doc_id % 97 <> 0)
SELECT corpus.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM corpus JOIN ev USING (h)
GROUP BY 1 ORDER BY 1
"""


def _doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style pretraining layout):
    documents concatenated in doc_id order, chunked into 2048-token
    sequences; each doc's placement (start sequence, in-sequence offset,
    sequences spanned) via the distributed two-phase prefix sum — no
    corpus-wide single-task window."""
    from pipelinedp_spark.operators.packing import pack_sequences
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return (pack_sequences(docs, seq_len=2048)
            .select("doc_id", "n_tokens", "start_seq", "start_off",
                    "n_seqs"))


_DOC_PACK_SQL = """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents),
c AS (
  SELECT doc_id, n,
         SUM(n) OVER (ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT doc_id,
       n AS n_tokens,
       CAST((cum - n) // 2048 AS BIGINT) AS start_seq,
       CAST((cum - n) % 2048 AS BIGINT) AS start_off,
       CAST(CASE WHEN n = 0 THEN 0
                 ELSE (cum - 1) // 2048 - (cum - n) // 2048 + 1
            END AS BIGINT) AS n_seqs
FROM c ORDER BY doc_id
"""


def _dp_variance_selected_sql() -> str:
    threshold = _laplace_threshold_for(25.0, 1e-4, 100)
    return f"""
WITH ev AS (
    SELECT user_id, event_type, value,
           CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
    FROM events),
agg AS (
    SELECT event_type, day,
           COUNT(DISTINCT user_id) AS n_users,
           SUM(POW(GREATEST(LEAST(value, 500.0), 0.0) - 250.0, 2))
               / GREATEST(1.0, COUNT(*))
           - POW(SUM(GREATEST(LEAST(value, 500.0), 0.0) - 250.0)
                 / GREATEST(1.0, COUNT(*)), 2) AS var_raw
    FROM ev GROUP BY 1, 2)
SELECT event_type, day, ROUND(var_raw, 6) AS var_value
FROM agg WHERE n_users >= {threshold}
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Round-5 batch 2: semantic dedup, span dedup, LM-quality, retrieval,
# importance weighting — LLM-pipeline ops with exact SQL oracles.
# ---------------------------------------------------------------------------


def _emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means cells + within-cell
    keep-first cosine pruning. Deterministic: quantizer trains on the
    lowest-10k-id sample with a fixed seed, so the oracle generator
    re-trains bit-identical centroids and mirrors cell assignment and
    the earlier-id pruning rule in SQL."""
    from pipelinedp_spark.operators import semdedup
    emb = _t(spark, sf_dir, "embeddings")
    return semdedup.semantic_dedup(emb, num_clusters=8,
                                   cosine_threshold=0.4)


def _gen_semantic_dedup_sql(num_clusters: int = 8, tau: float = 0.4,
                            seed: int = 7,
                            sf_dir: str = "/root/testdata/sf0.01") -> str:
    """SQL mirror of `semdedup.semantic_dedup`: same centroids (shared
    `train_ivf_centroids` on the same deterministic sample), argmax cell
    via row_number (dot DESC, cell ASC — numpy argmax-first-max), dup
    rule = EXISTS earlier-id same-cell member with round(cos, 6) >= tau."""
    import numpy as np
    import pyarrow.parquet as pq
    from pipelinedp_spark.operators.similarity import train_ivf_centroids
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    t = t.sort_values("vec_id").head(10_000)
    x = np.stack(t["embedding"].to_numpy()).astype("float64")
    cents = train_ivf_centroids(x, num_clusters, seed)
    cell_rows = ", ".join(f"({c}, {_plane_lit(cents[c])})"
                          for c in range(len(cents)))
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cells(cell, cv) AS (VALUES {cell_rows}),
ass AS (
  SELECT vec_id, v, cell FROM (
    SELECT vec_id, v, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY list_dot_product(v, cv) DESC,
                                       cell ASC) AS rn
    FROM base CROSS JOIN cells) WHERE rn = 1),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM ass a JOIN ass b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 6) >= {tau})
SELECT a.vec_id, a.cell, (d.vec_id IS NOT NULL) AS is_dup
FROM ass a LEFT JOIN dups d USING (vec_id)
"""


def _stream_semdedup_mirror(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Batch mirror of `streaming.semantic_dedup_batch` with exact
    two-trigger semantics (same harness as the line/sentence/near-dup
    mirrors): batch 0 = even vec_ids deduped among themselves, batch 1 =
    odd vec_ids checked against batch 0's KEPT state then among
    themselves by the earlier-id rule. Quantizer trained once on the
    lowest-10k-id sample of the full table (the operator's required
    fixed-centroids contract), identical to the oracle generator's."""
    from pipelinedp_spark.operators.similarity import (
        sample_corpus_matrix, train_ivf_centroids)
    from pipelinedp_spark.streaming.dp_streaming import (
        semantic_dedup_batch)
    emb = _t(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(
        sample_corpus_matrix(emb, "vec_id", "embedding", 10_000), 8, 7)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    f1, s1 = semantic_dedup_batch(even, None, cents,
                                  cosine_threshold=0.4,
                                  materialize=True)
    f2, _ = semantic_dedup_batch(odd, s1, cents, cosine_threshold=0.4)
    return (f1.withColumn("batch", F.lit(0).cast("long"))
            .unionByName(f2.withColumn("batch",
                                       F.lit(1).cast("long"))))


def _gen_stream_semdedup_sql(num_clusters: int = 8, tau: float = 0.4,
                             seed: int = 7,
                             sf_dir: str = "/root/testdata/sf0.01") -> str:
    """SQL mirror of `_stream_semdedup_mirror`: same baked centroids as
    `_gen_semantic_dedup_sql`; batch-0 dups by the earlier-id rule among
    evens, kept evens form the state, batch-1 dups = cosine hit against
    any kept even OR an earlier odd."""
    import numpy as np
    import pyarrow.parquet as pq
    from pipelinedp_spark.operators.similarity import train_ivf_centroids
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    t = t.sort_values("vec_id").head(10_000)
    x = np.stack(t["embedding"].to_numpy()).astype("float64")
    cents = train_ivf_centroids(x, num_clusters, seed)
    cell_rows = ", ".join(f"({c}, {_plane_lit(cents[c])})"
                          for c in range(len(cents)))
    cos = ("ROUND(list_dot_product(a.v, b.v) / "
           "(sqrt(list_dot_product(a.v, a.v)) "
           "* sqrt(list_dot_product(b.v, b.v))), 6)")
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cells(cell, cv) AS (VALUES {cell_rows}),
ass AS (
  SELECT vec_id, v, cell FROM (
    SELECT vec_id, v, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY list_dot_product(v, cv) DESC,
                                       cell ASC) AS rn
    FROM base CROSS JOIN cells) WHERE rn = 1),
d0 AS (
  SELECT DISTINCT b.vec_id
  FROM ass a JOIN ass b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 0 AND {cos} >= {tau}),
k0 AS (
  SELECT a.* FROM ass a
  WHERE a.vec_id % 2 = 0
    AND a.vec_id NOT IN (SELECT vec_id FROM d0)),
d1 AS (
  SELECT DISTINCT b.vec_id
  FROM k0 a JOIN ass b ON a.cell = b.cell
  WHERE b.vec_id % 2 = 1 AND {cos} >= {tau}
  UNION
  SELECT DISTINCT b.vec_id
  FROM ass a JOIN ass b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE a.vec_id % 2 = 1 AND b.vec_id % 2 = 1 AND {cos} >= {tau})
SELECT a.vec_id, a.cell,
       CASE WHEN a.vec_id % 2 = 0 THEN (d0.vec_id IS NOT NULL)
            ELSE (d1.vec_id IS NOT NULL) END AS is_dup,
       a.vec_id % 2 AS batch
FROM ass a
LEFT JOIN d0 ON a.vec_id = d0.vec_id
LEFT JOIN d1 ON a.vec_id = d1.vec_id
"""


_PII_PLANT = (
    " contact user@example-site.org now",      # email    (%5 == 0)
    " card 4532015112830366 on file",          # Luhn-valid card (%7==3)
    " card 1234567890123456 rejected",         # Luhn-invalid card (%7==4)
    " ssn 987-65-4320 via 10.0.0.77",          # ssn + ip (%9 == 1)
    " call 555-867-5309 today",                # phone    (%6 == 2)
)


def _doc_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII audit + scrub (`functions.pii.pii_report`): detection counts
    per type (credit cards Luhn-verified in pure integer codegen),
    plus the placeholder-redacted text — the standard pre-release
    corpus scrub. Deterministic PII of every type is planted by doc_id
    residue so all detector branches and the redaction order are
    exercised; patterns are the Java-regex/RE2 common subset so the
    DuckDB mirror runs them VERBATIM. Map-only stage: no shuffle."""
    from pipelinedp_spark.functions.pii import pii_report
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0,
                   F.lit(_PII_PLANT[0])).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 3,
                   F.lit(_PII_PLANT[1])).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 4,
                   F.lit(_PII_PLANT[2])).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 9 == 1,
                   F.lit(_PII_PLANT[3])).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 6 == 2,
                   F.lit(_PII_PLANT[4])).otherwise(F.lit("")),
        ).alias("text"))
    rep = pii_report(planted)
    return rep.select(
        "doc_id", "n_email", "n_card", "n_ssn", "n_phone", "n_ipv4",
        "n_card_luhn", "any_pii",
        F.md5(F.col("clean_text")).alias("clean_md5"))


def _gen_pii_audit_sql() -> str:
    """SQL mirror of `_doc_pii_audit`: identical patterns (verbatim —
    both engines treat the single-quoted pattern literally), identical
    redaction order, and the same 0-based-odd Luhn double expressed
    1-based. Static SQL, smokeable at any sf."""
    from pipelinedp_spark.functions.pii import PII_PATTERNS
    pats = {name: pat for name, pat, _ in PII_PATTERNS}
    repl = ""
    inner = "text"
    for name, pat, placeholder in PII_PATTERNS:
        inner = (f"regexp_replace({inner}, '{pat}', "
                 f"'{placeholder}', 'g')")
    repl = inner
    plant = _PII_PLANT
    return f"""
WITH base AS (
  SELECT doc_id,
         documents.text
         || CASE WHEN doc_id % 5 = 0 THEN '{plant[0]}' ELSE '' END
         || CASE WHEN doc_id % 7 = 3 THEN '{plant[1]}' ELSE '' END
         || CASE WHEN doc_id % 7 = 4 THEN '{plant[2]}' ELSE '' END
         || CASE WHEN doc_id % 9 = 1 THEN '{plant[3]}' ELSE '' END
         || CASE WHEN doc_id % 6 = 2 THEN '{plant[4]}' ELSE '' END
             AS text
  FROM documents),
cards AS (
  SELECT doc_id,
         [x::INT for x in regexp_extract_all(reverse(c), '[0-9]')] AS dl
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '{pats["card"]}'))
               AS c
        FROM base)),
luhn AS (
  SELECT doc_id,
         COUNT(*) FILTER (WHERE
           list_sum([CASE WHEN i % 2 = 0
                          THEN CASE WHEN dl[i] * 2 > 9
                                    THEN dl[i] * 2 - 9
                                    ELSE dl[i] * 2 END
                          ELSE dl[i] END
                     for i in range(1, len(dl) + 1)]) % 10 = 0)
             AS n_luhn
  FROM cards GROUP BY doc_id)
SELECT b.doc_id,
       CAST(len(regexp_extract_all(text, '{pats["email"]}')) AS INT)
           AS n_email,
       CAST(len(regexp_extract_all(text, '{pats["card"]}')) AS INT)
           AS n_card,
       CAST(len(regexp_extract_all(text, '{pats["ssn"]}')) AS INT)
           AS n_ssn,
       CAST(len(regexp_extract_all(text, '{pats["phone"]}')) AS INT)
           AS n_phone,
       CAST(len(regexp_extract_all(text, '{pats["ipv4"]}')) AS INT)
           AS n_ipv4,
       CAST(COALESCE(l.n_luhn, 0) AS INT) AS n_card_luhn,
       (len(regexp_extract_all(text, '{pats["email"]}')) > 0
        OR len(regexp_extract_all(text, '{pats["card"]}')) > 0
        OR len(regexp_extract_all(text, '{pats["ssn"]}')) > 0
        OR len(regexp_extract_all(text, '{pats["phone"]}')) > 0
        OR len(regexp_extract_all(text, '{pats["ipv4"]}')) > 0)
           AS any_pii,
       md5({repl}) AS clean_md5
FROM base b LEFT JOIN luhn l USING (doc_id)
"""


def _doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated k-token span cut ranges (keep the
    globally-first occurrence; overlapping windows merged)."""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.duplicate_spans(docs, k=8)


_DOC_DUP_SPANS_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
e AS (SELECT doc_id,
             unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS i,
             toks
      FROM t WHERE len(toks) >= 8),
g AS (SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(toks[i:i+7], ' ')) AS h
      FROM e),
dups AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY h
                              ORDER BY doc_id, pos) AS rn
    FROM g) WHERE rn > 1),
iv AS (SELECT doc_id, pos AS start, pos + 8 AS "end" FROM dups),
m AS (
  SELECT doc_id, start, "end",
         MAX("end") OVER (PARTITION BY doc_id ORDER BY start
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_end
  FROM iv),
grps AS (
  SELECT doc_id, start, "end",
         SUM(CASE WHEN prev_end IS NULL OR start > prev_end
                  THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY start
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS grp
  FROM m)
SELECT doc_id,
       CAST(MIN(start) AS BIGINT) AS span_start,
       CAST(MAX("end") AS BIGINT) AS span_end
FROM grps GROUP BY doc_id, grp
"""


# Planted boilerplate for doc_duplicate_spans_exact: three duplicated
# runs of varying length and token shape. S1 is a 13-token sentence
# (the token-window pass sees it too); S2 and S3 are single-token
# runs (a tracking URL and a hyphenated notice) that a k-TOKEN window
# pass is structurally blind to — only the character-level exact pass
# cuts them.
_SPAN_S1 = ("Subscribe to our newsletter for weekly updates and "
            "exclusive member-only offers today.")
_SPAN_S2 = ("https://cdn.example.com/t.gif?id=AAAABBBBCCCCDDDDEEEE"
            "FFFF0000111122223333&campaign=footer")
_SPAN_S3 = "COPYRIGHT-2026-ALL-RIGHTS-RESERVED-DO-NOT-REDISTRIBUTE!"


def _doc_duplicate_spans_exact(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TRUE ExactSubstr duplicated-span cut ranges (Lee et al.,
    arXiv:2107.06499) at CHARACTER granularity via the sorted-suffix
    join (`dedup.duplicate_spans_exact`): seed-gram prefilter, verify
    only candidates, keep the globally-first occurrence, merge
    overlapping windows. Boilerplate of three shapes is planted so the
    oracle exercises cross-doc, within-doc, and single-token repeats —
    the last being spans the fixed-k token pass cannot see."""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0,
                   F.lit(" " + _SPAN_S1)).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0,
                   F.lit(" " + _SPAN_S2)).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0,
                   F.lit(" " + _SPAN_S3 + " and then once more "
                         + _SPAN_S3)).otherwise(F.lit("")),
        ).alias("text"))
    return dedup.duplicate_spans_exact(planted, min_len=48)


_DOC_DUP_SPANS_EXACT_SQL = f"""
WITH base AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0 THEN ' {_SPAN_S1}' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' {_SPAN_S2}' ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' {_SPAN_S3} and then once more {_SPAN_S3}'
                 ELSE '' END AS t
  FROM documents),
pos AS (
  SELECT doc_id, unnest(range(0, length(t) - 48 + 1)) AS p, t
  FROM base WHERE length(t) >= 48),
h AS (
  SELECT doc_id, CAST(p AS BIGINT) AS p,
         md5(substr(t, CAST(p AS INTEGER) + 1, 48)) AS h
  FROM pos),
firsts AS (
  SELECT h, COUNT(*) AS n,
         MIN(doc_id * 1073741824 + p) AS fk
  FROM h GROUP BY h),
dups AS (
  SELECT doc_id, p FROM h JOIN firsts USING (h)
  WHERE n >= 2 AND doc_id * 1073741824 + p <> fk),
iv AS (SELECT doc_id, p AS start, p + 48 AS "end" FROM dups),
m AS (
  SELECT doc_id, start, "end",
         MAX("end") OVER (PARTITION BY doc_id ORDER BY start
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_end
  FROM iv),
grps AS (
  SELECT doc_id, start, "end",
         SUM(CASE WHEN prev_end IS NULL OR start > prev_end
                  THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY start
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS grp
  FROM m)
SELECT doc_id,
       CAST(MIN(start) AS BIGINT) AS span_start,
       CAST(MAX("end") AS BIGINT) AS span_end
FROM grps GROUP BY doc_id, grp
"""


_DECON_BENCH = ("Which river is the longest river flowing entirely "
                "within the national borders, and why does it matter?")


def _doc_decontaminate_spans(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Span-level eval-set decontamination
    (`dedup.cross_corpus_spans` + `dedup.cut_spans`): the benchmark
    corpus is every doc with doc_id % 17 == 5 plus a fixed question
    string; training docs with doc_id % 23 == 2 get that question
    planted (a cross-corpus hit the cut must remove), and benchmark
    members themselves appear verbatim in training (fully cut — the
    leaked-benchmark case). Cuts are surgical character ranges, not
    whole-document drops. Returns (doc_id, clean_md5, n_spans,
    n_cut_chars)."""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    train = docs.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.when(F.col("doc_id") % 23 == 2,
                        F.lit(" " + _DECON_BENCH)).otherwise(F.lit("")))
        .alias("text"))
    ref = (docs.filter(F.col("doc_id") % 17 == 5)
           .select("doc_id",
                   F.concat(F.col("text"), F.lit(" " + _DECON_BENCH))
                   .alias("text")))
    spans = dedup.cross_corpus_spans(train, ref, min_len=48)
    out = dedup.cut_spans(train, spans)
    return out.select("doc_id",
                      F.md5(F.col("clean_text")).alias("clean_md5"),
                      "n_spans", "n_cut_chars")


_DOC_DECON_SPANS_SQL = f"""
WITH train AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 23 = 2 THEN ' {_DECON_BENCH}'
                      ELSE '' END AS t
  FROM documents),
ref AS (
  SELECT text || ' {_DECON_BENCH}' AS t
  FROM documents WHERE doc_id % 17 = 5),
dh AS (
  SELECT doc_id, CAST(p AS BIGINT) AS p,
         md5(substr(t, CAST(p AS INTEGER) + 1, 48)) AS h
  FROM (SELECT doc_id, unnest(range(0, length(t) - 48 + 1)) AS p, t
        FROM train WHERE length(t) >= 48)),
rh AS (
  SELECT DISTINCT md5(substr(t, CAST(p AS INTEGER) + 1, 48)) AS h
  FROM (SELECT unnest(range(0, length(t) - 48 + 1)) AS p, t
        FROM ref WHERE length(t) >= 48)),
marked AS (SELECT doc_id, p FROM dh JOIN rh USING (h)),
iv AS (SELECT doc_id, p AS start, p + 48 AS "end" FROM marked),
m AS (
  SELECT doc_id, start, "end",
         MAX("end") OVER (PARTITION BY doc_id ORDER BY start
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_end
  FROM iv),
grps AS (
  SELECT doc_id, start, "end",
         SUM(CASE WHEN prev_end IS NULL OR start > prev_end
                  THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY start
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS grp
  FROM m),
spans AS (
  SELECT doc_id, MIN(start) AS s, MAX("end") AS e
  FROM grps GROUP BY doc_id, grp),
packed AS (
  SELECT doc_id,
         list({{'s': s, 'e': e}} ORDER BY s) AS sp
  FROM spans GROUP BY doc_id),
cutdoc AS (
  SELECT t.doc_id, t.t, COALESCE(p.sp, []) AS sp
  FROM train t LEFT JOIN packed p USING (doc_id)),
gaps AS (
  SELECT doc_id, t,
         list_prepend(CAST(0 AS BIGINT), [x.e for x in sp]) AS gs,
         list_append([x.s for x in sp], CAST(length(t) AS BIGINT))
             AS ge,
         sp
  FROM cutdoc)
SELECT doc_id,
       md5(array_to_string(
         [substr(t, CAST(gs[i] AS INTEGER) + 1,
                 CAST(ge[i] - gs[i] AS INTEGER))
          for i in range(1, len(gs) + 1)], '')) AS clean_md5,
       CAST(len(sp) AS BIGINT) AS n_spans,
       CAST(COALESCE(list_sum([x.e - x.s for x in sp]), 0) AS BIGINT)
           AS n_cut_chars
FROM gaps
"""


def _doc_decontam_incremental(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Span decontamination against a PERSISTED reference index
    (`dedup.build_span_store` + `incremental_decontaminate_spans`):
    the benchmark corpus (docs with doc_id % 19 == 7 plus the fixed
    question string) is indexed ONCE as bucketed winnowing anchors +
    bucketed text; the training batch (docs % 29 == 3 get the question
    planted) is span-cut against it with zero store-side shuffle and
    no reference fingerprint recompute. Result semantics identical to
    `cross_corpus_spans` (the oracle recomputes ground truth from
    scratch). Store tables are dropped after checkpointing the
    result."""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    train = docs.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.when(F.col("doc_id") % 29 == 3,
                        F.lit(" " + _DECON_BENCH)).otherwise(F.lit("")))
        .alias("text"))
    ref = (docs.filter(F.col("doc_id") % 19 == 7)
           .select("doc_id",
                   F.concat(F.col("text"), F.lit(" " + _DECON_BENCH))
                   .alias("text")))
    dedup.build_span_store(ref, "decon_store_r9", min_len=48)
    spans = dedup.incremental_decontaminate_spans(train,
                                                  "decon_store_r9")
    out = (dedup.cut_spans(train, spans)
           .select("doc_id", F.md5(F.col("clean_text")).alias("clean_md5"),
                   "n_spans", "n_cut_chars").localCheckpoint())
    for t in ("decon_store_r9_anchors", "decon_store_r9_texts",
              "decon_store_r9_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


_DOC_DECONTAM_INCR_SQL = f"""
WITH train AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 29 = 3 THEN ' {_DECON_BENCH}'
                      ELSE '' END AS t
  FROM documents),
ref AS (
  SELECT text || ' {_DECON_BENCH}' AS t
  FROM documents WHERE doc_id % 19 = 7),
dh AS (
  SELECT doc_id, CAST(p AS BIGINT) AS p,
         md5(substr(t, CAST(p AS INTEGER) + 1, 48)) AS h
  FROM (SELECT doc_id, unnest(range(0, length(t) - 48 + 1)) AS p, t
        FROM train WHERE length(t) >= 48)),
rh AS (
  SELECT DISTINCT md5(substr(t, CAST(p AS INTEGER) + 1, 48)) AS h
  FROM (SELECT unnest(range(0, length(t) - 48 + 1)) AS p, t
        FROM ref WHERE length(t) >= 48)),
marked AS (SELECT doc_id, p FROM dh JOIN rh USING (h)),
iv AS (SELECT doc_id, p AS start, p + 48 AS "end" FROM marked),
m AS (
  SELECT doc_id, start, "end",
         MAX("end") OVER (PARTITION BY doc_id ORDER BY start
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_end
  FROM iv),
grps AS (
  SELECT doc_id, start, "end",
         SUM(CASE WHEN prev_end IS NULL OR start > prev_end
                  THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY start
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS grp
  FROM m),
spans AS (
  SELECT doc_id, MIN(start) AS s, MAX("end") AS e
  FROM grps GROUP BY doc_id, grp),
packed AS (
  SELECT doc_id,
         list({{'s': s, 'e': e}} ORDER BY s) AS sp
  FROM spans GROUP BY doc_id),
cutdoc AS (
  SELECT t.doc_id, t.t, COALESCE(p.sp, []) AS sp
  FROM train t LEFT JOIN packed p USING (doc_id)),
gaps AS (
  SELECT doc_id, t,
         list_prepend(CAST(0 AS BIGINT), [x.e for x in sp]) AS gs,
         list_append([x.s for x in sp], CAST(length(t) AS BIGINT))
             AS ge,
         sp
  FROM cutdoc)
SELECT doc_id,
       md5(array_to_string(
         [substr(t, CAST(gs[i] AS INTEGER) + 1,
                 CAST(ge[i] - gs[i] AS INTEGER))
          for i in range(1, len(gs) + 1)], '')) AS clean_md5,
       CAST(len(sp) AS BIGINT) AS n_spans,
       CAST(COALESCE(list_sum([x.e - x.s for x in sp]), 0) AS BIGINT)
           AS n_cut_chars
FROM gaps
"""


def _doc_unigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc perplexity under a corpus-fit unigram LM (CCNet-style
    quality signal, exact-SQL-expressible unigram variant)."""
    from pipelinedp_spark.operators import quality
    docs = _t(spark, sf_dir, "documents")
    return quality.unigram_perplexity(docs)


def _gen_unigram_ppl_sql(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """SQL mirror of `quality.unigram_perplexity`. ln(N) is computed once
    in Python and injected as a literal into BOTH sides (the Spark op
    does the same), so the only cross-engine drift is last-ulp libm ln
    per token under a 6dp round."""
    import math
    import duckdb
    n = duckdb.sql(
        f"SELECT SUM(len(string_split(text, ' ')))"
        f" FROM read_parquet('{sf_dir}/documents.parquet')").fetchone()[0]
    ln_n = repr(math.log(float(n)))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
vocab AS (
  SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c FROM toks GROUP BY tok)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(EXP({ln_n} - SUM(LN(v.c)) / COUNT(*)), 6) AS ppl
FROM toks t JOIN vocab v USING (tok)
GROUP BY t.doc_id
"""


_BM25_QUERIES = [(0, "hash join merge"),
                 (1, "scan filter column"),
                 (2, "stream window batch"),
                 (3, "customer order query value")]


def _doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 docs per query over the documents corpus (inverted-
    index postings join; broadcast query terms)."""
    from pipelinedp_spark.operators import retrieval
    docs = _t(spark, sf_dir, "documents")
    vals = ", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)
    q = spark.sql(f"SELECT * FROM VALUES {vals} AS t(query_id, query_text)")
    return retrieval.bm25_topk(docs, q, k=10)


def _gen_bm25_sql(k: int = 10, sf_dir: str = "/root/testdata/sf0.01",
                  where: str = "TRUE") -> str:
    """SQL mirror of `retrieval.bm25_topk`: N and avgdl are computed once
    in Python from the parquet (exactly as the operator computes them)
    and injected as literals; the score expression mirrors the Column
    arithmetic term-for-term (same association, same Python-folded
    constants for k1=1.2, b=0.75). ``where`` restricts the corpus (the
    takedown oracle scores `documents WHERE <where>`)."""
    import duckdb
    n, tot = duckdb.sql(
        f"SELECT COUNT(*), SUM(len(string_split(text, ' ')))"
        f" FROM read_parquet('{sf_dir}/documents.parquet')"
        f" WHERE {where}").fetchone()
    avgdl = repr(float(tot) / float(n))
    vals = ", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)
    return f"""
WITH q(query_id, query_text) AS (VALUES {vals}),
qterms AS (
  SELECT query_id,
         unnest(list_distinct(string_split(query_text, ' '))) AS term
  FROM q),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         FROM documents WHERE {where}),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
post AS (
  SELECT qt.query_id, tf.doc_id, tf.tf, dft.df, dl.dl
  FROM tf JOIN qterms qt USING (term)
          JOIN dft USING (term)
          JOIN dl USING (doc_id)),
scored AS (
  SELECT query_id, doc_id,
         SUM(LN(1.0 + ({float(n)} - df + 0.5) / (df + 0.5))
             * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / {avgdl}))))
             AS score
  FROM post GROUP BY 1, 2)
SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank,
       ROUND(score, 6) AS score
FROM (SELECT query_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id ASC) AS rank,
             score
      FROM scored)
WHERE rank <= {k}
"""


def _doc_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion
    (`retrieval.rrf_fuse`): BM25 top-20 (lexical) and exact-cosine
    top-20 over the embeddings (dense, query vector = the query's own
    embedding row) fused with the standard 1/(60+rank) rule, final
    top-10 per query. The fusion itself touches only the two tiny rank
    tables — one union + one combinable groupBy + WindowGroupLimit."""
    from pipelinedp_spark.operators import retrieval, similarity
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    vals = ", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)
    q = spark.sql(f"SELECT * FROM VALUES {vals} AS t(query_id, query_text)")
    lex = retrieval.bm25_topk(docs, q, k=20) \
        .select("query_id", "doc_id", "rank")
    qv = (emb.filter(F.col("vec_id") < len(_BM25_QUERIES))
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("query_vec")))
    dense = (similarity.cosine_topk(emb, qv, k=20)
             .select("query_id", F.col("vec_id").alias("doc_id"),
                     "rank"))
    return retrieval.rrf_fuse([lex, dense], k=10)


def _doc_bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from a PERSISTED inverted index
    (`retrieval.build_bm25_index` + `bm25_topk_from_index`): the corpus
    tokenizes once at build into bucketed postings/terms tables; the
    query joins them with zero Exchange on the index side and cost
    proportional to the touched postings. k=15 distinguishes the
    result set from `doc_bm25_topk`'s k=10; the oracle is the same
    proven BM25 SQL at k=15. Store tables are dropped after
    checkpointing."""
    from pipelinedp_spark.operators import retrieval
    docs = _t(spark, sf_dir, "documents")
    vals = ", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)
    q = spark.sql(f"SELECT * FROM VALUES {vals} AS t(query_id, query_text)")
    retrieval.build_bm25_index(docs, "bm25_idx_r9")
    out = retrieval.bm25_topk_from_index(q, "bm25_idx_r9", k=15) \
        .localCheckpoint()
    for t in ("bm25_idx_r9_postings", "bm25_idx_r9_terms",
              "bm25_idx_r9_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


def _doc_bm25_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 index APPEND mode (`build_bm25_index(mode='append')`): the
    index is built from the even-doc_id half of the corpus, the odd
    half is appended — postings and df segments land bucket-aligned
    (cost proportional to the increment) and the n_docs/total_dl/avgdl
    scalars refresh exactly, so the served scores are bit-identical to
    a build-once index over the whole corpus. The oracle is therefore
    the same proven whole-corpus BM25 SQL, at k=12 to distinguish the
    result set from the k=10/k=15 siblings."""
    from pipelinedp_spark.operators import retrieval
    docs = _t(spark, sf_dir, "documents")
    vals = ", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)
    q = spark.sql(f"SELECT * FROM VALUES {vals} AS t(query_id, query_text)")
    retrieval.build_bm25_index(docs.filter(F.col("doc_id") % 2 == 0),
                               "bm25_idx_r10a")
    retrieval.build_bm25_index(docs.filter(F.col("doc_id") % 2 == 1),
                               "bm25_idx_r10a", mode="append")
    out = retrieval.bm25_topk_from_index(q, "bm25_idx_r10a", k=12) \
        .localCheckpoint()
    for t in ("bm25_idx_r10a_postings", "bm25_idx_r10a_terms",
              "bm25_idx_r10a_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


def _doc_bm25_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten on the persisted BM25 index
    (`retrieval.remove_from_bm25_index`): build over the whole corpus,
    logically remove every doc_id % 5 == 0 (tombstones + negative df
    segments + exact scalar corrections — O(removed), no rebuild), and
    serve at k=13. The oracle scores `documents WHERE doc_id % 5 <> 0`
    from scratch — equality proves the takedown is exact, not
    approximate. Store tables dropped after checkpointing."""
    from pipelinedp_spark.operators import retrieval
    docs = _t(spark, sf_dir, "documents")
    vals = ", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)
    q = spark.sql(f"SELECT * FROM VALUES {vals} AS t(query_id, query_text)")
    retrieval.build_bm25_index(docs, "bm25_idx_r10tk")
    retrieval.remove_from_bm25_index(
        docs.filter(F.col("doc_id") % 5 == 0), "bm25_idx_r10tk")
    out = retrieval.bm25_topk_from_index(q, "bm25_idx_r10tk", k=13) \
        .localCheckpoint()
    for t in ("bm25_idx_r10tk_postings", "bm25_idx_r10tk_terms",
              "bm25_idx_r10tk_meta", "bm25_idx_r10tk_tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


def _sim_ann_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown on the persisted IVF-PQ index
    (`similarity.remove_from_ann_index`): build over all embeddings
    with the standard deterministic models, logically remove every
    vec_id % 4 == 0 (tombstones, O(removed), no rebuild or
    retraining), and search k=7/nprobe=3. The oracle replays IVF-PQ in
    SQL over the corpus WHERE vec_id % 4 <> 0 with the same retrained
    quantizer literals — equality proves removed vectors are exactly
    invisible. Store tables dropped after checkpointing."""
    from pipelinedp_spark.operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    similarity.build_ann_index(emb, "ann_idx_r10tk", num_cells=8, m=4,
                               ksub=16)
    similarity.remove_from_ann_index(
        emb.filter(F.col("vec_id") % 4 == 0), "ann_idx_r10tk")
    out = (similarity.ann_search_from_index(q, "ann_idx_r10tk", k=7,
                                            nprobe=3)
           .withColumn("rank", F.col("rank").cast("long"))
           .localCheckpoint())
    for t in ("ann_idx_r10tk_codes", "ann_idx_r10tk_centroids",
              "ann_idx_r10tk_codebooks", "ann_idx_r10tk_meta",
              "ann_idx_r10tk_tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


def _stream_bm25_store_mirror(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Batch mirror of `streaming.streaming_bm25_ingest` with exact
    two-trigger-plus-replay semantics: the index bootstraps EMPTY;
    trigger 0 appends docs with doc_id % 3 == 0, trigger 1 the rest,
    then trigger 1 REPLAYS (at-least-once delivery) and must be
    suppressed by the ingest-log batch-id guard — BM25 appends, unlike
    the anti-join stores, double-count tf/df/scalars on replay, so the
    oracle equality below is itself the idempotence proof. Serving at
    k=9 (distinguishing the rows from the k=10/12/15 siblings) must
    equal the whole-corpus BM25 SQL."""
    from pipelinedp_spark.operators import retrieval
    from pipelinedp_spark.streaming.dp_streaming import (
        append_bm25_batch_idempotent)
    docs = _t(spark, sf_dir, "documents")
    vals = ", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)
    q = spark.sql(f"SELECT * FROM VALUES {vals} AS t(query_id, query_text)")
    retrieval.build_bm25_index(docs.limit(0), "bm25_idx_r10st",
                               num_buckets=4)
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 != 0)
    # The appends are load-bearing — never inside `assert` (python -O
    # would strip them and serve an empty index); bind, then check.
    applied0 = append_bm25_batch_idempotent(b0, "bm25_idx_r10st", 0)
    applied1 = append_bm25_batch_idempotent(b1, "bm25_idx_r10st", 1)
    replayed = append_bm25_batch_idempotent(b1, "bm25_idx_r10st", 1)
    if not (applied0 and applied1 and not replayed):
        raise AssertionError("bm25 ingest-log idempotency guard broke")
    out = retrieval.bm25_topk_from_index(q, "bm25_idx_r10st", k=9) \
        .localCheckpoint()
    for t in ("bm25_idx_r10st_postings", "bm25_idx_r10st_terms",
              "bm25_idx_r10st_meta", "bm25_idx_r10st_ingest_log"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


def _gen_hybrid_rrf_sql(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """SQL mirror of `_doc_hybrid_rrf`: the BM25 CTE is the proven
    `_gen_bm25_sql` body at k=20, the dense CTE the proven
    `_SIM_COSINE_TOPK_SQL` shape at k=20, fused with the identical
    1/(60+rank) sum (two-term double adds are order-independent, and
    reciprocal gaps >> the 6dp rounding)."""
    import duckdb
    n, tot = duckdb.sql(
        f"SELECT COUNT(*), SUM(len(string_split(text, ' ')))"
        f" FROM read_parquet('{sf_dir}/documents.parquet')").fetchone()
    avgdl = repr(float(tot) / float(n))
    vals = ", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)
    nq = len(_BM25_QUERIES)
    return f"""
WITH q(query_id, query_text) AS (VALUES {vals}),
qterms AS (
  SELECT query_id,
         unnest(list_distinct(string_split(query_text, ' '))) AS term
  FROM q),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
post AS (
  SELECT qt.query_id, tf.doc_id, tf.tf, dft.df, dl.dl
  FROM tf JOIN qterms qt USING (term)
          JOIN dft USING (term)
          JOIN dl USING (doc_id)),
lexscore AS (
  SELECT query_id, doc_id,
         SUM(LN(1.0 + ({float(n)} - df + 0.5) / (df + 0.5))
             * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / {avgdl}))))
             AS score
  FROM post GROUP BY 1, 2),
lex AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM lexscore)
  WHERE rank <= 20),
qv AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < {nq}),
densescore AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         list_dot_product(e.embedding::DOUBLE[], qv.v) /
         (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                e.embedding::DOUBLE[]))
          * sqrt(list_dot_product(qv.v, qv.v))) AS cosine
  FROM embeddings e CROSS JOIN qv),
dense AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, doc_id ASC) AS rank
    FROM densescore)
  WHERE rank <= 20),
uni AS (
  SELECT * FROM lex UNION ALL SELECT * FROM dense),
fused AS (
  SELECT query_id, doc_id,
         SUM(1.0 / (60.0 + rank)) AS s,
         COUNT(*) AS n_lists
  FROM uni GROUP BY 1, 2)
SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank,
       ROUND(s, 6) AS rrf_score, CAST(n_lists AS BIGINT) AS n_lists
FROM (SELECT query_id, doc_id, n_lists, s,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY s DESC, doc_id ASC) AS rank
      FROM fused)
WHERE rank <= 10
"""


def _doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-bigram importance weights: every document scored for
    similarity to the English-language subset (the 'target')."""
    from pipelinedp_spark.operators import mixing
    docs = _t(spark, sf_dir, "documents")
    return mixing.dsir_log_weights(docs, docs.filter(F.col("lang") == "en"))


def _gen_dsir_sql(num_buckets: int = 4096, alpha: float = 1.0,
                  sf_dir: str = "/root/testdata/sf0.01") -> str:
    """SQL mirror of `mixing.dsir_log_weights`: identical md5-bucket
    features, identical smoothing denominators (totals computed in
    Python from the parquet exactly as the operator's driver scalars and
    injected as literals)."""
    import duckdb
    con = duckdb.connect()
    gram_count = (
        "SELECT SUM(CASE WHEN len(string_split(text, ' ')) >= 2 "
        "THEN len(string_split(text, ' ')) - 1 ELSE 1 END) "
        f"FROM read_parquet('{sf_dir}/documents.parquet')")
    tot = con.execute(gram_count).fetchone()[0]
    tot_t = con.execute(gram_count + " WHERE lang = 'en'").fetchone()[0]
    denom_r = repr(float(tot) + alpha * num_buckets)
    denom_t = repr(float(tot_t) + alpha * num_buckets)
    bigram_cte = """
  SELECT doc_id, lang,
         unnest(CASE WHEN len(tk) >= 2
                     THEN [tk[i] || ' ' || tk[i+1]
                           for i in range(1, len(tk))]
                     ELSE [array_to_string(tk, ' ')] END) AS gram
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS tk
        FROM documents)"""
    return f"""
WITH g AS ({bigram_cte}),
f AS (SELECT doc_id,
             ('0x' || substr(md5(gram), 1, 15))::BIGINT % {num_buckets}
                 AS bucket,
             COUNT(*) AS c
      FROM g GROUP BY 1, 2),
rawc AS (SELECT bucket, SUM(c) AS c_r FROM f GROUP BY 1),
tgtc AS (SELECT ('0x' || substr(md5(gram), 1, 15))::BIGINT % {num_buckets}
                    AS bucket,
                COUNT(*) AS c_t
         FROM g WHERE lang = 'en' GROUP BY 1),
ratio AS (
  SELECT rawc.bucket,
         LN((COALESCE(tgtc.c_t, 0) + {alpha}) / {denom_t})
         - LN((rawc.c_r + {alpha}) / {denom_r}) AS lr
  FROM rawc LEFT JOIN tgtc USING (bucket))
SELECT f.doc_id,
       CAST(SUM(f.c) AS BIGINT) AS n_feats,
       ROUND(SUM(f.c * ratio.lr), 6) AS logw
FROM f JOIN ratio USING (bucket)
GROUP BY 1
"""


def _classifier_sample_from_parquet(sf_dir: str, num_buckets: int = 1024):
    """Shared trainer input for the quality-classifier query and its
    oracle: per-doc hashed-bigram counts + (lang == 'en') labels for the
    lowest-2000-id docs, computed via DuckDB (md5 buckets are engine-
    portable, so Spark produces the identical sample). Handles both
    single-file tables (driver-generated sf dirs) and Spark-written
    directory tables (the generated sf1 set)."""
    import os

    import duckdb
    path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    rows = duckdb.sql(f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tk
           FROM read_parquet('{path}')
           ORDER BY doc_id LIMIT 2000),
g AS (SELECT doc_id, lang,
             unnest(CASE WHEN len(tk) >= 2
                         THEN [tk[i] || ' ' || tk[i+1]
                               for i in range(1, len(tk))]
                         ELSE [array_to_string(tk, ' ')] END) AS gram
      FROM t)
SELECT doc_id,
       ('0x' || substr(md5(gram), 1, 15))::BIGINT % {num_buckets} AS bucket,
       COUNT(*) AS c,
       MAX(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS y
FROM g GROUP BY 1, 2 ORDER BY 1, 2
""").fetchall()
    by_doc: dict = {}
    for doc_id, bucket, c, y in rows:
        ent = by_doc.setdefault(doc_id, ({}, y))
        ent[0][int(bucket)] = int(c)
    return [(d, feats, int(y)) for d, (feats, y) in sorted(by_doc.items())]


def _doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality/domain classifier: logistic
    regression on hashed bigram features, trained deterministically on
    the lowest-id sample with (lang == 'en') labels, scoring every doc.
    The oracle retrains bit-identical weights (shared numpy trainer,
    engine-portable md5 features) and mirrors the scoring in SQL."""
    from pipelinedp_spark.operators import mixing
    docs = _t(spark, sf_dir, "documents")
    sample = _classifier_sample_from_parquet(sf_dir)
    w, b = mixing.train_linear_classifier(sample, num_buckets=1024)
    return mixing.classifier_scores(docs, w, b, num_buckets=1024)


def _gen_quality_classifier_sql(num_buckets: int = 1024,
                                sf_dir: str = "/root/testdata/sf0.01") -> str:
    from pipelinedp_spark.operators import mixing
    sample = _classifier_sample_from_parquet(sf_dir, num_buckets)
    w, b = mixing.train_linear_classifier(sample, num_buckets=num_buckets)
    vals = ", ".join(f"({i}, {w[i]!r})" for i in range(num_buckets)
                     if w[i] != 0.0)
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
g AS (SELECT doc_id,
             unnest(CASE WHEN len(tk) >= 2
                         THEN [tk[i] || ' ' || tk[i+1]
                               for i in range(1, len(tk))]
                         ELSE [array_to_string(tk, ' ')] END) AS gram
      FROM t),
f AS (SELECT doc_id,
             ('0x' || substr(md5(gram), 1, 15))::BIGINT % {num_buckets}
                 AS bucket,
             COUNT(*) AS c
      FROM g GROUP BY 1, 2),
wt(bucket, w) AS (VALUES {vals})
SELECT f.doc_id,
       ROUND(1.0 / (1.0 + EXP(-({b!r}
             + SUM(f.c * COALESCE(wt.w, 0.0)) / SUM(f.c)))), 6) AS score
FROM f LEFT JOIN wt USING (bucket)
GROUP BY 1
"""


def _doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window RAG-style chunking: 32-token chunks, 8-token
    overlap, per document."""
    from pipelinedp_spark.operators.packing import chunk_documents
    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=32, overlap=8)


_DOC_CHUNK_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
c AS (SELECT doc_id, tk, len(tk) AS n,
             CASE WHEN len(tk) <= 32 THEN 1
                  ELSE (len(tk) - 32 + 23) // 24 + 1 END AS nc
      FROM t),
e AS (SELECT doc_id, tk, n,
             unnest(generate_series(0, nc - 1)) AS chunk_idx
      FROM c)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       array_to_string(tk[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ')
           AS chunk,
       CAST(LEAST(32, n - chunk_idx * 24) AS BIGINT) AS n_tokens
FROM e
"""


def _doc_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR end-to-end: hashed-bigram importance weights vs the English
    subset, then deterministic Bernoulli importance resampling at an
    expected 25% keep rate."""
    from pipelinedp_spark.operators import mixing
    docs = _t(spark, sf_dir, "documents")
    weights = mixing.dsir_log_weights(docs,
                                      docs.filter(F.col("lang") == "en"))
    return mixing.importance_resample(weights, keep_fraction=0.25)


def _gen_dsir_resample_sql(keep_fraction: float = 0.25,
                           sf_dir: str = "/root/testdata/sf0.01") -> str:
    """SQL mirror: the weight query from `_gen_dsir_sql` as a CTE plus
    the md5-uniform Bernoulli keep rule. The Spark operator's filter
    consumes the ROUNDED logw column that `dsir_log_weights` projects,
    so the mirror's w and mean(w) are likewise built on the rounded
    value."""
    return f"""
WITH weights AS ({_gen_dsir_sql(sf_dir=sf_dir)}),
m AS (SELECT AVG(EXP(logw / 1.0)) AS mean_w FROM weights)
SELECT w.doc_id, w.n_feats, w.logw
FROM weights w, m
WHERE ('0x' || substr(md5('dsir:' || CAST(w.doc_id AS VARCHAR)), 1, 15))
          ::BIGINT / 1152921504606846976.0
      < LEAST(1.0, EXP(w.logw / 1.0) * ({keep_fraction} / m.mean_w))
"""


def _emb_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic cluster ids: SemDeDup within-cell pairs fed through
    iterative connected components (min-label + pointer jumping). Oracle
    mirrors the pairs in SQL and closes them with a recursive CTE."""
    from pipelinedp_spark.operators import graph, semdedup
    emb = _t(spark, sf_dir, "embeddings")
    pairs = semdedup.semantic_pairs(emb, num_clusters=8,
                                    cosine_threshold=0.4)
    return (graph.near_dup_clusters(emb.select("vec_id"), pairs,
                                    id_col="vec_id")
            .select(F.col("vec_id"),
                    F.col("cluster_id").cast("long").alias("cluster_id")))


def _gen_semantic_clusters_sql(num_clusters: int = 8, tau: float = 0.4,
                               seed: int = 7,
                               sf_dir: str = "/root/testdata/sf0.01") -> str:
    import numpy as np
    import pyarrow.parquet as pq
    from pipelinedp_spark.operators.similarity import train_ivf_centroids
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    t = t.sort_values("vec_id").head(10_000)
    x = np.stack(t["embedding"].to_numpy()).astype("float64")
    cents = train_ivf_centroids(x, num_clusters, seed)
    cell_rows = ", ".join(f"({c}, {_plane_lit(cents[c])})"
                          for c in range(len(cents)))
    return f"""
WITH RECURSIVE base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cells(cell, cv) AS (VALUES {cell_rows}),
ass AS (
  SELECT vec_id, v, cell FROM (
    SELECT vec_id, v, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY list_dot_product(v, cv) DESC,
                                       cell ASC) AS rn
    FROM base CROSS JOIN cells) WHERE rn = 1),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM ass a JOIN ass b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 6) >= {tau}),
und AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(node, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT und.u, reach.lbl FROM und JOIN reach ON reach.node = und.v
)
SELECT node AS vec_id, MIN(lbl) AS cluster_id
FROM reach GROUP BY node
"""


def _doc_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus report: the dataset-card rollup a
    training-data pipeline publishes — doc/token counts, exact-dup rate
    via fingerprint distinct, mean quality score. One scan + one
    map-side-combinable groupBy."""
    from pipelinedp_spark.functions import text as T
    docs = _t(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))),
                                " +", " "))
    return (docs.groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(T.token_count(F.col("text"))).cast("long")
                 .alias("n_tokens"),
                 F.countDistinct(fp).cast("long").alias("n_unique"),
                 # SUM (not AVG) of the 6dp per-doc scores: dividing by
                 # n lands exactly on .5-at-6dp boundaries where Spark
                 # (HALF_UP) and DuckDB (HALF_EVEN) round apart.
                 F.round(F.sum(T.quality_score(F.col("text"))), 6)
                 .alias("sum_quality")))


_DOC_CORPUS_REPORT_SQL = """
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), ' +', ' ',
                                              'g'))) AS BIGINT)
           AS n_unique,
       ROUND(SUM(ROUND(
         (CASE WHEN len(string_split(text, ' ')) < 50
               THEN len(string_split(text, ' ')) / 50.0
               WHEN len(string_split(text, ' ')) > 10000
               THEN 10000.0 / len(string_split(text, ' '))
               ELSE 1.0 END)
         * (len(list_distinct(string_split(text, ' ')))
            / greatest(len(string_split(text, ' ')), 1)), 6)), 6)
           AS sum_quality
FROM documents
GROUP BY 1, 2
"""


def _dp_corpus_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level DP statistics OVER the training corpus itself —
    the privacy-accounting shape for LLM training data releases: each
    DOCUMENT is the privacy unit (pid = doc_id), partitions are
    languages (public), and the released metric is the clipped sum of
    per-document token counts. Contribution bounding is real: a doc
    contributes to exactly its own language, token counts clip to
    [0, 80]. Zero noise for the oracle."""
    docs = _t(spark, sf_dir, "documents")
    from pipelinedp_spark.functions import text as T
    with_tokens = docs.select(
        F.col("doc_id"), F.col("lang"),
        T.token_count(F.col("text")).cast("double").alias("n_tokens"))
    query = (pds.QueryBuilder(with_tokens, "doc_id")
             .groupby("lang", max_groups_contributed=1,
                      max_contributions_per_group=1,
                      public_keys=["en", "de", "fr", "es", "zh"])
             .count(name="n_docs")
             .sum("n_tokens", min_value=0.0, max_value=80.0,
                  name="dp_tokens")
             .build_query())
    return query.run_query(pds.Budget(1.0), noise_mode="zero")


_DP_CORPUS_TOKEN_SQL = """
WITH pub(lang) AS (VALUES ('en'), ('de'), ('fr'), ('es'), ('zh')),
per_doc AS (
    SELECT doc_id, lang,
           GREATEST(LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE),
                          80.0), 0.0) AS clipped
    FROM documents),
agg AS (
    SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n_docs,
           CAST(SUM(clipped) AS DOUBLE) AS dp_tokens
    FROM per_doc GROUP BY lang)
SELECT pub.lang, COALESCE(agg.n_docs, 0.0) AS n_docs,
       COALESCE(agg.dp_tokens, 0.0) AS dp_tokens
FROM pub LEFT JOIN agg USING (lang)
"""


def _multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-feature path: full-range deterministic int16 PCM ->
    RIFF/WAVE encode -> opaque binary -> native decode -> normalized
    8-bin amplitude histogram (extract_audio_features, decoder=native).
    The histogram bin of sample v is exactly (v + 32768) // 8192 (the
    np.histogram edges are v/2^15 rationals — exact in float64), so the
    oracle recomputes the whole feature vector from the generating
    formula in integer SQL."""
    import numpy as np
    import pandas as pd
    from pipelinedp_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                n = 64 + d % 64
                rate = 8000 * (1 + d % 3)
                samples = ((d * 31 + np.arange(n) * 17) % 65536
                           - 32768).astype(np.int16)
                payloads.append(MM.encode_wav(samples, int(rate)))
            yield pd.DataFrame({"doc_id": ids, "audio": payloads})

    wav = docs.mapInPandas(gen, "doc_id long, audio binary")
    feats = MM.extract_audio_features(wav, "audio", decoder="native",
                                      n_bins=8)
    return feats.select(
        F.col("doc_id"),
        F.posexplode(F.col("audio_features")).alias("bin", "frac"),
        F.col("est_duration_s")).select(
        "doc_id", F.col("bin").cast("long").alias("bin"),
        F.round(F.col("frac"), 6).alias("frac"),
        F.round(F.col("est_duration_s"), 6).alias("est_duration_s"))


_MULTIMODAL_AUDIO_FEATURES_SQL = """
WITH s AS (
  SELECT d.doc_id, (d.doc_id * 31 + g.k * 17) % 65536 - 32768 AS v
  FROM documents d, generate_series(0, 127) g(k)
  WHERE g.k < 64 + d.doc_id % 64),
h AS (
  SELECT doc_id, CAST((v + 32768) // 8192 AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM s GROUP BY 1, 2),
grid AS (
  SELECT d.doc_id, g.b AS bin, 64 + d.doc_id % 64 AS n,
         8000 * (1 + d.doc_id % 3) AS rate
  FROM documents d, generate_series(0, 7) g(b))
SELECT grid.doc_id, CAST(grid.bin AS BIGINT) AS bin,
       ROUND(COALESCE(h.c, 0) / grid.n, 6) AS frac,
       ROUND(grid.n / grid.rate, 6) AS est_duration_s
FROM grid LEFT JOIN h ON grid.doc_id = h.doc_id AND grid.bin = h.bin
"""


def _dedup_cross_corpus_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion NEAR-dup dedup: odd-id docs (the 'new
    batch') surviving a MinHash band join + exact-Jaccard check against
    even-id docs (the 'reference index'). The oracle replays signatures,
    bands, the cross join, and the verify in SQL. (The reference-bucket
    cap never binds at this sf; the mirror omits it.)"""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    out = dedup.cross_corpus_near_dup(new, ref, jaccard_threshold=0.7)
    return out.select("doc_id", "lang")


_DEDUP_CROSS_NEAR_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                       for i in range(1, len(t) - 1)])
                   ELSE [array_to_string(t, ' ')] END AS shingles
       FROM tok),
hm AS (
  SELECT doc_id, shingles,
         [('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647
          for s in shingles] AS hs
  FROM sh),
sig AS (
  SELECT doc_id, shingles,
         [list_min([(((1103515245 * (i + 1) + 12345) % 2147483647) * h
                     + ((2654435761 * i + 97) % 2147483647)) % 2147483647
                    for h in hs])
          for i in range(0, 8)] AS sig
  FROM hm),
bands AS (
  SELECT doc_id,
         UNNEST(range(0, 2)) AS band_idx,
         UNNEST([md5(CAST(sig[1] AS VARCHAR) || '|' || CAST(sig[2] AS VARCHAR)
                     || '|' || CAST(sig[3] AS VARCHAR) || '|'
                     || CAST(sig[4] AS VARCHAR)),
                 md5(CAST(sig[5] AS VARCHAR) || '|' || CAST(sig[6] AS VARCHAR)
                     || '|' || CAST(sig[7] AS VARCHAR) || '|'
                     || CAST(sig[8] AS VARCHAR))])
             AS band_hash
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0),
dups AS (
  SELECT DISTINCT c.id_a
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
  WHERE ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
              (len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles))), 6) >= 0.7)
SELECT d.doc_id, d.lang
FROM documents d
WHERE d.doc_id % 2 = 1
  AND d.doc_id NOT IN (SELECT id_a FROM dups)
"""


def _dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup against a PERSISTED fingerprint store
    (`dedup.build_minhash_store` + `incremental_near_dup`): the even-id
    docs become the bucketed reference index (bands bucketed by band
    key, shingles by id — zero Exchange on the store side of both
    joins, pinned in test_plan_shapes_r9), then the odd-id 'new crawl'
    batch is deduped against it WITHOUT recomputing reference
    fingerprints. k=4 shingles / Jaccard 0.6 distinguish the knobs from
    `dedup_cross_corpus_near`'s k=3/0.7. The result is checkpointed and
    the store tables dropped so the query is self-contained."""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    dedup.build_minhash_store(ref, "incr_store_r9", k=4)
    out = (dedup.incremental_near_dup(new, "incr_store_r9",
                                      jaccard_threshold=0.6)
           .select("doc_id", "source").localCheckpoint())
    for t in ("incr_store_r9_bands", "incr_store_r9_shingles",
              "incr_store_r9_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


_DEDUP_INCREMENTAL_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 4
                   THEN list_distinct([t[i] || ' ' || t[i+1] || ' '
                                       || t[i+2] || ' ' || t[i+3]
                                       for i in range(1, len(t) - 2)])
                   ELSE [array_to_string(t, ' ')] END AS shingles
       FROM tok),
hm AS (
  SELECT doc_id, shingles,
         [('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647
          for s in shingles] AS hs
  FROM sh),
sig AS (
  SELECT doc_id, shingles,
         [list_min([(((1103515245 * (i + 1) + 12345) % 2147483647) * h
                     + ((2654435761 * i + 97) % 2147483647)) % 2147483647
                    for h in hs])
          for i in range(0, 8)] AS sig
  FROM hm),
bands AS (
  SELECT doc_id,
         UNNEST(range(0, 2)) AS band_idx,
         UNNEST([md5(CAST(sig[1] AS VARCHAR) || '|' || CAST(sig[2] AS VARCHAR)
                     || '|' || CAST(sig[3] AS VARCHAR) || '|'
                     || CAST(sig[4] AS VARCHAR)),
                 md5(CAST(sig[5] AS VARCHAR) || '|' || CAST(sig[6] AS VARCHAR)
                     || '|' || CAST(sig[7] AS VARCHAR) || '|'
                     || CAST(sig[8] AS VARCHAR))])
             AS band_hash
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0),
dups AS (
  SELECT DISTINCT c.id_a
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
  WHERE ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
              (len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles))), 6) >= 0.6)
SELECT d.doc_id, d.source
FROM documents d
WHERE d.doc_id % 2 = 1
  AND d.doc_id NOT IN (SELECT id_a FROM dups)
"""


def _doc_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM perplexity per document (lambda = 0.75
    bigram weight, unigram backoff)."""
    from pipelinedp_spark.operators import quality
    docs = _t(spark, sf_dir, "documents")
    return quality.bigram_perplexity(docs)


def _gen_bigram_ppl_sql(lam: float = 0.75,
                        sf_dir: str = "/root/testdata/sf0.01") -> str:
    """SQL mirror of `quality.bigram_perplexity`: N and ln(N) injected
    as the same Python-computed literals the Spark op folds in; the
    interpolation expression mirrors the Column arithmetic term for
    term."""
    import math
    import duckdb
    n = duckdb.sql(
        f"SELECT SUM(len(string_split(text, ' ')))"
        f" FROM read_parquet('{sf_dir}/documents.parquet')").fetchone()[0]
    total = repr(float(n))
    ln_n = repr(math.log(float(n)))
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
toks AS (SELECT doc_id, unnest(tk) AS tok FROM t),
uni AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c_w
        FROM toks GROUP BY 1),
prs AS (SELECT doc_id, tk[i] AS v, tk[i+1] AS w
        FROM (SELECT doc_id, tk,
                     unnest(generate_series(1, len(tk) - 1)) AS i
              FROM t WHERE len(tk) >= 2)),
big AS (SELECT v, w, CAST(COUNT(*) AS DOUBLE) AS c_vw
        FROM prs GROUP BY 1, 2),
fst AS (SELECT t.doc_id, LN(u.c_w) - {ln_n} AS lp
        FROM t JOIN uni u ON u.tok = t.tk[1]),
cond AS (SELECT p.doc_id,
                LN({lam} * (b.c_vw / cv.c_w)
                   + {1.0 - lam} * (uw.c_w / {total})) AS lp
         FROM prs p
         JOIN big b ON b.v = p.v AND b.w = p.w
         JOIN uni cv ON cv.tok = p.v
         JOIN uni uw ON uw.tok = p.w),
lp AS (SELECT doc_id, SUM(lp) AS lp
       FROM (SELECT * FROM fst UNION ALL SELECT * FROM cond)
       GROUP BY 1)
SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
       ROUND(EXP(-lp.lp / len(t.tk)), 6) AS ppl
FROM t JOIN lp USING (doc_id)
"""


def _stream_near_dup_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mirror of `streaming.streaming_near_dup_dedup` with exact
    two-trigger semantics: micro-batch 1 = even-id docs (deduped within
    itself), micro-batch 2 = odd-id docs (deduped against batch 1's
    kept-doc block state AND within itself). The oracle replays the
    simhash fingerprints, pigeonhole blocks, and both batches' keep
    rules in SQL. Returns (doc_id, batch)."""
    from pipelinedp_spark.streaming.dp_streaming import near_dup_dedup_batch
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    kept1, blocks1 = near_dup_dedup_batch(even, None)
    kept2, _ = near_dup_dedup_batch(odd, blocks1)
    return (kept1.select("doc_id").withColumn("batch", F.lit(0))
            .unionByName(kept2.select("doc_id")
                         .withColumn("batch", F.lit(1)))
            .select(F.col("doc_id"), F.col("batch").cast("long")))


_STREAM_NEAR_DUP_MIRROR_SQL = """
WITH tok AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents),
th AS (
  SELECT doc_id, UNNEST(toks) AS token FROM tok),
hashes AS (
  SELECT doc_id,
         ('0x' || substr(md5(token), 1, 15))::BIGINT AS h
  FROM th),
votes AS (
  SELECT doc_id, b.b AS bit,
         SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM hashes, (SELECT UNNEST(range(0, 60)) AS b) b
  GROUP BY doc_id, b.b),
fp AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
             AS simhash
  FROM votes GROUP BY doc_id),
blocks AS (
  SELECT doc_id, simhash, UNNEST(range(0, 4)) AS block_idx,
         UNNEST([(simhash >> 0) & 32767, (simhash >> 15) & 32767,
                 (simhash >> 30) & 32767, (simhash >> 45) & 32767])
             AS block_val
  FROM fp),
b1_dups AS (
  SELECT DISTINCT b.doc_id
  FROM blocks a JOIN blocks b
    ON a.block_idx = b.block_idx AND a.block_val = b.block_val
   AND a.doc_id < b.doc_id
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 0
    AND bit_count(xor(a.simhash, b.simhash)) <= 3),
kept1 AS (
  SELECT doc_id FROM fp
  WHERE doc_id % 2 = 0 AND doc_id NOT IN (SELECT doc_id FROM b1_dups)),
b2_state_dups AS (
  SELECT DISTINCT o.doc_id
  FROM blocks o JOIN blocks s
    ON o.block_idx = s.block_idx AND o.block_val = s.block_val
  WHERE o.doc_id % 2 = 1 AND s.doc_id IN (SELECT doc_id FROM kept1)
    AND bit_count(xor(o.simhash, s.simhash)) <= 3),
b2_in_batch_dups AS (
  SELECT DISTINCT b.doc_id
  FROM blocks a JOIN blocks b
    ON a.block_idx = b.block_idx AND a.block_val = b.block_val
   AND a.doc_id < b.doc_id
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 1
    AND bit_count(xor(a.simhash, b.simhash)) <= 3),
kept2 AS (
  SELECT doc_id FROM fp
  WHERE doc_id % 2 = 1
    AND doc_id NOT IN (SELECT doc_id FROM b2_state_dups)
    AND doc_id NOT IN (SELECT doc_id FROM b2_in_batch_dups))
SELECT doc_id, CAST(0 AS BIGINT) AS batch FROM kept1
UNION ALL
SELECT doc_id, CAST(1 AS BIGINT) AS batch FROM kept2
"""


def _doc_hash_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing text embeddings (model-free, md5-derived token
    vectors, L2-normalized bag sum) — the in-engine stand-in that feeds
    the semantic-dedup/ANN stack straight from text. Flattened to
    (doc_id, d, value) rows for the oracle compare."""
    from pipelinedp_spark.functions.embeddings import hashed_embeddings
    docs = _t(spark, sf_dir, "documents")
    emb = hashed_embeddings(docs, dim=16)
    return emb.select(
        F.col("doc_id"),
        F.posexplode(F.col("embedding")).alias("d", "value")).select(
        "doc_id", F.col("d").cast("long").alias("d"), F.col("value"))


_DOC_HASH_EMB_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
tok AS (SELECT doc_id, unnest(tk) AS tokn FROM t),
comp AS (
  SELECT doc_id, d.d AS d,
         SUM((('0x' || substr(md5(tokn), 2 * d.d + 1, 2))::BIGINT
              - 127.5) / 127.5) AS v
  FROM tok, (SELECT unnest(range(0, 16)) AS d) d
  GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(SUM(v * v)) AS n FROM comp GROUP BY 1)
SELECT comp.doc_id, CAST(comp.d AS BIGINT) AS d,
       ROUND(CASE WHEN nrm.n > 0 THEN comp.v / nrm.n
                  ELSE comp.v END, 6) AS value
FROM comp JOIN nrm USING (doc_id)
"""


def _doc_semantic_dedup_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composition, fully in-engine and fully mirrored: raw
    text -> feature-hashing embeddings -> SemDeDup (k-means cells +
    keep-first cosine pruning). No external model anywhere; the oracle
    recomputes the embeddings from text in SQL, and the generator
    retrains bit-identical centroids from the same deterministic
    sample via the shared numpy code path."""
    from pipelinedp_spark.functions.embeddings import hashed_embeddings
    from pipelinedp_spark.operators import semdedup
    docs = _t(spark, sf_dir, "documents")
    emb = hashed_embeddings(docs, dim=16)
    # Cluster count scales with the corpus (SemDeDup's contract: cells
    # must stay small or the in-cell mat-mul goes quadratic — a fixed 8
    # measured 15x on the 10x step). ~64 docs/cell; 500 docs at the
    # oracle sf yields exactly the 8 cells the SQL mirror trains.
    n_docs = docs.count()
    k = max(8, n_docs // 64)
    return semdedup.semantic_dedup(emb, vec_col="embedding",
                                   id_col="doc_id", num_clusters=k,
                                   cosine_threshold=0.8)


def _hash_embedding_matrix(sf_dir: str, limit: int = 10_000):
    """Driver-side replica of `hashed_embeddings` (same byte maths,
    same 6dp rounding) for the lowest-id docs — the quantizer-training
    sample `semantic_dedup` draws via `sample_corpus_matrix`."""
    import numpy as np
    import pyarrow.parquet as pq
    from pipelinedp_spark.functions.embeddings import token_vector
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    t = t.sort_values("doc_id").head(limit)
    out = []
    for txt in t["text"]:
        toks = txt.split(" ")
        m = np.stack([token_vector(tok) for tok in toks])
        v = m.sum(axis=0)
        n = float(np.linalg.norm(v))
        if n > 0.0:
            v = v / n
        out.append(np.round(v, 6))
    return np.stack(out)


def _gen_semantic_dedup_text_sql(num_clusters: int = 8, tau: float = 0.8,
                                 seed: int = 7,
                                 sf_dir: str = "/root/testdata/sf0.01"
                                 ) -> str:
    from pipelinedp_spark.operators.similarity import train_ivf_centroids
    x = _hash_embedding_matrix(sf_dir)
    cents = train_ivf_centroids(x, num_clusters, seed)
    cell_rows = ", ".join(f"({c}, {_plane_lit(cents[c])})"
                          for c in range(len(cents)))
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
tok AS (SELECT doc_id, unnest(tk) AS tokn FROM t),
comp AS (
  SELECT doc_id, d.d AS d,
         SUM((('0x' || substr(md5(tokn), 2 * d.d + 1, 2))::BIGINT
              - 127.5) / 127.5) AS v
  FROM tok, (SELECT unnest(range(0, 16)) AS d) d
  GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(SUM(v * v)) AS n FROM comp GROUP BY 1),
emb AS (
  SELECT comp.doc_id,
         list(ROUND(CASE WHEN nrm.n > 0 THEN comp.v / nrm.n
                         ELSE comp.v END, 6) ORDER BY comp.d) AS v
  FROM comp JOIN nrm USING (doc_id) GROUP BY comp.doc_id),
cells(cell, cv) AS (VALUES {cell_rows}),
ass AS (
  SELECT doc_id, v, cell FROM (
    SELECT doc_id, v, cell,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY list_dot_product(v, cv) DESC,
                                       cell ASC) AS rn
    FROM emb CROSS JOIN cells) WHERE rn = 1),
dups AS (
  SELECT DISTINCT b.doc_id
  FROM ass a JOIN ass b ON a.cell = b.cell AND a.doc_id < b.doc_id
  WHERE ROUND(list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 6) >= {tau})
SELECT a.doc_id, a.cell, (d.doc_id IS NOT NULL) AS is_dup
FROM ass a LEFT JOIN dups d USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Deterministic sketches: HyperLogLog, count-min, Bloom decontamination
# ---------------------------------------------------------------------------


def _doc_vocab_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count estimate (`sketches.hll_distinct_estimate`,
    m=1024 registers, md5-deterministic) over the corpus's word 3-grams —
    the KB-state mergeable alternative to `doc_vocab_estimate`'s KMV: no
    distinct pass at all, one map-side-combined groupBy over <= m register
    rows. One row out (raw + linear-counting-corrected estimates)."""
    from pipelinedp_spark.functions.sketches import hll_distinct_estimate
    from pipelinedp_spark.functions import text as TX
    docs = _t(spark, sf_dir, "documents")
    grams = docs.select(
        F.explode(TX._word_ngrams(F.col("text"), 3)).alias("gram"))
    return hll_distinct_estimate(grams, "gram", p=10)


# Mirrors sketches.hll_distinct_estimate exactly: same md5 register/rho
# draws, the integer-scaled (2^50) register sum so cross-register addition
# is order-independent in both engines, same bias constant and
# linear-counting branch (literals computed once in Python).
_DOC_VOCAB_HLL_SQL = """
WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT unnest(CASE WHEN len(t) >= 3
                     THEN [array_to_string(t[i:i+2], ' ')
                           for i in range(1, len(t) - 1)]
                     ELSE [array_to_string(t, ' ')] END) AS gram
  FROM tok),
hr AS (
  SELECT ('0x' || substr(md5('hllr:' || gram), 1, 15))::BIGINT % 1024
             AS reg,
         CAST(floor(ln(greatest(
                ('0x' || substr(md5('hllw:' || gram), 1, 15))::BIGINT
                    / 1152921504606846976.0,
                8.673617379884035e-19)) / ln(0.5)) + 1 AS INT) AS rho
  FROM g),
regs AS (SELECT reg, MAX(rho) AS mr FROM hr GROUP BY 1),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nz,
         CAST(SUM(CASE WHEN mr <= 50
                       THEN 1125899906842624::BIGINT >> mr
                       ELSE 0 END) AS BIGINT) AS present_scaled
  FROM regs),
est AS (
  SELECT nz,
         755541.746198293
           / ((present_scaled + (1024 - nz) * 1125899906842624)
              / 1125899906842624.0) AS raw
  FROM agg)
SELECT CAST(1024 AS BIGINT) AS m,
       nz AS nonzero_registers,
       ROUND(raw, 6) AS raw_estimate,
       ROUND(CASE WHEN raw <= 2560.0 AND nz < 1024
                  THEN 1024.0 * ln(1024.0 / (1024 - nz))
                  ELSE raw END, 6) AS estimate
FROM est
"""


def _token_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates (`sketches.cms_counters` /
    `cms_estimate`, depth=4, width=1024, md5-deterministic): corpus
    token counts reduced to a <= 4096-row integer counter table (one
    map-side-combined shuffle of a 2-int projection), then point-queried
    for every distinct token of the probe docs (doc_id % 199 == 0) via
    a broadcast of the counters and an integer min over the 4 rows.
    Estimates are exact upper bounds (never under the true count)."""
    from pipelinedp_spark.functions.sketches import cms_counters, cms_estimate
    from pipelinedp_spark.functions import text as TX
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
    counters = cms_counters(toks, "tok", depth=4, width=1024)
    probe = (docs.filter(F.col("doc_id") % 199 == 0)
             .select(F.explode(TX.tokens(F.col("text"))).alias("tok")))
    return cms_estimate(counters, probe, "tok", depth=4, width=1024)


_TOKEN_FREQ_CMS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
ctr AS (
  SELECT j,
         ('0x' || substr(md5('cms' || j || ':' || tok), 1, 15))::BIGINT
             % 1024 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok, (SELECT unnest(range(4)) AS j) r
  GROUP BY 1, 2),
pr AS (SELECT DISTINCT tok FROM tok WHERE doc_id % 199 = 0),
pj AS (
  SELECT tok, j,
         ('0x' || substr(md5('cms' || j || ':' || tok), 1, 15))::BIGINT
             % 1024 AS bucket
  FROM pr, (SELECT unnest(range(4)) AS j) r)
SELECT pj.tok, CAST(MIN(COALESCE(ctr.cnt, 0)) AS BIGINT) AS est_count
FROM pj LEFT JOIN ctr USING (j, bucket)
GROUP BY 1 ORDER BY 1
"""


def _doc_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination (`decontam.decontaminate_bloom`):
    same eval split and 3-gram overlap rule as `doc_decontaminate`, but
    the corpus grams probe a 4 KiB Bloom word table (broadcast) and only
    Bloom-positive occurrences reach the exact confirm join — the shape
    for eval suites too large to broadcast as exact hash sets. m_bits is
    deliberately small here so false positives occur and the confirm
    join is exercised; the output (kept doc_ids) is identical to exact
    decontamination, which IS the oracle."""
    from pipelinedp_spark.operators.decontam import decontaminate_bloom
    docs = _t(spark, sf_dir, "documents")
    evald = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    kept = decontaminate_bloom(train, evald, n=3, max_hits=0,
                               m_bits=1 << 15, num_hashes=3)
    return kept.select("doc_id")


# The Bloom changes the plan, never the answer: the oracle is plain exact
# decontamination (kept = train docs with zero eval-overlapping 3-grams).
_DOC_DECONTAM_BLOOM_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
gr AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN [array_to_string(t[i:i+2], ' ')
                    for i in range(1, len(t) - 1)]
              ELSE [array_to_string(t, ' ')] END AS grams
  FROM tok),
ev AS (
  SELECT DISTINCT ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
  FROM gr, UNNEST(grams) AS u(g)
  WHERE doc_id % 97 = 0),
bad AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
        FROM gr, UNNEST(grams) AS u(g)
        WHERE doc_id % 97 <> 0) c
  JOIN ev USING (h))
SELECT doc_id FROM documents
WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
ORDER BY doc_id
"""


def _events_windowed_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distinct-user estimates via grouped HyperLogLog
    (`sketches.hll_distinct_estimate_by`, m=256): the batch mirror of
    `streaming.streaming_distinct_hll` (same md5 registers, same
    integer-scaled estimate — the streaming state merged per trigger
    equals this exactly). Two map-side-combined shuffles, <= 256
    register rows per day."""
    from pipelinedp_spark.functions.sketches import hll_distinct_estimate_by
    ev = _t(spark, sf_dir, "events")
    day_us = 86_400_000_000
    ev = ev.select(
        F.floor(F.col("ts") / F.lit(day_us)).cast("long").alias("day"),
        F.col("user_id"))
    return hll_distinct_estimate_by(ev, "user_id", ["day"], p=8)


_EVENTS_WINDOWED_HLL_SQL = """
WITH ev AS (
  SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(user_id AS VARCHAR) AS v
  FROM events),
hr AS (
  SELECT day,
         ('0x' || substr(md5('hllr:' || v), 1, 15))::BIGINT % 256 AS reg,
         CAST(floor(ln(greatest(
                ('0x' || substr(md5('hllw:' || v), 1, 15))::BIGINT
                    / 1152921504606846976.0,
                8.673617379884035e-19)) / ln(0.5)) + 1 AS INT) AS rho
  FROM ev),
regs AS (SELECT day, reg, MAX(rho) AS mr FROM hr GROUP BY 1, 2),
agg AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS nz,
         CAST(SUM(CASE WHEN mr <= 50
                       THEN 1125899906842624::BIGINT >> mr
                       ELSE 0 END) AS BIGINT) AS ps
  FROM regs GROUP BY 1),
est AS (
  SELECT day, nz,
         47072.71267120224
           / ((ps + (256 - nz) * 1125899906842624)
              / 1125899906842624.0) AS raw
  FROM agg)
SELECT day, CAST(256 AS BIGINT) AS m, nz AS nonzero_registers,
       ROUND(raw, 6) AS raw_estimate,
       ROUND(CASE WHEN raw <= 640.0 AND nz < 256
                  THEN 256.0 * ln(256.0 / (256 - nz))
                  ELSE raw END, 6) AS estimate
FROM est ORDER BY 1
"""


def _vocab_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus vocabulary overlap from KMV/theta sketches
    (`sketches.kmv_overlap_estimate`, k=512): Jaccard + intersection +
    union estimates between the English and French corpora's token
    sets — the pre-pass that prices a cross-corpus dedup before paying
    its shuffle. Per side one distinct hash projection; one 512-row
    TakeOrderedAndProject over the merged sets. One row out."""
    from pipelinedp_spark.functions import text as TX
    from pipelinedp_spark.functions.sketches import kmv_overlap_estimate
    docs = _t(spark, sf_dir, "documents")
    en = (docs.filter(F.col("lang") == "en")
          .select(F.explode(TX.tokens(F.col("text"))).alias("tok")))
    fr = (docs.filter(F.col("lang") == "fr")
          .select(F.explode(TX.tokens(F.col("text"))).alias("tok")))
    return kmv_overlap_estimate(en, fr, "tok", k=512)


_VOCAB_OVERLAP_KMV_SQL = """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE lang IN ('en', 'fr')),
ha AS (SELECT DISTINCT
         ('0x' || substr(md5('kmv:' || tok), 1, 15))::BIGINT
             / 1152921504606846976.0 AS h
       FROM tok WHERE lang = 'en'),
hb AS (SELECT DISTINCT
         ('0x' || substr(md5('kmv:' || tok), 1, 15))::BIGINT
             / 1152921504606846976.0 AS h
       FROM tok WHERE lang = 'fr'),
mg AS (
  SELECT COALESCE(ha.h, hb.h) AS h,
         CASE WHEN ha.h IS NULL THEN 0 ELSE 1 END AS in_a,
         CASE WHEN hb.h IS NULL THEN 0 ELSE 1 END AS in_b
  FROM ha FULL OUTER JOIN hb ON ha.h = hb.h),
s AS (SELECT * FROM mg ORDER BY h LIMIT 512)
SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
       MAX(h) AS kth_min,
       ROUND(CASE WHEN COUNT(*) < 512 THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE (512.0 - 1.0) / MAX(h) END, 6) AS union_est,
       ROUND(CAST(SUM(in_a * in_b) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS jaccard_est,
       ROUND((CAST(SUM(in_a * in_b) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE))
             * (CASE WHEN COUNT(*) < 512 THEN CAST(COUNT(*) AS DOUBLE)
                     ELSE (512.0 - 1.0) / MAX(h) END), 6)
           AS intersection_est
FROM s
"""


def _doc_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (`sampling.temperature_sample`,
    alpha=0.5, total=200): per-source quotas proportional to
    n_s^alpha — the pretraining-mixture rule that upweights small
    sources — each source contributing its lowest-md5-hash docs. One
    count agg, a source-sized broadcast quota table, one per-source
    WindowGroupLimit."""
    from pipelinedp_spark.functions.sampling import temperature_sample
    docs = _t(spark, sf_dir, "documents")
    return (temperature_sample(docs, "source", "doc_id",
                               total=200, alpha=0.5)
            .select("doc_id", "source"))


_DOC_TEMPERATURE_MIX_SQL = """
WITH c AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n
           FROM documents GROUP BY 1),
z AS (SELECT SUM(pow(n, 0.5)) AS z FROM c),
q AS (SELECT source,
             CAST(FLOOR(200.0 * pow(n, 0.5) / z) AS BIGINT) AS quota
      FROM c, z),
r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5('temp:'
                        || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    / 1152921504606846976.0 ASC,
                    doc_id ASC) AS rn
  FROM documents)
SELECT r.doc_id, r.source
FROM r JOIN q USING (source)
WHERE rn <= quota
ORDER BY 1
"""


def _multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup via perceptual hashing (`multimodal.phash_dedup`):
    each doc renders one of 17 fixed 32x32 frequency patterns (class =
    doc_id % 17) PLUS a per-doc brightness offset (doc_id % 9) * 5 —
    byte-level dedup (md5 content hash) sees every image as unique, but
    pHash is brightness-shift invariant (the offset moves only the
    excluded DC coefficient), so images collapse exactly to their
    pattern class (verified: one hash per class, cross-class Hamming
    >= 20; pinned in tests/test_multimodal_native.py). Real BMP bytes
    in between, real decode on the way out. The oracle states the
    planted truth: dup iff a smaller doc_id shares the class."""
    import numpy as np
    import pandas as pd
    from pipelinedp_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        i, j = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                g = int(d) % 17
                base = (11 * ((i * i * (g + 2) + 3 * j) % 29)
                        + 5 * ((7 * i + (g + 5) * j * j) % 31)
                        + g * 17) % 200
                px = (base + (int(d) % 9) * 5).astype(np.uint8)
                payloads.append(MM.encode_bmp(px))
            yield pd.DataFrame({"doc_id": ids, "image": payloads})

    imgs = docs.mapInPandas(gen, "doc_id long, image binary")
    return (MM.phash_dedup(imgs, "image", "doc_id")
            .select("doc_id", "is_dup"))


_MULTIMODAL_PHASH_SQL = """
SELECT doc_id,
       doc_id > MIN(doc_id) OVER (PARTITION BY doc_id % 17) AS is_dup
FROM documents
ORDER BY doc_id
"""


def _multimodal_phash_incremental(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Incremental image dedup against a PERSISTED pHash index
    (`multimodal.build_phash_store` + `incremental_phash_dedup`): the
    reference corpus = even-id docs whose pattern class (doc_id % 17)
    is < 12, indexed once as bucketed bit-blocks + hashes; the odd-id
    'new crawl' batch renders the same 17 brightness-shifted BMP
    patterns and is flagged against the store with zero store-side
    shuffle and no reference re-decode. Planted truth: an odd doc is a
    dup iff its class is < 12 (classes 12-16 exist only outside the
    reference). max_hamming=2 exercises the pigeonhole block join
    (planted matches are Hamming 0, cross-class >= 20)."""
    import numpy as np
    import pandas as pd
    from pipelinedp_spark.operators import multimodal as MM

    # the render + pHash pass is Python-bound: spread it over all
    # cores, not the source parquet's file-partition count
    docs = (_t(spark, sf_dir, "documents").select("doc_id")
            .repartition(32))

    def gen(it):
        i, j = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                g = int(d) % 17
                base = (11 * ((i * i * (g + 2) + 3 * j) % 29)
                        + 5 * ((7 * i + (g + 5) * j * j) % 31)
                        + g * 17) % 200
                px = (base + (int(d) % 9) * 5).astype(np.uint8)
                payloads.append(MM.encode_bmp(px))
            yield pd.DataFrame({"doc_id": ids, "image": payloads})

    imgs = docs.mapInPandas(gen, "doc_id long, image binary")
    ref = imgs.filter((F.col("doc_id") % 2 == 0)
                      & (F.col("doc_id") % 17 < 12))
    batch = imgs.filter(F.col("doc_id") % 2 == 1)
    MM.build_phash_store(ref, "phash_store_r9", max_hamming=2,
                         num_blocks=4)
    out = (MM.incremental_phash_dedup(batch, "phash_store_r9")
           .select("doc_id", "is_dup").localCheckpoint())
    for t in ("phash_store_r9_blocks", "phash_store_r9_members",
              "phash_store_r9_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


_MULTIMODAL_PHASH_INCR_SQL = """
SELECT doc_id, (doc_id % 17) < 12 AS is_dup
FROM documents
WHERE doc_id % 2 = 1
ORDER BY doc_id
"""


def _multimodal_phash_takedown(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """PER-IMAGE right-to-be-forgotten on the persisted pHash index
    (`multimodal.remove_from_phash_store`, r11 semantics): same 17
    planted visual classes as `multimodal_phash_incremental` (ref =
    even ids, class < 12; batch = odd ids). Takedown: ALL reference
    members of classes 6-8 (their family fingerprints must die) and
    all-but-the-minimum-id member of classes 0-5 (a PARTIAL removal —
    one survivor keeps each family's fingerprint alive). Planted
    truth, mirrored by the oracle: an odd doc is flagged iff its class
    is < 12 and not in {6,7,8} — exactly a fresh index built without
    the removed images. Idempotency is exercised in-query: the partial
    set is removed twice."""
    import numpy as np
    import pandas as pd
    from pipelinedp_spark.operators import multimodal as MM

    docs = (_t(spark, sf_dir, "documents").select("doc_id")
            .repartition(32))

    def gen(it):
        i, j = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                g = int(d) % 17
                base = (11 * ((i * i * (g + 2) + 3 * j) % 29)
                        + 5 * ((7 * i + (g + 5) * j * j) % 31)
                        + g * 17) % 200
                px = (base + (int(d) % 9) * 5).astype(np.uint8)
                payloads.append(MM.encode_bmp(px))
            yield pd.DataFrame({"doc_id": ids, "image": payloads})

    imgs = docs.mapInPandas(gen, "doc_id long, image binary")
    ref = imgs.filter((F.col("doc_id") % 2 == 0)
                      & (F.col("doc_id") % 17 < 12))
    batch = imgs.filter(F.col("doc_id") % 2 == 1)
    MM.build_phash_store(ref, "phash_tk_r11", max_hamming=2,
                         num_blocks=4)
    cand = ref.withColumn("cls", F.col("doc_id") % 17) \
        .filter(F.col("cls") < 9)
    keep = (cand.filter(F.col("cls") < 6).groupBy("cls")
            .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    rm = cand.join(keep, "doc_id", "left_anti").select("doc_id",
                                                       "image")
    partial = rm.filter(F.col("doc_id") % 17 < 6).localCheckpoint()
    MM.remove_from_phash_store(partial, "phash_tk_r11")
    MM.remove_from_phash_store(
        rm.filter(F.col("doc_id") % 17 >= 6), "phash_tk_r11")
    # re-removing already-removed images must be a no-op
    MM.remove_from_phash_store(partial, "phash_tk_r11")
    out = (MM.incremental_phash_dedup(batch, "phash_tk_r11")
           .select("doc_id", "is_dup").localCheckpoint())
    for t in ("phash_tk_r11_blocks", "phash_tk_r11_members",
              "phash_tk_r11_meta", "phash_tk_r11_tombstones",
              "phash_tk_r11_removed_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


_MULTIMODAL_PHASH_TAKEDOWN_SQL = """
SELECT doc_id,
       ((doc_id % 17) < 12 AND (doc_id % 17) NOT IN (6, 7, 8)) AS is_dup
FROM documents
WHERE doc_id % 2 = 1
ORDER BY doc_id
"""


def _multimodal_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup via spectral fingerprints (`multimodal.audio_dedup`,
    Haitsma-Kalker flux bits): each doc renders one of 17 fixed
    three-sinusoid waveforms (class = doc_id % 17) at a per-doc gain of
    2^(doc_id % 5) — byte hashes all differ, but the fingerprint's
    difference signs are gain-invariant (power-of-two gains scale every
    FFT intermediate exactly in IEEE arithmetic, so invariance is exact
    here; under re-quantized arbitrary gains it is approximate), so
    clips collapse to their waveform class (cross-class Hamming >= 22;
    pinned in tests). Real WAV bytes in between, real decode on the way
    out. Oracle = the planted class truth."""
    import numpy as np
    import pandas as pd
    from pipelinedp_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        n, sr = 4096, 8000
        t = np.arange(n) / sr
        bases = {}
        for g in range(17):
            f1, f2 = 200 + 60 * g, 900 + 37 * g
            w = (np.sin(2 * np.pi * f1 * t)
                 + 0.5 * np.sin(2 * np.pi * f2 * t)
                 + 0.25 * np.sin(2 * np.pi * (f1 * 2.3 + 11 * g) * t))
            bases[g] = np.round(1000 * w).astype(np.int16)
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = [
                MM.encode_wav(
                    (bases[int(d) % 17] * (1 << (int(d) % 5)))
                    .astype(np.int16), sr)
                for d in ids]
            yield pd.DataFrame({"doc_id": ids, "audio": payloads})

    clips = docs.mapInPandas(gen, "doc_id long, audio binary")
    return (MM.audio_dedup(clips, "audio", "doc_id")
            .select("doc_id", "is_dup"))


_MULTIMODAL_AUDIO_DEDUP_SQL = """
SELECT doc_id,
       doc_id > MIN(doc_id) OVER (PARTITION BY doc_id % 17) AS is_dup
FROM documents
ORDER BY doc_id
"""


def _doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line dedup (`dedup.line_dedup`, RefinedWeb/CCNet
    boilerplate removal, grouped by source): docs are made multi-line
    deterministically on BOTH sides (five frequent words become
    newlines),
    then any line shared by >= 2 distinct docs of the same source is
    stripped from all of them and the text is rebuilt in order. One
    posexplode, two map-side aggs on the 60-bit line hash, one
    (source, hash) equi-join, one groupBy(doc) rebuild — no windows."""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source",
        F.regexp_replace(F.col("text"), " (the|a|data|value|row) ",
                         "\n").alias("text"))
    return dedup.line_dedup(docs, min_docs=2, group_col="source")


_DOC_LINE_DEDUP_SQL = """
WITH base AS (
  SELECT doc_id, source,
         regexp_replace(text, ' (the|a|data|value|row) ', chr(10), 'g') AS t
  FROM documents
),
lines AS (
  SELECT doc_id, source,
         UNNEST(string_split(t, chr(10))) AS line,
         generate_subscripts(string_split(t, chr(10)), 1) AS pos
  FROM base
),
dup AS (
  SELECT source, line
  FROM (SELECT source, line, COUNT(DISTINCT doc_id) AS nd
        FROM lines WHERE trim(line) <> '' GROUP BY 1, 2)
  WHERE nd >= 2
),
tagged AS (
  SELECT l.doc_id, l.line, l.pos,
         (d.line IS NOT NULL AND trim(l.line) <> '') AS removed
  FROM lines l
  LEFT JOIN dup d ON l.source = d.source AND l.line = d.line
)
SELECT doc_id,
       COALESCE(string_agg(line, chr(10) ORDER BY pos)
                FILTER (WHERE NOT removed), '') AS clean_text,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed
FROM tagged
GROUP BY doc_id
"""


def _multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVI/MJPEG frame sampling (`video.sample_video_frames_avi`): each
    doc renders a real RIFF/AVI container with 6 + doc_id%5 MJPEG frames
    (frame i = solid gray 32 + 64*((doc_id+i)%4), encoded by the
    package's own JPEG codec), then every 2nd frame is demux-sampled and
    DECODED; the recovered mean luma collapses to its planted class
    (64-wide bins, JPEG error ~1 gray level). Real container mux, real
    demux walk, real DCT decode on the way out. Oracle = the plant."""
    import numpy as np
    import pandas as pd
    from pipelinedp_spark.operators import video as V
    from pipelinedp_spark.operators.jpeg import encode_jpeg

    docs = _t(spark, sf_dir, "documents").select("doc_id") \
        .repartition(spark.sparkContext.defaultParallelism)

    def gen(it):
        cell = [encode_jpeg(np.full((16, 16, 3), 32 + 64 * c,
                                    dtype=np.uint8)) for c in range(4)]
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            vids = [V.encode_avi_mjpeg(
                        [cell[(int(d) + i) % 4]
                         for i in range(6 + int(d) % 5)], 16, 16)
                    for d in ids]
            yield pd.DataFrame({"doc_id": ids, "video": vids})

    clips = docs.mapInPandas(gen, "doc_id long, video binary")
    frames = V.sample_video_frames_avi(clips, "video", "doc_id",
                                       every_nth=2, decode=True)
    return frames.select(
        "doc_id", "frame_idx", "width", "height",
        F.round((F.col("mean_luma") - 32) / 64).cast("long")
        .alias("luma_class"))


_MULTIMODAL_VIDEO_FRAMES_SQL = """
WITH f AS (
  SELECT doc_id, UNNEST(range(0, 6 + doc_id % 5)) AS i
  FROM documents
)
SELECT doc_id,
       CAST(i AS BIGINT) AS frame_idx,
       CAST(16 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       CAST((doc_id + i) % 4 AS BIGINT) AS luma_class
FROM f
WHERE i % 2 = 0
"""


def _doc_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + registered-domain stats
    (`functions.urls`): each doc gets a deterministically messy URL
    (upper-cased scheme/host, default :443 port, utm tracking params,
    unsorted params, fragments — all keyed off doc_id), which the
    engine canonicalizes, domain-extracts (incl. the co.uk two-label
    suffix path), and annotates with a broadcast per-domain doc count.
    Everything is codegen column expressions — zero Python per row.
    Oracle = the planted canonical form."""
    from pipelinedp_spark.functions import urls as U

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id").cast("string")
    k = (F.col("doc_id") % 23).cast("string")
    m2, m3 = F.col("doc_id") % 2, F.col("doc_id") % 3
    m4, m5 = F.col("doc_id") % 4, F.col("doc_id") % 5
    raw = F.concat(
        F.when(m2 == 0, F.lit("https://")).otherwise(F.lit("HTTPS://")),
        F.when(m3 == 0, F.concat(F.lit("WWW.Site"), k, F.lit(".COM")))
         .when(m3 == 1, F.concat(F.lit("Site"), k, F.lit(".co.uk:443")))
         .otherwise(F.concat(F.lit("m.site"), k, F.lit(".com"))),
        F.lit("/p/"), d,
        F.when(m4 == 0, F.lit("?utm_source=feed&b=2&a=1"))
         .when(m4 == 1, F.lit("?b=2&a=1"))
         .when(m4 == 2, F.lit("?utm_campaign=x"))
         .otherwise(F.lit("")),
        F.when(m5 == 0, F.lit("#sec")).otherwise(F.lit("")))
    pages = docs.withColumn("url", raw)
    out = U.with_domain_counts(pages, "url")
    return out.select(
        "doc_id",
        U.canonicalize_url(F.col("url")).alias("canon_url"),
        "domain", "n_in_domain")


_DOC_URL_CANONICALIZE_SQL = """
WITH p AS (
  SELECT doc_id, doc_id % 23 AS k, doc_id % 3 AS m3, doc_id % 4 AS m4
  FROM documents
),
e AS (
  SELECT doc_id,
         CASE m3 WHEN 0 THEN 'www.site' || k || '.com'
                 WHEN 1 THEN 'site' || k || '.co.uk'
                 ELSE 'm.site' || k || '.com' END AS ch,
         CASE m3 WHEN 1 THEN 'site' || k || '.co.uk'
                 ELSE 'site' || k || '.com' END AS domain,
         CASE WHEN m4 IN (0, 1) THEN '?a=1&b=2' ELSE '' END AS q
  FROM p
)
SELECT doc_id,
       'https://' || ch || '/p/' || doc_id || q AS canon_url,
       domain,
       COUNT(*) OVER (PARTITION BY domain) AS n_in_domain
FROM e
"""


def _multimodal_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup via sampled-frame perceptual hashing
    (`video.video_dedup`): each doc renders a real AVI whose first 8
    MJPEG frames cycle 4 textures of its class (doc_id % 11) and whose
    tail appends 0-3 doc-specific junk frames; sampling every 2nd frame
    capped at 4 pins the compared prefix, so the per-bit-majority
    fingerprint collapses exactly to the class (the 11 class
    fingerprints are distinct — random low-frequency textures). Real mux, real
    demux, real JPEG decode + DCT pHash per sampled frame. Oracle =
    the planted class truth."""
    import numpy as np
    import pandas as pd
    from pipelinedp_spark.operators import video as V
    from pipelinedp_spark.operators.jpeg import encode_jpeg

    # Repartition the 8-byte id rows BEFORE the expensive render pass so
    # parallelism is core-bound, not input-file-bound (sf1 ships 8 files).
    docs = _t(spark, sf_dir, "documents").select("doc_id") \
        .repartition(spark.sparkContext.defaultParallelism)

    def gen(it):
        def texture(seed):
            # Low-frequency texture (4x4 noise upsampled 4x): decodes
            # ~4x faster than raw noise (sparse post-quant spectrum)
            # and concentrates energy exactly where pHash looks.
            rng = np.random.default_rng(seed)
            base = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
            return encode_jpeg(np.kron(base, np.ones((4, 4, 1),
                                                     dtype=np.uint8)))
        cls = {c: [texture(c * 4 + j) for j in range(4)]
               for c in range(11)}
        junk = [texture(100_000 + j) for j in range(64)]  # memoized pool
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            vids = []
            for d in ids:
                d = int(d)
                frames = [cls[d % 11][i % 4] for i in range(8)]
                frames += [junk[(d * 16 + j) % 64] for j in range(d % 4)]
                vids.append(V.encode_avi_mjpeg(frames, 16, 16))
            yield pd.DataFrame({"doc_id": ids, "video": vids})

    clips = docs.mapInPandas(gen, "doc_id long, video binary")
    # keyframe mode = the scale path (one decode per video instead of
    # max_frames); flags are identical to the majority vote on this
    # corpus — the class is already decided by frame 0 — and the
    # majority path stays pinned by test_sources_multimodal_streaming.
    return (V.video_dedup(clips, "video", "doc_id",
                          every_nth=2, max_frames=4, mode="keyframe")
            .select("doc_id", "is_dup"))


_MULTIMODAL_VIDEO_DEDUP_SQL = """
SELECT doc_id,
       doc_id > MIN(doc_id) OVER (PARTITION BY doc_id % 11) AS is_dup
FROM documents
"""


def _multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native image resize, oracle-exact (`multimodal.resize_images` ->
    `image_pixel_stats`): each doc renders a gray BMP of planted size
    (8+d%5 x 8+d%7) with pixel v(y,x) = (d + 7y + 13x) % 256, resized
    to 4x4 with the engine's nearest-neighbor resampler (rows
    (i*h)//4, cols (j*w)//4) and re-encoded; the decoded pixel sum of
    the OUTPUT bytes must equal the closed-form plant — integer-exact
    end-to-end (BMP is lossless, gray luma == v). Oracle = the same
    index arithmetic in SQL."""
    import numpy as np
    import pandas as pd
    from pipelinedp_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            imgs, metas = [], []
            for d in ids:
                d = int(d)
                w, h = 8 + d % 5, 8 + d % 7
                y, x = np.mgrid[0:h, 0:w]
                v = ((d + 7 * y + 13 * x) % 256).astype(np.uint8)
                imgs.append(MM.encode_bmp(np.stack([v, v, v], axis=2)))
                metas.append({"width": w, "height": h, "format": "bmp"})
            yield pd.DataFrame({"doc_id": ids, "image": imgs,
                                "meta": metas})

    imgs = docs.mapInPandas(
        gen, "doc_id long, image binary, "
             "meta struct<width:int,height:int,format:string>")
    resized = MM.resize_images(imgs, "image", "meta",
                               width=4, height=4, decoder="native")
    return MM.image_pixel_stats(resized, "image").select(
        "doc_id", "px_width", "px_height", "px_sum")


_MULTIMODAL_RESIZE_STATS_SQL = """
WITH p AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 7 AS h
  FROM documents
),
g AS (SELECT doc_id, w, h, UNNEST(range(0, 4)) AS i FROM p),
gg AS (SELECT doc_id, w, h, i, UNNEST(range(0, 4)) AS j FROM g)
SELECT doc_id,
       CAST(4 AS INTEGER) AS px_width,
       CAST(4 AS INTEGER) AS px_height,
       CAST(SUM((doc_id + 7 * ((i * h) // 4) + 13 * ((j * w) // 4))
                % 256) AS BIGINT) AS px_sum
FROM gg
GROUP BY doc_id
"""


def _dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivor selection
    (`graph.keep_best_representative`): the simhash near-dup clusters
    from dedup_clusters, but each cluster keeps its LONGEST document
    (n_chars, ties to smallest id) instead of the minimum id — the
    production rule (keep the best copy). One max(struct) agg per
    cluster, no windows. Oracle = the recursive-CTE closure plus a
    per-cluster argmax."""
    from pipelinedp_spark.operators import dedup, graph
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.simhash_pairs(docs, max_hamming=3)
    clusters = graph.near_dup_clusters(docs, pairs)
    return graph.keep_best_representative(docs, clusters, "n_chars")


def _gen_dedup_keep_best_sql() -> str:
    pair_sql = _DEDUP_SIMHASH_SQL.replace("ORDER BY 1, 2", "")
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({pair_sql})
),
und AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT und.u, reach.lbl FROM und JOIN reach ON reach.node = und.v
),
cluster AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id
  FROM reach GROUP BY node
)
SELECT c.doc_id, c.cluster_id,
       ROW_NUMBER() OVER (
         PARTITION BY c.cluster_id
         ORDER BY d.n_chars DESC, c.doc_id ASC) = 1 AS is_kept
FROM cluster c JOIN documents d USING (doc_id)
"""


def _doc_paragraph_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet paragraph-level LM filtering
    (`quality.paragraph_perplexity_filter`, max_ppl=60): docs made
    multi-paragraph deterministically (five frequent words become
    newlines), each paragraph scored under the corpus-fit unigram LM,
    rare-token paragraphs (ppl > 60) dropped, docs rebuilt in order.
    Oracle recomputes the identical model and threshold in SQL."""
    from pipelinedp_spark.operators import quality
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.col("text"), " (the|a|data|value|row) ",
                         "\n").alias("text"))
    return quality.paragraph_perplexity_filter(docs, max_ppl=60.0)


def _gen_paragraph_filter_sql(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """SQL mirror of `quality.paragraph_perplexity_filter`: ln(N) is
    computed once in Python and injected as a literal into BOTH sides
    (the operator does the same), so the only cross-engine drift is
    last-ulp libm ln per token under the 6dp round."""
    import math
    import duckdb
    n = duckdb.sql(f"""
WITH base AS (SELECT regexp_replace(text, ' (the|a|data|value|row) ',
                                    chr(10), 'g') AS t
              FROM read_parquet('{sf_dir}/documents.parquet')),
paras AS (SELECT UNNEST(string_split(t, chr(10))) AS para FROM base)
SELECT SUM(len(string_split(para, ' '))) FROM paras""").fetchone()[0]
    ln_n = repr(math.log(float(n)))
    return f"""
WITH base AS (
  SELECT doc_id, regexp_replace(text, ' (the|a|data|value|row) ',
                                chr(10), 'g') AS t
  FROM documents
),
paras AS (
  SELECT doc_id, UNNEST(string_split(t, chr(10))) AS para,
         generate_subscripts(string_split(t, chr(10)), 1) AS pos
  FROM base
),
toks AS (
  SELECT doc_id, pos, unnest(string_split(para, ' ')) AS tok FROM paras
),
vocab AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c FROM toks GROUP BY tok),
ppl AS (
  SELECT doc_id, pos,
         ROUND(EXP({ln_n} - SUM(LN(c)) / COUNT(*)), 6) AS p
  FROM toks JOIN vocab USING (tok) GROUP BY doc_id, pos
),
tagged AS (
  SELECT paras.doc_id, paras.pos, paras.para, ppl.p > 60.0 AS dropped
  FROM paras JOIN ppl ON paras.doc_id = ppl.doc_id
                     AND paras.pos = ppl.pos
)
SELECT doc_id,
       COALESCE(string_agg(para, chr(10) ORDER BY pos)
                FILTER (WHERE NOT dropped), '') AS clean_text,
       COUNT(*) AS n_paragraphs,
       CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped
FROM tagged
GROUP BY doc_id
"""


def _stream_line_dedup_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mirror of `streaming.streaming_line_dedup` with exact
    two-trigger semantics: micro-batch 1 = even-id docs (boilerplate =
    lines in >= 2 distinct even docs), micro-batch 2 = odd-id docs
    (boilerplate counted against batch 1's accumulated state PLUS the
    odd batch itself). Same multiline transform as doc_line_dedup.
    The oracle replays both batches' cumulative count rules in SQL."""
    from pipelinedp_spark.streaming.dp_streaming import line_dedup_batch
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.col("text"), " (the|a|data|value|row) ",
                         "\n").alias("text"))
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    cleaned1, state1 = line_dedup_batch(even, None, materialize=True)
    cleaned2, _ = line_dedup_batch(odd, state1)
    return (cleaned1.withColumn("batch", F.lit(0).cast("long"))
            .unionByName(cleaned2.withColumn("batch",
                                             F.lit(1).cast("long"))))


_STREAM_LINE_DEDUP_MIRROR_SQL = """
WITH base AS (
  SELECT doc_id,
         regexp_replace(text, ' (the|a|data|value|row) ', chr(10), 'g') AS t
  FROM documents
),
lines AS (
  SELECT doc_id, doc_id % 2 AS par,
         UNNEST(string_split(t, chr(10))) AS line,
         generate_subscripts(string_split(t, chr(10)), 1) AS pos
  FROM base
),
ce AS (
  SELECT line, COUNT(DISTINCT doc_id) AS nd FROM lines
  WHERE par = 0 AND trim(line) <> '' GROUP BY 1
),
co AS (
  SELECT line, COUNT(DISTINCT doc_id) AS nd FROM lines
  WHERE par = 1 AND trim(line) <> '' GROUP BY 1
),
tagged AS (
  SELECT l.doc_id, l.par, l.line, l.pos,
         (trim(l.line) <> '' AND
          CASE WHEN l.par = 0 THEN COALESCE(ce.nd, 0) >= 2
               ELSE COALESCE(ce.nd, 0) + COALESCE(co.nd, 0) >= 2
          END) AS removed
  FROM lines l
  LEFT JOIN ce ON l.line = ce.line
  LEFT JOIN co ON l.line = co.line
)
SELECT doc_id,
       COALESCE(string_agg(line, chr(10) ORDER BY pos)
                FILTER (WHERE NOT removed), '') AS clean_text,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(par AS BIGINT) AS batch
FROM tagged
GROUP BY doc_id, par
"""


def _doc_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget curation (`mixing.select_to_token_budget`, budget =
    40000): docs ranked by token count DESC (id tiebreak, both folded
    into one unique ascending key) are taken greedily while the
    cumulative token count stays within budget — the prefix sum is the
    distributed two-phase running_sum, not a single-task window. Oracle
    = the same cumulative rule as a SQL window."""
    from pipelinedp_spark.operators.mixing import select_to_token_budget
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_toks"))
    # unique ascending priority key: more tokens first, then smaller id
    # (n_toks < 2^20, doc_id < 2^40 at any test SF)
    keyed = toks.withColumn(
        "__ord__",
        (-F.col("n_toks") * F.lit(1 << 40) + F.col("doc_id"))
        .cast("long"))
    out = select_to_token_budget(keyed, 40000, "n_toks", "__ord__")
    return out.select("doc_id", "n_toks",
                      F.col("cum_tokens").cast("long").alias("cum_tokens"))


_DOC_TOKEN_BUDGET_SQL = """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
),
c AS (
  SELECT doc_id, n_toks,
         SUM(n_toks) OVER (ORDER BY n_toks DESC, doc_id ASC
                           ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT doc_id, n_toks, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= 40000
"""


def _doc_wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-archive ingestion (`sources.webcrawl`): docs are packed into
    one multi-record WET archive blob PER SOURCE (applyInPandas — the
    Common Crawl file shape: many conversion records per archive), then
    `extract_wet_records` fans the blobs back out to one row per record
    and the doc id is recovered from the WARC-Target-URI. Exercises the
    length-driven (Content-Length) record walk end-to-end; oracle = the
    original documents table."""
    import pandas as pd
    from pipelinedp_spark.sources.webcrawl import (encode_wet,
                                                   extract_wet_records)

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source",
                                                 "text")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        recs = [(f"https://crawl.test/{int(d)}", t)
                for d, t in zip(pdf["doc_id"], pdf["text"])]
        return pd.DataFrame({"archive": [encode_wet(recs)]})

    archives = docs.groupBy("source").applyInPandas(
        pack, "archive binary")
    out = extract_wet_records(archives, "archive")
    return out.select(
        F.regexp_extract(F.col("uri"), r"/(\d+)$", 1).cast("long")
        .alias("doc_id"),
        "text")


_DOC_WET_ROUNDTRIP_SQL = """
SELECT doc_id, text FROM documents
"""


def _doc_tar_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard ingestion (`sources.webcrawl.encode_tar`
    / `extract_tar_members`): docs are packed as per-source tar shards
    with two modalities per sample ({id}.txt = text, {id}.cls =
    n_chars), exploded back to row-per-member, and the sample's
    modalities regrouped by key with one groupBy (the WebDataset
    pattern). Oracle = the original documents table."""
    import pandas as pd
    from pipelinedp_spark.sources.webcrawl import (encode_tar,
                                                   extract_tar_members)

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source",
                                                 "text", "n_chars")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        members = []
        for d, t, nc in zip(pdf["doc_id"], pdf["text"], pdf["n_chars"]):
            members.append((f"s/{int(d)}.txt", str(t).encode("utf-8")))
            members.append((f"s/{int(d)}.cls", str(int(nc)).encode()))
        return pd.DataFrame({"shard": [encode_tar(members)]})

    shards = docs.groupBy("source").applyInPandas(pack, "shard binary")
    mem = extract_tar_members(shards, "shard")
    sample = mem.groupBy("key").agg(
        F.first(F.when(F.col("suffix") == "txt",
                       F.decode(F.col("payload"), "UTF-8")),
                ignorenulls=True).alias("text"),
        F.first(F.when(F.col("suffix") == "cls",
                       F.decode(F.col("payload"), "UTF-8")),
                ignorenulls=True).cast("long").alias("n_chars"))
    return sample.select(
        F.regexp_extract(F.col("key"), r"/(\d+)$", 1).cast("long")
        .alias("doc_id"),
        "text", "n_chars")


_DOC_TAR_SHARDS_SQL = """
SELECT doc_id, text, n_chars FROM documents
"""


def _multimodal_exif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF extraction (`multimodal.parse_exif` / `extract_exif`): each
    doc gets a real JPEG with a planted APP1 Exif segment (TIFF IFD0;
    little-endian for even ids, big-endian MM for odd — both byte
    orders walked), every 7th doc carries NO EXIF (nulls). Oracle =
    the plant."""
    import numpy as np
    import pandas as pd
    from pipelinedp_spark.operators import multimodal as MM
    from pipelinedp_spark.operators.jpeg import encode_jpeg

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        base = encode_jpeg(np.full((8, 8, 3), 120, dtype=np.uint8))
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            imgs = []
            for d in ids:
                d = int(d)
                if d % 7 == 0:
                    imgs.append(base)
                    continue
                app1 = MM.build_exif_app1(
                    {"make": f"Cam{d % 5}",
                     "orientation": 1 + d % 8,
                     "datetime": f"2026:01:{1 + d % 28:02d} 00:00:00"},
                    big_endian=bool(d % 2))
                imgs.append(base[:2] + app1 + base[2:])
            yield pd.DataFrame({"doc_id": ids, "image": imgs})

    imgs = docs.mapInPandas(gen, "doc_id long, image binary")
    out = MM.extract_exif(imgs, "image")
    return out.select("doc_id",
                      F.col("exif.make").alias("make"),
                      F.col("exif.orientation").alias("orientation"),
                      F.col("exif.datetime").alias("exif_datetime"))


_MULTIMODAL_EXIF_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN NULL
            ELSE 'Cam' || CAST(doc_id % 5 AS VARCHAR) END AS make,
       CASE WHEN doc_id % 7 = 0 THEN NULL
            ELSE CAST(1 + doc_id % 8 AS INTEGER) END AS orientation,
       CASE WHEN doc_id % 7 = 0 THEN NULL
            ELSE '2026:01:' || lpad(CAST(1 + doc_id % 28 AS VARCHAR),
                                    2, '0') || ' 00:00:00'
       END AS exif_datetime
FROM documents
"""


def _multimodal_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 frame-header metadata (`multimodal.parse_mp3_metadata`):
    each doc renders a real MPEG-1 Layer III frame sequence (planted
    frame count 20 + d%17, bitrate index 1 + d%14, samplerate index
    d%3; every 11th doc gets an ID3v2 prefix the walker must skip) and
    the walk recovers rate/bitrate/frames/duration. Oracle = the plant
    (no 6dp rounding ties exist for these rationals — 44100 needs
    49 | n_frames, out of range)."""
    import pandas as pd
    from pipelinedp_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                d = int(d)
                b = MM.build_mp3_frames(20 + d % 17,
                                        bitrate_idx=1 + d % 14,
                                        rate_idx=d % 3)
                if d % 11 == 0:
                    b = (b"ID3\x04\x00\x00\x00\x00\x00\x0a"
                         + bytes(10) + b)
                payloads.append(b)
            yield pd.DataFrame({"doc_id": ids, "audio": payloads})

    clips = docs.mapInPandas(gen, "doc_id long, audio binary")
    out = MM.extract_mp3_metadata(clips, "audio")
    return out.select(
        "doc_id",
        F.col("mp3.sample_rate").alias("sample_rate"),
        F.col("mp3.bitrate_kbps").alias("bitrate_kbps"),
        F.col("mp3.n_frames").cast("long").alias("n_frames"),
        F.col("mp3.est_duration_s").alias("est_duration_s"))


_MULTIMODAL_MP3_META_SQL = """
WITH p AS (
  SELECT doc_id,
         20 + doc_id % 17 AS nf,
         1 + doc_id % 14 AS bi,
         doc_id % 3 AS ri
  FROM documents
)
SELECT doc_id,
       CAST(CASE ri WHEN 0 THEN 44100 WHEN 1 THEN 48000
                    ELSE 32000 END AS INTEGER) AS sample_rate,
       CAST(list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
                         bi) AS INTEGER) AS bitrate_kbps,
       CAST(nf AS BIGINT) AS n_frames,
       ROUND(nf * 1152.0 / (CASE ri WHEN 0 THEN 44100 WHEN 1 THEN 48000
                                    ELSE 32000 END), 6) AS est_duration_s
FROM p
"""


def _doc_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus cap — the full C4/RefinedWeb curation chain in
    one plan: planted messy URL -> `urls.registered_domain` -> at most
    3 docs kept per domain by md5 priority (`sampling.cap_per_key`,
    which compiles to partial+final WindowGroupLimit — a hot domain
    never concentrates on one task). Oracle replays the same domain
    formula and row_number rule."""
    from pipelinedp_spark.functions import urls as U
    from pipelinedp_spark.functions.sampling import cap_per_key
    from pipelinedp_spark.functions.text import hex_to_long

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    k = (F.col("doc_id") % 23).cast("string")
    m3 = F.col("doc_id") % 3
    host = (F.when(m3 == 0, F.concat(F.lit("www.site"), k,
                                     F.lit(".com")))
            .when(m3 == 1, F.concat(F.lit("site"), k, F.lit(".co.uk")))
            .otherwise(F.concat(F.lit("m.site"), k, F.lit(".com"))))
    pages = docs.withColumn(
        "url", F.concat(F.lit("https://"), host, F.lit("/p/"),
                        F.col("doc_id").cast("string")))
    tagged = pages.withColumn(
        "domain", U.registered_domain(U.url_host(F.col("url")))) \
        .withColumn("__pri__",
                    hex_to_long(F.md5(F.concat(F.lit("cap:"),
                                               F.col("doc_id")
                                               .cast("string")))))
    capped = cap_per_key(tagged, "domain", 3, "__pri__")
    return capped.select("doc_id", "domain")


_DOC_DOMAIN_CAP_SQL = """
WITH p AS (
  SELECT doc_id, doc_id % 23 AS k, doc_id % 3 AS m3 FROM documents
),
d AS (
  SELECT doc_id,
         CASE m3 WHEN 1 THEN 'site' || k || '.co.uk'
                 ELSE 'site' || k || '.com' END AS domain,
         ('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)),
                         1, 15))::BIGINT AS pri
  FROM p
),
r AS (
  SELECT doc_id, domain,
         ROW_NUMBER() OVER (PARTITION BY domain ORDER BY pri ASC) AS rn
  FROM d
)
SELECT doc_id, domain FROM r WHERE rn <= 3
"""


def _doc_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (`dedup.corpus_diff`): v2 of the documents
    table drops every 7th doc (removed), rewrites every 5th surviving
    text (changed), and appends 50 synthetic ids (added); the diff
    labels all of it off ONE full-outer join on the 60-bit fingerprints
    — text never shuffles. Oracle = the planted status formula."""
    from pipelinedp_spark.operators.dedup import corpus_diff
    old = _t(spark, sf_dir, "documents").select("doc_id", "text")
    surviving = old.filter(F.col("doc_id") % 7 != 0)
    changed = surviving.select(
        "doc_id",
        F.when((F.col("doc_id") % 5 == 0),
               F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")).alias("text"))
    mx = 1_000_000_000
    added = spark.range(mx, mx + 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("new doc "), F.col("id").cast("string"))
        .alias("text"))
    new = changed.unionByName(added)
    return corpus_diff(old, new)


_DOC_CORPUS_DIFF_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN 'removed'
            WHEN doc_id % 5 = 0 THEN 'changed'
            ELSE 'unchanged' END AS status
FROM documents
UNION ALL
SELECT 1000000000 + r.range AS doc_id, 'added' AS status
FROM range(0, 50) r
"""


def _doc_contamination_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc contamination audit (`decontam.contamination_report`,
    3-grams, eval = doc_id % 97 == 0): EVERY training doc reported with
    its gram total, eval-overlap count, and fraction — the release-
    review view where doc_decontaminate is the filter. Gram totals are
    a codegen size(); hits reuse the broadcast semi-join."""
    from pipelinedp_spark.operators.decontam import contamination_report
    docs = _t(spark, sf_dir, "documents")
    evald = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_report(train, evald, n=3)


_DOC_CONTAMINATION_SCORE_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
gr AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN [array_to_string(t[i:i+2], ' ')
                    for i in range(1, len(t) - 1)]
              ELSE [array_to_string(t, ' ')] END AS grams
  FROM tok),
ev AS (
  SELECT DISTINCT ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
  FROM gr, UNNEST(grams) AS u(g)
  WHERE doc_id % 97 = 0),
corpus AS (
  SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
  FROM gr, UNNEST(grams) AS u(g)
  WHERE doc_id % 97 <> 0),
hits AS (
  SELECT corpus.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM corpus JOIN ev USING (h)
  GROUP BY 1),
totals AS (
  SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams
  FROM gr WHERE doc_id % 97 <> 0)
SELECT t.doc_id, t.n_grams,
       COALESCE(h.n_hits, 0) AS n_hits,
       CASE WHEN t.n_grams > 0
            THEN ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
                       / t.n_grams, 6)
            ELSE 0.0 END AS contamination_frac
FROM totals t LEFT JOIN hits h USING (doc_id)
"""


def _doc_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codegen text normalization (`text.normalize_text`): each doc is
    made deterministically messy (tab/space padding, a BEL control
    byte, CRLF line breaks injected at ' the ') and normalized back;
    the expected output is a closed-form transform of the original
    text. Pure regexp expressions — zero Python per row."""
    from pipelinedp_spark.functions.text import normalize_text
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    messy = F.concat(F.lit("\t  "),
                     F.replace(F.col("text"), F.lit(" the "),
                               F.lit(" \r\n the ")),
                     F.lit("\x07"), F.lit("  "))
    return docs.select(
        "doc_id", normalize_text(messy).alias("clean_text"))


_DOC_NORMALIZE_TEXT_SQL = """
SELECT doc_id,
       replace(text, ' the ', chr(10) || 'the ') AS clean_text
FROM documents
"""


# ---------------------------------------------------------------------------
# round 7: character n-gram language ID + Unicode normalization
# ---------------------------------------------------------------------------

# Planted multilingual snippets (pre-lowercased so lower() parity never
# matters); odd doc_ids swap their English text for one of these, even
# doc_ids keep the original — the classifier must get both right.
_LANGID_SNIPPETS = [
    ("en", "i think that we should go to the market in the morning "
           "and buy some bread with the other people."),
    ("es", "nosotros vamos a la ciudad para comprar comida y después "
           "volvemos a casa con los niños pequeños."),
    ("de", "ich möchte morgen in die schule gehen und danach mit "
           "meinen freunden zusammen spielen."),
    ("fr", "nous allons au marché pour acheter des légumes et ensuite "
           "nous rentrons à la maison avec les enfants."),
    ("ru", "мы идем в магазин чтобы купить хлеб и потом возвращаемся "
           "домой вместе с детьми."),
    ("zh", "我们明天去市场买一些水果和蔬菜然后回家吃饭。"),
    ("ja", "私たちは明日市場へ行って果物を買います。それから家に帰ります。"),
    ("th", "พรุ่งนี้เราจะไปตลาดเพื่อซื้อผลไม้และกลับบ้าน"),
    ("ar", "نحن نذهب إلى السوق لشراء الخبز ثم نعود إلى البيت مع الأطفال."),
]


def _doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character 1/2/3-gram language ID (`operators.langid`): script
    blocks make CJK/Thai/Arabic/Cyrillic self-identifying, trigrams
    disambiguate Latin languages. Odd doc_ids carry planted
    multilingual snippets; even keep their English text. Exactly
    mirrored in SQL (substring grams + VALUES profile table +
    struct-max argmax)."""
    from pipelinedp_spark.operators.langid import language_id_ngram
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    snips = F.array(*[F.lit(s) for _, s in _LANGID_SNIPPETS])
    planted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 1,
               F.element_at(
                   snips,
                   (F.col("doc_id") % len(_LANGID_SNIPPETS))
                   .cast("int") + 1))
        .otherwise(F.col("text")).alias("text"))
    return language_id_ngram(planted)


def _gen_language_id_sql() -> str:
    from pipelinedp_spark.operators.langid import (MAX_GRAM,
                                                   language_profiles)
    prof = language_profiles()
    vals = ", ".join(
        "('{}', '{}', {!r})".format(lang, g.replace("'", "''"), w)
        for lang, g, w in prof)
    snip_list = ", ".join(
        "'{}'".format(s.replace("'", "''")) for _, s in _LANGID_SNIPPETS)
    k = len(_LANGID_SNIPPETS)
    gram_lists = ", ".join(
        f"[substring(t, i, {n}) for i in range(1, length(t) - {n} + 2)]"
        for n in range(1, MAX_GRAM + 1))
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 1
              THEN ([{snip_list}])[(doc_id % {k})::INT + 1]
              ELSE text END AS text
  FROM documents),
norm AS (
  SELECT doc_id,
         ' ' || trim(regexp_replace(lower(substring(text, 1, 256)), '\\s+', ' ', 'g'))
             || ' ' AS t
  FROM planted),
g AS (
  SELECT doc_id, length(t) * {MAX_GRAM} AS ng,
         unnest(flatten([{gram_lists}])) AS gram
  FROM norm),
wt(lang, gram, w) AS (VALUES {vals}),
hits AS (
  SELECT g.doc_id, wt.lang, g.ng, SUM(wt.w) AS h
  FROM g JOIN wt USING (gram)
  GROUP BY 1, 2, 3),
best AS (
  SELECT doc_id,
         max(struct_pack(score := ROUND(h / ng, 6),
                         lang := lang)) AS b
  FROM hits GROUP BY 1)
SELECT n.doc_id,
       COALESCE(b.b.lang, 'unknown') AS lang,
       COALESCE(b.b.score, 0.0) AS score
FROM norm n LEFT JOIN best b USING (doc_id)
"""


def _doc_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched Unicode normalization (`text.unicode_normalize`,
    form=NFC so DuckDB's nfc_normalize can oracle it; the NFKC
    compatibility folding of the same UDF is pinned by pytest). Each
    doc is decorated with decomposed accents (e + COMBINING ACUTE) and
    the UDF must compose them."""
    from pipelinedp_spark.functions.text import unicode_normalize
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # DECOMPOSED literals (e + U+0301, n + U+0303): the UDF must
    # compose them or the value hash differs from the oracle's
    # nfc_normalize output - an identity stand-in cannot pass.
    deco = F.concat(F.lit("re\u0301sume\u0301: "), F.col("text"),
                    F.lit(" cafe\u0301 n\u0303"))
    return docs.select(
        "doc_id", unicode_normalize(deco, "NFC").alias("ntext"))


_DOC_NFC_NORMALIZE_SQL = """
SELECT doc_id,
       nfc_normalize('re' || chr(769) || 'sume' || chr(769) || ': '
                     || text || ' cafe' || chr(769) || ' n'
                     || chr(771)) AS ntext
FROM documents
"""


def _doc_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality filter (Rae et al. 2021 Table A1
    defaults): per-rule booleans + overall pass, every rule except the
    top-2-gram shuffle a per-row codegen expression (the four line
    rules share ONE split via `text.line_signals`)."""
    from pipelinedp_spark.operators.quality import gopher_quality_filter
    docs = _t(spark, sf_dir, "documents")
    return gopher_quality_filter(docs)


_DOC_GOPHER_FILTER_SQL = """
WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t,
                    string_split(text, chr(10)) AS ls
             FROM documents),
g5 AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 5
              THEN [array_to_string(t[i:i+4], ' ')
                    for i in range(1, len(t) - 3)]
              ELSE [array_to_string(t, ' ')] END AS g
  FROM tok),
dup5 AS (
  SELECT doc_id,
         CASE WHEN list_aggregate([length(x) for x in g], 'sum') > 0
              THEN ROUND(
                (list_aggregate([length(x) for x in g], 'sum')
                 - list_aggregate([length(x) for x in list_distinct(g)],
                                  'sum'))::DOUBLE
                / list_aggregate([length(x) for x in g], 'sum'), 6)
              ELSE 0.0 END AS dup_5gram_frac
  FROM g5),
g2 AS (
  SELECT doc_id,
         UNNEST(CASE WHEN len(t) >= 2
                     THEN [t[i] || ' ' || t[i+1]
                           for i in range(1, len(t))]
                     ELSE [array_to_string(t, ' ')] END) AS g
  FROM tok),
cnt2 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2),
tot2 AS (SELECT doc_id, SUM(cnt * length(g)) AS total
         FROM cnt2 GROUP BY 1),
top2 AS (
  SELECT doc_id, g, cnt FROM cnt2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY cnt DESC, g ASC) = 1),
sig AS (
  SELECT doc_id,
         len(t) AS n_words,
         ROUND(list_aggregate([length(x) for x in t],
                              'sum')::DOUBLE
               / greatest(len(t), 1), 6) AS mwl,
         CASE WHEN len(t) > 0
              THEN ROUND(
                (length(text) - length(replace(text, '#', ''))
                 + len(regexp_extract_all(text, '\\.\\.\\.')))::DOUBLE
                / len(t), 6)
              ELSE 0.0 END AS sym,
         CASE WHEN len(ls) > 0
              THEN ROUND((len(ls) - len(list_distinct(ls)))::DOUBLE
                         / len(ls), 6) ELSE 0.0 END AS dlf,
         CASE WHEN list_aggregate([length(x) for x in ls], 'sum') > 0
              THEN ROUND(
                (list_aggregate([length(x) for x in ls], 'sum')
                 - list_aggregate(
                     [length(x) for x in list_distinct(ls)], 'sum')
                 )::DOUBLE
                / list_aggregate([length(x) for x in ls], 'sum'), 6)
              ELSE 0.0 END AS dlcf,
         CASE WHEN len(ls) > 0
              THEN ROUND(len([x for x in ls
                              if regexp_matches(trim(x), '^[-*•]')
                              ])::DOUBLE / len(ls), 6)
              ELSE 0.0 END AS bul,
         CASE WHEN len(ls) > 0
              THEN ROUND(len([x for x in ls
                              if regexp_matches(trim(x),
                                                '(\\.\\.\\.|…)$')
                              ])::DOUBLE / len(ls), 6)
              ELSE 0.0 END AS ell,
         ROUND(len([x for x in t
                    if regexp_matches(x, '[A-Za-z]')])::DOUBLE
               / greatest(len(t), 1), 6) AS alpha,
         len(list_intersect(
               list_distinct([regexp_replace(lower(x), '[^a-z]', '', 'g')
                              for x in t]),
               ['the', 'be', 'to', 'of', 'and', 'that',
                'have', 'with'])) AS sw
  FROM tok)
SELECT s.doc_id,
       s.n_words::BIGINT AS n_words,
       (s.n_words >= 50 AND s.n_words <= 100000) AS ok_words,
       (s.mwl >= 3.0 AND s.mwl <= 10.0) AS ok_word_len,
       (s.sym <= 0.1) AS ok_symbol,
       (s.bul <= 0.9 AND s.ell <= 0.3) AS ok_lines,
       (s.dlf <= 0.3 AND s.dlcf <= 0.2) AS ok_dup_lines,
       (ROUND((top2.cnt * length(top2.g))::DOUBLE / tot2.total, 6)
            <= 0.2) AS ok_top2gram,
       (dup5.dup_5gram_frac <= 0.15) AS ok_dup5gram,
       (s.alpha >= 0.8) AS ok_alpha,
       (s.sw >= 2) AS ok_stopwords,
       ((s.n_words >= 50 AND s.n_words <= 100000)
        AND (s.mwl >= 3.0 AND s.mwl <= 10.0)
        AND (s.sym <= 0.1)
        AND (s.bul <= 0.9 AND s.ell <= 0.3)
        AND (s.dlf <= 0.3 AND s.dlcf <= 0.2)
        AND (ROUND((top2.cnt * length(top2.g))::DOUBLE / tot2.total, 6)
             <= 0.2)
        AND (dup5.dup_5gram_frac <= 0.15)
        AND (s.alpha >= 0.8)
        AND (s.sw >= 2)) AS passes
FROM sig s
JOIN dup5 USING (doc_id)
JOIN top2 USING (doc_id)
JOIN tot2 USING (doc_id)
"""


def _doc_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF keywords per document (`retrieval.tfidf_keywords`):
    one corpus explode (shared word-count plan), df off the tf table,
    per-doc WindowGroupLimit top-k."""
    from pipelinedp_spark.operators.retrieval import tfidf_keywords
    docs = _t(spark, sf_dir, "documents")
    return tfidf_keywords(docs, k=5)


_DOC_TFIDF_KEYWORDS_SQL = """
WITH tfc AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  GROUP BY 1, 2),
dft AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
s AS (SELECT doc_id, term,
             tf * ln(nd::DOUBLE / df) AS score
      FROM tfc JOIN dft USING (term), n)
SELECT doc_id, term, rank, ROUND(score, 6) AS score
FROM (SELECT doc_id, term, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term ASC) AS rank
      FROM s)
WHERE rank <= 5
"""


def _doc_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus collocations by PMI over adjacent word pairs
    (`retrieval.pmi_collocations`): two word-count plans + a
    vocabulary-sized join, global top-k sort of the min_count
    survivors."""
    from pipelinedp_spark.operators.retrieval import pmi_collocations
    docs = _t(spark, sf_dir, "documents")
    return pmi_collocations(docs, k=50, min_count=5)


_DOC_PMI_COLLOCATIONS_SQL = """
WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
pr AS (
  SELECT unnest([{'x': t[i], 'y': t[i+1]}
                 for i in range(1, len(t))], recursive := true)
  FROM tok),
big AS (SELECT x, y, COUNT(*) AS c FROM pr GROUP BY 1, 2),
uni AS (SELECT w, COUNT(*) AS cw
        FROM (SELECT unnest(t) AS w FROM tok) GROUP BY 1),
tot AS (SELECT SUM(c) AS tt FROM big),
s AS (
  SELECT b.x, b.y, b.c,
         ln(b.c::DOUBLE * tot.tt / (ux.cw * uy.cw)) AS pmi
  FROM big b
  JOIN uni ux ON b.x = ux.w
  JOIN uni uy ON b.y = uy.w, tot
  WHERE b.c >= 5)
SELECT x || ' ' || y AS gram, c::BIGINT AS c, ROUND(pmi, 6) AS pmi
FROM s ORDER BY pmi DESC, gram ASC LIMIT 50
"""


_CODE_SNIPPETS = [
    ("def main(argv):\n    total = 0\n    for i in range(10):\n"
     "        total += i * i\n    return total\n"
     "if __name__ == '__main__':\n    print(main([]))"),
    ("public static int sum(int[] xs) {\n    int acc = 0;\n"
     "    for (int i = 0; i < xs.length; i++) { acc += xs[i]; }\n"
     "    return acc;\n}"),
    ("const f = (xs) => {\n    let acc = 0;\n"
     "    xs.forEach((x) => { acc += x; });\n    return acc;\n};"),
]


def _doc_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing signals (`text.code_signals` /
    `code_score`): doc_ids divisible by 3 keep their prose, the rest
    get a code snippet appended — the detector must separate them.
    Pure codegen regexp counts, mirrored exactly in SQL."""
    from pipelinedp_spark.functions.text import code_score, is_code
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    snips = F.array(*[F.lit(s) for s in _CODE_SNIPPETS])
    planted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.col("text"))
        .otherwise(F.concat(
            F.col("text"), F.lit("\n"),
            F.element_at(snips, (F.col("doc_id")
                                 % len(_CODE_SNIPPETS)).cast("int") + 1)))
        .alias("text"))
    return planted.select(
        "doc_id",
        code_score(F.col("text")).alias("code_score"),
        is_code(F.col("text")).alias("is_code"))


def _gen_code_detect_sql() -> str:
    from pipelinedp_spark.functions.text import _CODE_KEYWORD_PATTERN
    snips = ", ".join("'{}'".format(
        s.replace("'", "''").replace("\n", "' || chr(10) || '"))
        for s in _CODE_SNIPPETS)
    # DuckDB single-quoted strings do not process backslash escapes, so
    # the Java-regex pattern passes through verbatim.
    kw = _CODE_KEYWORD_PATTERN.replace("'", "''")
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text
              ELSE text || chr(10)
                   || ([{snips}])[(doc_id % 3)::INT + 1] END AS text
  FROM documents),
sig AS (
  SELECT doc_id,
         ROUND(len(regexp_extract_all(text,
                   '[{{}}\\[\\]()]'))::DOUBLE
               / greatest(length(text), 1), 6) AS brace_density,
         ROUND(len([x for x in string_split(text, chr(10))
                    if regexp_matches(x, ';\\s*$')])::DOUBLE
               / greatest(len(string_split(text, chr(10))), 1), 6)
             AS semicolon_line_frac,
         ROUND(len([x for x in string_split(text, chr(10))
                    if regexp_matches(x, '^(    |\\t)')])::DOUBLE
               / greatest(len(string_split(text, chr(10))), 1), 6)
             AS indent_line_frac,
         ROUND(len(regexp_extract_all(text, '{kw}'))::DOUBLE
               / greatest(len(string_split(text, ' ')), 1), 6)
             AS keyword_density,
         ROUND(len(regexp_extract_all(text,
                   '(==|!=|<=|>=|->|=>|\\+=|-=|\\*=|/=|::|:=)'))::DOUBLE
               / greatest(length(text), 1), 6) AS assign_density
  FROM planted)
SELECT doc_id,
       ROUND(least(1.0, brace_density * 8.0
                        + semicolon_line_frac * 1.2
                        + indent_line_frac * 0.8
                        + keyword_density * 3.0
                        + assign_density * 10.0), 6) AS code_score,
       (ROUND(least(1.0, brace_density * 8.0
                         + semicolon_line_frac * 1.2
                         + indent_line_frac * 0.8
                         + keyword_density * 3.0
                         + assign_density * 10.0), 6) >= 0.3) AS is_code
FROM sig
"""


def _doc_language_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus language distribution off the n-gram language classifier:
    per-language doc counts + share. The share window runs over the
    ALREADY-AGGREGATED language table (tens of rows), not the corpus."""
    from pyspark.sql import Window as W
    counts = (_doc_language_id(spark, sf_dir)
              .groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs")))
    total = W.partitionBy()
    return counts.select(
        "lang", F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.col("n_docs").cast("double")
                / F.sum("n_docs").over(total), 6).alias("share"))


def _gen_language_mix_sql() -> str:
    inner = _gen_language_id_sql()
    return f"""
WITH lid AS ({inner})
SELECT lang, COUNT(*)::BIGINT AS n_docs,
       ROUND(COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER (), 6) AS share
FROM lid GROUP BY lang
"""


def _doc_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-level corpus dedup (`dedup.sentence_dedup`): documents
    get deterministic sentence boundaries on BOTH sides (five frequent
    words become '. '), then any trimmed sentence shared by >= 2
    distinct docs of the same source is stripped and the text rebuilt
    in order. Same plan shape as line dedup — hash-only counting
    shuffles, groupBy rebuild, no windows."""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source",
        F.regexp_replace(F.col("text"), " (the|a|data|value|row) ",
                         ". ").alias("text"))
    return dedup.sentence_dedup(docs, min_docs=2, group_col="source")


_DOC_SENTENCE_DEDUP_SQL = """
WITH base AS (
  SELECT doc_id, source,
         regexp_replace(text, ' (the|a|data|value|row) ', '. ', 'g') AS t
  FROM documents
),
sents AS (
  SELECT doc_id, source,
         UNNEST(regexp_extract_all(t, '[^.!?]+[.!?]*')) AS s,
         generate_subscripts(regexp_extract_all(t, '[^.!?]+[.!?]*'), 1)
             AS pos
  FROM base
),
dup AS (
  SELECT source, ts
  FROM (SELECT source, trim(s) AS ts, COUNT(DISTINCT doc_id) AS nd
        FROM sents WHERE trim(s) <> '' GROUP BY 1, 2)
  WHERE nd >= 2
),
tagged AS (
  SELECT se.doc_id, se.s, se.pos,
         (d.ts IS NOT NULL AND trim(se.s) <> '') AS removed
  FROM sents se
  LEFT JOIN dup d ON se.source = d.source AND trim(se.s) = d.ts
),
reb AS (
  SELECT doc_id,
         COALESCE(string_agg(s, '' ORDER BY pos)
                  FILTER (WHERE NOT removed), '') AS clean_text,
         COUNT(*) AS n_lines,
         CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed
  FROM tagged
  GROUP BY doc_id
)
SELECT b.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(COALESCE(r.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed
FROM base b LEFT JOIN reb r USING (doc_id)
"""


def _stream_sentence_dedup_mirror(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Batch mirror of `streaming.streaming_sentence_dedup` with exact
    two-trigger semantics (same harness as stream_line_dedup_mirror):
    batch 1 = even docs, batch 2 = odd docs counted against batch 1's
    accumulated sentence state. Same '. ' sentence decoration as
    doc_sentence_dedup."""
    from pipelinedp_spark.streaming.dp_streaming import (
        sentence_dedup_batch)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.col("text"), " (the|a|data|value|row) ",
                         ". ").alias("text"))
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    cleaned1, state1 = sentence_dedup_batch(even, None, materialize=True)
    cleaned2, _ = sentence_dedup_batch(odd, state1)
    return (cleaned1.withColumn("batch", F.lit(0).cast("long"))
            .unionByName(cleaned2.withColumn("batch",
                                             F.lit(1).cast("long"))))


_STREAM_SENTENCE_DEDUP_MIRROR_SQL = """
WITH base AS (
  SELECT doc_id,
         regexp_replace(text, ' (the|a|data|value|row) ', '. ', 'g') AS t
  FROM documents
),
sents AS (
  SELECT doc_id, doc_id % 2 AS par,
         UNNEST(regexp_extract_all(t, '[^.!?]+[.!?]*')) AS s,
         generate_subscripts(regexp_extract_all(t, '[^.!?]+[.!?]*'), 1)
             AS pos
  FROM base
),
ce AS (
  SELECT trim(s) AS ts, COUNT(DISTINCT doc_id) AS nd FROM sents
  WHERE par = 0 AND trim(s) <> '' GROUP BY 1
),
co AS (
  SELECT trim(s) AS ts, COUNT(DISTINCT doc_id) AS nd FROM sents
  WHERE par = 1 AND trim(s) <> '' GROUP BY 1
),
tagged AS (
  SELECT se.doc_id, se.par, se.s, se.pos,
         (trim(se.s) <> '' AND
          CASE WHEN se.par = 0 THEN COALESCE(ce.nd, 0) >= 2
               ELSE COALESCE(ce.nd, 0) + COALESCE(co.nd, 0) >= 2
          END) AS removed
  FROM sents se
  LEFT JOIN ce ON trim(se.s) = ce.ts
  LEFT JOIN co ON trim(se.s) = co.ts
),
reb AS (
  SELECT doc_id, par AS batch,
         COALESCE(string_agg(s, '' ORDER BY pos)
                  FILTER (WHERE NOT removed), '') AS clean_text,
         COUNT(*) AS n_lines,
         CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed
  FROM tagged
  GROUP BY doc_id, par
)
SELECT b.doc_id,
       b.doc_id % 2 AS batch,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(COALESCE(r.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed
FROM base b LEFT JOIN reb r USING (doc_id)
"""


def _sim_ivf_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval (`similarity.ivf_pq_rerank_topk`): IVF-PQ
    40-candidate shortlist from compressed codes, exact-cosine re-rank
    of only those rows — the production serving shape. Oracle = the
    composed IVF-PQ SQL at k*mult re-ranked by true cosine."""
    from pipelinedp_spark.operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    out = similarity.ivf_pq_rerank_topk(emb, q, k=10, shortlist_mult=4,
                                        num_cells=8, nprobe=2,
                                        m=4, ksub=16)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _gen_ivf_pq_rerank_sql(k: int = 10, mult: int = 4) -> str:
    inner = _gen_ivf_pq_topk_sql(k=k * mult)
    return f"""
WITH short AS ({inner}),
bv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
resc AS (
  SELECT s.query_id, s.vec_id,
         list_dot_product(c.v, q.v) /
         (sqrt(list_dot_product(c.v, c.v))
          * sqrt(list_dot_product(q.v, q.v))) AS cosine
  FROM short s
  JOIN bv c ON s.vec_id = c.vec_id
  JOIN bv q ON s.query_id = q.vec_id)
SELECT query_id, vec_id, rank, ROUND(cosine, 6) AS cosine
FROM (SELECT query_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id ASC)
                 AS rank
      FROM resc)
WHERE rank <= {k}
"""


def _emb_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means on the FULL embedding corpus
    (`clustering.kmeans_fit`): codegen nearest-centroid assignment, one
    map-side-combinable (cluster, pos) sum per iteration, exact
    integer arithmetic on quantized inputs so the iterative fit is
    bit-reproducible. Oracle = the same 3 iterations unrolled into
    CTEs (assign / mean / carry) on the same quantized vectors."""
    from pipelinedp_spark.operators import clustering
    emb = _t(spark, sf_dir, "embeddings")
    cents, sizes = clustering.kmeans_fit(emb, k=8, iters=3)
    return clustering.centroids_table(spark, cents, sizes)


def _gen_kmeans_prefix(k: int, iters: int, q: int) -> str:
    """Unrolled Lloyd iterations: a{i} assigns against c{i-1} (argmax of
    dot(v, c) - ||c||^2/2, ties to lowest cluster), m{i} takes exact
    integer-sum means per (cluster, pos), c{i} carries the previous
    centroid for emptied clusters. Mirrors kmeans_fit step for step.
    Returns the WITH body up to c{iters} for final-SELECTs to build on."""
    sql = f"""
WITH v AS (
  SELECT vec_id,
         [CAST(floor(x * {q}.0 + 0.5) AS BIGINT)
          for x in embedding::DOUBLE[]] AS vq
  FROM embeddings),
vd AS (SELECT vec_id, vq::DOUBLE[] AS vdd FROM v),
ex AS (
  SELECT vec_id, UNNEST(vq) AS val,
         generate_subscripts(vq, 1) - 1 AS pos
  FROM v),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         vq::DOUBLE[] AS cent
  FROM v ORDER BY vec_id LIMIT {k})"""
    for i in range(1, iters + 1):
        sql += f""",
a{i} AS (
  SELECT vec_id, cluster FROM (
    SELECT d.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY d.vec_id
             ORDER BY list_dot_product(d.vdd, c.cent)
                      - 0.5 * list_dot_product(c.cent, c.cent) DESC,
                      c.cluster ASC) AS rn
    FROM vd d CROSS JOIN c{i - 1} c) WHERE rn = 1),
m{i} AS (
  SELECT a.cluster, e.pos, SUM(e.val) / COUNT(*) AS cm
  FROM a{i} a JOIN ex e USING (vec_id)
  GROUP BY 1, 2),
c{i} AS (
  SELECT p.cluster, COALESCE(n.cent, p.cent) AS cent
  FROM c{i - 1} p LEFT JOIN (
    SELECT cluster, list(cm ORDER BY pos) AS cent
    FROM m{i} GROUP BY 1) n USING (cluster))"""
    return sql


def _gen_kmeans_sql(k: int = 8, iters: int = 3, q: int = 1 << 20) -> str:
    sql = _gen_kmeans_prefix(k, iters, q)
    sql += f""",
sz AS (SELECT cluster, COUNT(*) AS members FROM a{iters} GROUP BY 1),
fin AS (
  SELECT cluster, UNNEST(cent) AS cm,
         generate_subscripts(cent, 1) - 1 AS pos
  FROM c{iters})
SELECT CAST(f.cluster AS BIGINT) AS cluster,
       CAST(f.pos AS BIGINT) AS pos,
       ROUND(f.cm, 6) AS centroid,
       CAST(COALESCE(s.members, 0) AS BIGINT) AS members
FROM fin f LEFT JOIN sz s USING (cluster)
"""
    return sql


def _emb_cluster_balanced_sample(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Cluster-balanced curation subset
    (`clustering.cluster_balanced_sample`): k-means topics capped at a
    fixed per-cluster budget, rows picked in portable-hash order so the
    subset is reproducible across engines and layouts. Oracle = the
    unrolled-Lloyd prefix + final assignment + per-cluster
    ROW_NUMBER over the same md5-derived order key."""
    from pipelinedp_spark.operators import clustering
    emb = _t(spark, sf_dir, "embeddings")
    return clustering.cluster_balanced_sample(emb, k=8, iters=2,
                                              per_cluster=12)


def _gen_cluster_balanced_sql(k: int = 8, iters: int = 2,
                              per_cluster: int = 12,
                              q: int = 1 << 20) -> str:
    sql = _gen_kmeans_prefix(k, iters, q)
    sql += f""",
af AS (
  SELECT vec_id, cluster FROM (
    SELECT d.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY d.vec_id
             ORDER BY list_dot_product(d.vdd, c.cent)
                      - 0.5 * list_dot_product(c.cent, c.cent) DESC,
                      c.cluster ASC) AS rn
    FROM vd d CROSS JOIN c{iters} c) WHERE rn = 1)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(cluster AS BIGINT) AS cluster,
       CAST(rk AS BIGINT) AS rank
FROM (
  SELECT vec_id, cluster,
         ROW_NUMBER() OVER (
           PARTITION BY cluster
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                        ::BIGINT ASC,
                    vec_id ASC) AS rk
  FROM af)
WHERE rk <= {per_cluster}
"""
    return sql


def _emb_int8_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization QA (`functions.embeddings.int8_*`):
    per-dimension code range and reconstruction error for the 4x
    storage cut. Errors are scaled to exact 1e-7 integer ticks so the
    aggregation is order-independent (same trick as the k-means fit);
    oracle recomputes the identical affine codes in SQL."""
    from pipelinedp_spark.functions import embeddings as EMB
    emb = _t(spark, sf_dir, "embeddings")
    params = EMB.int8_quantize_params(emb, "embedding")
    codes = EMB.int8_quantize_expr(F.col("embedding"), params)
    deq = EMB.int8_dequantize_expr(codes, params)
    errq = F.zip_with(
        deq, F.col("embedding").cast("array<double>"),
        lambda a, b: F.floor(F.abs(a - b) * F.lit(1e7) + F.lit(0.5))
        .cast("long"))
    pair = F.zip_with(codes, errq,
                      lambda c, e: F.struct(c.alias("c"), e.alias("e")))
    ex = emb.select(F.posexplode(pair).alias("pos", "s"))
    return (ex.groupBy(F.col("pos").cast("long").alias("pos"))
            .agg(F.min(F.col("s.c")).cast("long").alias("code_min"),
                 F.max(F.col("s.c")).cast("long").alias("code_max"),
                 F.max(F.col("s.e")).alias("max_err_e7"),
                 F.round(F.sum(F.col("s.e")) / F.count(F.lit(1)), 6)
                 .alias("mean_err_e7")))


_EMB_INT8_ROUNDTRIP_SQL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
ex AS (
  SELECT vec_id, UNNEST(e) AS x,
         generate_subscripts(e, 1) - 1 AS pos
  FROM v),
mm AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY 1),
q AS (
  SELECT e.pos,
         CAST(CASE WHEN (m.mx - m.mn) / 255.0 > 0
                   THEN floor((e.x - m.mn) / ((m.mx - m.mn) / 255.0)
                              + 0.5)
                   ELSE 0 END - 128 AS BIGINT) AS code,
         e.x, m.mn, m.mx
  FROM ex e JOIN mm m USING (pos)),
r AS (
  SELECT pos, code,
         CAST(floor(abs((code + 128) * ((mx - mn) / 255.0) + mn - x)
                    * 10000000.0 + 0.5) AS BIGINT) AS eq
  FROM q)
SELECT CAST(pos AS BIGINT) AS pos,
       CAST(MIN(code) AS BIGINT) AS code_min,
       CAST(MAX(code) AS BIGINT) AS code_max,
       CAST(MAX(eq) AS BIGINT) AS max_err_e7,
       ROUND(SUM(eq) / COUNT(*), 6) AS mean_err_e7
FROM r GROUP BY 1
"""


def _emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus covariance matrix (`functions.embeddings.gram_sums`):
    per-partition numpy int64 Gram partials, O(partitions x dim^2)
    shuffle, exact integer assembly (n*sxy - s_i*s_j) / n^2 with one
    final division — the PCA/whitening input at any corpus size.
    Oracle recomputes the pairwise-product sums by self-joining the
    unnested quantized vectors."""
    from pipelinedp_spark.functions import embeddings as EMB
    emb = _t(spark, sf_dir, "embeddings")
    g = EMB.gram_sums(emb, "embedding", 1 << 10).localCheckpoint()
    n = int(g.filter((F.col("i") == -1) & (F.col("j") == -1))
            .first()["sxy"])
    lin = g.filter((F.col("i") == -1) & (F.col("j") >= 0)) \
           .select(F.col("j").alias("pos"), F.col("sxy").alias("sv"))
    pairs = g.filter(F.col("i") >= 0)
    si = lin.select(F.col("pos").alias("i"), F.col("sv").alias("si"))
    sj = lin.select(F.col("pos").alias("j"), F.col("sv").alias("sj"))
    return (pairs.join(F.broadcast(si), "i").join(F.broadcast(sj), "j")
            .select("i", "j",
                    F.round((F.lit(n) * F.col("sxy")
                             - F.col("si") * F.col("sj"))
                            / F.lit(n * n), 6).alias("cov")))


_EMB_COVARIANCE_SQL = """
WITH v AS (
  SELECT vec_id,
         [CAST(floor(x * 1024.0 + 0.5) AS BIGINT)
          for x in embedding::DOUBLE[]] AS vq
  FROM embeddings),
ex AS (
  SELECT vec_id, UNNEST(vq) AS val,
         generate_subscripts(vq, 1) - 1 AS pos
  FROM v),
pr AS (
  SELECT a.pos AS i, b.pos AS j, SUM(a.val * b.val) AS sxy
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.pos <= b.pos
  GROUP BY 1, 2),
s AS (SELECT pos, SUM(val) AS sv FROM ex GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM v)
SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
       ROUND((nn.n * p.sxy - si.sv * sj.sv) / (nn.n * nn.n), 6) AS cov
FROM pr p
CROSS JOIN nn
JOIN s si ON si.pos = p.i
JOIN s sj ON sj.pos = p.j
"""


def _emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA dim-reduction (`functions.embeddings.pca_*`): gram_sums →
    driver eigh on the bounded covariance → pure-codegen projection
    folds. Oracle re-derives the identical components from the same
    parquet (shared pca_from_gram helper, same precedent as the IVF
    quantizer oracles) and projects with list_dot_product."""
    from pipelinedp_spark.functions import embeddings as EMB
    emb = _t(spark, sf_dir, "embeddings")
    comps, mean_dots, _ = EMB.pca_components(emb, "embedding", k=4)
    pcs = EMB.pca_project_expr(F.col("embedding"), comps, mean_dots)
    return emb.select("vec_id",
                      *[F.round(pc, 6).alias(f"pc{i}")
                        for i, pc in enumerate(pcs)])


def _gen_pca_sql(k: int = 4, q: int = 1 << 10,
                 sf_dir: str = "/root/testdata/sf0.01") -> str:
    import duckdb
    import numpy as np

    from pipelinedp_spark.functions.embeddings import pca_from_gram

    sample = duckdb.sql(
        f"SELECT embedding FROM read_parquet"
        f"('{sf_dir}/embeddings.parquet')").fetchnumpy()["embedding"]
    x = np.floor(np.stack([np.asarray(v, dtype="float64")
                           for v in sample]) * float(q) + 0.5) \
        .astype(np.int64)
    g = x.T @ x
    s = x.sum(axis=0)
    dim = x.shape[1]
    rows = [(-1, -1, len(x))]
    rows += [(-1, j, int(s[j])) for j in range(dim)]
    rows += [(i, j, int(g[i, j])) for i in range(dim)
             for j in range(i, dim)]
    comps, mean_dots, _ = pca_from_gram(rows, dim, k)
    comp_lits = [
        "[" + ", ".join(repr(float(c)) for c in comp) + "]"
        for comp in comps]
    sel = ",\n       ".join(
        f"ROUND(list_dot_product(xq, {comp_lits[i]}) "
        f"- {mean_dots[i]!r}, 6) AS pc{i}" for i in range(k))
    return f"""
WITH v AS (
  SELECT vec_id,
         [floor(x * {q}.0 + 0.5) for x in embedding::DOUBLE[]] AS xq
  FROM embeddings)
SELECT vec_id,
       {sel}
FROM v
"""


def _doc_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching report (`packing.length_buckets`):
    price the padding cost of bucket boundaries before an SFT run.
    Pure codegen ladder + a <=8-key groupBy; oracle mirrors the CASE
    ladder on string_split token counts."""
    from pipelinedp_spark.operators import packing
    docs = _t(spark, sf_dir, "documents")
    return packing.length_buckets(docs, "text",
                                  boundaries=(32, 64, 128, 256, 512))


_DOC_LENGTH_BUCKETS_SQL = """
WITH tok AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
b AS (
  SELECT n,
         CASE WHEN n <= 32 THEN 32
              WHEN n <= 64 THEN 64
              WHEN n <= 128 THEN 128
              WHEN n <= 256 THEN 256
              ELSE 512 END AS bucket
  FROM tok)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST(SUM(LEAST(n, bucket)) AS BIGINT) AS kept_tokens,
       CAST(COUNT(*) * bucket - SUM(LEAST(n, bucket)) AS BIGINT)
           AS pad_tokens,
       ROUND((COUNT(*) * bucket - SUM(LEAST(n, bucket)))
             / (COUNT(*) * bucket), 6) AS pad_frac
FROM b GROUP BY bucket
"""


def _stream_cluster_assign_mirror(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Batch twin of `streaming.streaming_cluster_assign`: assignment
    is a STATELESS codegen expression, so the streaming operator is
    the batch expression verbatim — this mirror runs it through the
    streaming entry point on two micro-batch halves (even/odd ids) and
    reports per-batch cluster counts. True-streaming execution is
    pinned by tests/test_clustering.py's availableNow run."""
    from pipelinedp_spark.operators import clustering
    from pipelinedp_spark.streaming.dp_streaming import (
        streaming_cluster_assign)
    emb = _t(spark, sf_dir, "embeddings")
    cents, _ = clustering.kmeans_fit(emb, k=8, iters=2)
    asg = streaming_cluster_assign(emb, cents)
    return (asg.groupBy((F.col("vec_id") % 2).cast("long").alias("batch"),
                        "cluster")
            .agg(F.count(F.lit(1)).alias("n")))


def _gen_stream_cluster_sql(k: int = 8, iters: int = 2,
                            q: int = 1 << 20) -> str:
    sql = _gen_kmeans_prefix(k, iters, q)
    sql += f""",
af AS (
  SELECT vec_id, cluster FROM (
    SELECT d.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY d.vec_id
             ORDER BY list_dot_product(d.vdd, c.cent)
                      - 0.5 * list_dot_product(c.cent, c.cent) DESC,
                      c.cluster ASC) AS rn
    FROM vd d CROSS JOIN c{iters} c) WHERE rn = 1)
SELECT CAST(vec_id % 2 AS BIGINT) AS batch,
       CAST(cluster AS BIGINT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n
FROM af GROUP BY 1, 2
"""
    return sql


def _emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training data prep (`similarity.hard_negatives`):
    top-5 nearest different-label rows per anchor — the label filter
    runs before scoring so same-label pairs never cost a cosine."""
    from pipelinedp_spark.operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec"),
                 F.col("label").alias("query_label")))
    return similarity.hard_negatives(emb, q, k=5)


_EMB_HARD_NEGATIVES_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
  FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(e.embedding::DOUBLE[], q.qv) /
         (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                e.embedding::DOUBLE[]))
          * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.label <> q.ql),
ranked AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank,
         cosine
  FROM scored)
SELECT query_id, vec_id, rank, ROUND(cosine, 6) AS cosine
FROM ranked WHERE rank <= 5
"""


def _emb_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality audit: per k-means cluster, its size, majority
    label, and purity (majority share). Reuses
    `streaming_cluster_assign` on the batch frame (stateless codegen —
    no join to re-attach labels) + one two-level agg with a
    max(struct) argmax, no windows."""
    from pipelinedp_spark.operators import clustering
    from pipelinedp_spark.streaming.dp_streaming import (
        streaming_cluster_assign)
    emb = _t(spark, sf_dir, "embeddings")
    cents, _ = clustering.kmeans_fit(emb, k=8, iters=2)
    asg = streaming_cluster_assign(emb, cents)
    cnt = (asg.groupBy("cluster", F.col("label").cast("long")
                       .alias("label"))
           .agg(F.count(F.lit(1)).alias("c")))
    return (cnt.groupBy("cluster")
            .agg(F.sum("c").alias("n"),
                 F.max(F.struct(F.col("c"), (-F.col("label"))
                                .alias("nl"))).alias("_m"))
            .select("cluster", "n",
                    (-F.col("_m.nl")).alias("top_label"),
                    F.round(F.col("_m.c") / F.col("n"), 6)
                    .alias("purity")))


def _gen_cluster_purity_sql(k: int = 8, iters: int = 2,
                            q: int = 1 << 20) -> str:
    sql = _gen_kmeans_prefix(k, iters, q)
    sql += f""",
af AS (
  SELECT vec_id, cluster FROM (
    SELECT d.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY d.vec_id
             ORDER BY list_dot_product(d.vdd, c.cent)
                      - 0.5 * list_dot_product(c.cent, c.cent) DESC,
                      c.cluster ASC) AS rn
    FROM vd d CROSS JOIN c{iters} c) WHERE rn = 1),
lab AS (
  SELECT af.cluster, CAST(e.label AS BIGINT) AS label
  FROM af JOIN embeddings e USING (vec_id)),
cnt AS (SELECT cluster, label, COUNT(*) AS c FROM lab GROUP BY 1, 2),
top AS (
  SELECT cluster, label AS top_label, c FROM cnt
  QUALIFY ROW_NUMBER() OVER (PARTITION BY cluster
                             ORDER BY c DESC, label ASC) = 1),
tot AS (SELECT cluster, SUM(c) AS n FROM cnt GROUP BY 1)
SELECT CAST(t.cluster AS BIGINT) AS cluster,
       CAST(tot.n AS BIGINT) AS n,
       CAST(t.top_label AS BIGINT) AS top_label,
       ROUND(t.c / tot.n, 6) AS purity
FROM top t JOIN tot USING (cluster)
"""
    return sql


def _emb_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet-loss training rows (`similarity.mine_triplets`):
    rank-aligned same-label positives and different-label hard
    negatives with the training margin."""
    from pipelinedp_spark.operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec"),
                 F.col("label").alias("query_label")))
    return similarity.mine_triplets(emb, q, k=3)


_EMB_TRIPLETS_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
  FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, q.ql, e.vec_id, e.label,
         list_dot_product(e.embedding::DOUBLE[], q.qv) /
         (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                e.embedding::DOUBLE[]))
          * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
  FROM embeddings e CROSS JOIN q),
pos AS (
  SELECT query_id, vec_id AS pos_id, cosine AS pc,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored WHERE label = ql AND vec_id <> query_id),
neg AS (
  SELECT query_id, vec_id AS neg_id, cosine AS nc,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored WHERE label <> ql)
SELECT p.query_id, p.rank, p.pos_id, n.neg_id,
       ROUND(ROUND(p.pc, 6) - ROUND(n.nc, 6), 6) AS margin
FROM pos p JOIN neg n USING (query_id, rank)
WHERE p.rank <= 3 AND n.rank <= 3
"""


def _dp_cluster_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP + clustering integration: differentially-private release of
    k-means topic sizes (privacy unit = vector id; each id contributes
    to exactly its one cluster, so L0 = Linf = 1). Public partitions =
    the k cluster ids (data-independent), zero-noise mode for the
    oracle. The DP layer runs on the codegen assignment column — no
    extra scan beyond the fit."""
    from pipelinedp_spark.operators import clustering
    emb = _t(spark, sf_dir, "embeddings")
    cents, _ = clustering.kmeans_fit(emb, k=8, iters=2)
    asg = clustering.kmeans_assign(emb, cents)
    query = (pds.QueryBuilder(asg, "vec_id")
             .groupby("cluster", max_groups_contributed=1,
                      max_contributions_per_group=1,
                      public_keys=list(range(8)))
             .count()
             .build_query())
    return query.run_query(pds.Budget(1.0, 1e-6), noise_mode="zero")


def _gen_dp_cluster_counts_sql(k: int = 8, iters: int = 2,
                               q: int = 1 << 20) -> str:
    sql = _gen_kmeans_prefix(k, iters, q)
    sql += f""",
af AS (
  SELECT vec_id, cluster FROM (
    SELECT d.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY d.vec_id
             ORDER BY list_dot_product(d.vdd, c.cent)
                      - 0.5 * list_dot_product(c.cent, c.cent) DESC,
                      c.cluster ASC) AS rn
    FROM vd d CROSS JOIN c{iters} c) WHERE rn = 1),
pub AS (SELECT UNNEST(range({k})) AS cluster),
agg AS (SELECT cluster, CAST(COUNT(*) AS DOUBLE) AS count
        FROM af GROUP BY 1)
SELECT CAST(pub.cluster AS BIGINT) AS cluster,
       COALESCE(agg.count, 0.0) AS count
FROM pub LEFT JOIN agg USING (cluster)
"""
    return sql


def _emb_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality gate for int8 quantization: top-10 neighbors
    computed on dequantized vectors vs the exact top-10, per query —
    the acceptance metric before swapping a 4x-smaller index in.
    Codegen fold cosine on BOTH rankings (bit-identical to the SQL
    mirror's list_dot_product)."""
    from pyspark.sql import Window

    from pipelinedp_spark.functions import embeddings as EMB
    from pipelinedp_spark.operators.similarity import cosine_expr
    emb = _t(spark, sf_dir, "embeddings")
    params = EMB.int8_quantize_params(emb, "embedding")

    def deq(col):
        return EMB.int8_dequantize_expr(
            EMB.int8_quantize_expr(col, params), params)

    base = emb.select("vec_id",
                      F.col("embedding").cast("array<double>").alias("ev"),
                      deq(F.col("embedding")).alias("dv"))
    q = (base.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("ev").alias("qe"), F.col("dv").alias("qd")))
    scored = (base.crossJoin(F.broadcast(q))
              .select("query_id", "vec_id",
                      cosine_expr(F.col("ev"), F.col("qe")).alias("ce"),
                      cosine_expr(F.col("dv"), F.col("qd")).alias("cd")))
    we = Window.partitionBy("query_id").orderBy(F.col("ce").desc(),
                                                F.col("vec_id").asc())
    wd = Window.partitionBy("query_id").orderBy(F.col("cd").desc(),
                                                F.col("vec_id").asc())
    te = (scored.withColumn("r", F.row_number().over(we))
          .filter(F.col("r") <= 10).select("query_id", "vec_id"))
    td = (scored.withColumn("r", F.row_number().over(wd))
          .filter(F.col("r") <= 10).select("query_id", "vec_id"))
    hit = te.join(td, ["query_id", "vec_id"])
    return (q.select("query_id")
            .join(hit.groupBy("query_id")
                  .agg(F.count(F.lit(1)).alias("n_overlap")),
                  "query_id", "left")
            .select("query_id",
                    F.coalesce(F.col("n_overlap"), F.lit(0))
                    .cast("long").alias("n_overlap"))
            .withColumn("recall",
                        F.round(F.col("n_overlap") / F.lit(10), 6)))


_EMB_INT8_RECALL_SQL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
ex AS (
  SELECT vec_id, UNNEST(e) AS x,
         generate_subscripts(e, 1) - 1 AS pos
  FROM v),
mm AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx,
              (MAX(x) - MIN(x)) / 255.0 AS sc
       FROM ex GROUP BY 1),
qz AS (
  SELECT e.vec_id, e.pos,
         (CASE WHEN m.sc > 0
               THEN floor((e.x - m.mn) / m.sc + 0.5) ELSE 0 END - 128)
             AS code,
         m.mn, m.sc
  FROM ex e JOIN mm m USING (pos)),
dq AS (
  SELECT vec_id,
         list((code + 128) * sc + mn ORDER BY pos) AS d
  FROM qz GROUP BY vec_id),
b AS (SELECT v.vec_id, v.e, dq.d FROM v JOIN dq USING (vec_id)),
q AS (SELECT vec_id AS query_id, e AS qe, d AS qd FROM b
      WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, b.vec_id,
         list_dot_product(b.e, q.qe)
           / (sqrt(list_dot_product(b.e, b.e))
              * sqrt(list_dot_product(q.qe, q.qe))) AS ce,
         list_dot_product(b.d, q.qd)
           / (sqrt(list_dot_product(b.d, b.d))
              * sqrt(list_dot_product(q.qd, q.qd))) AS cd
  FROM b CROSS JOIN q),
te AS (SELECT query_id, vec_id FROM (
         SELECT query_id, vec_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY ce DESC, vec_id ASC) AS r
         FROM scored) WHERE r <= 10),
td AS (SELECT query_id, vec_id FROM (
         SELECT query_id, vec_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cd DESC, vec_id ASC) AS r
         FROM scored) WHERE r <= 10),
hit AS (
  SELECT te.query_id, COUNT(*) AS n_overlap
  FROM te JOIN td USING (query_id, vec_id) GROUP BY 1)
SELECT q.query_id,
       CAST(COALESCE(hit.n_overlap, 0) AS BIGINT) AS n_overlap,
       ROUND(COALESCE(hit.n_overlap, 0) / 10, 6) AS recall
FROM q LEFT JOIN hit USING (query_id)
"""


def _emb_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified retrieval (`similarity.mmr_rerank`): greedy MMR over
    a 20-candidate exact shortlist, lam = 0.5. Oracle = the greedy
    trace unrolled into one CTE pair per selection step (the Lloyd
    unroll discipline: 6dp-rounded inputs, exact literals, lowest-id
    ties)."""
    from pipelinedp_spark.operators import similarity
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    return similarity.mmr_rerank(emb, q, k=5, shortlist=20, lam=0.5)


def _gen_mmr_sql(k: int = 5, shortlist: int = 20) -> str:
    sql = f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5),
allsc AS (
  SELECT q.query_id, b.vec_id,
         list_dot_product(b.v, q.qv) /
         (sqrt(list_dot_product(b.v, b.v))
          * sqrt(list_dot_product(q.qv, q.qv))) AS c
  FROM base b CROSS JOIN q),
cand AS (
  SELECT query_id, vec_id, ROUND(c, 6) AS rel FROM (
    SELECT query_id, vec_id, c,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY c DESC, vec_id ASC) AS r
    FROM allsc) WHERE r <= {shortlist}),
sim AS (
  SELECT a.query_id, a.vec_id AS sa, b2.vec_id AS sb,
         ROUND(list_dot_product(va.v, vb.v) /
               (sqrt(list_dot_product(va.v, va.v))
                * sqrt(list_dot_product(vb.v, vb.v))), 6) AS s
  FROM cand a
  JOIN cand b2 USING (query_id)
  JOIN base va ON va.vec_id = a.vec_id
  JOIN base vb ON vb.vec_id = b2.vec_id
  WHERE a.vec_id <> b2.vec_id),
sel1 AS (
  SELECT query_id, vec_id, 1 AS mmr_rank, rel FROM (
    SELECT query_id, vec_id, rel,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, vec_id ASC) AS r
    FROM cand) WHERE r = 1)"""
    for i in range(2, k + 1):
        sql += f""",
pen{i} AS (
  SELECT c.query_id, c.vec_id, c.rel, MAX(sim.s) AS pen
  FROM cand c
  JOIN sim ON sim.query_id = c.query_id AND sim.sa = c.vec_id
  JOIN sel{i - 1} s ON s.query_id = sim.query_id
                   AND s.vec_id = sim.sb
  WHERE NOT EXISTS (SELECT 1 FROM sel{i - 1} x
                    WHERE x.query_id = c.query_id
                      AND x.vec_id = c.vec_id)
  GROUP BY 1, 2, 3),
pick{i} AS (
  SELECT query_id, vec_id, {i} AS mmr_rank, rel FROM (
    SELECT query_id, vec_id, rel,
           ROW_NUMBER() OVER (
             PARTITION BY query_id
             ORDER BY 0.5 * rel - 0.5 * pen DESC, vec_id ASC) AS r
    FROM pen{i}) WHERE r = 1),
sel{i} AS (SELECT * FROM sel{i - 1}
           UNION ALL SELECT * FROM pick{i})"""
    sql += f"""
SELECT query_id, vec_id, CAST(mmr_rank AS BIGINT) AS mmr_rank,
       rel AS relevance
FROM sel{k}
"""
    return sql


def _events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity + distinct-l-diversity audit over events
    (`anonymity.k_anonymity_report` / `l_diversity_report` combined):
    quasi-identifiers = (event_type, value generalized to width-5
    buckets, hour of day), sensitive attribute = user_id. One
    combinable aggregate on the quasi tuple — the audit every release
    pipeline runs before handing data to analysts."""
    from pipelinedp_spark.operators.anonymity import (generalize_bucket,
                                                      l_diversity_report)
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type", "user_id",
        generalize_bucket(F.col("value"), 5.0).alias("vbucket"),
        ((F.col("ts") / 3600000000).cast("long") % 24).alias("hour"))
    rep = l_diversity_report(q, ["event_type", "vbucket", "hour"],
                             "user_id", l=3)
    return rep.select(
        "event_type", "vbucket", "hour",
        F.col("group_size").cast("long").alias("group_size"),
        F.col("n_sensitive").cast("long").alias("n_users"),
        (F.col("group_size") >= 5).alias("meets_k"),
        F.col("meets_l").alias("meets_l"))


_EVENTS_K_ANONYMITY_SQL = """
SELECT event_type,
       FLOOR(value / 5.0) * 5.0 AS vbucket,
       (epoch_us(ts) // 3600000000) % 24 AS hour,
       CAST(COUNT(*) AS BIGINT) AS group_size,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       COUNT(*) >= 5 AS meets_k,
       COUNT(DISTINCT user_id) >= 3 AS meets_l
FROM events
GROUP BY 1, 2, 3
"""


def _events_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pseudonymization (`anonymity.pseudonymize`): user ids become
    stable salted-hash surrogates (rotating the salt unlinks releases),
    then a per-surrogate activity rollup proves joins/groupBys still
    work on the pseudonymized table. Map-only hash + one aggregate."""
    from pipelinedp_spark.operators.anonymity import pseudonymize
    ev = _t(spark, sf_dir, "events").select("user_id", "value")
    p = pseudonymize(ev, ["user_id"], salt="release-2026-08")
    return (p.groupBy("user_id_pseudo")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value")))


_EVENTS_PSEUDONYMIZE_SQL = """
SELECT ('0x' || substr(md5('release-2026-08:' || user_id), 1, 15))::BIGINT
           AS user_id_pseudo,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM events GROUP BY 1
"""


def _doc_leakage_safe_split(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment
    (`clustering.leakage_safe_split`): the split hashes the SOURCE (the
    same-content grouping), so every doc of a near-dup cluster lands in
    one split — the row-hash alternative silently leaks eval twins into
    train. Output is the per-(source, split) rollup; the oracle
    recomputes the portable-hash bucket arithmetic."""
    from pipelinedp_spark.operators.clustering import leakage_safe_split
    docs = _t(spark, sf_dir, "documents")
    out = leakage_safe_split(docs, "source")
    return (out.groupBy("source", "split")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))


_DOC_LEAKAGE_SPLIT_SQL = """
SELECT source,
       CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM (SELECT source,
             ('0x' || substr(md5('split:' || source), 1, 15))::BIGINT
             / 1152921504606846976.0 AS u
      FROM documents)
GROUP BY 1, 2
"""


def _events_parse_quarantine(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Ingestion-integrity split (`semistructured.parse_with_quarantine`):
    events.props parses against an explicit schema; malformed payloads
    (planted: a leading stray brace when event_id % 13 == 7 — trailing
    junk wouldn't do: Spark's JSON parser ignores it) route to
    quarantine, VALID payloads missing the key (planted '{"other": 1}'
    when event_id % 17 == 3) stay good with a NULL field — never silent
    NULLs from corruption, never a killed job. One lazy parse shared by
    both routes; output is the per-route rollup."""
    from pipelinedp_spark.functions.semistructured import (
        parse_with_quarantine)
    ev = _t(spark, sf_dir, "events").select("event_id", "props")
    planted = ev.withColumn(
        "props",
        F.when(F.col("event_id") % 13 == 7,
               F.concat(F.lit("{"), F.col("props")))
        .when(F.col("event_id") % 17 == 3, F.lit('{"other": 1}'))
        .otherwise(F.col("props")))
    good, bad = parse_with_quarantine(planted, "props", "k INT")
    g = good.select(
        F.lit("good").alias("route"),
        F.col("parsed.k").isNull().cast("long").alias("null_k"),
        F.coalesce(F.col("parsed.k"), F.lit(0)).cast("long").alias("k"))
    b = bad.select(F.lit("quarantine").alias("route"),
                   F.lit(0).cast("long").alias("null_k"),
                   F.lit(0).cast("long").alias("k"))
    return (g.unionByName(b).groupBy("route")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("null_k").cast("long").alias("n_null_k"),
                 F.sum("k").cast("long").alias("sum_k")))


_EVENTS_PARSE_QUARANTINE_SQL = """
WITH planted AS (
  SELECT event_id,
         CASE WHEN event_id % 13 = 7 THEN '{' || props
              WHEN event_id % 17 = 3 THEN '{"other": 1}'
              ELSE props END AS props
  FROM events),
routed AS (
  SELECT CASE WHEN props IS NOT NULL AND NOT json_valid(props)
              THEN 'quarantine' ELSE 'good' END AS route,
         CASE WHEN json_valid(props)
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
              ELSE NULL END AS k
  FROM planted)
SELECT route,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN route = 'good' AND k IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
       CAST(COALESCE(SUM(CASE WHEN route = 'good' THEN k END), 0)
            AS BIGINT) AS sum_k
FROM routed GROUP BY 1
"""


def _events_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit skew-salted join (`skew.salted_join`): events (hot on
    the handful of event types) join a small weight dim, salt factor 8
    spread via the deterministic event_id hash — semantically identical
    to the plain join, which is exactly what the oracle runs. Output is
    the weighted per-type rollup."""
    from pipelinedp_spark.operators.skew import salted_join
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type",
                                            "value")
    dim = spark.sql(
        "SELECT * FROM VALUES ('click', 10), ('view', 1), "
        "('purchase', 100), ('error', 0), ('signup', 50) "
        "AS t(event_type, weight)")
    j = salted_join(ev, dim, ["event_type"], factor=8,
                    salt_src="event_id")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (j.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(F.col("weight").cast("long")).alias("w_total"),
                 F.sum(cents * F.col("weight").cast("long"))
                 .alias("weighted_cents")))


_EVENTS_SALTED_JOIN_SQL = """
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(d.weight) AS BIGINT) AS w_total,
       CAST(SUM(CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT) * d.weight)
            AS BIGINT) AS weighted_cents
FROM events e
JOIN (VALUES ('click', 10), ('view', 1), ('purchase', 100),
             ('error', 0), ('signup', 50)) AS d(event_type, weight)
  ON e.event_type = d.event_type
GROUP BY 1
"""


def _tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (adapted to this generator's schema) —
    the canonical scan-heavy aggregate proving the relational path:
    one parquet scan with the shipdate filter pushed down, one
    map-side-combinable groupBy over 6 keys. Money stays EXACT: prices
    as integer cents, discount/tax as basis points, the discounted and
    charged amounts as per-row integer products (one deterministic
    integer DIV rescale), so distributed partial sums are
    order-independent and the oracle hash-matches bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") <= F.lit("1998-06-30"))
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))         .cast("long")
    d_bp = F.floor(F.col("l_discount") * 10000 + F.lit(0.5)).cast("long")
    t_bp = F.floor(F.col("l_tax") * 10000 + F.lit(0.5)).cast("long")
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    disc_u = cents * (F.lit(10000) - d_bp)          # 1e-6 dollars
    charge_u = F.expr(
        "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) "
        "* (10000 - CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)) "
        "* (10000 + CAST(FLOOR(l_tax * 10000 + 0.5) AS BIGINT)) "
        "DIV 10000")                                # 1e-6 dollars
    agg = (li.groupBy("l_returnflag", "l_linestatus")
           .agg(F.sum(qty).alias("sum_qty"),
                F.sum(cents).alias("sum_base_cents"),
                F.sum(disc_u).alias("sum_disc_micro"),
                F.sum(charge_u).alias("sum_charge_micro"),
                F.sum(d_bp).alias("__dbp__"),
                F.count(F.lit(1)).alias("n_rows")))
    return agg.select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
        "sum_disc_micro", "sum_charge_micro", "n_rows",
        F.round(F.col("sum_qty") / F.col("n_rows"), 6).alias("avg_qty"),
        F.round((F.col("sum_base_cents") / F.lit(100.0))
                / F.col("n_rows"), 6).alias("avg_price"),
        F.round((F.col("__dbp__") / F.lit(10000.0))
                / F.col("n_rows"), 6).alias("avg_disc"))


_TPCH_Q1_SQL = """
WITH base AS (
  SELECT l_returnflag, l_linestatus,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT) AS d_bp,
         CAST(FLOOR(l_tax * 10000 + 0.5) AS BIGINT) AS t_bp
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) <= DATE '1998-06-30')
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty) AS BIGINT) AS sum_qty,
       CAST(SUM(cents) AS BIGINT) AS sum_base_cents,
       CAST(SUM(cents * (10000 - d_bp)) AS BIGINT) AS sum_disc_micro,
       CAST(SUM(cents * (10000 - d_bp) * (10000 + t_bp) // 10000)
            AS BIGINT) AS sum_charge_micro,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(SUM(qty) / COUNT(*), 6) AS avg_qty,
       ROUND((SUM(cents) / 100.0) / COUNT(*), 6) AS avg_price,
       ROUND((SUM(d_bp) / 10000.0) / COUNT(*), 6) AS avg_disc
FROM base GROUP BY 1, 2
"""


def _tpch_q3_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping-priority (adapted): BUILDING-segment customers,
    orders placed before the cutoff, lineitems shipped after it; top-10
    orders by discounted revenue. The customer dim filters to ~1/5 of a
    small table and must BROADCAST into the orders join; the top-10 is
    TakeOrderedAndProject, never a global sort. Revenue in exact
    integer micro-dollars; deterministic (revenue DESC, orderkey ASC)
    tie-break."""
    cutoff = "1998-06-30"
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit(cutoff)).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit(cutoff)).select(
        "l_orderkey",
        (F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
         .cast("long")
         * (F.lit(10000)
            - F.floor(F.col("l_discount") * 10000 + F.lit(0.5))
            .cast("long"))).alias("rev_u"))
    j = (li.join(orders.join(F.broadcast(cust),
                             orders.o_custkey == cust.c_custkey),
                 li.l_orderkey == orders.o_orderkey)
         .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
         .agg(F.sum("rev_u").alias("revenue_micro")))
    return (j.select(
        F.col("l_orderkey").alias("orderkey"),
        F.date_format(F.col("o_orderdate"), "yyyy-MM-dd")
        .alias("orderdate"),
        F.col("o_orderpriority").alias("priority"),
        "revenue_micro")
        .orderBy(F.col("revenue_micro").desc(), F.col("orderkey").asc())
        .limit(10))


_TPCH_Q3_SQL = """
SELECT l.l_orderkey AS orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority AS priority,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (10000 - CAST(FLOOR(l.l_discount * 10000 + 0.5)
                                AS BIGINT))) AS BIGINT) AS revenue_micro
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1998-06-30'
  AND CAST(l.l_shipdate AS DATE) > DATE '1998-06-30'
GROUP BY 1, 2, 3
ORDER BY revenue_micro DESC, orderkey ASC
LIMIT 10
"""


def _events_rolling_features(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour activity features (count + exact-cents
    value sum) via a RANGE-frame window over the event time — the
    time-series feature-engineering primitive (fraud/abuse velocity
    counters, engagement features). RANGE (not ROWS) so ts ties are
    frame-stable: the result is deterministic under any partition
    layout. One shuffle on user_id; window state is one open frame per
    user."""
    from pyspark.sql import Window
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = (Window.partitionBy("user_id").orderBy("ts")
         .rangeBetween(-3600000000, 0))
    return ev.select(
        "event_id", "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
        F.sum(cents).over(w).cast("long").alias("cents_1h"))


_EVENTS_ROLLING_SQL = """
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w
            AS BIGINT) AS cents_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def _doc_exact_substr_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Lee et al. ExactSubstr DEDUP pipeline composed end to
    end: character-level exact duplicated-span detection
    (`dedup.duplicate_spans_exact`) followed by the surgical text
    splice (`dedup.cut_spans`) — every duplicated run of >= 64 chars
    is removed from all but its globally-first occurrence and the
    corpus text is rebuilt. Output is the per-doc scrub record."""
    from pipelinedp_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    spans = dedup.duplicate_spans_exact(docs, min_len=64)
    out = dedup.cut_spans(docs, spans)
    return out.select("doc_id",
                      F.md5(F.col("clean_text")).alias("clean_md5"),
                      "n_spans", "n_cut_chars")


_DOC_EXACT_SUBSTR_CUT_SQL = """
WITH pos AS (
  SELECT doc_id, unnest(range(0, length(text) - 64 + 1)) AS p, text AS t
  FROM documents WHERE length(text) >= 64),
h AS (
  SELECT doc_id, CAST(p AS BIGINT) AS p,
         md5(substr(t, CAST(p AS INTEGER) + 1, 64)) AS h
  FROM pos),
firsts AS (
  SELECT h, COUNT(*) AS n, MIN(doc_id * 1073741824 + p) AS fk
  FROM h GROUP BY h),
marked AS (
  SELECT doc_id, p FROM h JOIN firsts USING (h)
  WHERE n >= 2 AND doc_id * 1073741824 + p <> fk),
iv AS (SELECT doc_id, p AS start, p + 64 AS "end" FROM marked),
m AS (
  SELECT doc_id, start, "end",
         MAX("end") OVER (PARTITION BY doc_id ORDER BY start
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_end
  FROM iv),
grps AS (
  SELECT doc_id, start, "end",
         SUM(CASE WHEN prev_end IS NULL OR start > prev_end
                  THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY start
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS grp
  FROM m),
spans AS (
  SELECT doc_id, MIN(start) AS s, MAX("end") AS e
  FROM grps GROUP BY doc_id, grp),
packed AS (
  SELECT doc_id, list({'s': s, 'e': e} ORDER BY s) AS sp
  FROM spans GROUP BY doc_id),
cutdoc AS (
  SELECT d.doc_id, d.text AS t, COALESCE(p.sp, []) AS sp
  FROM documents d LEFT JOIN packed p USING (doc_id)),
gaps AS (
  SELECT doc_id, t,
         list_prepend(CAST(0 AS BIGINT), [x.e for x in sp]) AS gs,
         list_append([x.s for x in sp], CAST(length(t) AS BIGINT))
             AS ge,
         sp
  FROM cutdoc)
SELECT doc_id,
       md5(array_to_string(
         [substr(t, CAST(gs[i] AS INTEGER) + 1,
                 CAST(ge[i] - gs[i] AS INTEGER))
          for i in range(1, len(gs) + 1)], '')) AS clean_md5,
       CAST(len(sp) AS BIGINT) AS n_spans,
       CAST(COALESCE(list_sum([x.e - x.s for x in sp]), 0) AS BIGINT)
           AS n_cut_chars
FROM gaps
"""


def _tpch_q5_local_supplier(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier revenue (adapted): per-nation revenue in
    one region where the supplying and ordering nations coincide. The
    snowflake dims (region -> nation, supplier) BROADCAST down the
    chain; the only corpus-scale shuffles are lineitem x orders and the
    final six-key aggregate. Revenue in exact integer micro-dollars."""
    nat = (_t(spark, sf_dir, "nation")
           .join(F.broadcast(_t(spark, sf_dir, "region")
                             .filter(F.col("r_name") == "ASIA")),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .select("n_nationkey", "n_name"))
    sup = (_t(spark, sf_dir, "supplier")
           .join(F.broadcast(nat),
                 F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", "s_nationkey", "n_name"))
    cust = _t(spark, sf_dir, "customer").select("c_custkey",
                                                "c_nationkey")
    orders = (_t(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate").cast("date")
                       >= F.lit("1996-01-01"))
                      & (F.col("o_orderdate").cast("date")
                         < F.lit("1998-01-01")))
              .select("o_orderkey", "o_custkey"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
         .cast("long")
         * (F.lit(10000)
            - F.floor(F.col("l_discount") * 10000 + F.lit(0.5))
            .cast("long"))).alias("rev_u"))
    j = (li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
         .join(orders, li.l_orderkey == orders.o_orderkey)
         .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
         .filter(F.col("c_nationkey") == F.col("s_nationkey")))
    return (j.groupBy("n_name")
            .agg(F.sum("rev_u").alias("revenue_micro"),
                 F.count(F.lit(1)).cast("long").alias("n_items")))


_TPCH_Q5_SQL = """
SELECT n.n_name,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (10000 - CAST(FLOOR(l.l_discount * 10000 + 0.5)
                                AS BIGINT))) AS BIGINT) AS revenue_micro,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND c.c_nationkey = s.s_nationkey
  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
GROUP BY 1
"""


def _tpch_q18_large_orders(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers), adapted: orders whose total
    lineitem quantity exceeds 150, joined back to customer, global
    top-100 by (totalprice desc, orderdate, orderkey — fully
    deterministic tie-break). The skew-heavy relational shape: the
    HAVING subquery is a map-side-combinable aggregate over the hot
    l_orderkey (a popular order's lines partial-combine before the
    exchange, so no single task serializes a hot key), the qualifying
    set semi-joins lineitem (AQE can skew-split it), customer
    broadcasts, and the top-100 compiles to TakeOrderedAndProject —
    never a global sort. Money exact as integer cents."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(qty).alias("total_qty"))
           .filter(F.col("total_qty") > 150))
    tp_cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)) \
        .cast("long")
    out = (orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
           .join(F.broadcast(cust),
                 orders["o_custkey"] == cust["c_custkey"])
           .select("c_name", "c_custkey", "o_orderkey",
                   F.col("o_orderdate").cast("string")
                   .alias("o_orderdate"),
                   tp_cents.alias("totalprice_cents"), "total_qty"))
    return (out.orderBy(F.col("totalprice_cents").desc(),
                        "o_orderdate", "o_orderkey")
            .limit(100))


_TPCH_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
             AS total_qty
  FROM lineitem
  GROUP BY 1
  HAVING SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) > 150)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
       CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)
           AS totalprice_cents,
       b.total_qty
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY totalprice_cents DESC, o_orderdate, o.o_orderkey
LIMIT 100
"""


def _tpch_q10_returned_items(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting), adapted: revenue lost to
    returned lineitems ('R' returnflag) over one quarter, grouped by
    customer with nation attached, top-20 by revenue. Plan posture:
    both date bounds and the returnflag filter push into the scans,
    customer and nation broadcast (dim lookups never shuffle the fact
    side), revenue is the exact integer micro-dollar product (cents x
    basis points), and the top-20 compiles to TakeOrderedAndProject
    with a fully deterministic (revenue desc, custkey) tie-break."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-04-01")))
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev_u = F.expr(
        "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) "
        "* (10000 - CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT))")
    agg = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
           .join(F.broadcast(cust),
                 orders["o_custkey"] == cust["c_custkey"])
           .join(F.broadcast(nation),
                 cust["c_nationkey"] == nation["n_nationkey"])
           .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
           .agg(F.sum(rev_u).alias("revenue_micro"),
                F.count(F.lit(1)).alias("n_items")))
    return (agg.select("c_custkey", "c_name",
                       F.round("c_acctbal", 2).alias("c_acctbal"),
                       "n_name", "revenue_micro", "n_items")
            .orderBy(F.col("revenue_micro").desc(), "c_custkey")
            .limit(20))


_TPCH_Q10_SQL = """
SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2) AS c_acctbal,
       n.n_name,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (10000 - CAST(FLOOR(l.l_discount * 10000 + 0.5)
                                AS BIGINT))) AS BIGINT) AS revenue_micro,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1997-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue_micro DESC, c_custkey
LIMIT 20
"""


def _tpch_q16_supplier_variety(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted to this
    generator (lineitem's part-supplier edges stand in for partsupp):
    distinct supplier count per (brand, type, size) for parts outside
    an excluded brand and type, top-40. The COUNT DISTINCT workhorse:
    the edge set dedupes FIRST (one (part,supp) row regardless of how
    many lineitems share it — partial-combinable), the filtered part
    dim broadcasts with both predicates pushed to its scan, and the
    top-40 is TakeOrderedAndProject with full tie-break."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (~F.col("p_type").startswith("PROMO")))
    edges = li.select("l_partkey", "l_suppkey").distinct()
    agg = (edges.join(F.broadcast(part),
                      edges["l_partkey"] == part["p_partkey"])
           .groupBy("p_brand", "p_type", "p_size")
           .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))
    return (agg.orderBy(F.col("supplier_cnt").desc(), "p_brand",
                        "p_type", "p_size")
            .limit(40))


_TPCH_Q16_SQL = """
WITH edges AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT e.l_suppkey) AS BIGINT) AS supplier_cnt
FROM edges e
JOIN part p ON e.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#9'
  AND p.p_type NOT LIKE 'PROMO%'
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 40
"""


def _doc_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning ruleset (`quality.c4_filter`): docs get deterministic
    line structure (five frequent words become newlines), lines keep
    only if terminal-punctuated with >= 3 words, pages pass on >= 3
    retained sentence marks and no code-brace/lorem-ipsum boilerplate
    (planted by doc_id residue so both doc-level rules fire). Pure
    codegen, no shuffle."""
    from pipelinedp_spark.operators.quality import c4_filter
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.col("text"), " (the|a|data|value|row) ",
                             ".\n"),
            F.when(F.col("doc_id") % 19 == 4,
                   F.lit("\nif (x) { lorem ipsum dolor sit. }"))
            .otherwise(F.lit(""))).alias("text"))
    out = c4_filter(docs)
    return out.select("doc_id", F.md5("clean_text").alias("clean_md5"),
                      "n_lines_kept", "n_lines_total", "n_sentences",
                      "has_bad_substring", "passes")


_DOC_C4_FILTER_SQL = r"""
WITH base AS (
  SELECT doc_id,
         regexp_replace(text, ' (the|a|data|value|row) ', '.
', 'g')
         || CASE WHEN doc_id % 19 = 4
                 THEN '
if (x) { lorem ipsum dolor sit. }'
                 ELSE '' END AS t
  FROM documents),
split AS (
  SELECT doc_id, t, regexp_split_to_array(t, '\r?\n') AS ls FROM base),
kept AS (
  SELECT doc_id, t, len(ls) AS n_total,
         [trim(replace(x, chr(13), '')) for x in ls
          if regexp_matches(trim(x), '[.!?"”’'']$')
             AND len([w for w in string_split(trim(x), ' ')
                      if w <> '']) >= 3] AS kl
  FROM split),
fin AS (
  SELECT doc_id, t, n_total, kl,
         COALESCE(array_to_string(kl, chr(10)), '') AS clean
  FROM kept)
SELECT doc_id,
       md5(clean) AS clean_md5,
       CAST(len(kl) AS BIGINT) AS n_lines_kept,
       CAST(n_total AS BIGINT) AS n_lines_total,
       CAST(len(regexp_extract_all(clean, '[.!?]')) AS BIGINT)
           AS n_sentences,
       (contains(lower(t), 'lorem ipsum') OR contains(lower(t), '{')
        OR contains(lower(t), 'javascript must be enabled'))
           AS has_bad_substring,
       (len(regexp_extract_all(clean, '[.!?]')) >= 3
        AND NOT (contains(lower(t), 'lorem ipsum')
                 OR contains(lower(t), '{')
                 OR contains(lower(t), 'javascript must be enabled')))
           AS passes
FROM fin
"""


def _emb_matryoshka_recall(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval gate (Kusupati et al. 2022): the
    top-10 cosine neighbors computed on the FIRST 16 of 64 dims vs the
    exact full-dim top-10, per query — the acceptance metric before
    shipping a 4x-cheaper truncated index. Same plan as
    `emb_int8_recall`: broadcast query rows, codegen fold cosines,
    WindowGroupLimit per ranking."""
    from pyspark.sql import Window

    from pipelinedp_spark.operators.similarity import cosine_expr
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        F.slice(F.col("embedding").cast("array<double>"), 1, 16)
        .alias("tv"))
    q = (base.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("ev").alias("qe"), F.col("tv").alias("qt")))
    scored = (base.crossJoin(F.broadcast(q))
              .select("query_id", "vec_id",
                      cosine_expr(F.col("ev"), F.col("qe")).alias("ce"),
                      cosine_expr(F.col("tv"), F.col("qt")).alias("ct")))
    we = Window.partitionBy("query_id").orderBy(F.col("ce").desc(),
                                                F.col("vec_id").asc())
    wt = Window.partitionBy("query_id").orderBy(F.col("ct").desc(),
                                                F.col("vec_id").asc())
    te = (scored.withColumn("r", F.row_number().over(we))
          .filter(F.col("r") <= 10).select("query_id", "vec_id"))
    tt = (scored.withColumn("r", F.row_number().over(wt))
          .filter(F.col("r") <= 10).select("query_id", "vec_id"))
    hit = te.join(tt, ["query_id", "vec_id"])
    return (q.select("query_id")
            .join(hit.groupBy("query_id")
                  .agg(F.count(F.lit(1)).alias("n_overlap")),
                  "query_id", "left")
            .select("query_id",
                    F.coalesce(F.col("n_overlap"), F.lit(0))
                    .cast("long").alias("n_overlap"))
            .withColumn("recall",
                        F.round(F.col("n_overlap") / F.lit(10), 6)))


_EMB_MATRYOSHKA_SQL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                  (embedding::DOUBLE[])[1:16] AS t
           FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe, t AS qt FROM v
      WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, v.vec_id,
         ROUND(list_dot_product(v.e, q.qe)
               / (sqrt(list_dot_product(v.e, v.e))
                  * sqrt(list_dot_product(q.qe, q.qe))), 6) AS ce,
         ROUND(list_dot_product(v.t, q.qt)
               / (sqrt(list_dot_product(v.t, v.t))
                  * sqrt(list_dot_product(q.qt, q.qt))), 6) AS ct
  FROM v CROSS JOIN q),
te AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ce DESC, vec_id ASC) AS r
    FROM scored) WHERE r <= 10),
tt AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ct DESC, vec_id ASC) AS r
    FROM scored) WHERE r <= 10),
hit AS (
  SELECT te.query_id, COUNT(*) AS n
  FROM te JOIN tt USING (query_id, vec_id) GROUP BY 1)
SELECT q.query_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_overlap,
       ROUND(COALESCE(h.n, 0) / 10, 6) AS recall
FROM q LEFT JOIN hit h USING (query_id)
"""


def _doc_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL interchange round-trip (`to_json` -> `from_json`): docs
    serialize to JSON Lines records — the lingua franca of corpus
    releases — and parse back; the check compares a stable digest of
    each reserialized record plus the recovered fields, proving the
    sink/source pair is lossless for the release schema. Pure codegen
    both ways; the oracle reproduces DuckDB-side canonical JSON with
    the same key order."""
    docs = _t(spark, sf_dir, "documents")
    rec = F.to_json(F.struct(
        F.col("doc_id"), F.col("source"),
        F.col("lang"), F.col("text")))
    parsed = F.from_json(
        rec, "doc_id long, source string, lang string, text string")
    return docs.select(
        "doc_id",
        F.md5(rec).alias("record_md5"),
        (parsed["doc_id"] == F.col("doc_id")).alias("id_ok"),
        (parsed["text"] == F.col("text")).alias("text_ok"),
        F.length(rec).cast("long").alias("record_len"))


_DOC_JSONL_SQL = """
WITH rec AS (
  SELECT doc_id,
         '{"doc_id":' || doc_id
         || ',"source":' || to_json(source)
         || ',"lang":' || to_json(lang)
         || ',"text":' || to_json(text) || '}' AS r,
         text
  FROM documents)
SELECT doc_id,
       md5(r) AS record_md5,
       (json_extract_string(r, '$.doc_id')::BIGINT = doc_id) AS id_ok,
       (json_extract_string(r, '$.text') = text) AS text_ok,
       CAST(length(r) AS BIGINT) AS record_len
FROM rec
"""


def _doc_fix_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake repair (`text.fix_mojibake` / `mojibake_count`):
    UTF-8-decoded-as-cp1252 artifacts are planted deterministically
    (in-body accent corruption for doc_id % 5 == 1, an appended
    smart-quote/dash/ellipsis tail for doc_id % 7 == 2), then counted
    and repaired with the longest-first literal-replace chain. Pure
    map stage; the oracle re-runs the identical chain."""
    from pipelinedp_spark.functions.text import (MOJIBAKE_FIXES,
                                                 fix_mojibake,
                                                 mojibake_count)
    acc = MOJIBAKE_FIXES[6][0]       # the e-acute artifact
    tail = (MOJIBAKE_FIXES[1][0] + "quoted" + MOJIBAKE_FIXES[2][0]
            + " " + MOJIBAKE_FIXES[4][0] + " dash"
            + MOJIBAKE_FIXES[5][0])
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 5 == 1,
                   F.replace(F.col("text"), F.lit(" the "),
                             F.lit(" th" + acc + " ")))
            .otherwise(F.col("text")),
            F.when(F.col("doc_id") % 7 == 2,
                   F.lit(" " + tail)).otherwise(F.lit("")))
        .alias("text"))
    t = F.col("text")
    return planted.select(
        "doc_id",
        mojibake_count(t).alias("n_artifacts"),
        F.md5(fix_mojibake(t)).alias("fixed_md5"),
        (fix_mojibake(t) != t).alias("changed"))


def _gen_fix_mojibake_sql() -> str:
    """SQL mirror of `_doc_fix_mojibake`: the artifact table renders as
    a chain of CTEs (cur_k = replace(cur_{k-1}, bad_k, good_k), count
    accumulated per stage) so the longest-first repair order and the
    no-double-count rule replay exactly. Static apart from the
    artifact literals themselves (engine-independent constants)."""
    from pipelinedp_spark.functions.text import MOJIBAKE_FIXES
    acc = MOJIBAKE_FIXES[6][0]
    tail = (MOJIBAKE_FIXES[1][0] + "quoted" + MOJIBAKE_FIXES[2][0]
            + " " + MOJIBAKE_FIXES[4][0] + " dash"
            + MOJIBAKE_FIXES[5][0])
    ctes = [f"""c0 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 1
              THEN replace(text, ' the ', ' th{acc} ')
              ELSE text END
         || CASE WHEN doc_id % 7 = 2 THEN ' {tail}' ELSE '' END AS cur,
         CAST(0 AS BIGINT) AS acc
  FROM documents)"""]
    for i, (bad, good) in enumerate(MOJIBAKE_FIXES, start=1):
        b = bad.replace("'", "''")
        g = good.replace("'", "''")
        ctes.append(f"""c{i} AS (
  SELECT doc_id, replace(cur, '{b}', '{g}') AS cur,
         acc + (length(cur) - length(replace(cur, '{b}', '')))
               // {len(bad)} AS acc
  FROM c{i - 1})""")
    n = len(MOJIBAKE_FIXES)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT c0.doc_id,
       CAST(c{n}.acc AS BIGINT) AS n_artifacts,
       md5(c{n}.cur) AS fixed_md5,
       (c{n}.cur <> c0.cur) AS changed
FROM c0 JOIN c{n} USING (doc_id)
""")


def _doc_release_manifest(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Per-source release manifest (`release.corpus_manifest`): doc and
    token counts plus an order-insensitive BIT_XOR content checksum
    over (id, text)-binding hashes — the artifact a consumer verifies a
    snapshot against, incremental under single-doc updates. One
    combinable aggregate."""
    from pipelinedp_spark.operators.release import corpus_manifest
    docs = _t(spark, sf_dir, "documents")
    return corpus_manifest(docs, "source")


_DOC_RELEASE_MANIFEST_SQL = """
SELECT source AS "group",
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       BIT_XOR(('0x' || substr(md5(doc_id || ':' || md5(text)), 1, 15))
               ::BIGINT) AS content_xor
FROM documents GROUP BY 1
"""


def _doc_chat_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT chat-template rendering (`chat.render_chat` +
    `chat.conversation_stats`): each document becomes a synthetic
    conversation (its first four sentences as alternating
    user/assistant turns, a system turn planted when doc_id % 3 == 0),
    rendered flat under ChatML with the assistant-content loss-mask
    spans. The oracle reconstructs the rendering and the span
    arithmetic algebraically — every offset is plain string length
    math, so a template drift or an off-by-one in the mask fails the
    hash."""
    from pipelinedp_spark.operators.chat import (conversation_stats,
                                                 render_chat)
    docs = _t(spark, sf_dir, "documents")
    arr = F.regexp_extract_all(F.col("text"),
                               F.lit(r"[^.!?]+[.!?]*"), 0)
    sent = [F.coalesce(F.trim(F.get(arr, i)), F.lit(f"filler {i}"))
            for i in range(4)]
    turn = lambda r, c: F.struct(F.lit(r).alias("role"),
                                 c.alias("content"))
    base = F.array(turn("user", sent[0]), turn("assistant", sent[1]),
                   turn("user", sent[2]), turn("assistant", sent[3]))
    msgs = F.when(F.col("doc_id") % 3 == 0,
                  F.concat(F.array(turn("system", F.lit("be concise"))),
                           base)).otherwise(base)
    conv = docs.select("doc_id", msgs.alias("messages"))
    r = render_chat(conv)
    s = conversation_stats(conv)
    return (r.join(s, "doc_id")
            .select("doc_id", "n_chars",
                    F.md5(F.col("text")).alias("rendered_md5"),
                    F.array_join(
                        F.transform(
                            F.col("assistant_spans"),
                            lambda x: F.concat(x["s"].cast("string"),
                                               F.lit(":"),
                                               x["e"].cast("string"))),
                        ",").alias("spans"),
                    "n_turns", "n_assistant", "alternation_ok",
                    "ends_assistant"))


_DOC_CHAT_RENDER_SQL = """
WITH s AS (
  SELECT doc_id,
         regexp_extract_all(text, '[^.!?]+[.!?]*') AS a,
         doc_id % 3 = 0 AS has_sys
  FROM documents),
c AS (
  SELECT doc_id, has_sys,
         COALESCE(trim(a[1]), 'filler 0') AS c1,
         COALESCE(trim(a[2]), 'filler 1') AS c2,
         COALESCE(trim(a[3]), 'filler 2') AS c3,
         COALESCE(trim(a[4]), 'filler 3') AS c4,
         CASE WHEN doc_id % 3 = 0
              THEN '<|im_start|>system' || chr(10) || 'be concise'
                   || '<|im_end|>' || chr(10) ELSE '' END AS p0
  FROM s),
r AS (
  SELECT doc_id, has_sys, c2, c4, p0,
         p0 || '<|im_start|>user' || chr(10) || c1 || '<|im_end|>'
            || chr(10)
            || '<|im_start|>assistant' || chr(10) || c2 || '<|im_end|>'
            || chr(10)
            || '<|im_start|>user' || chr(10) || c3 || '<|im_end|>'
            || chr(10)
            || '<|im_start|>assistant' || chr(10) || c4 || '<|im_end|>'
            || chr(10) AS txt,
         -- user piece: 12 + 4 + 1 + len(c) + 10 + 1 = 28 + len(c)
         -- assistant header = 12 + 9 + 1 = 22
         length(p0) + 28 + length(c1) + 22 AS a1s
  FROM c),
sp AS (
  SELECT doc_id, has_sys, txt, a1s,
         a1s + length(c2) AS a1e,
         a1s + length(c2) + 11 + 28
             + (SELECT length(cc.c3) FROM c cc
                WHERE cc.doc_id = r.doc_id) + 22 AS a2s,
         length(c4) AS lc4
  FROM r)
SELECT doc_id,
       CAST(length(txt) AS BIGINT) AS n_chars,
       md5(txt) AS rendered_md5,
       a1s::VARCHAR || ':' || a1e::VARCHAR || ','
           || a2s::VARCHAR || ':' || (a2s + lc4)::VARCHAR AS spans,
       CAST(CASE WHEN has_sys THEN 5 ELSE 4 END AS BIGINT) AS n_turns,
       CAST(2 AS BIGINT) AS n_assistant,
       TRUE AS alternation_ok,
       TRUE AS ends_assistant
FROM sp
"""


def _doc_preference_pairs(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """DPO preference-pair construction (`chat.preference_pairs`):
    documents become scored responses to 50 synthetic prompts
    (prompt = doc_id % 50, response = the doc's first sentence,
    score = n_chars % 97, rid = doc_id), pairs = per-prompt argmax vs
    argmin with deterministic tie-breaks and a margin floor. One
    groupBy with two max(struct) argm* folds, no windows."""
    from pipelinedp_spark.operators.chat import preference_pairs
    docs = _t(spark, sf_dir, "documents")
    resp = docs.select(
        F.concat(F.lit("prompt-"),
                 (F.col("doc_id") % 50).cast("string")).alias("prompt"),
        F.trim(F.regexp_extract(F.col("text"),
                                r"[^.!?]+[.!?]*", 0)).alias("response"),
        (F.col("n_chars") % 97).cast("double").alias("score"),
        F.col("doc_id").alias("resp_id"))
    out = preference_pairs(resp, min_margin=2.0)
    return out.select(
        "prompt", F.md5("chosen").alias("chosen_md5"),
        F.md5("rejected").alias("rejected_md5"),
        F.round("chosen_score", 6).alias("chosen_score"),
        F.round("rejected_score", 6).alias("rejected_score"),
        F.round("margin", 6).alias("margin"))


_DOC_PREFERENCE_PAIRS_SQL = """
WITH resp AS (
  SELECT 'prompt-' || (doc_id % 50) AS prompt,
         trim(regexp_extract(text, '[^.!?]+[.!?]*', 0)) AS response,
         CAST(n_chars % 97 AS DOUBLE) AS score,
         doc_id AS rid
  FROM documents),
picked AS (
  SELECT prompt,
         COUNT(*) AS n,
         first(response ORDER BY score DESC, rid ASC) AS chosen,
         first(score ORDER BY score DESC, rid ASC) AS chosen_score,
         first(rid ORDER BY score DESC, rid ASC) AS hi_rid,
         first(response ORDER BY score ASC, rid DESC) AS rejected,
         first(score ORDER BY score ASC, rid DESC) AS rejected_score,
         first(rid ORDER BY score ASC, rid DESC) AS lo_rid
  FROM resp GROUP BY prompt)
SELECT prompt,
       md5(chosen) AS chosen_md5,
       md5(rejected) AS rejected_md5,
       ROUND(chosen_score, 6) AS chosen_score,
       ROUND(rejected_score, 6) AS rejected_score,
       ROUND(chosen_score - rejected_score, 6) AS margin
FROM picked
WHERE n >= 2 AND hi_rid <> lo_rid
  AND chosen_score - rejected_score >= 2.0
"""


def _dedup_lsh_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic MinHash-LSH banding plan grid (the math behind
    `dedup.plan_lsh_params`): for each rows-per-band option, the
    minimal band count meeting 95% recall at threshold 0.8 via the
    closed form b = ceil(ln(1-R) / ln(1-t^r)), with the S-curve recall
    and the false-candidate rate at background similarity 0.2; the
    selected row minimizes (num_hashes, fp, bands). Pure arithmetic —
    no table scan at all — kept as an oracle query because the planner
    must agree with any engine that re-derives it."""
    t, R, bg = 0.8, 0.95, 0.2
    rows = spark.sql(
        "SELECT col1 AS r FROM VALUES (2), (3), (4), (5), (6), (8)")
    b = F.ceil(F.log(F.lit(1.0) - F.lit(R))
               / F.log(F.lit(1.0) - F.pow(F.lit(t), F.col("r"))))
    g = rows.select(
        F.col("r").cast("long").alias("rows_per_band"),
        b.cast("long").alias("bands"))
    g = g.withColumn("num_hashes",
                     (F.col("bands") * F.col("rows_per_band"))
                     .cast("long"))
    recall = (F.lit(1.0) - F.pow(
        F.lit(1.0) - F.pow(F.lit(t), F.col("rows_per_band")),
        F.col("bands")))
    fp = (F.lit(1.0) - F.pow(
        F.lit(1.0) - F.pow(F.lit(bg), F.col("rows_per_band")),
        F.col("bands")))
    g = g.select("rows_per_band", "bands", "num_hashes",
                 F.round(recall, 6).alias("recall"),
                 F.round(fp, 6).alias("fp_rate"))
    from pyspark.sql import Window
    w = Window.orderBy("num_hashes", "fp_rate", "bands")
    return (g.withColumn("selected", F.row_number().over(w) == 1)
            .select("rows_per_band", "bands", "num_hashes", "recall",
                    "fp_rate", "selected"))


_DEDUP_LSH_PLAN_SQL = """
WITH g AS (
  SELECT CAST(r AS BIGINT) AS rows_per_band,
         CAST(CEIL(LN(1.0 - 0.95) / LN(1.0 - POW(0.8, r))) AS BIGINT)
             AS bands
  FROM (VALUES (2), (3), (4), (5), (6), (8)) AS t(r)),
e AS (
  SELECT rows_per_band, bands,
         CAST(bands * rows_per_band AS BIGINT) AS num_hashes,
         ROUND(1.0 - POW(1.0 - POW(0.8, rows_per_band), bands), 6)
             AS recall,
         ROUND(1.0 - POW(1.0 - POW(0.2, rows_per_band), bands), 6)
             AS fp_rate
  FROM g)
SELECT rows_per_band, bands, num_hashes, recall, fp_rate,
       ROW_NUMBER() OVER (ORDER BY num_hashes, fp_rate, bands) = 1
           AS selected
FROM e
"""


def _events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the product-
    analytics headline metric. DAU is one distinct-count aggregate; WAU
    re-aggregates the (day, user) pairs over a 7-day integer-DIV-free
    range join expressed as a self-join on day distance (days are a
    tiny dimension — broadcast). Stickiness = DAU/WAU, one final
    division."""
    ev = _t(spark, sf_dir, "events")
    day = (F.col("ts") / F.lit(86400000000)).cast("long")
    du = ev.select(day.alias("day"), "user_id").distinct()
    dau = du.groupBy("day").agg(
        F.countDistinct("user_id").alias("dau"))
    days = dau.select("day")
    wau = (du.join(F.broadcast(days.select(F.col("day").alias("d"))),
                   (F.col("day") <= F.col("d"))
                   & (F.col("day") > F.col("d") - 7))
           .groupBy("d")
           .agg(F.countDistinct("user_id").alias("wau")))
    return (dau.join(wau, dau.day == wau.d)
            .select("day",
                    F.col("dau").cast("long").alias("dau"),
                    F.col("wau").cast("long").alias("wau"),
                    F.round(F.col("dau") / F.col("wau"), 6)
                    .alias("stickiness")))


_EVENTS_DAU_WAU_SQL = """
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
  FROM events),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY 1),
wau AS (
  SELECT d.day AS day, COUNT(DISTINCT u.user_id) AS wau
  FROM (SELECT DISTINCT day FROM du) d
  JOIN du u ON u.day <= d.day AND u.day > d.day - 7
  GROUP BY 1)
SELECT dau.day,
       CAST(dau.dau AS BIGINT) AS dau,
       CAST(wau.wau AS BIGINT) AS wau,
       ROUND(dau.dau / wau.wau, 6) AS stickiness
FROM dau JOIN wau USING (day)
"""


def _customer_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style latest-wins upsert (`scd.apply_changes`): the base
    customer table (version 0) absorbs a synthetic change batch —
    balance updates for custkey % 7 == 1 (version 2), segment updates
    for custkey % 11 == 3 (version 1, LOSES to the balance update on
    overlapping keys), tombstones for custkey % 13 == 5 (version 3,
    wins over everything) — producing the current snapshot with one
    argmax fold per key, no window."""
    from pipelinedp_spark.operators.scd import apply_changes
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")         .withColumn("version", F.lit(0).cast("long"))
    upd_bal = (cust.filter(F.col("c_custkey") % 7 == 1)
               .select("c_custkey", "c_name",
                       (F.col("c_acctbal") + 100).alias("c_acctbal"),
                       "c_mktsegment")
               .withColumn("version", F.lit(2).cast("long"))
               .withColumn("_deleted", F.lit(False)))
    upd_seg = (cust.filter(F.col("c_custkey") % 11 == 3)
               .select("c_custkey", "c_name", "c_acctbal",
                       F.lit("REASSIGNED").alias("c_mktsegment"))
               .withColumn("version", F.lit(1).cast("long"))
               .withColumn("_deleted", F.lit(False)))
    dels = (cust.filter(F.col("c_custkey") % 13 == 5)
            .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
            .withColumn("version", F.lit(3).cast("long"))
            .withColumn("_deleted", F.lit(True)))
    updates = upd_bal.unionByName(upd_seg).unionByName(dels)
    out = apply_changes(cust, updates, "c_custkey", "version")
    return out.select("c_custkey", "c_name",
                      F.round("c_acctbal", 2).alias("c_acctbal"),
                      "c_mktsegment", "version")


_CUSTOMER_UPSERT_SQL = """
WITH base AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         CAST(0 AS BIGINT) AS version, FALSE AS del
  FROM customer),
ub AS (
  SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal,
         c_mktsegment, CAST(2 AS BIGINT) AS version, FALSE AS del
  FROM customer WHERE c_custkey % 7 = 1),
us AS (
  SELECT c_custkey, c_name, c_acctbal,
         'REASSIGNED' AS c_mktsegment, CAST(1 AS BIGINT) AS version,
         FALSE AS del
  FROM customer WHERE c_custkey % 11 = 3),
ud AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         CAST(3 AS BIGINT) AS version, TRUE AS del
  FROM customer WHERE c_custkey % 13 = 5),
allr AS (SELECT * FROM base UNION ALL SELECT * FROM ub
         UNION ALL SELECT * FROM us UNION ALL SELECT * FROM ud),
win AS (
  SELECT c_custkey,
         first(c_name ORDER BY version DESC) AS c_name,
         first(c_acctbal ORDER BY version DESC) AS c_acctbal,
         first(c_mktsegment ORDER BY version DESC) AS c_mktsegment,
         first(version ORDER BY version DESC) AS version,
         first(del ORDER BY version DESC) AS del
  FROM allr GROUP BY c_custkey)
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal,
       c_mktsegment, version
FROM win WHERE NOT del
"""


def _stream_upsert_mirror(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Batch mirror of `streaming.streaming_apply_changes` with exact
    two-trigger semantics: trigger 0 merges the base customer rows into
    an empty snapshot, trigger 1 merges the synthetic change batch
    (balance updates, losing segment updates, tombstones — the
    customer_upsert plant). Output = the snapshot AFTER EACH trigger,
    tagged by batch, proving the per-batch merge contract rather than
    only the final state."""
    from pipelinedp_spark.operators.scd import apply_changes
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")         .withColumn("version", F.lit(0).cast("long"))         .withColumn("_deleted", F.lit(False))
    snap0 = apply_changes(cust.limit(0), cust, "c_custkey", "version")         .localCheckpoint()
    upd = (cust.filter(F.col("c_custkey") % 7 == 1)
           .select("c_custkey", "c_name",
                   (F.col("c_acctbal") + 100).alias("c_acctbal"),
                   "c_mktsegment",
                   F.lit(2).cast("long").alias("version"),
                   F.lit(False).alias("_deleted"))
           .unionByName(
               cust.filter(F.col("c_custkey") % 11 == 3)
               .select("c_custkey", "c_name", "c_acctbal",
                       F.lit("REASSIGNED").alias("c_mktsegment"),
                       F.lit(1).cast("long").alias("version"),
                       F.lit(False).alias("_deleted")))
           .unionByName(
               cust.filter(F.col("c_custkey") % 13 == 5)
               .select("c_custkey", "c_name", "c_acctbal",
                       "c_mktsegment",
                       F.lit(3).cast("long").alias("version"),
                       F.lit(True).alias("_deleted"))))
    snap1 = apply_changes(
        snap0.withColumn("_deleted", F.lit(False)), upd,
        "c_custkey", "version")
    tag = lambda df, b: df.select(
        F.lit(b).cast("long").alias("batch"), "c_custkey", "c_name",
        F.round("c_acctbal", 2).alias("c_acctbal"), "c_mktsegment",
        "version")
    return tag(snap0, 0).unionByName(tag(snap1, 1))


_STREAM_UPSERT_MIRROR_SQL = """
WITH base AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         CAST(0 AS BIGINT) AS version, FALSE AS del
  FROM customer),
ub AS (
  SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal,
         c_mktsegment, CAST(2 AS BIGINT) AS version, FALSE AS del
  FROM customer WHERE c_custkey % 7 = 1),
us AS (
  SELECT c_custkey, c_name, c_acctbal,
         'REASSIGNED' AS c_mktsegment, CAST(1 AS BIGINT) AS version,
         FALSE AS del
  FROM customer WHERE c_custkey % 11 = 3),
ud AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         CAST(3 AS BIGINT) AS version, TRUE AS del
  FROM customer WHERE c_custkey % 13 = 5),
allr AS (SELECT * FROM base UNION ALL SELECT * FROM ub
         UNION ALL SELECT * FROM us UNION ALL SELECT * FROM ud),
fin AS (
  SELECT c_custkey,
         first(c_name ORDER BY version DESC) AS c_name,
         first(c_acctbal ORDER BY version DESC) AS c_acctbal,
         first(c_mktsegment ORDER BY version DESC) AS c_mktsegment,
         first(version ORDER BY version DESC) AS version,
         first(del ORDER BY version DESC) AS del
  FROM allr GROUP BY c_custkey)
SELECT CAST(0 AS BIGINT) AS batch, c_custkey, c_name,
       ROUND(c_acctbal, 2) AS c_acctbal, c_mktsegment, version
FROM base
UNION ALL
SELECT CAST(1 AS BIGINT) AS batch, c_custkey, c_name,
       ROUND(c_acctbal, 2) AS c_acctbal, c_mktsegment, version
FROM fin WHERE NOT del
"""


def _doc_head_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head-coverage curve (the Zipf check that sizes
    tokenizer vocabularies): for k in {10, 100, 1000}, the fraction of
    all corpus token occurrences covered by the k most frequent types
    (ties broken by token ascending). One word-count aggregate; the
    top-k mass comes from a WindowGroupLimit over the already-tiny
    count table, never a corpus sort."""
    from pyspark.sql import Window
    from pipelinedp_spark.functions import text as TX
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("w"))         .filter(F.col("w") != "")
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    counts = counts.localCheckpoint()
    total = counts.agg(F.sum("c")).collect()[0][0]
    w = Window.orderBy(F.col("c").desc(), F.col("w").asc())
    ranked = counts.withColumn("rank", F.row_number().over(w))         .filter(F.col("rank") <= 1000)
    out = None
    for k in (10, 100, 1000):
        o = (ranked.filter(F.col("rank") <= k)
             .agg(F.lit(k).cast("long").alias("k"),
                  F.sum("c").cast("long").alias("head_tokens"),
                  F.round(F.sum("c") / F.lit(float(total)), 6)
                  .alias("coverage")))
        out = o if out is None else out.unionByName(o)
    return out


_DOC_HEAD_COVERAGE_SQL = """
WITH counts AS (
  SELECT w, COUNT(*) AS c FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w),
tot AS (SELECT SUM(c) AS t FROM counts),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS rank
  FROM counts),
ks AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES (10), (100), (1000))
       AS v(k))
SELECT ks.k,
       CAST(SUM(r.c) AS BIGINT) AS head_tokens,
       ROUND(SUM(r.c) / (SELECT CAST(t AS DOUBLE) FROM tot), 6)
           AS coverage
FROM ks JOIN ranked r ON r.rank <= ks.k
GROUP BY ks.k
"""


def _events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase
    (`funnel.funnel_report`): per-user strict-ordering matches via
    type-pruned scans joined to the shrinking per-step state table."""
    from pipelinedp_spark.operators.funnel import funnel_report
    ev = _t(spark, sf_dir, "events")
    return funnel_report(ev, ["view", "click", "purchase"])


_EVENTS_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
u AS (
  SELECT 1 AS step, 'view' AS step_name,
         (SELECT COUNT(*) FROM s1) AS users
  UNION ALL
  SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
  UNION ALL
  SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3))
SELECT CAST(step AS BIGINT) AS step, step_name,
       CAST(users AS BIGINT) AS users,
       ROUND(users / (SELECT COUNT(*) FROM s1), 6) AS conversion
FROM u
"""


def _events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention grid (`funnel.retention_cohorts`):
    integer-DIV period bucketing, two map-side-combinable aggs, one
    broadcast cohort-size join."""
    from pipelinedp_spark.operators.funnel import retention_cohorts
    ev = _t(spark, sf_dir, "events")
    return retention_cohorts(ev)


_EVENTS_RETENTION_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tm FROM events),
first AS (
  SELECT user_id, MIN(tm) // 604800000000 AS cohort
  FROM e GROUP BY 1),
active AS (
  SELECT DISTINCT user_id, tm // 604800000000 AS p FROM e),
grid AS (
  SELECT f.cohort, a.p - f.cohort AS off, COUNT(*) AS users
  FROM active a JOIN first f USING (user_id)
  GROUP BY 1, 2),
sz AS (SELECT cohort, COUNT(*) AS n FROM first GROUP BY 1)
SELECT CAST(g.cohort AS BIGINT) AS cohort,
       CAST(g.off AS BIGINT) AS offset,
       CAST(g.users AS BIGINT) AS users,
       ROUND(g.users / sz.n, 6) AS retention
FROM grid g JOIN sz USING (cohort)
WHERE g.off >= 0
"""


def _events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column stats (`functions.semistructured`): the
    JSON props field parsed ONCE per row (from_json, explicit schema —
    no inference scan), integer-exact per-type aggregates."""
    from pipelinedp_spark.functions.semistructured import json_fields
    ev = _t(spark, sf_dir, "events")
    withk = json_fields(ev, "props", "k BIGINT")
    return (withk.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k"),
                 F.round(F.sum("k") / F.count(F.lit(1)), 6)
                 .alias("avg_k")))


_EVENTS_JSON_STATS_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       ROUND(SUM(k) / COUNT(*), 6) AS avg_k
FROM e GROUP BY 1
"""


def _doc_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph keyword extraction (`retrieval.textrank_keywords`):
    integer-arithmetic PageRank over the adjacent-word graph, 3
    iterations unrolled in the oracle (integer DIV throughout — the
    Lloyd discipline applied to a graph algorithm)."""
    from pipelinedp_spark.operators.retrieval import textrank_keywords
    docs = _t(spark, sf_dir, "documents")
    return textrank_keywords(docs, iters=3, k=20, min_count=2)


def _gen_textrank_sql(iters: int = 3, k: int = 20, min_count: int = 2,
                      scale: int = 1_000_000, d_pct: int = 85) -> str:
    base = (scale * (100 - d_pct)) // 100
    sql = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bi0 AS (
  SELECT UNNEST(CASE WHEN len(t) >= 2
                     THEN [t[i] || ' ' || t[i+1]
                           for i in range(1, len(t))]
                     ELSE [] END) AS g
  FROM tok),
bi AS (
  SELECT split_part(g, ' ', 1) AS a, split_part(g, ' ', 2) AS b,
         COUNT(*) AS cnt
  FROM bi0 GROUP BY 1, 2 HAVING COUNT(*) >= {min_count}),
und AS (
  SELECT v, w, SUM(cnt) AS cnt FROM (
    SELECT a AS v, b AS w, cnt FROM bi
    UNION ALL
    SELECT b AS v, a AS w, cnt FROM bi) GROUP BY 1, 2),
ow AS (SELECT v, SUM(cnt) AS outw FROM und GROUP BY 1),
e AS (SELECT und.v, und.w, und.cnt, ow.outw
      FROM und JOIN ow USING (v)),
r0 AS (SELECT DISTINCT v AS word, CAST({scale} AS BIGINT) AS r FROM e)"""
    for i in range(1, iters + 1):
        sql += f""",
r{i} AS (
  SELECT e.w AS word,
         CAST({base} + ({d_pct} * SUM((r.r * e.cnt) // e.outw)) // 100
              AS BIGINT) AS r
  FROM e JOIN r{i - 1} r ON r.word = e.v GROUP BY 1)"""
    sql += f"""
SELECT word, r AS rank FROM r{iters}
ORDER BY r DESC, word ASC LIMIT {k}
"""
    return sql


def _events_json_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON schema discovery (`semistructured.json_key_profile`): per
    top-level key, rows carrying it — the promote-to-column signal."""
    from pipelinedp_spark.functions.semistructured import json_key_profile
    ev = _t(spark, sf_dir, "events")
    return json_key_profile(ev, "props")


_EVENTS_JSON_PROFILE_SQL = """
WITH k AS (
  SELECT UNNEST(json_keys(props)) AS key FROM events)
SELECT key, CAST(COUNT(*) AS BIGINT) AS rows
FROM k GROUP BY 1
"""


def _events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency (`funnel.funnel_users`): micros from first view
    to the funnel-completing purchase for converting users —
    integer-exact min/max/avg (sum of micros stays in int64)."""
    from pipelinedp_spark.operators.funnel import funnel_users
    ev = _t(spark, sf_dir, "events")
    tabs = funnel_users(ev, ["view", "click", "purchase"])
    first = tabs[0].select("user_id", F.col("t").alias("_t1"))
    last = tabs[2].select("user_id", F.col("t").alias("_t3"))
    d = first.join(last, "user_id").select(
        (F.col("_t3") - F.col("_t1")).alias("_d"))
    return d.agg(F.count(F.lit(1)).alias("users"),
                 F.min("_d").alias("min_us"),
                 F.max("_d").alias("max_us"),
                 F.round(F.sum("_d") / F.count(F.lit(1)), 6)
                 .alias("avg_us"))


_EVENTS_TIME_TO_CONVERT_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS tm FROM events),
s1 AS (
  SELECT user_id, MIN(tm) AS t FROM e
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id, MIN(e.tm) AS t
  FROM e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.tm > s1.t GROUP BY 1),
s3 AS (
  SELECT e.user_id, MIN(e.tm) AS t
  FROM e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.tm > s2.t GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS users,
       CAST(MIN(s3.t - s1.t) AS BIGINT) AS min_us,
       CAST(MAX(s3.t - s1.t) AS BIGINT) AS max_us,
       ROUND(SUM(s3.t - s1.t) / COUNT(*), 6) AS avg_us
FROM s3 JOIN s1 USING (user_id)
"""


def _events_window_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-anomaly scores per (event_type, hour window): signed
    squared-z-score as the exact rational (c*n - S)^2 / (n*Sq - S^2) —
    integer numerators/denominators on both engines until ONE final
    division, so the anomaly ranking is bit-reproducible. Top-10 via
    TakeOrderedAndProject; the per-type stats table is 5 rows
    (broadcast)."""
    ev = _t(spark, sf_dir, "events")
    win = ev.select("event_type",
                    F.expr("ts DIV 3600000000").alias("win"))
    counts = (win.groupBy("event_type", "win")
              .agg(F.count(F.lit(1)).alias("c")))
    stats = (counts.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("c").alias("s"),
                  F.sum(F.col("c") * F.col("c")).alias("sq")))
    dev = F.col("c") * F.col("n") - F.col("s")
    den = F.col("n") * F.col("sq") - F.col("s") * F.col("s")
    return (counts.join(F.broadcast(stats), "event_type")
            .select("event_type", F.col("win").cast("long").alias("win"),
                    F.col("c").cast("long").alias("c"),
                    F.when(den > 0,
                           F.round(F.signum(dev.cast("double"))
                                   * (dev * dev) / den, 6))
                    .otherwise(F.lit(0.0)).alias("score"))
            .orderBy(F.col("score").desc(), "event_type", "win")
            .limit(10))


_EVENTS_WINDOW_ANOMALY_SQL = """
WITH w AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS win FROM events),
counts AS (
  SELECT event_type, win, COUNT(*) AS c FROM w GROUP BY 1, 2),
stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS sq
  FROM counts GROUP BY 1),
scored AS (
  SELECT c.event_type, CAST(c.win AS BIGINT) AS win,
         CAST(c.c AS BIGINT) AS c,
         CASE WHEN t.n * t.sq - t.s * t.s > 0
              THEN ROUND(sign(c.c * t.n - t.s)
                         * ((c.c * t.n - t.s) * (c.c * t.n - t.s))
                         / (t.n * t.sq - t.s * t.s), 6)
              ELSE 0.0 END AS score
  FROM counts c JOIN stats t USING (event_type))
SELECT event_type, win, c, score FROM scored
ORDER BY score DESC, event_type, win LIMIT 10
"""


def _doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid readability per document
    (`functions.text.flesch_kincaid_grade`): pure codegen regexp
    counts — zero shuffles beyond the scan."""
    from pipelinedp_spark.functions import text as TX
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        TX.sentence_count(F.col("text")).cast("long").alias("sentences"),
        TX.syllable_estimate(F.col("text")).cast("long")
        .alias("syllables"),
        TX.flesch_kincaid_grade(F.col("text")).alias("fk_grade"))


_DOC_READABILITY_SQL = """
WITH base AS (
  SELECT doc_id, n_chars, text,
         len(string_split(text, ' ')) AS w,
         CASE WHEN length(text) = 0 THEN 0
              ELSE GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
         END AS s,
         len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS sy
  FROM documents)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(s AS BIGINT) AS sentences,
       CAST(sy AS BIGINT) AS syllables,
       CASE WHEN w > 0 AND s > 0
            THEN ROUND(0.39 * (w::DOUBLE / s::DOUBLE)
                       + 11.8 * (sy::DOUBLE / w::DOUBLE) - 15.59, 6)
            ELSE 0.0 END AS fk_grade
FROM base
"""


def _doc_source_quality_report(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Curation dashboard row: Gopher pass rate and mean FK grade per
    source — the decide-what-to-recrawl report. Composes the gopher
    filter (one corpus pass) with a source join and a
    source-cardinality agg."""
    from pipelinedp_spark.functions import text as TX
    from pipelinedp_spark.operators.quality import gopher_quality_filter
    docs = _t(spark, sf_dir, "documents")
    g = gopher_quality_filter(docs).select("doc_id", "passes")
    base = docs.select("doc_id", "source",
                       TX.flesch_kincaid_grade(F.col("text"))
                       .alias("fk"))
    return (base.join(g, "doc_id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("passes").cast("long")).alias("n_pass"),
                 F.round(F.sum(F.col("passes").cast("long"))
                         / F.count(F.lit(1)), 6).alias("pass_rate"),
                 F.round(F.sum("fk") / F.count(F.lit(1)), 6)
                 .alias("avg_fk")))


def _gen_source_quality_sql() -> str:
    gopher = _DOC_GOPHER_FILTER_SQL.strip()
    assert gopher.startswith("WITH ")
    fk = """
SELECT d.source, g.passes, b.fk
FROM documents d
JOIN gph g USING (doc_id)
JOIN (SELECT doc_id,
             CASE WHEN len(string_split(text, ' ')) > 0
                   AND (CASE WHEN length(text) = 0 THEN 0
                        ELSE GREATEST(len(regexp_extract_all(
                                 text, '[.!?]+')), 1) END) > 0
                  THEN ROUND(0.39 * (len(string_split(text, ' '))::DOUBLE
                             / (GREATEST(len(regexp_extract_all(
                                  text, '[.!?]+')), 1))::DOUBLE)
                        + 11.8 * (len(regexp_extract_all(
                                  text, '[aeiouyAEIOUY]+'))::DOUBLE
                             / (len(string_split(text, ' ')))::DOUBLE)
                        - 15.59, 6)
                  ELSE 0.0 END AS fk
      FROM documents) b USING (doc_id)
"""
    return (gopher.replace("WITH ", "WITH gph AS (WITH ", 1)
            .rsplit("FROM sig s", 1)[0]
            + "FROM sig s JOIN dup5 USING (doc_id) "
              "JOIN top2 USING (doc_id) JOIN tot2 USING (doc_id))\n"
            + f"""SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(passes::INT) AS BIGINT) AS n_pass,
       ROUND(SUM(passes::INT) / COUNT(*), 6) AS pass_rate,
       ROUND(SUM(fk) / COUNT(*), 6) AS avg_fk
FROM ({fk}) GROUP BY source""")


def _events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase attributes its
    value (exact integer cents) to the user's most recent prior click
    via the as-of join; unattributed purchases land in bucket -1.
    Composes `asof.asof_join` + integer-cent sums — no float
    accumulation."""
    from pipelinedp_spark.operators.asof import asof_join
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)) \
        .cast("long")
    pur = (ev.filter(F.col("event_type") == "purchase")
           .select("user_id", "ts", cents.alias("cents")))
    clk = (ev.filter(F.col("event_type") == "click")
           .select("user_id", "ts"))
    j = asof_join(pur, clk, "ts", "user_id")
    hour = (F.when(F.col("ts_right").isNull(), F.lit(-1))
            .otherwise(F.expr("ts_right DIV 3600000000"))).cast("long")
    return (j.groupBy(hour.alias("click_hour"))
            .agg(F.count(F.lit(1)).alias("purchases"),
                 F.sum("cents").alias("revenue_cents")))


_EVENTS_ATTRIBUTION_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS tm,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events),
p AS (SELECT user_id, tm, cents FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, tm FROM e WHERE event_type = 'click'),
j AS (
  SELECT p.user_id, p.tm, p.cents, c.tm AS ctm
  FROM p ASOF LEFT JOIN c
    ON p.user_id = c.user_id AND p.tm >= c.tm)
SELECT CAST(CASE WHEN ctm IS NULL THEN -1
            ELSE ctm // 3600000000 END AS BIGINT) AS click_hour,
       CAST(COUNT(*) AS BIGINT) AS purchases,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM j GROUP BY 1
"""


def _events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event transition matrix (Markov view of user journeys):
    consecutive event pairs per user via LEAD over (ts, event_id) —
    the tiebreaker makes the sequence deterministic — then
    P(next | current) from integer counts. The per-user window is
    bounded by per-user activity (document: cap outliers upstream with
    `sampling.cap_per_key` before sequence ops on adversarial data)."""
    from pyspark.sql import Window
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select("user_id", "ts", "event_id", "event_type",
                       F.lead("event_type").over(w).alias("nxt"))
             .filter(F.col("nxt").isNotNull())
             .groupBy(F.col("event_type").alias("from_type"),
                      F.col("nxt").alias("to_type"))
             .agg(F.count(F.lit(1)).alias("cnt")))
    tot = pairs.groupBy("from_type").agg(F.sum("cnt").alias("_tot"))
    return (pairs.join(F.broadcast(tot), "from_type")
            .select("from_type", "to_type",
                    F.col("cnt").cast("long").alias("cnt"),
                    F.round(F.col("cnt") / F.col("_tot"), 6)
                    .alias("prob")))


_EVENTS_TRANSITIONS_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tm, event_id, event_type FROM events),
seq AS (
  SELECT event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY tm, event_id) AS nxt
  FROM e),
pairs AS (
  SELECT event_type AS from_type, nxt AS to_type, COUNT(*) AS cnt
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT from_type, SUM(cnt) AS t FROM pairs GROUP BY 1)
SELECT p.from_type, p.to_type, CAST(p.cnt AS BIGINT) AS cnt,
       ROUND(p.cnt / t.t, 6) AS prob
FROM pairs p JOIN tot t USING (from_type)
"""


def _part_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / fuzzy key join: 10 deterministically
    corrupted part names (one char overwritten) matched back to the
    catalog by Levenshtein <= 2 with length blocking. The length-delta
    prefilter runs before the distance (Catalyst orders the cheap
    predicate first); queries broadcast; per-query best match =
    min(struct) argmax — no window. Levenshtein is codegen in BOTH
    engines with the identical standard definition."""
    part = _t(spark, sf_dir, "part")
    q = (part.filter(F.col("p_partkey") <= 10)
         .select(F.col("p_partkey").alias("query_id"),
                 F.concat(F.substring("p_name", 1, 5), F.lit("#"),
                          F.substring("p_name", 7, 10_000))
                 .alias("q_name")))
    cand = (part.select("p_partkey", "p_name")
            .crossJoin(F.broadcast(q))
            .filter((F.abs(F.length("p_name") - F.length("q_name"))
                     <= 2)
                    & (F.levenshtein("p_name", "q_name") <= 2)))
    best = (cand.select("query_id",
                        F.struct(F.levenshtein("p_name", "q_name")
                                 .alias("d"),
                                 F.col("p_partkey").alias("k"))
                        .alias("s"))
            .groupBy("query_id")
            .agg(F.min("s").alias("m")))
    return best.select("query_id",
                       F.col("m.k").cast("long").alias("matched_key"),
                       F.col("m.d").cast("long").alias("distance"))


_PART_FUZZY_MATCH_SQL = """
WITH q AS (
  SELECT p_partkey AS query_id,
         substr(p_name, 1, 5) || '#' || substr(p_name, 7) AS q_name
  FROM part WHERE p_partkey <= 10),
cand AS (
  SELECT q.query_id, p.p_partkey,
         levenshtein(p.p_name, q.q_name) AS d
  FROM part p CROSS JOIN q
  WHERE abs(length(p.p_name) - length(q.q_name)) <= 2
    AND levenshtein(p.p_name, q.q_name) <= 2)
SELECT query_id,
       CAST(first(p_partkey ORDER BY d ASC, p_partkey ASC) AS BIGINT)
           AS matched_key,
       CAST(MIN(d) AS BIGINT) AS distance
FROM cand GROUP BY 1
"""


def _lineitem_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (non-DP) per-group order statistics: median and p90 of
    lineitem quantity per return flag — Spark's exact `median` /
    `percentile` aggregates (sort-based within group, map-side
    partial) vs DuckDB MEDIAN/QUANTILE_CONT. The non-private twin of
    dp_percentile_*."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.median("l_quantity"), 6).alias("median_qty"),
                 F.round(F.expr("percentile(l_quantity, 0.9)"), 6)
                 .alias("p90_qty")))


_LINEITEM_ORDER_STATS_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MEDIAN(l_quantity), 6) AS median_qty,
       ROUND(QUANTILE_CONT(l_quantity, 0.9), 6) AS p90_qty
FROM lineitem GROUP BY 1
"""


def _events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped funnel: view -> click -> purchase must all occur
    inside ONE gap-based session (1 h). Composes `sessions.sessionize`
    with `funnel.funnel_report` over a folded (user, session) key
    (user_id * 2^20 + session_id — session counts are bounded far
    below 2^20 by the gap). The counting unit becomes the session."""
    from pipelinedp_spark.operators.funnel import funnel_report
    from pipelinedp_spark.operators.sessions import sessionize
    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, "ts", "user_id", gap=3_600_000_000)
    s = s.withColumn(
        "uk", F.col("user_id") * F.lit(1 << 20) + F.col("session_id"))
    return (funnel_report(s, ["view", "click", "purchase"],
                          user_col="uk")
            .withColumnRenamed("users", "sessions"))


_EVENTS_SESSION_FUNNEL_SQL = """
WITH x AS (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
d AS (
  SELECT user_id, event_type, t,
         CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                   > 3600000000 THEN 1 ELSE 0 END AS brk
  FROM x),
s AS (
  SELECT event_type, t,
         user_id * 1048576
         + SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                          ROWS UNBOUNDED PRECEDING) AS uk
  FROM d),
s1 AS (SELECT uk, MIN(t) AS t FROM s
       WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT s.uk, MIN(s.t) AS t FROM s JOIN s1 USING (uk)
       WHERE s.event_type = 'click' AND s.t > s1.t GROUP BY 1),
s3 AS (SELECT s.uk, MIN(s.t) AS t FROM s JOIN s2 USING (uk)
       WHERE s.event_type = 'purchase' AND s.t > s2.t GROUP BY 1),
u AS (
  SELECT 1 AS step, 'view' AS step_name,
         (SELECT COUNT(*) FROM s1) AS c
  UNION ALL
  SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
  UNION ALL
  SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3))
SELECT CAST(step AS BIGINT) AS step, step_name,
       CAST(c AS BIGINT) AS sessions,
       ROUND(c / (SELECT COUNT(*) FROM s1), 6) AS conversion
FROM u
"""


def _customer_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension merge (`scd.scd2_apply`): every 10th
    customer gets an address change at eff=1000 — expired version +
    new open version + untouched rows, plain equi-joins (the MERGE an
    ACID format would run)."""
    from pipelinedp_spark.operators.scd import scd2_apply
    cust = _t(spark, sf_dir, "customer")
    dim = cust.select("c_custkey", "c_mktsegment",
                      F.lit(0).cast("long").alias("valid_from"),
                      F.lit(None).cast("long").alias("valid_to"))
    upd = (cust.filter(F.col("c_custkey") % 10 == 0)
           .select("c_custkey",
                   F.concat(F.col("c_mktsegment"), F.lit("-V2"))
                   .alias("c_mktsegment"),
                   F.lit(1000).cast("long").alias("eff_ts")))
    out = scd2_apply(dim, upd, "c_custkey", ["c_mktsegment"])
    return out.select(F.col("c_custkey").cast("long"), "c_mktsegment",
                      "valid_from", "valid_to")


_CUSTOMER_SCD2_SQL = """
WITH dim AS (
  SELECT c_custkey, c_mktsegment,
         CAST(0 AS BIGINT) AS valid_from,
         CAST(NULL AS BIGINT) AS valid_to
  FROM customer),
upd AS (
  SELECT c_custkey, c_mktsegment || '-V2' AS new_seg,
         CAST(1000 AS BIGINT) AS eff
  FROM customer WHERE c_custkey % 10 = 0),
j AS (
  SELECT d.*, u.new_seg, u.eff,
         (u.eff IS NOT NULL
          AND NOT (d.c_mktsegment IS NOT DISTINCT FROM u.new_seg))
             AS changed
  FROM dim d LEFT JOIN upd u USING (c_custkey))
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment,
       valid_from, valid_to
FROM j WHERE NOT changed
UNION ALL
SELECT CAST(c_custkey AS BIGINT), c_mktsegment, valid_from, eff
FROM j WHERE changed
UNION ALL
SELECT CAST(c_custkey AS BIGINT), new_seg, eff,
       CAST(NULL AS BIGINT)
FROM j WHERE changed
"""
