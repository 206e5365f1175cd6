"""LLM-pipeline operators: text analysis, dedup, similarity.

Part of the driver-contract oracle registry (split out of
__spark_entry__.py in round 11; every query name, plan, and oracle hash
unchanged). QUERIES maps query name -> (spark, sf_dir) -> DataFrame;
ORACLES maps the same names to DuckDB-ANSI SQL strings the driver runs
side-by-side at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipelinedp_spark.queries.common import _t


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


QUERIES = {
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
}

ORACLES = {
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
}
