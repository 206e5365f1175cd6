"""Deterministic feature-hashing text embeddings (the hashing trick,
Weinberger et al., ICML 2009): each token's dense vector is derived
from its md5 digest — component d is byte d of the digest mapped to
[-1, 1] — and a document's embedding is the L2-normalized sum of its
token vectors (counts included). Two documents sharing most tokens get
high cosine similarity, which is exactly what the downstream
embedding operators (semantic dedup, ANN) consume.

This is NOT a learned embedding — it is the deterministic, model-free
stand-in that makes the text -> embed -> semantic-dedup path fully
self-contained in-engine (and exactly SQL-mirrorable: one md5 per
token, hex-pair slices for the components). Swap in real model vectors
by replacing this single stage.

Scale shape: one Arrow-batched pass per document, zero shuffles; the
per-token md5 is computed JVM-side once (`text.tokens` + transform)
and the digest bytes fan out to all components — no per-component
hashing.

No reference counterpart (net-new LLM-pipeline function).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pipelinedp_spark.functions import text as T

MAX_DIM = 16  # md5 yields 16 digest bytes -> at most 16 components


def token_vector(token: str, dim: int = 16) -> "np.ndarray":
    """Reference (driver-side) per-token vector: digest byte d mapped
    to (b - 127.5) / 127.5. Shared by tests and oracle generators."""
    dig = hashlib.md5(token.encode()).digest()
    return (np.frombuffer(dig[:dim], dtype=np.uint8)
            .astype("float64") - 127.5) / 127.5


def hashed_embeddings(df: DataFrame,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      dim: int = 16) -> DataFrame:
    """(id_col, embedding array<double>) — L2-normalized hashed
    bag-of-words embedding per document, ``dim`` <= 16."""
    if not 1 <= dim <= MAX_DIM:
        raise ValueError(f"dim must be in [1, {MAX_DIM}], got {dim}")

    # md5 hex per token computed JVM-side; the UDF only does byte
    # arithmetic over the hex strings (vectorized numpy).
    hexes = F.transform(T.tokens(F.col(text_col)), lambda t: F.md5(t))

    @pandas_udf("array<double>")
    def _embed(col: pd.Series) -> pd.Series:
        out = []
        for arr in col:
            if len(arr) == 0:
                out.append([0.0] * dim)
                continue
            # hex digests -> (n_tokens, dim) uint8 matrix in one C pass
            # per document (bytes.fromhex + frombuffer), not a Python
            # per-hex-pair int() loop — measured ~5x on the UDF stage.
            raw = bytes.fromhex("".join(arr))
            b = np.frombuffer(raw, dtype=np.uint8).reshape(
                len(arr), 16)[:, :dim].astype("float64")
            v = ((b - 127.5) / 127.5).sum(axis=0)
            norm = float(np.linalg.norm(v))
            if norm > 0.0:
                v = v / norm
            out.append(np.round(v, 6).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col), _embed(hexes).alias("embedding"))


# ---------------------------------------------------------------------------
# Int8 scalar quantization — the 100 TB embedding-storage move: per-dim
# min/max affine codes cut an array<float> column 4x (and more vs double)
# before ANN indexing or shipping to a feature store. Everything below is
# codegen column expressions against a bounded (2 x dim) parameter table;
# rounding is floor(z + 0.5) so Spark and a SQL oracle agree bit-for-bit
# (F.round is HALF_UP, DuckDB's is HALF_EVEN — floor sidesteps both).
# ---------------------------------------------------------------------------


def int8_quantize_params(df: DataFrame, vec_col: str = "embedding"
                         ) -> list:
    """Per-dimension (min, max) over the corpus: one posexplode →
    groupBy(pos) min/max (map-side combinable; shuffles <= partitions x
    dim rows) → a dim-sized driver collect (bounded model table)."""
    rows = (df.select(F.posexplode(F.col(vec_col).cast("array<double>"))
                      .alias("_pos", "_val"))
            .groupBy("_pos")
            .agg(F.min("_val").alias("_mn"), F.max("_val").alias("_mx"))
            .collect())
    by_pos = {r["_pos"]: (r["_mn"], r["_mx"]) for r in rows}
    return [by_pos[p] for p in range(len(by_pos))]


def int8_quantize_expr(vec: Column, params: list) -> Column:
    """array<tinyint> codes: floor((x - min) / scale + 0.5) - 128 with
    scale = (max - min) / 255; a constant dimension (max == min) codes
    to -128. Values outside the fitted per-dim [min, max] (stored
    params applied to new data) clamp to the range edge rather than
    wrapping in the tinyint cast. Pure codegen (two zip_with passes
    over literal arrays)."""
    mins = F.array(*[F.lit(float(mn)) for mn, _ in params])
    scales = F.array(*[F.lit((float(mx) - float(mn)) / 255.0)
                       for mn, mx in params])
    shifted = F.zip_with(vec.cast("array<double>"), mins,
                         lambda x, mn: x - mn)
    return F.zip_with(
        shifted, scales,
        lambda d, s: F.greatest(F.lit(-128), F.least(F.lit(127), (
            F.when(s > 0.0, F.floor(d / s + F.lit(0.5)))
            .otherwise(F.lit(0)) - F.lit(128)))).cast("tinyint"))


def int8_dequantize_expr(codes: Column, params: list) -> Column:
    """array<double> reconstruction: min + (code + 128) * scale."""
    mins = F.array(*[F.lit(float(mn)) for mn, _ in params])
    scales = F.array(*[F.lit((float(mx) - float(mn)) / 255.0)
                       for mn, mx in params])
    unshift = F.zip_with(codes, scales,
                         lambda c, s: (c.cast("double") + F.lit(128.0)) * s)
    return F.zip_with(unshift, mins, lambda v, mn: v + mn)


def gram_sums(df: DataFrame, vec_col: str = "embedding",
              quant_scale: int = 1 << 10) -> DataFrame:
    """Exact second-moment sums for covariance/PCA/whitening: one
    Arrow-batched pass computes the per-partition int64 Gram matrix
    ``X^T X`` with a numpy matmul (exact integer arithmetic on
    ``floor(x * quant_scale + 0.5)`` codes), then a tiny
    map-side-combinable groupBy folds partitions — the shuffle is
    O(partitions x dim^2) regardless of corpus size. Returns
    (i, j, sxy) for i <= j, plus linear sums as (-1, j, sum_j) and the
    row count as (-1, -1, n), so covariance assembles downstream as
    ``(n*sxy - s_i*s_j) / n^2`` in exact integer arithmetic until one
    final division.

    Overflow bound: ``quant_scale^2 * max|x|^2 * n_rows < 2^62`` — the
    default 2^10 scale holds to ~4e12 unit-norm rows; this is the
    covariance-grade quantization (coarser than the k-means 2^20
    because products square the scale)."""
    import numpy as np
    import pandas as pd

    dim = df.select(F.size(F.col(vec_col))).first()[0]
    q = float(quant_scale)

    def _part(batches):
        g = np.zeros((dim, dim), dtype=np.int64)
        s = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.floor(np.stack(pdf[vec_col].to_numpy())
                         .astype("float64") * q + 0.5).astype(np.int64)
            g += x.T @ x
            s += x.sum(axis=0)
            n += len(x)
        iu = np.triu_indices(dim)
        out = pd.DataFrame({"i": iu[0].astype("int64"),
                            "j": iu[1].astype("int64"),
                            "sxy": g[iu]})
        lin = pd.DataFrame({"i": np.full(dim, -1, dtype="int64"),
                            "j": np.arange(dim, dtype="int64"),
                            "sxy": s})
        cnt = pd.DataFrame({"i": [-1], "j": [-1],
                            "sxy": np.array([n], dtype="int64")})
        yield pd.concat([out, lin, cnt], ignore_index=True)

    part = df.select(vec_col).mapInPandas(_part,
                                          "i long, j long, sxy long")
    return part.groupBy("i", "j").agg(F.sum("sxy").alias("sxy"))


def pca_from_gram(gram_rows, dim: int, k: int):
    """Top-k principal directions from `gram_sums` output rows
    ((i, j, sxy) tuples incl. the (-1, *) linear/count rows): builds the
    exact-integer covariance (n*G - s s^T) / n^2, runs a driver-side
    eigh on the bounded dim x dim matrix, fixes each eigenvector's sign
    so its largest-|.| component is positive. Shared by the Spark
    operator and the oracle generator so both derive bit-identical
    components from the same sums. Returns (components k x dim,
    mean_dots length-k, eigvals desc) where mean_dots[i] is the
    sequential fold of mean . comp_i (the centering scalar)."""
    import numpy as np

    g = np.zeros((dim, dim), dtype=np.int64)
    s = np.zeros(dim, dtype=np.int64)
    n = 0
    for i, j, sxy in gram_rows:
        if i == -1 and j == -1:
            n = int(sxy)
        elif i == -1:
            s[j] = sxy
        else:
            g[i, j] = sxy
            g[j, i] = sxy
    cov = (n * g - np.outer(s, s)).astype("float64") / float(n * n)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = []
    mean = [s[p] / n for p in range(dim)]
    mean_dots = []
    for idx in order:
        c = v[:, idx].copy()
        top = int(np.argmax(np.abs(c)))
        if c[top] < 0:
            c = -c
        comps.append([float(x) for x in c])
        acc = 0.0
        for p in range(dim):
            acc += mean[p] * comps[-1][p]
        mean_dots.append(acc)
    return comps, mean_dots, [float(w[i]) for i in order]


def pca_components(df: DataFrame, vec_col: str = "embedding", k: int = 4,
                   quant_scale: int = 1 << 10):
    """Fit: one gram_sums pass + driver eigh (see pca_from_gram)."""
    g = gram_sums(df, vec_col, quant_scale)
    rows = [(r["i"], r["j"], r["sxy"]) for r in g.collect()]
    dim = max(j for i, j, _ in rows) + 1
    return pca_from_gram(rows, dim, k)


def pca_project_expr(vec: Column, comps, mean_dots,
                     quant_scale: int = 1 << 10) -> list:
    """k projection columns (quantized-unit scores): each is
    fold(x_q * comp) - mean_dot — a sequential dot-product fold
    (bit-identical to SQL list_dot_product) minus the precomputed
    centering scalar. Pure codegen; inline after `pca_components` or a
    stored fit."""
    xq = F.transform(
        vec.cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(quant_scale)) + F.lit(0.5)))
    out = []
    for ci, (comp, md) in enumerate(zip(comps, mean_dots)):
        lit_c = F.array(*[F.lit(float(x)) for x in comp])
        dot = F.aggregate(F.zip_with(xq, lit_c, lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        out.append((dot - F.lit(float(md))).alias(f"pc{ci}"))
    return out
