"""Release manifests: the integrity artifact shipped next to a corpus
snapshot so a consumer can verify what they downloaded and a producer
can prove what they published.

`corpus_manifest` rolls each group (source, language, shard — the
manifest key) into counts plus an ORDER-INSENSITIVE content checksum:
BIT_XOR over per-document 60-bit content hashes. XOR is the right fold
at scale — commutative/associative (any partitioning gives the same
answer), overflow-free (unlike a sum), and incremental (XOR of an
updated doc's old and new hash patches the manifest without a rescan).
The per-doc hash binds id AND text, so reassigning texts between ids
changes the checksum even when the text multiset is unchanged.

`schema_fingerprint` hashes the column name/type list — the cheap drift
alarm between producer and consumer.

Everything is one map-side-combinable aggregate; no reference
counterpart (net-new per project north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelinedp_spark.functions import text as T


def doc_content_hash(id_col: str = "doc_id",
                     text_col: str = "text"):
    """60-bit per-document content hash binding (id, text) — the XOR
    leaf of `corpus_manifest`. md5-derived, so any engine reproduces
    it."""
    return T.hex_to_long(F.md5(F.concat(
        F.col(id_col).cast("string"), F.lit(":"),
        F.md5(F.col(text_col)))))


def corpus_manifest(df: DataFrame,
                    group_col: str = "source",
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-group release manifest: (group, n_docs, total_chars,
    total_tokens, content_xor). Verification = recompute and compare
    content_xor; a mismatch localizes to the group, not the corpus.
    One combinable aggregate — manifest cost is one scan regardless of
    corpus size."""
    return (df.groupBy(F.col(group_col).alias("group"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(F.length(text_col)).cast("long")
                 .alias("total_chars"),
                 F.sum(T.token_count(F.col(text_col)).cast("long"))
                 .alias("total_tokens"),
                 F.bit_xor(doc_content_hash(id_col, text_col))
                 .alias("content_xor")))


def schema_fingerprint(df: DataFrame) -> str:
    """Driver-side hash of the (name, type) column list — embed it in
    the manifest metadata so a consumer detects producer-side schema
    drift before reading a byte of data."""
    import hashlib
    sig = ";".join(f"{f.name}:{f.dataType.simpleString()}"
                   for f in df.schema.fields)
    return hashlib.md5(sig.encode()).hexdigest()
