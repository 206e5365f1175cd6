"""Sequence packing for training-data pipelines: concat-and-chunk
document placement into fixed-capacity token sequences (the GPT-style
pretraining layout — documents concatenated in a deterministic order,
then split into ``seq_len``-token sequences).

Built on ``running.running_sum`` (the two-phase distributed prefix sum):
each document's global token OFFSET is the running sum of token counts
in ``order_col`` order, from which its placement is pure per-row
arithmetic — start sequence, offset within it, and how many sequences
it spans. One range exchange + a tiny per-partition-totals collect; no
corpus-wide window sort.

No reference counterpart (net-new per project north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelinedp_spark.functions import text as T
from pipelinedp_spark.operators.running import running_sum


def pack_sequences(docs: DataFrame, seq_len: int,
                   text_col: str = "text", id_col: str = "doc_id",
                   order_col: str = None) -> DataFrame:
    """(all input columns, n_tokens, start_seq, start_off, n_seqs):
    placement of each document in the concatenated token stream chunked
    into ``seq_len``-token sequences. ``order_col`` (default: id_col)
    must be globally unique — it defines the deterministic concat order.
    """
    order_col = order_col or id_col
    with_n = docs.withColumn("n_tokens",
                             T.token_count(F.col(text_col)).cast("long"))
    summed = running_sum(with_n, order_col, "n_tokens",
                         out_col="__cum__")
    # Integer DIV, not float division: a 100 TB corpus holds ~10^13
    # tokens and double arithmetic would lose exactness near 2^53.
    out = (summed
           .withColumn("__off__", F.col("__cum__") - F.col("n_tokens"))
           .withColumn("start_seq",
                       F.expr(f"__off__ DIV {seq_len}").cast("long"))
           .withColumn("start_off", F.col("__off__") % seq_len)
           .withColumn(
               "n_seqs",
               F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
               .otherwise(
                   F.expr(f"(__cum__ - 1) DIV {seq_len}").cast("long")
                   - F.expr(f"__off__ DIV {seq_len}").cast("long")
                   + 1)))
    return out.drop("__cum__", "__off__")
