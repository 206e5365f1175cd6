"""Conversation / SFT-data operators: chat-template rendering with
loss-mask spans, and conversation-shape validation.

Instruction-tuning pipelines store conversations as arrays of
(role, content) turns; training needs (a) the FLAT rendered text under
a chat template and (b) the character spans of assistant content — the
positions the loss is computed on (user/system tokens are masked out).
Both are derived here in one pass: explode the turns with their index,
take a per-conversation running offset over the rendered piece lengths
(a window over conversation-sized partitions — bounded), and rebuild.

The template is ChatML-shaped (`<|im_start|>role\\ncontent<|im_end|>\\n`)
because it is the de-facto open format; the pieces are pure string
arithmetic, so any engine reproduces the offsets exactly.

No reference counterpart (net-new per project north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

IM_START = "<|im_start|>"
IM_END = "<|im_end|>\n"


def _piece(role, content):
    return F.concat(F.lit(IM_START), role, F.lit("\n"), content,
                    F.lit(IM_END))


def render_chat(df: DataFrame,
                messages_col: str = "messages",
                id_col: str = "doc_id") -> DataFrame:
    """(id, text, n_chars, assistant_spans) — the flat ChatML rendering
    plus the end-exclusive character ranges of each assistant turn's
    CONTENT (the loss mask). One posexplode + one per-conversation
    window cumsum (partitions are conversation-sized) + one groupBy
    rebuild; every expression is engine-portable string arithmetic."""
    ex = df.select(
        F.col(id_col),
        F.posexplode(F.col(messages_col)).alias("__i__", "__m__"))
    role = F.col("__m__.role")
    content = F.col("__m__.content")
    piece = _piece(role, content)
    w = (Window.partitionBy(id_col).orderBy("__i__")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.length(piece)).over(w)
    start = cum - F.length(piece)
    # content begins after '<|im_start|>' + role + '\n'
    c_start = start + F.lit(len(IM_START)) + F.length(role) + F.lit(1)
    c_end = c_start + F.length(content)
    rows = ex.select(
        F.col(id_col), F.col("__i__"), piece.alias("__p__"),
        F.when(role == "assistant",
               F.struct(c_start.cast("long").alias("s"),
                        c_end.cast("long").alias("e")))
        .alias("__span__"))
    return (rows.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.struct(
                             F.col("__i__").alias("i"),
                             F.col("__p__").alias("p")))),
                         lambda x: x["p"]), "").alias("text"),
                 F.array_sort(F.collect_list("__span__"))
                 .alias("assistant_spans"))
            .select(id_col, "text",
                    F.length("text").cast("long").alias("n_chars"),
                    "assistant_spans"))


def conversation_stats(df: DataFrame,
                       messages_col: str = "messages",
                       id_col: str = "doc_id") -> DataFrame:
    """Shape validation per conversation: turn counts by role, whether
    roles strictly alternate after an optional leading system turn, and
    whether the conversation ends on an assistant turn (the trainable
    shape). Pure higher-order codegen over the message array — no
    explode, no shuffle."""
    m = F.col(messages_col)
    roles = F.transform(m, lambda x: x["role"])
    body = F.when(F.element_at(roles, 1) == "system",
                  F.slice(roles, 2, F.greatest(F.size(roles) - 1,
                                               F.lit(0)))) \
        .otherwise(roles)
    pairs_ok = F.forall(
        F.zip_with(body, F.slice(F.concat(body, F.array(F.lit(""))),
                                 2, F.size(body)),
                   lambda a, b: (b == "") | (a != b)),
        lambda ok: ok)
    n_role = lambda r: F.size(F.filter(roles, lambda x: x == r))
    return df.select(
        F.col(id_col),
        F.size(m).cast("long").alias("n_turns"),
        n_role(F.lit("user")).cast("long").alias("n_user"),
        n_role(F.lit("assistant")).cast("long").alias("n_assistant"),
        n_role(F.lit("system")).cast("long").alias("n_system"),
        ((F.size(body) > 0) & (F.element_at(body, 1) == "user")
         & pairs_ok).alias("alternation_ok"),
        (F.element_at(roles, -1) == "assistant").alias("ends_assistant"))


def preference_pairs(df: DataFrame,
                     prompt_col: str = "prompt",
                     response_col: str = "response",
                     score_col: str = "score",
                     id_col: str = "resp_id",
                     min_margin: float = 0.0) -> DataFrame:
    """DPO/RLHF preference-pair construction from scored responses: per
    prompt, chosen = argmax score (ties to the smallest id), rejected =
    argmin score (ties to the LARGEST id, so a full tie still yields a
    distinct pair under min_margin=0);
    prompts with fewer than two responses, identical chosen/rejected
    rows, or a score margin below ``min_margin`` are dropped.

    Plan: ONE groupBy(prompt) with two max(struct) argm* aggregates —
    map-side combinable, no windows (a popular prompt with millions of
    responses never lands on one task) — then one join back per side to
    fetch the response text. Returns (prompt, chosen, rejected,
    chosen_score, rejected_score, margin)."""
    src = df.select(F.col(prompt_col).alias("prompt"),
                    F.col(response_col).alias("response"),
                    F.col(score_col).cast("double").alias("score"),
                    F.col(id_col).cast("long").alias("rid"))
    best = src.groupBy("prompt").agg(
        F.count(F.lit(1)).alias("__n__"),
        F.max(F.struct(F.col("score"), (-F.col("rid")).alias("nid")))
        .alias("__hi__"),
        F.min(F.struct(F.col("score"), (-F.col("rid")).alias("nid")))
        .alias("__lo__"))
    picked = (best.filter(F.col("__n__") >= 2)
              .select("prompt",
                      (-F.col("__hi__.nid")).alias("hi_rid"),
                      F.col("__hi__.score").alias("chosen_score"),
                      (-F.col("__lo__.nid")).alias("lo_rid"),
                      F.col("__lo__.score").alias("rejected_score"))
              .filter(F.col("hi_rid") != F.col("lo_rid"))
              .filter(F.col("chosen_score") - F.col("rejected_score")
                      >= min_margin))
    hi = src.select(F.col("rid").alias("hi_rid"),
                    F.col("response").alias("chosen"))
    lo = src.select(F.col("rid").alias("lo_rid"),
                    F.col("response").alias("rejected"))
    return (picked.join(hi, "hi_rid").join(lo, "lo_rid")
            .select("prompt", "chosen", "rejected", "chosen_score",
                    "rejected_score",
                    (F.col("chosen_score") - F.col("rejected_score"))
                    .alias("margin")))
