"""Distributed BPE training vs a from-first-principles reference
implementation (same deterministic tie-break), plus encoder invariants."""

import collections

import pytest
from pyspark.sql import functions as F

from pipelinedp_spark.operators.bpe import (END_OF_WORD, apply_bpe,
                                            train_bpe_merges)


def _reference_bpe(texts, num_merges, min_pair_count=2):
    vocab = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[tuple(list(w) + [END_OF_WORD])] += 1
    merges = []
    for _ in range(num_merges):
        stats = collections.Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += cnt
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _n = best
        merges.append((a, b))
        new_vocab = collections.Counter()
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges


CORPUS = ["low low low low low lower lower newest newest newest",
          "newest newest newest widest widest widest",
          "low lower newest widest hugs"]


def test_merges_match_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = train_bpe_merges(df, num_merges=12)
    want = _reference_bpe(CORPUS, num_merges=12)
    assert got == want
    assert len(got) == 12


def test_early_stop_on_min_count(spark):
    df = spark.createDataFrame([("x y z",)], "text string")
    # every pair occurs once -> below min_pair_count=2 -> no merges
    assert train_bpe_merges(df, num_merges=5) == []


def test_apply_bpe_reconstructs_words(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = train_bpe_merges(df, num_merges=8)
    out = apply_bpe(df, merges).collect()
    for r in out:
        # concatenating the subwords reproduces every word + marker
        joined = "".join(r["bpe_tokens"])
        expect = "".join(w + END_OF_WORD
                         for w in r["text"].split(" ") if w)
        assert joined == expect
    # frequent word "newest" must have been compressed below char level
    toks = out[0]["bpe_tokens"]
    assert any(len(t.replace(END_OF_WORD, "")) > 1 for t in toks)


def test_apply_matches_training_segmentation(spark):
    """Applying the learned merges by rank must reproduce the exact
    vocabulary segmentation training ended with."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = train_bpe_merges(df, num_merges=10)

    # reference: replay training rewrites
    vocab = {}
    for t in CORPUS:
        for w in t.split(" "):
            if w:
                vocab[w] = list(w) + [END_OF_WORD]
    for a, b in merges:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out

    enc = apply_bpe(df, merges).collect()
    for r in enc:
        reference = [s for w in r["text"].split(" ") if w
                     for s in vocab[w]]
        assert r["bpe_tokens"] == reference


def test_apply_bpe_edge_inputs(spark):
    merges = [("a", "b"), ("ab", "</w>")]
    df = spark.createDataFrame(
        [("",), ("   ",), ("ab",), ("ab ab xyz",)], "text string")
    rows = apply_bpe(df, merges).collect()
    assert rows[0]["bpe_tokens"] == []          # empty text
    assert rows[1]["bpe_tokens"] == []          # whitespace only
    assert rows[2]["bpe_tokens"] == ["ab</w>"]  # both merges chain
    assert rows[3]["bpe_tokens"] == ["ab</w>", "ab</w>",
                                     "x", "y", "z", "</w>"]


def test_local_trainer_matches_reference_and_distributed(spark):
    from pipelinedp_spark.operators.bpe import train_bpe_merges_local
    wc = collections.Counter()
    for t in CORPUS:
        for w in t.split(" "):
            if w:
                wc[w] += 1
    local = train_bpe_merges_local(wc, num_merges=12)
    assert local == _reference_bpe(CORPUS, num_merges=12)
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    assert local == train_bpe_merges(df, num_merges=12)


def test_sequential_encoder_matches_rank_greedy(spark):
    # encode_word_sequential (learned-order exhaustive application) and
    # apply_bpe (min-rank greedy) are equivalent formulations of BPE
    # application; pin it on every corpus word including repeats like
    # 'aaa' shapes.
    from pipelinedp_spark.operators.bpe import (encode_word_sequential,
                                                train_bpe_merges_local)
    corpus = CORPUS + ["aaaa aab baaa", "hugs hugs huge hugged"]
    wc = collections.Counter(w for t in corpus for w in t.split(" ") if w)
    merges = train_bpe_merges_local(wc, num_merges=15)
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    for r in apply_bpe(df, merges).collect():
        want = [s for w in r["text"].split(" ") if w
                for s in encode_word_sequential(w, merges)]
        assert r["bpe_tokens"] == want
