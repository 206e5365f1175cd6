"""Adversarial exactness check for the winnowing-anchor ExactSubstr
path (r9): `duplicate_spans_exact` and `cross_corpus_spans` must equal
a pure-Python brute force (md5 over EVERY window position — no
anchors, no prefilter) on a corpus engineered to stress the anchor
guarantee: periodic strings (overlapping self-duplicates whose copies
can share an anchor position), unicode (char-vs-byte indexing),
min_len-boundary docs, duplicates at doc start/end, and high-dup text.
The winnowing proof says anchors only PREFILTER — any miss here means
lost recall, which the sf0.01 oracle corpus may not catch."""

import hashlib
import random

import pytest


def _brute_dup_spans(docs: dict, min_len: int) -> set:
    """(doc_id, start, end) merged spans of positions whose min_len
    window occurs >= 2 times, minus the globally-first occurrence of
    each window hash (min (doc, pos)) — the spec duplicate_spans_exact
    implements."""
    occ = {}
    for d, t in docs.items():
        for p in range(len(t) - min_len + 1):
            h = hashlib.md5(t[p:p + min_len].encode("utf-8")).digest()
            occ.setdefault(h, []).append((d, p))
    marked = []
    for h, ps in occ.items():
        if len(ps) < 2:
            continue
        first = min(ps)
        marked.extend(x for x in ps if x != first)
    return _merge({(d, p, p + min_len) for d, p in marked})


def _brute_cross_spans(docs: dict, ref: dict, min_len: int) -> set:
    rh = set()
    for t in ref.values():
        for p in range(len(t) - min_len + 1):
            rh.add(hashlib.md5(
                t[p:p + min_len].encode("utf-8")).digest())
    marked = set()
    for d, t in docs.items():
        for p in range(len(t) - min_len + 1):
            h = hashlib.md5(t[p:p + min_len].encode("utf-8")).digest()
            if h in rh:
                marked.add((d, p, p + min_len))
    return _merge(marked)


def _merge(iv: set) -> set:
    out = set()
    bydoc = {}
    for d, s, e in iv:
        bydoc.setdefault(d, []).append((s, e))
    for d, spans in bydoc.items():
        spans.sort()
        cs, ce = spans[0]
        for s, e in spans[1:]:
            if s > ce:
                out.add((d, cs, ce))
                cs, ce = s, e
            else:
                ce = max(ce, e)
        out.add((d, cs, ce))
    return out


def _adversarial_corpus() -> dict:
    rng = random.Random(421)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    boiler = ("the shared boilerplate sentence that is long enough to "
              "exceed the minimum duplicated span length threshold")
    docs = {}
    for d in range(24):
        body = " ".join(rng.choice(words) for _ in range(rng.randint(
            20, 60)))
        if d % 3 == 0:
            body = body + " " + boiler          # duplicate at doc END
        if d % 5 == 1:
            body = boiler + " " + body          # duplicate at doc START
        if d == 7:
            body = "a" * 150                    # periodic: overlapping
        if d == 11:
            body = "ab" * 80                    # period-2 run
        if d == 13:
            body = "a" * 149                    # periodic, shares with 7
        if d == 17:
            body = ("ünïcödé çhàracters stretch this text " * 4
                    + "ünïcödé çhàracters stretch this text")
        if d == 19:
            body = ("ünïcödé çhàracters stretch this text " * 3).strip()
        if d == 23:
            body = body[:49]                    # just below min_len=50
        docs[d] = body
    return docs


@pytest.mark.parametrize("min_len,seed_len", [(50, None), (50, 16),
                                              (50, 44), (20, 8)])
def test_duplicate_spans_exact_equals_brute_force(spark, min_len,
                                                  seed_len):
    from pipelinedp_spark.operators.dedup import duplicate_spans_exact

    docs = _adversarial_corpus()
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    out = duplicate_spans_exact(df, min_len=min_len, seed_len=seed_len)
    got = {(r["doc_id"], r["span_start"], r["span_end"])
           for r in out.collect()}
    want = _brute_dup_spans(docs, min_len)
    assert got == want
    assert want, "corpus must actually contain duplicates"


def test_cross_corpus_spans_equals_brute_force(spark):
    from pipelinedp_spark.operators.dedup import cross_corpus_spans

    corpus = _adversarial_corpus()
    docs = {d: t for d, t in corpus.items() if d % 2 == 1}
    ref = {d: t for d, t in corpus.items() if d % 2 == 0}
    ddf = spark.createDataFrame(list(docs.items()),
                                "doc_id long, text string")
    rdf = spark.createDataFrame(list(ref.items()),
                                "doc_id long, text string")
    out = cross_corpus_spans(ddf, rdf, min_len=50)
    got = {(r["doc_id"], r["span_start"], r["span_end"])
           for r in out.collect()}
    want = _brute_cross_spans(docs, ref, 50)
    assert got == want
    assert want
