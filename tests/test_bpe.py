"""Distributed BPE training/encoding vs an independent pure-Python BPE.

The Spark implementation (operators/bpe.py) learns merges over the
distinct-word vocabulary with lookaround-regexp merge rewriting; the
reference here is the textbook algorithm over Python symbol lists
(Sennrich et al. 2016).  Every merge (order, pair, frequency) and every
encoded token sequence must match exactly.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators import bpe


def _norm_words(text: str) -> list[str]:
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).split()


def _py_apply(symbols: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _py_train(texts: list[str], num_merges: int,
              min_pair_freq: int = 2) -> list[tuple[str, str, int]]:
    freqs: Counter = Counter()
    for t in texts:
        freqs.update(_norm_words(t))
    vocab = {w: list(w) for w in freqs}
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), f = min(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if f < min_pair_freq:
            break
        merges.append((a, b, f))
        vocab = {w: _py_apply(s, a, b) for w, s in vocab.items()}
    return merges


def _py_encode(text: str, merges: list[tuple[str, str, int]]) -> list[str]:
    toks: list[str] = []
    for w in _norm_words(text):
        syms = list(w)
        for a, b, _ in merges:
            syms = _py_apply(syms, a, b)
        toks.extend(syms)
    return toks


TEXTS = [
    "the lower cases flow lower and lower down the low road",
    "newest widest lowest estimates of the newest tests",
    "aaaaa aaa aa banana bandana ananas",  # odd runs: greedy tie cases
    "merge merge merge tables merge sorts merge joins",
    "x y z q8 mixed42 tokens99 and pure punctuation!!! ... ---",
    "",
]


@pytest.fixture(scope="module")
def text_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string")


def test_train_matches_pure_python(spark, text_df):
    # checkpoint_every=3 exercises the mid-loop lineage cut
    got = bpe.bpe_train(text_df, num_merges=20, checkpoint_every=3)
    want = _py_train(TEXTS, num_merges=20)
    assert got == want
    assert len(got) > 5  # the fixture actually trains something


def test_train_min_pair_freq_stops(spark, text_df):
    got = bpe.bpe_train(text_df, num_merges=500, min_pair_freq=4)
    want = _py_train(TEXTS, num_merges=500, min_pair_freq=4)
    assert got == want
    assert all(f >= 4 for _, _, f in got)


def test_encode_matches_pure_python(spark, text_df):
    merges = _py_train(TEXTS, num_merges=20)
    enc = {r["doc_id"]: list(r["tokens"])
           for r in bpe.bpe_encode(text_df, merges).collect()}
    for i, t in enumerate(TEXTS):
        want = _py_encode(t, merges)
        if not want:
            assert i not in enc  # empty docs emit no row (no words)
        else:
            assert enc[i] == want, f"doc {i}"


def test_greedy_left_to_right_on_odd_runs(spark):
    # 'aaaaa' under merge (a,a) must segment as aa|aa|a, never aa|a|aa —
    # the exactness claim of the lookaround rewrite (bpe.py docstring)
    df = spark.createDataFrame([(0, "aaaaa")], "doc_id bigint, text string")
    enc = bpe.bpe_encode(df, [("a", "a", 99)]).first()
    assert list(enc["tokens"]) == ["aa", "aa", "a"]
    enc2 = bpe.bpe_encode(df, [("a", "a", 99), ("aa", "aa", 9)]).first()
    assert list(enc2["tokens"]) == ["aaaa", "a"]


def test_pair_counts_match_python(spark, text_df):
    got = {(r["left"], r["right"]): r["pair_freq"]
           for r in bpe.bpe_pair_counts(text_df).collect()}
    freqs: Counter = Counter()
    for t in TEXTS:
        freqs.update(_norm_words(t))
    want: Counter = Counter()
    for w, f in freqs.items():
        for i in range(len(w) - 1):
            want[(w[i], w[i + 1])] += f
    assert got == dict(want)


def test_encode_partition_invariant(spark, text_df):
    merges = _py_train(TEXTS, num_merges=10)
    a = sorted((r["doc_id"], tuple(r["tokens"]))
               for r in bpe.bpe_encode(text_df, merges).collect())
    b = sorted((r["doc_id"], tuple(r["tokens"]))
               for r in bpe.bpe_encode(text_df.repartition(7),
                                       merges).collect())
    assert a == b
