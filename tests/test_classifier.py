"""Hashed logistic-regression quality classifier vs a pure-Python replay.

Verifies the full-batch GD trajectory (presence features, 9-dp boundary
rounding, dense weight table with bias at bucket -1), scoring semantics
(6-dp round BEFORE threshold, bias-only margin for featureless docs),
partition-order independence, and that the model actually separates two
marker vocabularies after a handful of iterations.
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from graphrag_rs_spark.operators.classifier import (
    BIAS_BUCKET, doc_features, score_quality, train_quality_classifier)

B = 64  # small bucket count so hash collisions actually occur
ITERS = 3
LR = 5.0

POS_ROWS = [  # "curated" vocabulary
    ("p0", "the theory of prime numbers and elegant proofs", 1),
    ("p1", "a rigorous proof of the theorem on prime gaps", 1),
    ("p2", "elegant mathematics and number theory lectures", 1),
]
NEG_ROWS = [  # "crawl" vocabulary
    ("n0", "click here to win free coins buy now", 0),
    ("n1", "free spins casino bonus click now", 0),
    ("n2", "buy cheap pills online free shipping", 0),
    ("n3", "", 0),           # empty: no features, bias-only margin
    ("n4", "!!! ???", 0),    # normalizes to empty too
]
ROWS = POS_ROWS + NEG_ROWS


def _toks(t: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feats(t: str) -> set[int]:
    return {_h60(f"qc:{w}") % B for w in _toks(t)}


def _py_train() -> dict[int, float]:
    """Independent replay of train_quality_classifier's arithmetic."""
    feats = {d: _feats(t) for d, t, _ in ROWS}
    ys = {d: float(y) for d, _, y in ROWS}
    n = float(len(ROWS))
    w = {b: 0.0 for b in range(-1, B)}
    for _ in range(ITERS):
        p = {}
        for d in ys:
            dot = sum(w[b] for b in feats[d]) + w[BIAS_BUCKET]
            p[d] = round(1.0 / (1.0 + math.exp(-dot)), 9)
        g = {b: 0.0 for b in range(-1, B)}
        for d in ys:
            r = p[d] - ys[d]
            g[BIAS_BUCKET] += r
            for b in feats[d]:
                g[b] += r
        for b in w:
            w[b] = round(w[b] - LR * round(g[b] / n, 9), 9)
    return w


def _py_score(t: str, w: dict[int, float]) -> float:
    dot = sum(w[b] for b in _feats(t)) + w[BIAS_BUCKET]
    return round(round(1.0 / (1.0 + math.exp(-dot)), 9), 6)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id string, text string, y int")


def test_doc_features_presence_bag(spark, docs):
    got = {(r.doc_id, r.bucket, r.x)
           for r in doc_features(docs, num_buckets=B).collect()}
    want = {(d, b, 1.0) for d, t, _ in ROWS for b in _feats(t)}
    assert got == want  # distinct presence rows, empty docs emit nothing


def test_trained_weights_match_python_replay(spark, docs):
    w = {r.bucket: r.weight
         for r in train_quality_classifier(
             docs, "y", num_buckets=B, iters=ITERS, lr=LR).collect()}
    exp = _py_train()
    assert set(w) == set(exp)  # dense: every bucket plus the bias row
    for b in exp:
        assert w[b] == pytest.approx(exp[b], abs=1e-12), b


def test_scores_match_replay_and_separate_classes(spark, docs):
    model = train_quality_classifier(docs, "y", num_buckets=B,
                                     iters=ITERS, lr=LR)
    got = {r.doc_id: (r.score, r.pred)
           for r in score_quality(docs, model, num_buckets=B).collect()}
    w = _py_train()
    assert len(got) == len(ROWS)  # featureless docs kept via left join
    for d, t, y in ROWS:
        s = _py_score(t, w)
        assert got[d][0] == pytest.approx(s, abs=1e-12)
        assert got[d][1] == int(s >= 0.5)
    # the marker vocabularies must actually separate
    for d, _, y in ROWS[:3]:
        assert got[d][1] == 1, d
    for d, _, y in [r for r in NEG_ROWS if _toks(r[1])]:
        assert got[d][1] == 0, d


def test_partition_order_independence(spark, docs):
    a = train_quality_classifier(docs.coalesce(1), "y", num_buckets=B,
                                 iters=ITERS, lr=LR)
    b = train_quality_classifier(docs.repartition(8), "y", num_buckets=B,
                                 iters=ITERS, lr=LR)
    wa = sorted((r.bucket, r.weight) for r in a.collect())
    wb = sorted((r.bucket, r.weight) for r in b.collect())
    assert wa == wb
