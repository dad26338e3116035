"""Confidence cross-encoder reranking (reranking/cross_encoder.rs):
scoring goldens, sigmoid path, retain/truncate order, stats."""

from __future__ import annotations

import math

import pytest

from graphrag_rs_spark.retrieval.cross_encoder import (
    cross_encoder_rerank,
    reranking_stats,
)


def _cands(spark, rows):
    return spark.createDataFrame(
        rows, "id long, content string, score double")


def test_raw_relevance_golden(spark):
    out = cross_encoder_rerank(
        _cands(spark, [(1, "alpha gamma delta", 0.5)]),
        "alpha beta", normalize=False).collect()[0]
    # jaccard 1/4, length factor 3/100 -> 0.25*0.7 + 0.03*0.3.
    assert out.relevance == pytest.approx(round(0.175 + 0.009, 6))
    assert out.delta == pytest.approx(round(0.184 - 0.5, 6))


def test_sigmoid_normalization(spark):
    out = cross_encoder_rerank(
        _cands(spark, [(1, "alpha gamma delta", 0.5)]),
        "alpha beta", normalize=True).collect()[0]
    expected = 1.0 / (1.0 + math.exp(-5.0 * (0.184 - 0.5)))
    assert out.relevance == pytest.approx(round(expected, 6), abs=1e-6)


def test_empty_doc_scores_zero(spark):
    out = cross_encoder_rerank(
        _cands(spark, [(1, "", 0.3)]), "alpha", normalize=False,
        min_confidence=0.0).collect()
    assert out[0].relevance == 0.0


def test_length_factor_caps_at_one(spark):
    long_doc = " ".join(["word"] * 150)
    out = cross_encoder_rerank(
        _cands(spark, [(1, long_doc, 0.0)]), "zzz",
        normalize=False).collect()[0]
    # jaccard 0, length factor capped at 1 -> 0.3.
    assert out.relevance == pytest.approx(0.3)


def test_retain_before_truncate(spark):
    # 5 candidates, 3 above threshold, top_k=2 -> exactly the best 2
    # of the PASSING set (cross_encoder.rs:186-190 order).
    rows = [(i, " ".join(["filler"] * (10 * i)), 0.0)
            for i in range(1, 6)]
    out = cross_encoder_rerank(
        _cands(spark, rows), "zzz", top_k=2,
        min_confidence=0.09, normalize=False).collect()
    # relevance = 0.3 * min(10i/100, 1): i=1..5 -> .03 .06 .09 .12 .15
    assert [r.id for r in out] == [5, 4]


def test_reranking_stats(spark):
    cands = _cands(spark, [
        (1, "alpha beta gamma", 0.1),
        (2, "alpha", 0.9),
        (3, "", 0.5)])
    ranked = cross_encoder_rerank(cands, "alpha", top_k=10,
                                  min_confidence=0.01, normalize=False)
    stats = reranking_stats(3, ranked).collect()[0]
    assert stats.candidates_count == 3
    assert stats.results_count == 2          # empty doc filtered
    assert stats.filter_rate == pytest.approx(round(1 / 3 * 100, 6))
    rows = {r.id: r.delta for r in ranked.collect()}
    assert stats.max_improvement == pytest.approx(max(rows.values()))
    assert stats.avg_improvement == pytest.approx(
        round(sum(rows.values()) / 2, 6), abs=1e-6)
