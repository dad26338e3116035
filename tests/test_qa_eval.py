"""QA answer-quality evaluation (monitoring/benchmark.rs:322-441):
exact match + duplicate-counting token F1 goldens."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.qa_eval import qa_quality, qa_summary


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "id long, generated string, ground_truth string")


def test_exact_match_case_and_trim(spark):
    out = {r.id: r for r in qa_quality(_pairs(spark, [
        (1, "  Paris  ", "paris"),
        (2, "london", "paris")])).collect()}
    assert out[1].exact_match == 1 and out[1].f1 == 1.0
    assert out[2].exact_match == 0 and out[2].f1 == 0.0


def test_f1_partial_overlap(spark):
    out = qa_quality(_pairs(spark, [
        (1, "the capital is paris", "paris is the capital of france"),
    ])).collect()[0]
    # common = 4 (all gen tokens in gt); p = 1, r = 4/6.
    p, r = 1.0, 4 / 6
    assert out.f1 == pytest.approx(round(2 * p * r / (p + r), 6))


def test_f1_duplicate_counting_quirk(spark):
    # benchmark.rs:355-362 — generated duplicates each count.
    out = qa_quality(_pairs(spark, [
        (1, "paris paris paris", "paris rome")])).collect()[0]
    p, r = 3 / 3, 3 / 2  # recall exceeds 1.0 via the quirk
    assert out.f1 == pytest.approx(round(2 * p * r / (p + r), 6))


def test_empty_sides_score_zero(spark):
    out = {r.id: r for r in qa_quality(_pairs(spark, [
        (1, "", "paris"), (2, "paris", "")])).collect()}
    assert out[1].f1 == 0.0 and out[2].f1 == 0.0


def test_summary_averages(spark):
    scored = qa_quality(_pairs(spark, [
        (1, "paris", "paris"),
        (2, "rome milan", "rome florence")]))
    s = qa_summary(scored).collect()[0]
    assert s.total_queries == 2
    assert s.avg_exact_match == 0.5
    f2 = round(2 * 0.5 * 0.5 / 1.0, 6)
    assert s.avg_f1 == pytest.approx(round((1.0 + f2) / 2, 6))
