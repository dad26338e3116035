"""Q13 ROGRAG validator (validator.rs): golden values for the batch
query/response validation operator, including the reference's own unit
fixture (validator.rs:893-921)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.rograg.validator import (
    validate_queries,
    validate_responses,
)


def _responses(spark, rows):
    return spark.createDataFrame(
        rows,
        "response_id long, query string, content string, "
        "confidence double, sources array<string>, n_subqueries int")


RUST_CONTENT = ("Entity Name is a young boy character in Mark Twain's "
                "novels. He is adventurous and mischievous.")


def test_rust_unit_response(spark):
    """The reference's create_test_response (validator.rs:893-921):
    every metric hand-derived from the Rust formulas."""
    out = validate_responses(_responses(spark, [
        (1, "What is Entity Name?", RUST_CONTENT, 0.8,
         ["source1", "source2"], 1),
    ])).collect()[0]
    # 3 raw sentence splits (trailing empty kept), 0 connectors.
    assert out.coherence == 0.0
    # word-set Jaccard: {what,is,entity,name?} vs 15 content tokens,
    # intersection {is, entity} -> 2/17.
    assert out.relevance == pytest.approx(round(2 / 17, 6))
    assert out.consistency == 1.0
    # completeness: len=95 -> 0.95, sources 2 -> 1.0, subq 1 -> 1.0.
    assert len(RUST_CONTENT) == 95
    assert out.completeness == pytest.approx(round((0.95 + 1 + 1) / 3, 6))
    # 16 words / 2 punctuation chars = 8 wps; avg word len < 8.
    assert out.readability == 1.0
    # credibility: min(2/5,1)=0.4; prefixes 'source1','source2' distinct.
    assert out.credibility == pytest.approx(0.7)
    # issues: coherence 0.0<0.3 and relevance 2/17<0.2 fail; the
    # query-coverage check passes at exactly 1/3 >= 0.3.
    assert out.n_issues == 2
    assert out.passed == 0


def test_contradiction_consistency(spark):
    out = validate_responses(_responses(spark, [
        (1, "what is it?", "it is not true. never always here.", 0.9,
         ["s1", "s2", "s3"], 2),
    ])).collect()[0]
    # 3 raw splits, one contradiction pair in each real sentence.
    assert out.consistency == pytest.approx(round(1 - 2 / 3, 6))


def test_connector_coherence(spark):
    out = validate_responses(_responses(spark, [
        (1, "q?", "alpha beta. however gamma. therefore delta.", 0.9,
         ["s1"], 2),
    ])).collect()[0]
    # 4 raw splits (trailing empty), 2 connector sentences.
    assert out.coherence == 0.5


def test_single_sentence_scores_one(spark):
    out = validate_responses(_responses(spark, [
        (1, "alpha beta?", "alpha beta gamma delta", 0.9, ["s1"], 2),
    ])).collect()[0]
    assert out.coherence == 1.0  # validator.rs:788 — never penalized


def test_empty_sources_credibility(spark):
    out = validate_responses(_responses(spark, [
        (1, "alpha beta?", "alpha beta gamma delta epsilon zeta", 0.9,
         [], 2),
    ])).collect()[0]
    assert out.credibility == 0.0
    assert out.n_issues >= 1  # no-sources issue


def test_safety_and_length_issues(spark):
    rows = [
        (1, "what is x?", "tiny", 0.9, ["s1", "s2", "s3"], 2),
        (2, "what is x?", "this content mentions violence openly and "
            "continues with words. what is x here.", 0.9,
         ["s1", "s2", "s3"], 2),
        (3, "what is x?", "fine answer about x topic. x is central "
            "and what matters here is x.", 0.05, ["s1", "s2", "s3"], 2),
    ]
    out = {r.response_id: r
           for r in validate_responses(_responses(spark, rows)).collect()}
    assert out[1].n_issues >= 1          # too short (<10 chars)
    assert out[2].n_issues >= 1          # safety regex on content
    assert out[3].n_issues >= 1          # confidence < 0.3


def test_query_validation_branches(spark):
    qdf = spark.createDataFrame(
        [(0, ""), (1, "ok " * 600), (2, "is violence acceptable?"),
         (3, "123 456!"), (4, "What is Entity Name?")],
        "query_id long, query string")
    out = {r.query_id: r for r in validate_queries(qdf).collect()}
    # empty -> critical: invalid, score 0, issues {empty, no-alpha}.
    assert out[0].is_valid == 0 and out[0].validation_score == 0.0
    assert out[0].n_issues == 2
    # over-long -> 1 issue, score 0.9 (validator.rs:353-357).
    assert out[1].n_issues == 1
    assert out[1].validation_score == pytest.approx(0.9)
    assert out[2].n_issues == 1          # safety pattern
    assert out[3].n_issues == 1          # no alphabetic chars
    assert out[4].n_issues == 0
    assert out[4].validation_score == 1.0 and out[4].is_valid == 1
