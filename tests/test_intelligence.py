"""Query intelligence (query/intelligence.rs): type detection,
template rewrite, ordered synonym expansion with first-occurrence
dedup, stop-word key terms, EWMA relevance feedback."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.retrieval.intelligence import (
    fold_feedback,
    rewrite_queries,
)


def _q(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "query_id long, query string")


def _rows(spark, texts, feedback=None):
    out = rewrite_queries(_q(spark, texts), feedback=feedback)
    return {r.query_id: r for r in out.collect()}


def test_query_type_detection(spark):
    """intelligence.rs:360-375 unit test, plus the remaining types."""
    r = _rows(spark, [
        "who is the CEO of OpenAI?",
        "how many employees work at Google?",
        "what is the relationship between Apple and Microsoft?",
        "when did the merger happen",
        "why did it grow",
        "compare apples with oranges",
        "plain words here",
    ])
    assert r[0].query_type == "entity_lookup"
    assert r[1].query_type == "aggregation"
    assert r[2].query_type == "relationship"  # checked before entity
    assert r[3].query_type == "temporal"
    assert r[4].query_type == "causal"
    assert r[5].query_type == "comparison"
    assert r[6].query_type == "general"


def test_template_rewrite(spark):
    r = _rows(spark, [
        "who is napoleon", "what is the best approach",
        "how many ships sailed", "compare x with y"])
    assert r[0].rewritten == "entity: napoleon"
    assert r[1].rewritten == "define: the best approach"
    assert r[2].rewritten == "count: ships sailed"
    assert r[3].rewritten == "compare: x with y"
    # stop-word removal (intelligence.rs:390-399): the/is filtered out.
    assert "the" not in r[1].terms.split()
    assert set(r[1].terms.split()) == {"define:", "best", "approach"}


def test_synonym_expansion_order_and_dedup(spark):
    r = _rows(spark, [
        "find large companies",
        "find search",           # later WORD duplicates a synonym
        "large important",       # 'significant' dedups across keys
    ])
    assert r[0].rewritten == ("find search locate large big huge "
                              "significant companies")
    # Words are always appended, even when already present (:248).
    assert r[1].rewritten == "find search locate search"
    # important's 'significant' already expanded from large (:253).
    assert r[2].rewritten == ("large big huge significant important "
                              "critical key")


def test_confidence_default_relevance(spark):
    r = _rows(spark, ["find large companies", "the and of"])
    # 8 terms, wc=3: spec=min(8/4,1)=1; rel=0.5 -> 0.6+0.2=0.8.
    assert r[0].n_terms == 8
    assert r[0].confidence == pytest.approx(0.8)
    # all-stop-word query -> no terms -> 0.5 (intelligence.rs:274-276).
    assert r[1].n_terms == 0
    assert r[1].confidence == 0.5


def test_feedback_fold_matches_sequential_ewma(spark):
    fb = spark.createDataFrame(
        [("artificial_intelligence", 1, 0.9),
         ("artificial_intelligence", 2, 0.8)],
        "term string, event_id long, score double")
    out = {r.term: r.relevance for r in fold_feedback(fb).collect()}
    # r = 0.5 -> 0.5*0.5+0.5*0.9 = 0.7 -> 0.5*0.7+0.5*0.8 = 0.75.
    assert out["artificial_intelligence"] == pytest.approx(0.75)


def test_feedback_window_bounds_state(spark):
    fb = spark.createDataFrame(
        [("t", i, 1.0) for i in range(25)],
        "term string, event_id long, score double")
    out = fold_feedback(fb).collect()[0]
    # Last 20 events of score 1.0: r = 0.5^21 + sum_j 0.5^j = 1 - 2^-21.
    assert out.relevance == pytest.approx(1.0 - 2.0 ** -21, abs=0)


def test_confidence_with_feedback(spark):
    fb = spark.createDataFrame(
        [("napoleon", 1, 1.0)],
        "term string, event_id long, score double")
    r = _rows(spark, ["who is napoleon"], feedback=fb)
    # rewritten 'entity: napoleon', terms = both (not stop words),
    # wc=3; spec = min(2/4,1) = 0.5; rel = avg(0.5_default, 0.75) where
    # napoleon folds to 0.5^2 + 1.0*0.5^1 = 0.75 -> rel = 0.625.
    assert r[0].terms == "entity: napoleon"
    assert r[0].confidence == pytest.approx(0.5 * 0.6 + 0.625 * 0.4)
