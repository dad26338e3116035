"""Golden tests for ROGRAG intent classification (intent_classifier.rs).

Every expected value below is hand-derived from the reference's scoring
rules: score = min(1, 0.5·kw_frac + 0.5·rx_frac), substring keyword
matching, ambiguity at >0.8·primary among the next two, refusal below
0.8, and the 0.3/0.2/0.2/0.3 complexity blend."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from graphrag_rs_spark.rograg.intent import classify_intent
from tests.conftest import spark  # noqa: F401


def _classify(spark, queries):
    df = spark.createDataFrame(
        [(i, q) for i, q in enumerate(queries)],
        "query_id long, query string")
    return {r.query_id: r for r in classify_intent(df).collect()}


def test_factual_scoring_and_refusal(spark):
    got = _classify(spark, ["what is spark?"])[0]
    # kw 1/4·0.5 + rx 1/4·0.5 = 0.25; refuse (< 0.8)
    assert got.intent == "factual"
    assert got.confidence == pytest.approx(0.25)
    assert got.should_refuse == 1
    # wc=3, sents=1, alpha=11: 0.15·0.3 + (1/3)·0.2 + (11/24)·0.2
    assert got.complexity == pytest.approx(0.203333, abs=1e-6)


def test_relational_counts_substring_keywords(spark):
    got = _classify(spark, ["relationship between a and b"])[0]
    # kws {relationship, between, and} 3/5·0.5 = 0.3; rxs
    # {relationship between, \w+ and \w+} 2/4·0.5 = 0.25
    assert got.intent == "relational"
    assert got.confidence == pytest.approx(0.55)
    assert got.should_refuse == 1


def test_ambiguous_when_secondary_close(spark):
    got = _classify(spark, ["when did x happen and why did y happen"])[0]
    # relational 0.225 vs causal 0.183333 > 0.8·0.225 → ambiguous
    assert got.intent == "ambiguous"
    assert got.confidence == pytest.approx(0.225)
    assert got.should_refuse == 1


def test_full_match_not_refused(spark):
    got = _classify(
        spark, ["what is it, which was that, how many and how much"])[0]
    # all 4 factual kws + all 4 factual rxs → score 1.0 ≥ 0.8
    assert got.intent == "factual"
    assert got.confidence == pytest.approx(1.0)
    assert got.should_refuse == 0


def test_inappropriate_short_circuits(spark):
    got = _classify(spark, ["is this illegal"])[0]
    assert (got.intent, got.confidence, got.should_refuse,
            got.complexity) == ("inappropriate", 1.0, 1, 0.0)


def test_no_match_is_ambiguous_with_complexity(spark):
    got = _classify(spark, ["zzz qqq"])[0]
    assert got.intent == "ambiguous"
    assert got.confidence == 0.0
    assert got.should_refuse == 1
    # wc=2, sents=1, alpha=6: 0.1·0.3 + (1/3)·0.2 + 0.375·0.2
    assert got.complexity == pytest.approx(0.171667, abs=1e-6)


def test_complexity_construct_bonus_and_cap(spark):
    rows = _classify(spark, [
        "a because b",                       # subordination bonus 0.3
        # every factor saturates: 0.3 + 0.2 + 0.2 + 0.3 capped at 1.0
        " ".join(["extraordinarily"] * 25) + " and more. ! ?",
    ])
    assert rows[0].complexity > 0.3
    assert rows[1].complexity == 1.0
