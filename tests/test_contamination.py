"""Benchmark-contamination detection (training-pipeline op)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.contamination import ngram_contamination


@pytest.fixture(scope="module")
def corpus_and_bench(spark):
    corpus = spark.createDataFrame([
        # c1 fully contains the benchmark sentence
        ("c1", "the quick brown fox jumps over the lazy dog tonight"),
        # c2 shares nothing
        ("c2", "completely different words appear in this training row"),
        # c3 too short for any 8-gram
        ("c3", "tiny doc"),
    ], "doc_id string, text string")
    bench = spark.createDataFrame([
        ("b1", "the quick brown fox jumps over the lazy dog"),
    ], "doc_id string, text string")
    return corpus, bench


def test_contamination_fractions(corpus_and_bench):
    corpus, bench = corpus_and_bench
    out = {r["doc_id"]: r for r in
           ngram_contamination(corpus, bench, n=8).collect()}
    assert set(out) == {"c1", "c2", "c3"}   # every corpus doc reports

    c1 = out["c1"]
    # 10 tokens -> 3 distinct 8-grams; benchmark has 2 (9 tokens); both
    # benchmark 8-grams appear in c1
    assert c1["n_ngrams"] == 3
    assert c1["n_contaminated"] == 2
    assert c1["contamination_frac"] == round(2 / 3, 6)

    assert out["c2"]["n_contaminated"] == 0
    assert out["c2"]["contamination_frac"] == 0.0

    c3 = out["c3"]                          # < n tokens: zero n-grams
    assert (c3["n_ngrams"], c3["contamination_frac"]) == (0, 0.0)


def test_benchmark_side_is_broadcast(corpus_and_bench):
    corpus, bench = corpus_and_bench
    plan = ngram_contamination(corpus, bench, n=8) \
        ._jdf.queryExecution().optimizedPlan().toString()
    # the membership probe is a broadcast of the (marked) bench grams
    assert "ResolvedHint (strategy=broadcast)" in plan \
        or "broadcast" in plan.lower()


def test_oversized_benchmark_drops_broadcast_hint(corpus_and_bench):
    corpus, bench = corpus_and_bench
    out = ngram_contamination(corpus, bench, n=8, broadcast_threshold=1)
    # over the cap: no guaranteed-broadcast hint, values unchanged
    assert {r["doc_id"]: r["n_contaminated"] for r in out.collect()} == \
        {"c1": 2, "c2": 0, "c3": 0}
