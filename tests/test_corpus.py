"""Per-source profiling/filtering + token-budget sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.corpus import filter_sources, source_stats
from graphrag_rs_spark.operators.sampling import (hash_bucket,
                                                  sample_token_budget)

GOOD = ("the quick brown fox jumps over the lazy dog and then it runs "
        "far away into the woods with friends for the whole day") * 2


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("d1", GOOD + " one", "good.example"),
        ("d2", GOOD + " two", "good.example"),
        ("d3", GOOD + " one", "mirror.example"),   # exact dup of d1
        ("d4", GOOD + " one", "mirror.example"),   # exact dup of d1
        ("d5", "x y", "junk.example"),             # low quality
        ("d6", "z !", "junk.example"),             # low quality
        ("d7", GOOD + " seven", "blocked.example"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string, "
                                       "source string")


def test_source_stats(corpus):
    s = {r["source"]: r for r in source_stats(corpus).collect()}
    assert set(s) == {"good.example", "mirror.example", "junk.example",
                      "blocked.example"}
    assert s["good.example"]["n_docs"] == 2
    assert s["good.example"]["dup_frac"] == 0.0
    assert s["good.example"]["mean_quality"] == 1.0
    # d1 is canonical for the (d1,d3,d4) hash group, so BOTH mirror docs
    # are non-canonical
    assert s["mirror.example"]["dup_frac"] == 1.0
    assert s["junk.example"]["mean_quality"] < 0.5
    assert s["junk.example"]["total_word_tokens"] == 3  # x, y, z ('!' strips)


def test_filter_sources(corpus):
    kept, counts = filter_sources(corpus, min_mean_quality=0.5,
                                  max_dup_frac=0.5,
                                  blocklist=("blocked.example",))
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == {"d1", "d2"}
    assert counts == {"input_docs": 7, "sources_total": 4,
                      "sources_dropped": 3, "docs_dropped": 5,
                      "survivors": 2}
    assert set(kept.columns) == {"doc_id", "text", "source"}


def test_filter_sources_renamed_column(spark, corpus):
    renamed = corpus.withColumnRenamed("source", "domain")
    kept, counts = filter_sources(renamed, min_mean_quality=0.5,
                                  max_dup_frac=0.5,
                                  blocklist=("blocked.example",),
                                  source_col="domain")
    assert {r["doc_id"] for r in kept.collect()} == {"d1", "d2"}
    assert counts["survivors"] == 2
    assert "domain" in kept.columns and "_keep" not in kept.columns


def test_filter_sources_keeps_unrelated_source_column(spark, corpus):
    """Regression: with a renamed source_col, a caller data column that
    happens to be named 'source' must come back intact — the join's
    verdict key may not shadow it."""
    renamed = (corpus.withColumnRenamed("source", "domain")
               .withColumn("source", F.concat(F.lit("payload-"),
                                              F.col("doc_id"))))
    kept, _ = filter_sources(renamed, min_mean_quality=0.5,
                             max_dup_frac=0.5,
                             blocklist=("blocked.example",),
                             source_col="domain")
    rows = {r["doc_id"]: r["source"] for r in kept.collect()}
    assert rows == {"d1": "payload-d1", "d2": "payload-d2"}


def _naive_budget(rows, budget):
    """Reference semantics: global (bucket, key) order, prefix ≤ budget."""
    ordered = sorted(rows, key=lambda r: (r["bucket"], r["key"]))
    kept, cum = [], 0
    for r in ordered:
        if cum + r["w"] > budget:
            break
        cum += r["w"]
        kept.append(r["key"])
    return set(kept)


@pytest.mark.parametrize("budget", [0, 37, 500, 10**9])
def test_sample_token_budget_matches_naive(spark, budget):
    df = spark.range(200).select(
        F.col("id").cast("string").alias("key"),
        (F.col("id") % 17 + 1).alias("w"))
    rows = df.withColumn("bucket", hash_bucket("key", "budget")).collect()
    out = sample_token_budget(df, "key", "w", budget=budget)
    got = {r["key"] for r in out.collect()}
    assert got == _naive_budget(rows, budget)


def test_sample_token_budget_boundary_is_partial(spark):
    # force everything into one logical ordering and a budget that cuts
    # mid-bucket: the boundary bucket must keep a strict prefix
    df = spark.range(50).select(
        F.col("id").cast("string").alias("key"), F.lit(10).alias("w"))
    out = sample_token_budget(df, "key", "w", budget=105)
    assert out.count() == 10  # 10 docs * 10 tokens = 100 <= 105 < 110


def test_length_quantiles_golden(spark):
    from graphrag_rs_spark.operators.corpus import length_quantiles
    # token counts 1..5 for source s (texts of i single-letter words)
    rows = [("s", " ".join(["a"] * i)) for i in range(1, 6)]
    rows += [("t", "only four words here")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r.source: r for r in length_quantiles(df).collect()}
    s = out["s"]
    assert (s.n_docs, s.mean_tokens, s.p50) == (5, 3.0, 3.0)
    assert s.p90 == 4.6 and s.p99 == 4.96  # linear interpolation
    t = out["t"]
    assert (t.n_docs, t.p50, t.p99) == (1, 4.0, 4.0)
