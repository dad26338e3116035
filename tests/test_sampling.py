"""Deterministic sampling / split-assignment operators (training-pipeline).

Properties that matter at 100 TB: determinism across runs and partition
layouts, nested samples, key-stable splits, per-stratum fractions, and a
plan that is a pure scan-side filter (no shuffle, no Python).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.sampling import (
    RESOLUTION, deterministic_sample, hash_bucket, hash_split,
    stratified_sample)


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.range(2000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
        (F.col("id") % 4).cast("int").alias("grp"))


def test_split_deterministic_and_exhaustive(spark, keys_df):
    a = {r["key"]: r["split"]
         for r in hash_split(keys_df, "key", seed="s1").collect()}
    b = {r["key"]: r["split"]
         for r in hash_split(keys_df.repartition(7), "key",
                             seed="s1").collect()}
    assert a == b                      # partition-layout independent
    assert set(a.values()) == {"train", "val", "test"}
    n = len(a)
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.7 * n < n_train < 0.9 * n  # ~80% within hash noise


def test_split_weights_must_sum_to_one(keys_df):
    with pytest.raises(ValueError):
        hash_split(keys_df, "key", weights={"a": 0.5, "b": 0.3})


def test_sample_nested_and_stable(spark, keys_df):
    small = {r["key"] for r in
             deterministic_sample(keys_df, "key", 0.1, "s").collect()}
    big = {r["key"] for r in
           deterministic_sample(keys_df, "key", 0.3, "s").collect()}
    assert small <= big                # nested samples
    # stable under corpus growth: sampling a superset keeps every old key
    grown = keys_df.union(spark.range(2000, 3000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
        (F.col("id") % 4).cast("int").alias("grp")))
    regrown = {r["key"] for r in
               deterministic_sample(grown, "key", 0.1, "s").collect()}
    assert small == {k for k in regrown if int(k[1:]) < 2000}


def test_seed_decorrelates(keys_df):
    s1 = {r["key"] for r in
          deterministic_sample(keys_df, "key", 0.5, "seedA").collect()}
    s2 = {r["key"] for r in
          deterministic_sample(keys_df, "key", 0.5, "seedB").collect()}
    assert s1 != s2
    overlap = len(s1 & s2) / max(len(s1), 1)
    assert 0.3 < overlap < 0.7         # independent draws ≈ 50% overlap


def test_stratified_fractions(keys_df):
    out = stratified_sample(keys_df, strata="grp", key="key",
                            fractions={0: 0.9, 1: 0.1},
                            default_fraction=0.0, seed="z")
    counts = {r["grp"]: r["n"] for r in
              out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts.get(2) is None and counts.get(3) is None
    assert counts[0] > 400 and counts[1] < 100   # of 500 per stratum


def test_bucket_range_and_plan_is_scan_side(spark, keys_df):
    rows = keys_df.select(hash_bucket("key", "s").alias("b")).collect()
    assert all(0 <= r["b"] < RESOLUTION for r in rows)
    plan = deterministic_sample(
        keys_df, "key", 0.2, "s")._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan      # no shuffle
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
