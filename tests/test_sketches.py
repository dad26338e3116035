"""KMV distinct-count sketch (operators/sketches.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.sketches import kmv_distinct, kmv_distinct_by


def test_exact_below_k(spark):
    df = spark.range(50).select(F.lit("g").alias("g"),
                                F.col("id").cast("string").alias("v"))
    # duplicates must not inflate the sketch
    df = df.union(df)
    row = kmv_distinct_by(df, "g", "v", k=256).collect()[0]
    assert row.n_kept == 50 and row.est_distinct == 50.0


def test_estimate_within_stderr(spark):
    n = 20_000
    df = spark.range(n).select((F.col("id") % 5).cast("string").alias("g"),
                               F.col("id").cast("string").alias("v"))
    rows = kmv_distinct_by(df, "g", "v", k=256).collect()
    assert len(rows) == 5
    for r in rows:
        true = n // 5
        # stderr ≈ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
        assert abs(r.est_distinct - true) / true < 0.25, r


def test_parallelism_invariance(spark):
    df = spark.range(5_000).select(
        F.lit("g").alias("g"), (F.col("id") * 7919).cast("string").alias("v"))
    a = kmv_distinct_by(df.repartition(1), "g", "v").collect()[0]
    b = kmv_distinct_by(df.repartition(32), "g", "v").collect()[0]
    assert (a.n_kept, a.est_distinct) == (b.n_kept, b.est_distinct)


def test_null_values_do_not_occupy_sketch_slots(spark):
    df = spark.createDataFrame(
        [("g", str(i)) for i in range(10)] + [("g", None)] * 5,
        "g string, v string")
    row = kmv_distinct_by(df, "g", "v", k=256).collect()[0]
    assert row.n_kept == 10 and row.est_distinct == 10.0


def test_global_variant_and_k_guard(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("v"))
    row = kmv_distinct(df, "v", k=8).collect()[0]
    assert row.n_kept == 8 and row.est_distinct > 0
    with pytest.raises(ValueError):
        kmv_distinct(df, "v", k=2)
