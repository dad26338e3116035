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


# ---------------------------------------------------------------- CMS

from graphrag_rs_spark.operators.sketches import (cms_build, cms_estimate,
                                                  cms_heavy_hitters)


def _stream(spark):
    # key i appears (i+1)·10 times, i = 0..9
    rows = [(str(i),) for i in range(10) for _ in range((i + 1) * 10)]
    return spark.createDataFrame(rows, "k string")


def test_cms_overestimates_never_under(spark):
    df = _stream(spark)
    counters = cms_build(df, "k", depth=4, width=64)
    est = {r.k: r.est_cnt
           for r in cms_estimate(counters, df.select("k"), "k",
                                 depth=4, width=64).collect()}
    for i in range(10):
        assert est[str(i)] >= (i + 1) * 10
    # wide sketch (no collisions among 10 keys) is exact
    wide = cms_build(df, "k", depth=4, width=4096)
    est_w = {r.k: r.est_cnt
             for r in cms_estimate(wide, df.select("k"), "k",
                                   depth=4, width=4096).collect()}
    assert est_w == {str(i): (i + 1) * 10 for i in range(10)}


def test_cms_absent_key_reads_zero(spark):
    df = _stream(spark)
    counters = cms_build(df, "k", depth=4, width=4096)
    probe = spark.createDataFrame([("nope",)], "k string")
    [r] = cms_estimate(counters, probe, "k", depth=4, width=4096).collect()
    assert r.est_cnt == 0


def test_cms_counters_merge_by_sum(spark):
    from pyspark.sql import functions as F
    df = _stream(spark)
    lo = df.filter(F.col("k") < "5")
    hi = df.filter(F.col("k") >= "5")
    merged = (cms_build(lo, "k", width=64)
              .unionByName(cms_build(hi, "k", width=64))
              .groupBy("row_i", "bucket").agg(F.sum("cnt").alias("cnt")))
    whole = cms_build(df, "k", width=64)
    assert merged.exceptAll(whole).isEmpty() \
        and whole.exceptAll(merged).isEmpty()


def test_cms_parallelism_invariance(spark):
    df = _stream(spark)
    a = sorted(map(tuple, cms_build(df.repartition(1), "k").collect()))
    b = sorted(map(tuple, cms_build(df.repartition(32), "k").collect()))
    assert a == b


def test_cms_heavy_hitters_ranking(spark):
    out = cms_heavy_hitters(_stream(spark), "k", min_count=50,
                            width=4096, top_k=3).collect()
    assert [(r.key, r.est_cnt) for r in out] == [
        ("9", 100), ("8", 90), ("7", 80)]


# -------------------------------------------------------------- Bloom

from graphrag_rs_spark.operators.sketches import (bloom_build,
                                                  bloom_might_contain)


def test_bloom_no_false_negatives(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(200)],
                                 "k string")
    bloom = bloom_build(keys, "k", n_bits=4096, n_hashes=4)
    out = bloom_might_contain(bloom, keys, "k", n_bits=4096, n_hashes=4)
    assert out.count() == 200
    assert all(r.maybe for r in out.collect())


def test_bloom_definite_absence(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(20)],
                                 "k string")
    other = spark.createDataFrame([(f"absent{i}",) for i in range(20)],
                                  "k string")
    bloom = bloom_build(keys, "k", n_bits=65536, n_hashes=4)
    hits = [r.maybe for r in
            bloom_might_contain(bloom, other, "k",
                                n_bits=65536, n_hashes=4).collect()]
    # 20 keys in 64k bits: P(any fp) < 1e-8 — all definite absences
    assert not any(hits)


def test_bloom_merges_by_bit_or(spark):
    from pyspark.sql import functions as F
    keys = spark.createDataFrame([(f"k{i}",) for i in range(100)],
                                 "k string")
    lo = keys.filter(F.col("k") < "k5")
    hi = keys.filter(F.col("k") >= "k5")
    merged = (bloom_build(lo, "k", n_bits=4096)
              .unionByName(bloom_build(hi, "k", n_bits=4096))
              .groupBy("word_idx").agg(F.bit_or("bits").alias("bits")))
    whole = bloom_build(keys, "k", n_bits=4096)
    assert merged.exceptAll(whole).isEmpty() \
        and whole.exceptAll(merged).isEmpty()


def test_bloom_parallelism_invariance_and_guard(spark):
    import pytest
    keys = spark.createDataFrame([(f"k{i}",) for i in range(500)],
                                 "k string")
    a = sorted(map(tuple,
                   bloom_build(keys.repartition(1), "k",
                               n_bits=4096).collect()))
    b = sorted(map(tuple,
                   bloom_build(keys.repartition(32), "k",
                               n_bits=4096).collect()))
    assert a == b
    with pytest.raises(ValueError):
        bloom_build(keys, "k", n_bits=100)
