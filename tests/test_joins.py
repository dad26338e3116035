"""as-of join + range join (operators/joins.py) — engine-added family.

Golden values are hand-computed; the pandas cross-check uses
merge_asof (same semantics: backward/forward/nearest, inclusive)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.joins import asof_join, range_join_points


def _ts(s):
    return pd.Timestamp(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        pd.DataFrame({
            "k": ["a", "a", "a", "b", "c"],
            "ts": [_ts("2024-01-01 00:10"), _ts("2024-01-01 01:00"),
                   _ts("2024-01-01 00:00"), _ts("2024-01-01 05:00"),
                   _ts("2024-01-01 00:30")],
            "lv": [1, 2, 3, 4, 5],
        }))
    right = spark.createDataFrame(
        pd.DataFrame({
            "k": ["a", "a", "a", "b", "x"],
            "ts": [_ts("2024-01-01 00:00"), _ts("2024-01-01 00:45"),
                   _ts("2024-01-01 02:00"), _ts("2024-01-01 06:00"),
                   _ts("2024-01-01 00:00")],
            "rv": [10.0, 20.0, 30.0, 40.0, 50.0],
        }))
    return left, right


def _collect(df):
    return {tuple(r[c] for c in ("k", "lv")): r.asDict()
            for r in df.collect()}


def test_asof_backward_inclusive(frames):
    left, right = frames
    out = _collect(asof_join(left, right, "k"))
    assert out[("a", 1)]["rv"] == 10.0       # 00:10 → 00:00
    assert out[("a", 2)]["rv"] == 20.0       # 01:00 → 00:45
    assert out[("a", 3)]["rv"] == 10.0       # 00:00 → 00:00 inclusive
    assert out[("b", 4)]["rv"] is None       # only later right rows
    assert out[("c", 5)]["rv"] is None       # no right key


def test_asof_backward_strict_excludes_equal(frames):
    left, right = frames
    out = _collect(asof_join(left, right, "k", strict=True))
    assert out[("a", 3)]["rv"] is None       # 00:00 == 00:00 hidden
    assert out[("a", 1)]["rv"] == 10.0       # unaffected


def test_asof_forward(frames):
    left, right = frames
    out = _collect(asof_join(left, right, "k", direction="forward"))
    assert out[("a", 1)]["rv"] == 20.0       # 00:10 → 00:45
    assert out[("a", 2)]["rv"] == 30.0       # 01:00 → 02:00
    assert out[("a", 3)]["rv"] == 10.0       # inclusive equal
    assert out[("b", 4)]["rv"] == 40.0       # 05:00 → 06:00


def test_asof_nearest_ties_backward(frames):
    left, right = frames
    out = _collect(asof_join(left, right, "k", direction="nearest"))
    assert out[("a", 1)]["rv"] == 10.0       # 10 min back vs 35 min fwd
    assert out[("a", 2)]["rv"] == 20.0       # 15 min back vs 60 min fwd
    assert out[("b", 4)]["rv"] == 40.0       # only forward exists
    assert out[("c", 5)]["rv"] is None
    # exact tie → backward wins: left 00:30 is 7.5 min from nothing…
    # construct a real tie: right a@00:00/00:45, left midpoint 00:22:30
    spark = left.sparkSession
    mid = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "ts": [_ts("2024-01-01 00:22:30")],
                      "lv": [9]}))
    tie = _collect(asof_join(mid, right, "k", direction="nearest"))
    assert tie[("a", 9)]["rv"] == 10.0


def test_asof_tolerance(frames):
    left, right = frames
    out = _collect(asof_join(left, right, "k", tolerance=600))
    assert out[("a", 1)]["rv"] == 10.0       # 600 s away, inclusive bound
    assert out[("a", 2)]["rv"] is None       # 900 s > 600 s → nulled


def test_asof_matches_pandas_merge_asof(spark):
    rng = pd.Series(range(200))
    left = pd.DataFrame({
        "k": (rng % 7).map(lambda i: f"k{i}"),
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(rng * 37, "s"),
        "lv": rng,
    })
    right = pd.DataFrame({
        "k": (rng % 5).map(lambda i: f"k{i}"),
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(rng * 53, "s"),
        "rv": (rng * 3).astype("float"),
    })
    got = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right), "k") \
        .orderBy("lv").toPandas()
    want = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                         on="ts", by="k").sort_values("lv")
    assert list(got["rv"].fillna(-1)) == list(want["rv"].fillna(-1))


def test_asof_null_timestamps_never_match(spark):
    """Null-ts right rows must not back-fill (they sort first under asc);
    null-ts left rows must stay unmatched (they sort last under desc)."""
    import datetime as dt
    t1 = dt.datetime(2024, 1, 1, 1, 0)
    t2 = dt.datetime(2024, 1, 1, 0, 30)
    left = spark.createDataFrame(
        [("a", t1, 1), ("a", None, 2)], "k string, ts timestamp, lv int")
    right = spark.createDataFrame(
        [("a", None, 99.0), ("a", t2, 7.0)],
        "k string, ts timestamp, rv double")
    for direction in ("backward", "forward", "nearest"):
        out = {r.lv: r.rv for r in
               asof_join(left, right, "k", direction=direction).collect()}
        assert out[2] is None, direction           # null left ts
        if direction == "backward":
            assert out[1] == 7.0                   # real match, not 99.0
        assert out[1] != 99.0, direction           # null right ts ignored


def test_range_join_inner_and_left(spark):
    points = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1.0, 5.0, 14.9, 15.0, 99.0])],
        "pid int, x double")
    intervals = spark.createDataFrame(
        [("i1", 0.0, 5.0), ("i2", 5.0, 15.0), ("i3", 200.0, 300.0),
         ("bad", 9.0, 3.0)],
        "iid string, lo double, hi double")
    got = {(r.pid, r.iid)
           for r in range_join_points(points, intervals, "x", "lo", "hi",
                                      bin_width=4.0).collect()}
    assert got == {(0, "i1"), (1, "i1"), (1, "i2"), (2, "i2"), (3, "i2")}
    left = range_join_points(points, intervals, "x", "lo", "hi",
                             bin_width=4.0, how="left")
    rows = {(r.pid, r.iid) for r in left.collect()}
    assert (4, None) in rows and len(rows) == 6


def test_range_join_bin_width_invariance(spark):
    import random
    rnd = random.Random(7)
    points = spark.createDataFrame(
        [(i, rnd.uniform(0, 100)) for i in range(300)], "pid int, x double")
    ivs = []
    for i in range(40):
        lo = rnd.uniform(0, 95)
        ivs.append((f"i{i}", lo, lo + rnd.uniform(0, 10)))
    intervals = spark.createDataFrame(ivs, "iid string, lo double, hi double")
    ref = None
    for w in (0.5, 3.0, 50.0):
        got = sorted(
            (r.pid, r.iid)
            for r in range_join_points(points, intervals, "x", "lo", "hi",
                                       bin_width=w).collect())
        if ref is None:
            ref = got
        assert got == ref and len(ref) > 0


def test_asof_plan_has_no_nested_loop(frames):
    left, right = frames
    plan = asof_join(left, right, "k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_plan_has_no_nested_loop(spark):
    points = spark.range(10).select(
        F.col("id").alias("pid"), (F.col("id") * 1.5).alias("x"))
    intervals = spark.range(5).select(
        F.col("id").alias("iid"), (F.col("id") * 2.0).alias("lo"),
        (F.col("id") * 2.0 + 3).alias("hi"))
    plan = range_join_points(points, intervals, "x", "lo", "hi", 2.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_left_null_point_column_no_duplicates(spark):
    # a matched point carrying a NULL in a non-key column must not be
    # re-emitted as spurious-unmatched (the anti-join is null-SAFE)
    points = spark.createDataFrame(
        [(1, None, 5.0), (2, "t", 50.0)],
        "pid int, tag string, x double")
    intervals = spark.createDataFrame(
        [("i1", 0.0, 10.0)], "iid string, lo double, hi double")
    rows = range_join_points(points, intervals, "x", "lo", "hi",
                             bin_width=4.0, how="left").collect()
    got = sorted((r.pid, r.iid) for r in rows)
    assert got == [(1, "i1"), (2, None)]
