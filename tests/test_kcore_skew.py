"""k-core (algos/kcore.py) and skew_stats (operators/corpus.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.algos.kcore import k_core
from graphrag_rs_spark.operators.corpus import skew_stats


def _sym(spark, pairs):
    both = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src string, dst string")


def test_kcore_cascading_peel(spark):
    # K4 {a,b,c,d} + tail d—e—f: f peels first (deg 1), which drops e
    # to deg 1 → a second peel round; 2-core = K4 ∪ {d-e edge gone}
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    edges = _sym(spark, k4 + [("d", "e"), ("e", "f")])
    core2 = {r.node: r.degree for r in k_core(edges, 2).collect()}
    assert core2 == {"a": 3, "b": 3, "c": 3, "d": 3}
    core3 = {r.node: r.degree for r in k_core(edges, 3).collect()}
    assert core3 == {"a": 3, "b": 3, "c": 3, "d": 3}
    assert k_core(edges, 4).count() == 0


def test_kcore_k1_keeps_everything_connected(spark):
    edges = _sym(spark, [("a", "b"), ("c", "d")])
    assert k_core(edges, 1).count() == 4
    with pytest.raises(ValueError):
        k_core(edges, 0)


def test_skew_stats_shares_and_ranks(spark):
    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("c1",)] + [("c2",)]
    df = spark.createDataFrame(rows, "k string")
    out = {r.rank: r for r in skew_stats(df, "k", top_k=3).collect()}
    assert len(out) == 3
    assert (out[1].key, out[1].cnt, out[1].share) == ("hot", 6, 0.545455)
    assert (out[2].key, out[2].cnt) == ("warm", 3)
    # ties broken by key asc → c1 beats c2 at rank 3
    assert out[3].key == "c1"
    assert out[3].cum_share == round(10 / 11, 6)


def test_skew_stats_single_partition_only_after_topk(spark):
    df = spark.range(10_000).select((F.col("id") % 97).alias("k"))
    plan = skew_stats(df, "k", top_k=10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
