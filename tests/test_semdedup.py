"""SemDeDup vs an independent pure-Python replay.

Verifies the hash-seeded quantizer handoff, within-cluster-only pair
semantics, CC group closure, the paper's keeper rule (lowest centroid
similarity survives), parallelism invariance, and the scale-shape
claims (centroids broadcast, no Python in the plan).
"""

from __future__ import annotations

import hashlib
import math

import pytest

from graphrag_rs_spark.operators.similarity import semdedup

# Two tight clusters on orthogonal axes plus one lone outlier.  Within
# each cluster every pair has cosine ≈ 1 (>> threshold); across
# clusters cosine ≈ 0.  Vector ids are ints like the embeddings table.
VECS = [
    (1, [1.0, 0.02, 0.0, 0.0]),
    (2, [1.0, 0.00, 0.02, 0.0]),
    (3, [1.0, 0.01, 0.01, 0.0]),
    (4, [0.0, 1.0, 0.02, 0.0]),
    (5, [0.0, 1.0, 0.00, 0.02]),
    (6, [0.02, 0.0, 0.0, 1.0]),  # outlier: nothing within 0.9 of it
]
THRESHOLD = 0.9
N_LISTS = 2


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _cos(a, b) -> float:
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
    return round(num / den, 6)


def _py_semdedup():
    """Independent replay: seeds → 1 Lloyd step → membership → pairs →
    CC → keeper."""
    vs = {i: v for i, v in VECS}
    seeds = sorted(vs, key=lambda i: (_h60(str(i)), i))[:N_LISTS]
    cents = {li + 1: vs[i] for li, i in enumerate(seeds)}

    def nearest(v, cents):
        return max(cents, key=lambda li: (_cos(v, cents[li]), -li))

    assign = {i: nearest(v, cents) for i, v in vs.items()}
    lloyd = {}
    for li in cents:
        members = [vs[i] for i in vs if assign[i] == li]
        lloyd[li] = [round(sum(col) / len(members), 6)
                     for col in zip(*members)]
    member = {i: nearest(v, lloyd) for i, v in vs.items()}

    edges = [(a, b) for a in vs for b in vs
             if a < b and member[a] == member[b]
             and _cos(vs[a], vs[b]) >= THRESHOLD]
    parent = {i: i for i in vs}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    group = {i: find(i) for i in vs}
    cent_sim = {i: _cos(vs[i], lloyd[member[i]]) for i in vs}
    kept = {}
    for g in set(group.values()):
        ms = [i for i in vs if group[i] == g]
        kept[g] = min(ms, key=lambda i: (cent_sim[i], i))
    return {i: (member[i], group[i], cent_sim[i],
                1 if kept[group[i]] == i else 0) for i in vs}


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(
        VECS, "vec_id long, embedding array<double>")
    return {r["vec_id"]: r for r in
            semdedup(df, threshold=THRESHOLD, n_lists=N_LISTS).collect()}


def test_matches_python_replay(result):
    want = _py_semdedup()
    assert set(result) == set(want)
    for i, (li, g, cs, kept) in want.items():
        row = result[i]
        assert row["list"] == li, i
        assert row["group_id"] == g, i
        assert row["cent_sim"] == pytest.approx(cs, abs=1e-6)
        assert row["is_kept"] == kept, i


def test_group_and_keeper_semantics(result):
    # every group keeps exactly one member
    groups = {}
    for r in result.values():
        groups.setdefault(r["group_id"], []).append(r)
    for g, rows in groups.items():
        assert sum(r["is_kept"] for r in rows) == 1
        keeper = next(r for r in rows if r["is_kept"])
        # the paper's rule: survivor has the group-min centroid cosine
        assert keeper["cent_sim"] == min(r["cent_sim"] for r in rows)
    # the two tight clusters collapse (≥1 group of size >1), and the
    # outlier survives alone
    assert any(len(rows) > 1 for rows in groups.values())
    out = result[6]
    assert out["is_kept"] == 1
    assert sum(1 for r in result.values()
               if r["group_id"] == out["group_id"]) == 1


def test_parallelism_invariant(spark, result):
    df8 = spark.createDataFrame(
        VECS, "vec_id long, embedding array<double>").repartition(8)
    again = {r["vec_id"]: r for r in
             semdedup(df8, threshold=THRESHOLD, n_lists=N_LISTS).collect()}
    for i in again:
        assert (again[i]["group_id"], again[i]["is_kept"]) == \
            (result[i]["group_id"], result[i]["is_kept"])


def test_scale_shape(spark):
    df = spark.createDataFrame(VECS, "vec_id long, embedding array<double>")
    plan = semdedup(df, threshold=THRESHOLD, n_lists=N_LISTS) \
        ._jdf.queryExecution().executedPlan().toString()
    # centroid table joins via broadcast; no Python anywhere
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
