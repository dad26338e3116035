"""DSIR importance resampling vs an independent pure-Python replay.

Verifies the hashed-n-gram bucket model arithmetic (add-alpha smoothing,
dense bucket table), per-doc log-weight sums, the deterministic
Gumbel-top-k draw, and the operators' scale-shape claims (ratio table
broadcast, no corpus-wide window).
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from graphrag_rs_spark.operators.dsir import (
    dsir_log_ratio, dsir_select, dsir_weights)

B = 64  # small bucket count so collisions actually occur in the test
RESOLUTION = 1_000_000

TARGET_ROWS = [
    ("t0", "the quick brown fox jumps over the lazy dog"),
    ("t1", "the quick red fox runs fast"),
    ("t2", "foxes and dogs are quick animals"),
]
RAW_ROWS = [
    ("r0", "the quick brown fox jumps over the lazy dog"),  # = target text
    ("r1", "stock market prices fell sharply on monday"),
    ("r2", "quarterly earnings beat analyst expectations"),
    ("r3", "the fox is quick"),
    ("r4", ""),  # empty after normalization: zero features
    ("r5", "!!! ???"),  # normalizes to empty too
]


def _toks(t: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]


def _grams(t: str) -> list[str]:
    ts = _toks(t)
    return ts + [" ".join(ts[i:i + 2]) for i in range(len(ts) - 1)]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _bucket(gram: str, seed: str = "dsir") -> int:
    return _h60(f"{seed}:{gram}") % B


def _py_log_ratio(alpha: float = 1.0) -> dict[int, float]:
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for _, t in TARGET_ROWS:
        for g in _grams(t):
            b = _bucket(g)
            tc[b] = tc.get(b, 0) + 1
    for _, t in RAW_ROWS:
        for g in _grams(t):
            b = _bucket(g)
            rc[b] = rc.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    return {
        b: (math.log((tc.get(b, 0) + alpha) / (tt + alpha * B))
            - math.log((rc.get(b, 0) + alpha) / (rt + alpha * B)))
        for b in range(B)
    }


def _py_log_w(text: str, ratio: dict[int, float]) -> float:
    return round(sum(ratio[_bucket(g)] for g in _grams(text)), 6)


@pytest.fixture(scope="module")
def frames(spark):
    tgt = spark.createDataFrame(TARGET_ROWS, "doc_id string, text string")
    raw = spark.createDataFrame(RAW_ROWS, "doc_id string, text string")
    return tgt, raw


def test_log_ratio_matches_python_replay(spark, frames):
    tgt, raw = frames
    got = {r["bucket"]: r["log_ratio"]
           for r in dsir_log_ratio(tgt, raw, num_buckets=B).collect()}
    want = _py_log_ratio()
    assert set(got) == set(range(B))  # dense: every bucket present
    for b in range(B):
        assert got[b] == pytest.approx(want[b], abs=1e-12)


def test_weights_match_python_replay(spark, frames):
    tgt, raw = frames
    ratio = dsir_log_ratio(tgt, raw, num_buckets=B)
    got = {r["doc_id"]: r for r in
           dsir_weights(raw, ratio, num_buckets=B).collect()}
    py_ratio = _py_log_ratio()
    assert set(got) == {d for d, _ in RAW_ROWS}  # nothing dropped
    for doc_id, text in RAW_ROWS:
        row = got[doc_id]
        assert row["n_features"] == len(_grams(text))
        assert row["log_w"] == pytest.approx(
            _py_log_w(text, py_ratio), abs=1e-6)
    # the target-identical doc must outscore the out-of-domain ones
    assert got["r0"]["log_w"] > got["r1"]["log_w"]
    assert got["r0"]["log_w"] > got["r2"]["log_w"]
    # featureless docs survive with log_w 0.0
    assert got["r4"]["n_features"] == 0 and got["r4"]["log_w"] == 0.0
    assert got["r5"]["n_features"] == 0 and got["r5"]["log_w"] == 0.0


def test_gumbel_select_matches_python_replay(spark, frames):
    tgt, raw = frames
    w = dsir_weights(raw, dsir_log_ratio(tgt, raw, num_buckets=B),
                     num_buckets=B)
    got = dsir_select(w, k=3).collect()
    assert len(got) == 3
    # replay: key = round(log_w − ln(−ln(u)), 6), u from the md5 bucket
    py_ratio = _py_log_ratio()
    keyed = []
    for doc_id, text in RAW_ROWS:
        u = ((_h60(f"dsir-gumbel:{doc_id}") % RESOLUTION) + 0.5) / RESOLUTION
        key = round(_py_log_w(text, py_ratio) - math.log(-math.log(u)), 6)
        keyed.append((key, doc_id))
    want = sorted(keyed, key=lambda kv: (-kv[0], kv[1]))[:3]
    got_sorted = sorted(got, key=lambda r: r["rank"])
    for rank, (row, (key, doc_id)) in enumerate(zip(got_sorted, want), 1):
        assert row["rank"] == rank
        assert row["doc_id"] == doc_id
        assert row["gumbel_key"] == pytest.approx(key, abs=1e-6)


def test_selection_is_parallelism_invariant(spark, frames):
    tgt, raw = frames
    w1 = dsir_weights(raw.coalesce(1),
                      dsir_log_ratio(tgt, raw, num_buckets=B),
                      num_buckets=B)
    w8 = dsir_weights(raw.repartition(8),
                      dsir_log_ratio(tgt, raw, num_buckets=B),
                      num_buckets=B)
    s1 = [(r["doc_id"], r["rank"]) for r in dsir_select(w1, 4).collect()]
    s8 = [(r["doc_id"], r["rank"]) for r in dsir_select(w8, 4).collect()]
    assert sorted(s1) == sorted(s8)


def test_scale_shape_broadcast_ratio_no_global_window(spark, frames):
    tgt, raw = frames
    ratio = dsir_log_ratio(tgt, raw, num_buckets=B)
    plan = dsir_weights(raw, ratio, num_buckets=B) \
        ._jdf.queryExecution().executedPlan().toString()
    # the ratio table joins the exploded corpus via broadcast
    assert "BroadcastHashJoin" in plan
    # no Python in the scoring path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    sel = dsir_select(dsir_weights(raw, ratio, num_buckets=B), 3)
    splan = sel._jdf.queryExecution().executedPlan().toString()
    # global top-k lowers to TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in splan
