"""Domain-mixture plan + realization vs an independent pandas replay.

Checks the solver arithmetic (share normalization over present sources,
epoch cap), the hash-deterministic copy counts, and the operators'
scale-shape claims (no corpus shuffle in realize, plan is one agg).
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.mixture import mixture_plan, realize_mixture

ROWS = [
    # (doc_id, text, source) — word counts 4/2/6 per doc
    (0, "alpha beta gamma delta", "web"),
    (1, "one two", "web"),
    (2, "a b c d e f", "web"),
    (3, "lorem ipsum dolor sit", "books"),
    (4, "six words here in this doc", "books"),
    (5, "tiny", "code"),
    (6, "x " * 50, "code"),
    (7, "unmatched source text here", "junk"),
]


def _wc(t: str) -> int:
    return len(re.sub(r"[^a-z0-9]+", " ", t.lower()).split())


def _bucket(key, seed: str) -> int:
    h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15]
    return int(h, 16) % 1_000_000


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id bigint, text string, source string")


TARGETS = {"web": 0.6, "books": 0.3, "code": 0.1, "absent": 0.5}
BUDGET = 40


def test_plan_arithmetic(spark, docs):
    plan = {r["source"]: r for r in
            mixture_plan(docs, TARGETS, token_budget=BUDGET).collect()}
    # 'junk' has no target, 'absent' has no docs → neither plans
    assert set(plan) == {"web", "books", "code"}
    avail = {"web": 12, "books": 10, "code": 51}
    tot = 0.6 + 0.3 + 0.1  # normalization over PRESENT sources only
    for s, row in plan.items():
        share = TARGETS[s] / tot
        assert row["available_tokens"] == avail[s]
        assert row["target_share"] == round(share, 6)
        assert row["desired_tokens"] == round(share * BUDGET, 6)
        assert row["epochs"] == round(min(share * BUDGET / avail[s], 4.0), 6)
    # web: 24/12 = 2.0 epochs; code: 4/51 ≈ 0.078 — both regimes covered
    assert plan["web"]["epochs"] == 2.0
    assert plan["code"]["epochs"] < 1.0


def test_plan_zero_token_source_plans_zero_epochs(spark):
    """ANSI-mode regression: a source whose docs all tokenize to nothing
    (all-punctuation / non-Latin text) has available_tokens = 0 — the
    epochs division must yield 0.0, not abort the job with
    DIVIDE_BY_ZERO (Spark 4 default ANSI semantics)."""
    rows = [(0, "real words here", "web"), (1, "!!! ...", "punct")]
    d = spark.createDataFrame(rows, "doc_id bigint, text string, "
                                    "source string")
    plan = {r["source"]: r for r in
            mixture_plan(d, {"web": 0.5, "punct": 0.5},
                         token_budget=10).collect()}
    assert plan["punct"]["available_tokens"] == 0
    assert plan["punct"]["epochs"] == 0.0
    assert plan["web"]["epochs"] > 0.0


def test_plan_all_zero_shares(spark, docs):
    """total_share = 0 must also survive ANSI mode: every share is 0."""
    plan = mixture_plan(docs, {"web": 0.0, "books": 0.0},
                        token_budget=10).collect()
    assert all(r["epochs"] == 0.0 and r["target_share"] == 0.0
               for r in plan)


def test_epoch_cap(spark, docs):
    plan = {r["source"]: r["epochs"] for r in
            mixture_plan(docs, TARGETS, token_budget=10_000,
                         max_epochs=3.5).collect()}
    assert all(e == 3.5 for e in plan.values())


def test_realize_copy_counts_match_hash_replay(spark, docs):
    plan = mixture_plan(docs, TARGETS, token_budget=BUDGET)
    eps = {r["source"]: r["epochs"] for r in plan.collect()}
    got = sorted((r["doc_id"], r["source"], r["copy_idx"])
                 for r in realize_mixture(docs, plan).collect())
    want = []
    for doc_id, text, source in ROWS:
        if source not in eps:
            continue
        e = eps[source]
        n = math.floor(e) + (
            1 if _bucket(doc_id, "mixture") < round((e - math.floor(e))
                                                    * 1_000_000) else 0)
        want.extend((doc_id, source, k) for k in range(1, int(n) + 1))
    assert got == sorted(want)


def test_realize_deterministic_across_partitionings(spark, docs):
    plan = mixture_plan(docs, TARGETS, token_budget=BUDGET)
    a = sorted(map(tuple, realize_mixture(docs, plan).collect()))
    b = sorted(map(tuple,
                   realize_mixture(docs.repartition(5), plan).collect()))
    assert a == b


def test_realize_has_no_corpus_shuffle(spark, docs):
    # with a materialized plan (how a real pipeline passes it — computed
    # once, persisted), realization must be scan → broadcast join →
    # explode with NO shuffle of the corpus at all
    plan = spark.createDataFrame(
        mixture_plan(docs, TARGETS, token_budget=BUDGET).collect())
    plan_str = realize_mixture(docs, plan)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastExchange" in plan_str
    for line in plan_str.splitlines():
        if "Exchange" in line and "Broadcast" not in line:
            raise AssertionError(f"corpus shuffle in realize: {line}")
