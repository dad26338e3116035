"""substring_dedup (ExactSubstr-style span removal) golden semantics.

Handcrafted corpora pin the paper-critical cases: duplicated spans at
DIFFERENT alignments (what fixed-segment dedup misses), self-repeats
within one document, maximal-span cover (a run of L ≥ width duplicated
tokens drops entirely, its unique flanks survive), and short-doc /
unique-doc no-ops.  Plus plan-shape assertions (no Python, no corpus
cross join).
"""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.dedup import substring_dedup

W = 3  # small width so fixtures stay readable


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = substring_dedup(df, "doc_id", "text", width=W, **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_cross_doc_duplicate_any_alignment(spark):
    # the shared run "x y z" sits at offset 0 in a and offset 2 in b —
    # a fixed width-3 segmentation of b would slice it as "q p x | y z"
    # and never see the duplicate; sliding shingles catch it exactly.
    got = _run(spark, [
        ("a", "x y z u1 u2"),
        ("b", "q p x y z"),
    ])
    assert got["a"]["clean_text"] == "u1 u2"
    assert got["a"]["n_dropped"] == 3 and got["a"]["n_tokens"] == 5
    assert got["b"]["clean_text"] == "q p"
    assert got["b"]["n_dropped"] == 3 and got["b"]["n_tokens"] == 5


def test_self_repeat_within_one_doc(spark):
    # "r s t" occurs twice in the SAME doc: both occurrences drop
    # (the paper counts self-repeats), unique middle survives
    got = _run(spark, [("a", "r s t mid r s t")])
    assert got["a"]["clean_text"] == "mid"
    assert got["a"]["n_dropped"] == 6


def test_long_span_fully_tiled(spark):
    # a 5-token duplicated run is tiled by three width-3 shingles; the
    # whole run drops from both docs, distinct flanks stay
    got = _run(spark, [
        ("a", "f1 c1 c2 c3 c4 c5 f2"),
        ("b", "g1 g2 c1 c2 c3 c4 c5"),
    ])
    assert got["a"]["clean_text"] == "f1 f2"
    assert got["b"]["clean_text"] == "g1 g2"


def test_short_and_unique_docs_untouched(spark):
    got = _run(spark, [
        ("a", "one two"),            # shorter than width: no shingles
        ("b", "all words unique here"),
        ("c", "all words unique here"),  # exact dup of b: both emptied
    ])
    assert got["a"]["clean_text"] == "one two"
    assert got["a"]["n_dropped"] == 0
    assert got["b"]["clean_text"] == "" and got["b"]["n_dropped"] == 4
    assert got["c"]["clean_text"] == "" and got["c"]["n_dropped"] == 4


def test_max_count_raises_the_bar(spark):
    # with max_count=2 a span must appear 3+ times to drop
    rows = [("a", "k l m t1"), ("b", "k l m t2"), ("c", "k l m t3")]
    got2 = _run(spark, rows, max_count=2)
    assert all(g["n_dropped"] == 3 for g in got2.values())
    got3 = _run(spark, rows[:2], max_count=2)  # only 2 occurrences now
    assert all(g["n_dropped"] == 0 for g in got3.values())


def test_parallelism_invariant(spark):
    rows = [(f"d{i}", "x y z pad%d a b c" % i) for i in range(20)]
    df1 = spark.createDataFrame(rows, "doc_id string, text string")
    a = sorted((r["doc_id"], r["clean_text"]) for r in
               substring_dedup(df1.coalesce(1), width=W).collect())
    b = sorted((r["doc_id"], r["clean_text"]) for r in
               substring_dedup(df1.repartition(8), width=W).collect())
    assert a == b


def test_scale_shape(spark):
    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z")], "doc_id string, text string")
    plan = substring_dedup(df, width=W) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
