"""Q11 DocumentTree::query (summarization/mod.rs:867-930): keyword
construction + node scoring goldens."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.retrieval.summarize import (
    extract_keywords_py,
    hierarchical_summary,
    tree_keywords,
    tree_query,
)


def _tree(spark, chunks):
    df = spark.createDataFrame(
        chunks, "doc_id long, chunk_seq long, content string")
    tree = hierarchical_summary(df, fanout=4, max_len=600)
    return tree, tree_keywords(tree, fanout=4)


def test_extract_keywords_py_ordering():
    # count desc, then word asc (text/mod.rs:477-500; HashMap tie
    # order replaced by the documented deterministic tie-break).
    kws = extract_keywords_py(
        "quantum mechanics describes particles quantum", 5)
    assert kws == ["quantum", "describes", "mechanics", "particles"]
    # stop words and short words are dropped before counting.
    assert extract_keywords_py("the which of it so up", 5) == []


def test_leaf_and_parent_keywords(spark):
    _, kw = _tree(spark, [
        (1, 0, "quantum mechanics describes particles quantum"),
        (1, 1, "classical physics describes motion"),
    ])
    rows = {(r.level, r.node_idx): r.keywords for r in kw.collect()}
    assert rows[(0, 0)] == ["quantum", "describes", "mechanics",
                            "particles"]
    assert rows[(0, 1)] == ["classical", "describes", "motion",
                            "physics"]
    # parent = 10 lexicographically-smallest distinct child keywords
    # (mod.rs:693-713 sort -> dedup -> truncate(10)).
    assert rows[(1, 0)] == ["classical", "describes", "mechanics",
                            "motion", "particles", "physics", "quantum"]


def test_parent_keywords_truncate_to_ten(spark):
    _, kw = _tree(spark, [
        (1, 0, "aaaa bbbb cccc dddd eeee"),
        (1, 1, "ffff gggg hhhh iiii jjjj"),
        (1, 2, "kkkk llll mmmm nnnn oooo"),
    ])
    rows = {(r.level, r.node_idx): r.keywords for r in kw.collect()}
    assert rows[(1, 0)] == ["aaaa", "bbbb", "cccc", "dddd", "eeee",
                            "ffff", "gggg", "hhhh", "iiii", "jjjj"]


def test_tree_query_scoring(spark):
    tree, kw = _tree(spark, [
        (1, 0, "quantum mechanics describes particles quantum"),
        (1, 1, "classical physics describes motion"),
    ])
    out = tree_query(tree, kw, "quantum physics overview", 10).collect()
    rows = {(r.level, r.node_idx): r.score for r in out}
    # root: 2 keyword hits + 2*(2/3) overlap + 0.5/2 level bonus.
    assert rows[(1, 0)] == pytest.approx(round(2 + 4 / 3 + 0.25, 6))
    # each leaf: 1 hit + 2*(1/3) + 0.5.
    assert rows[(0, 0)] == pytest.approx(round(1 + 2 / 3 + 0.5, 6))
    assert rows[(0, 1)] == rows[(0, 0)]
    # ranked: root first (desc), then leaves tie-broken by node_idx.
    ordered = [(r.level, r.node_idx) for r in out]
    assert ordered == [(1, 0), (0, 0), (0, 1)]


def test_score_threshold_drops_unmatched_deep_nodes(spark):
    # no matches at all: score = level bonus only; level 0 -> 0.5
    # passes the >0.1 cut (mod.rs:875), so all nodes of a tiny tree
    # still appear — verify the bonus-only score.
    tree, kw = _tree(spark, [(1, 0, "alpha beta gamma delta")])
    out = tree_query(tree, kw, "zzzz yyyy", 10).collect()
    assert len(out) == 1
    assert out[0].score == pytest.approx(0.5)
