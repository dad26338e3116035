"""RRF/weighted fusion, concept co-occurrence, personalized PageRank,
JSON graph export round-trip."""

import math

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.retrieval.fusion import (rrf_fuse, weighted_fuse,
                                                concept_cooccurrence)
from graphrag_rs_spark.algos.pagerank import pagerank


def test_rrf(spark):
    a = spark.createDataFrame(
        [("d1", 0.9), ("d2", 0.8), ("d3", 0.1)], "doc_id string, score double")
    b = spark.createDataFrame(
        [("d2", 0.95), ("d4", 0.5)], "doc_id string, score double")
    fused = {r["id"]: r["rrf_score"] for r in rrf_fuse([a, b], k=60).collect()}
    # d2 appears rank2 in a and rank1 in b → top fused
    assert fused["d2"] == max(fused.values())
    assert math.isclose(fused["d2"], 1 / 62 + 1 / 61, rel_tol=1e-6)
    assert math.isclose(fused["d1"], 1 / 61, rel_tol=1e-6)


def test_weighted_fuse(spark):
    vec = spark.createDataFrame(
        [("d1", 1.0), ("d2", 0.5)], "doc_id string, score double")
    bm = spark.createDataFrame(
        [("d2", 1.0), ("d3", 0.9)], "doc_id string, score double")
    out = {r["id"]: r for r in weighted_fuse(
        {"vector": vec, "bm25": bm},
        {"vector": 0.6, "bm25": 0.4}, top_k=10).collect()}
    assert math.isclose(out["d1"]["fused_score"], 0.6, rel_tol=1e-9)
    assert math.isclose(out["d2"]["fused_score"], 0.4, rel_tol=1e-9)
    assert out["d2"]["sources"] == ["bm25", "vector"]


def test_concept_cooccurrence(spark):
    rows = [("apple", "c1"), ("banana", "c1"), ("apple", "c2"),
            ("banana", "c2"), ("cherry", "c2"), ("apple", "c2")]
    df = spark.createDataFrame(rows, "item string, container string")
    pairs = {(r["item_a"], r["item_b"]): r["n_shared"]
             for r in concept_cooccurrence(df, min_count=2).collect()}
    assert pairs == {("apple", "banana"): 2}


def test_personalized_pagerank(spark):
    # star: center h connected to a,b,c; personalize on 'a'
    edges = spark.createDataFrame(
        [("h", "a"), ("a", "h"), ("h", "b"), ("b", "h"), ("h", "c"),
         ("c", "h")], "src string, dst string")
    reset = spark.createDataFrame([("a", 1.0)], "node string, weight double")
    pr = {r["node"]: r["rank"]
          for r in pagerank(edges, iterations=20, reset=reset).collect()}
    # teleport mass concentrates around 'a' and the hub
    assert pr["a"] > pr["b"]
    assert math.isclose(pr["b"], pr["c"], rel_tol=1e-9)
    assert math.isclose(sum(pr.values()), 1.0, rel_tol=1e-6)
    # uniform PPR == plain pagerank
    uni = spark.createDataFrame(
        [(n, 1.0) for n in ("h", "a", "b", "c")], "node string, weight double")
    pr_u = {r["node"]: r["rank"]
            for r in pagerank(edges, iterations=20, reset=uni).collect()}
    pr_plain = {r["node"]: r["rank"]
                for r in pagerank(edges, iterations=20).collect()}
    for n in pr_u:
        assert math.isclose(pr_u[n], pr_plain[n], rel_tol=1e-9)


@pytest.fixture(scope="module")
def dual_corpora(spark):
    high = spark.createDataFrame(
        [("d1", "databases overview and storage themes"),
         ("d2", "networking themes and routing overview"),
         ("d3", "storage compression themes")],
        "doc_id string, text string")
    low = spark.createDataFrame(
        [("d1", "postgres postgres btree index details"),
         ("d2", "router firmware packet details"),
         ("d4", "btree split algorithm details postgres")],
        "doc_id string, text string")
    return high, low


def test_dual_retrieve_interleave_alternates_and_dedups(dual_corpora):
    from graphrag_rs_spark.retrieval.dual import dual_retrieve
    high, low = dual_corpora
    out = dual_retrieve(high, low, ["storage", "themes"],
                        ["postgres", "details"], top_k=6).collect()
    rows = sorted(out, key=lambda r: r["rank"])
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids))          # id-dedup
    assert rows[0]["level"] == "high"         # interleave starts high
    assert rows[1]["level"] == "low"
    levels = {r["level"] for r in rows}
    assert levels == {"high", "low"}


def test_dual_retrieve_order_strategies(dual_corpora):
    from graphrag_rs_spark.retrieval.dual import dual_retrieve
    high, low = dual_corpora
    hf = [r["level"] for r in sorted(
        dual_retrieve(high, low, ["themes"], ["details"], top_k=6,
                      strategy="high_first").collect(),
        key=lambda r: r["rank"])]
    assert hf == sorted(hf, key=lambda lv: lv != "high")
    lf = [r["level"] for r in sorted(
        dual_retrieve(high, low, ["themes"], ["details"], top_k=6,
                      strategy="low_first").collect(),
        key=lambda r: r["rank"])]
    assert lf == sorted(lf, key=lambda lv: lv != "low")


def test_dual_retrieve_weighted_reorders(dual_corpora):
    from graphrag_rs_spark.retrieval.dual import dual_retrieve
    high, low = dual_corpora
    out = sorted(
        dual_retrieve(high, low, ["themes"], ["details"], top_k=6,
                      strategy="weighted", high_weight=0.01,
                      low_weight=0.99).collect(),
        key=lambda r: r["rank"])
    assert out[0]["level"] == "low"    # crushing the high weight


def test_split_keywords_reference_fallback():
    from graphrag_rs_spark.retrieval.dual import split_keywords
    high, low = split_keywords("Who wrote the storage layer for Globex")
    assert high == []                  # reference fallback: all → low
    assert low == ["wrote", "storage", "layer", "globex"]
    high, low = split_keywords(
        "Who wrote the storage layer for Globex",
        entity_names={"globex"})
    assert low == ["globex"]
    assert "storage" in high and "globex" not in high


def test_export_roundtrip(spark, tmp_path):
    from graphrag_rs_spark.stages.export import (export_graph_json,
                                                 load_graph_json)
    from graphrag_rs_spark.stages.pipeline import run_pipeline
    from graphrag_rs_spark.datagen import generate_rows
    rows = generate_rows(10, seed=42, max_turns=10)
    res = run_pipeline(spark, spark.createDataFrame(rows))
    path = str(tmp_path / "graph.json")
    counts = export_graph_json(
        res.canonical_entities, res.canonical_triples, res.chunks, path)
    assert counts["entities"] > 0 and counts["relationships"] > 0
    ents, rels = load_graph_json(spark, path)
    assert ents.count() == counts["entities"]
    assert rels.count() == counts["relationships"]
    got = {(r["source_id"], r["relation_type"], r["target_id"])
           for r in rels.collect()}
    want = {(r["subj"], r["pred"], r["obj"])
            for r in res.canonical_triples.collect()}
    assert got == want
