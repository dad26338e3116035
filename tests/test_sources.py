"""S2/S3 file & tabular loaders, Q4 query analysis."""

from __future__ import annotations

import os

import pytest

from graphrag_rs_spark.sources.loaders import (
    ColumnMappings, import_table, load_documents)
from graphrag_rs_spark.retrieval.query_analysis import analyze_query


@pytest.fixture(scope="module")
def doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    (d / "plain.txt").write_text("Alice met Bob at Acme Corp.\nSecond line.")
    (d / "guide.md").write_text(
        "# Title\n\nSome **bold** and *em* text with [a link](http://x) "
        "and `code`.\n\n- item one\n- item two\n\n```\nfenced code\n```\n"
        "> quoted\n")
    (d / "page.html").write_text(
        "<html><head><style>p{color:red}</style>"
        "<script>var x=1;</script></head>"
        "<body><h1>Header</h1><p>Para one &amp; more.</p>"
        "<p>Tom &lt;3 Jerry</p><!-- hidden --></body></html>")
    return str(d)


def test_load_documents_formats_and_strip(spark, doc_dir):
    docs = {r["title"]: r for r in load_documents(spark, doc_dir).collect()}
    assert set(docs) == {"plain", "guide", "page"}
    assert docs["plain"]["format"] == "text"
    assert "Alice met Bob" in docs["plain"]["content"]
    md = docs["guide"]
    assert md["format"] == "markdown"
    for gone in ("#", "**", "](", "`", "fenced"):
        assert gone not in md["content"]
    for kept in ("Title", "bold", "em", "a link", "item one", "quoted"):
        assert kept in md["content"]
    html = docs["page"]
    assert html["format"] == "html"
    for gone in ("<p>", "<h1>", "</", "var x", "color:red", "hidden"):
        assert gone not in html["content"]     # tags/script/style/comments
    assert "Para one & more." in html["content"]   # &amp; decoded
    assert "Tom <3 Jerry" in html["content"]       # &lt; decoded
    assert "Header" in html["content"]


def test_import_table_csv_with_relationships(spark, tmp_path):
    p = tmp_path / "ents.csv"
    p.write_text(
        "id,label,kind,src,dst,rel\n"
        "e1,Alice,PERSON,e1,e2,KNOWS\n"
        "e2,Acme,ORG,e2,e1,EMPLOYS\n"
        "e2,AcmeDup,ORG,,,\n"          # duplicate id → first wins
        ",NoId,ORG,,,\n")              # null id dropped
    ents, rels = import_table(
        spark, str(p), "csv",
        ColumnMappings(entity_id="id", entity_name="label",
                       entity_type="kind", relationship_source="src",
                       relationship_target="dst", relationship_type="rel"))
    e = {r["entity_id"]: r for r in ents.collect()}
    assert set(e) == {"e1", "e2"}
    assert e["e1"]["name"] == "Alice" and e["e1"]["entity_type"] == "PERSON"
    r = {(x["subj"], x["pred"], x["obj"]) for x in rels.collect()}
    assert r == {("e1", "KNOWS", "e2"), ("e2", "EMPLOYS", "e1")}


def test_import_table_json_entities_only(spark, tmp_path):
    p = tmp_path / "ents.json"
    p.write_text('{"eid": "a", "n": "Ann", "t": "PERSON"}\n'
                 '{"eid": "b", "n": "Bee Corp", "t": "ORG"}\n')
    ents, rels = import_table(
        spark, str(p), "json",
        ColumnMappings(entity_id="eid", entity_name="n", entity_type="t"))
    assert rels is None
    assert ents.count() == 2


def test_analyze_query_rules():
    names = ["Alice", "Acme Corp"]
    a = analyze_query("how do Alice and Acme relate", names)
    assert a.query_type == "Relationship"          # 2 entities detected
    assert a.intent == "Detailed"                  # no intent keyword → default
    assert analyze_query("alice overview", names).intent == "Overview"

    b = analyze_query("alice", names)
    assert b.query_type == "EntityFocused"
    c = analyze_query("the theory of relativity", [])
    assert c.query_type == "Conceptual"
    d = analyze_query("explain gravity", [])
    assert d.query_type == "Exploratory"
    e = analyze_query("gravity波", [])
    assert e.query_type == "Factual"
    f = analyze_query("compare gravity versus magnetism", [])
    assert f.intent == "Comparative"
    g = analyze_query("why did it happen", [])
    assert g.intent == "Causal"
    # complexity: words*0.1 + entities*0.3 + concepts*0.2 capped at 1
    h = analyze_query("alice", names)
    assert h.complexity_score == pytest.approx(0.1 + 0.3)
