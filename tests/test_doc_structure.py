"""Golden tests for markdown structure parsing (text/parsers/markdown.rs
+ text/document_structure.rs)."""

from graphrag_rs_spark.operators.doc_structure import markdown_structure
from tests.conftest import spark  # noqa: F401


def _parse(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = markdown_structure(df).collect()
    out = {}
    for r in rows:
        out.setdefault(r.doc_id, {})[r.idx] = r
    return out


MD = "# Title\nintro\n## Sub\nbody\n### Deep\nmore\n## Sub2\nend"


def test_headings_sections_offsets(spark):
    h = _parse(spark, [MD])[0]
    assert [h[i].title for i in range(4)] == ["Title", "Sub", "Deep",
                                              "Sub2"]
    assert [h[i].level for i in range(4)] == [1, 2, 3, 2]
    assert (h[0].heading_start, h[0].heading_end) == (0, 7)
    assert h[0].content_start == 7
    assert h[0].content_end == 14          # next heading's start
    assert h[1].heading_start == 14
    assert h[3].content_end == len(MD)     # last section ends at EOF
    assert [h[i].line_number for i in range(4)] == [0, 2, 4, 6]


def test_hierarchy_stack_semantics(spark):
    h = _parse(spark, [MD])[0]
    assert [h[i].parent_idx for i in range(4)] == [None, 0, 1, 0]
    assert [h[i].depth for i in range(4)] == [0, 1, 2, 1]


def test_invalid_headings_skipped(spark):
    h = _parse(spark, [
        "#nospace\n####### seven\n#\n# \n#  padded\n  ## indented"])[0]
    # only "#  padded" (title trims to "padded") and the
    # whitespace-indented "## indented" (trim_start) are valid
    assert {r.title for r in h.values()} == {"padded", "indented"}


def test_pop_to_root_and_level_jump(spark):
    h = _parse(spark, ["## A\n# B\n## C", "# A\n#### D\n## E"])
    a = h[0]
    assert (a[0].parent_idx, a[0].depth) == (None, 0)   # no lower level
    assert (a[1].parent_idx, a[1].depth) == (None, 0)
    assert (a[2].parent_idx, a[2].depth) == (1, 1)      # latest lower
    b = h[1]
    assert (b[1].parent_idx, b[1].depth) == (0, 1)      # # → ####
    assert (b[2].parent_idx, b[2].depth) == (0, 1)      # pops the ####


def test_no_headings_empty(spark):
    assert _parse(spark, ["plain text\nno headings here"]) == {}


HTML = ('<h1>Top</h1>\n'
        'para text\n'
        '<div><h2 class="x">Mid <b>bold</b></h2></div>\n'
        '<h3>Three</h3><h2>Two</h2>\n'
        '<h4>unclosed\n'
        '<h5></h5>\n'
        '<H1>CAPS</H1>')


def test_html_headings_and_quirks(spark):
    from graphrag_rs_spark.operators.doc_structure import html_structure
    df = spark.createDataFrame([(0, HTML)], "doc_id long, text string")
    h = {r.idx: r for r in html_structure(df).collect()}
    # line 3 has <h3> before <h2> but the reference scans levels 1→6,
    # so the h2 is pushed first; unclosed h4 and empty h5 are skipped;
    # uppercase <H1> matches case-insensitively, title keeps case
    assert [(h[i].title, h[i].level) for i in range(5)] == [
        ("Top", 1), ("Mid bold", 2), ("Two", 2), ("Three", 3),
        ("CAPS", 1)]
    assert h[0].heading_start == 0
    assert h[0].heading_end == len("<h1>Top</h1>")
    assert [h[i].parent_idx for i in range(5)] == [None, 0, 0, 2, None]
    assert [h[i].depth for i in range(5)] == [0, 1, 1, 2, 0]


def test_html_offsets_and_sections(spark):
    from graphrag_rs_spark.operators.doc_structure import html_structure
    df = spark.createDataFrame([(0, HTML)], "doc_id long, text string")
    h = {r.idx: r for r in html_structure(df).collect()}
    line3_start = len("<h1>Top</h1>\npara text\n"
                      '<div><h2 class="x">Mid <b>bold</b></h2></div>\n')
    assert h[2].heading_start == line3_start + len("<h3>Three</h3>")
    assert h[3].heading_start == line3_start
    # content spans follow PUSH order: h2(idx2) → next is h3(idx3)
    assert h[2].content_end == h[3].heading_start
    assert h[4].content_end == len(HTML)
