"""Markdown document-structure parsing (text/parsers/markdown.rs +
text/document_structure.rs) as a corpus-wide batch operator.

The reference parses one document at a time with a mutable stack; here
the whole corpus parses in one pass of windows:

- heading detection (markdown.rs:82-117): a line whose trimmed form is
  1-6 '#'s followed by a space and a non-empty title; level capped at 6,
  '#'-runs of 7+ are NOT headings, '#title' without the space is NOT a
  heading.  Offsets accumulate line length + 1 per line (the
  reference's byte offsets; identical for ASCII — divergence is
  codepoint-based offsets on multibyte text, documented).
- sections (markdown.rs:18-33): content spans from a heading's end to
  the next heading's start (document end for the last).
- hierarchy (markdown.rs:35-72): the reference's monotonic stack —
  parent(i) = the LATEST previous heading with a strictly smaller
  level — is computed without a stack: six per-level running-max
  window columns (`last level-l heading index over rows preceding`)
  and parent = greatest of those below my level.  The stack invariant
  guarantees this is the same answer; windows distribute, stacks don't.
- depth = ancestor count: levels strictly decrease up the chain so
  depth ≤ 5; five bounded self-joins on the (small) headings frame.

One shuffle keyed by doc_id for the windows; headings per document are
bounded, so the self-joins broadcast naturally at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MAX_LEVEL = 6


def markdown_structure(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """→ (doc_id, idx, level, title, line_number, heading_start,
    heading_end, content_start, content_end, parent_idx, depth)."""
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("_t"))
    lines = base.select(
        "doc_id", F.length("_t").alias("_doc_len"),
        F.posexplode(F.split("_t", "\n")).alias("line_number", "line"))
    wdoc = Window.partitionBy("doc_id").orderBy("line_number")
    lines = lines.withColumn(
        "heading_start",
        F.coalesce(F.sum(F.length("line") + 1).over(
            wdoc.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
        .cast("int"))
    trimmed = F.trim(F.col("line"))
    level = F.length(F.regexp_extract(trimmed, "^#+", 0))
    title = F.trim(F.substring(trimmed, level + 1, F.length(trimmed)))
    heads = (lines
             .withColumn("level", level.cast("int"))
             .withColumn("title", title)
             .filter((F.col("level") >= 1) & (F.col("level") <= MAX_LEVEL)
                     & (F.substring(trimmed, F.col("level") + 1,
                                    F.lit(1)) == " ")
                     & (F.length("title") > 0))
             .withColumn("heading_end", (F.col("heading_start")
                                         + F.length("line")).cast("int"))
             .withColumn("_ord", F.col("line_number")))
    return _finish(heads)


def _finish(heads: DataFrame) -> DataFrame:
    """Shared section-span / hierarchy / depth tail: `heads` carries
    (doc_id, _ord, level, title, line_number, heading_start,
    heading_end, _doc_len); `_ord` is the reference's push order."""
    widx = Window.partitionBy("doc_id").orderBy("_ord")
    heads = (heads
             .withColumn("idx", (F.row_number().over(widx) - 1)
                         .cast("int"))
             .withColumn("content_start", F.col("heading_end"))
             .withColumn("content_end", F.coalesce(
                 F.lead("heading_start").over(widx),
                 F.col("_doc_len")).cast("int")))
    prev = Window.partitionBy("doc_id").orderBy("idx") \
        .rowsBetween(Window.unboundedPreceding, -1)
    for lv in range(1, MAX_LEVEL):
        heads = heads.withColumn(
            f"_last{lv}",
            F.coalesce(F.max(F.when(F.col("level") == lv,
                                    F.col("idx"))).over(prev), F.lit(-1)))
    parent = F.lit(-1)
    for lv in range(2, MAX_LEVEL + 1):
        lowers = [F.col(f"_last{j}") for j in range(1, lv)]
        best = lowers[0] if len(lowers) == 1 else F.greatest(*lowers)
        parent = F.when(F.col("level") == lv, best).otherwise(parent)
    heads = (heads.withColumn("parent_idx",
                              F.nullif(parent, F.lit(-1)).cast("int"))
             .select("doc_id", "idx", "level", "title", "line_number",
                     "heading_start", "heading_end", "content_start",
                     "content_end", "parent_idx")
             .localCheckpoint(eager=True))
    # depth: follow parent pointers; levels strictly decrease upward so
    # five bounded hops cover level ≤ 6
    links = heads.select("doc_id", F.col("idx").alias("_a"),
                         F.col("parent_idx").alias("_p"))
    cur = heads.select(
        "doc_id", "idx", F.col("parent_idx").alias("_a"),
        F.col("parent_idx").isNotNull().cast("int").alias("depth"))
    for _ in range(MAX_LEVEL - 2):
        cur = (cur.join(links, ["doc_id", "_a"], "left")
               .select("doc_id", "idx", F.col("_p").alias("_a"),
                       (F.col("depth")
                        + F.col("_p").isNotNull().cast("int"))
                       .alias("depth")))
    return heads.join(cur.select("doc_id", "idx", "depth"),
                      ["doc_id", "idx"])


def html_structure(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """HTML heading structure (text/parsers/html.rs:38-80) — same output
    shape as markdown_structure.

    Reference quirks preserved: per line, levels are scanned 1→6 and at
    most ONE heading per level per line is taken (the FIRST <hN>…</hN>
    pair by lowercased find), so two headings on one line are emitted in
    LEVEL order, not text order; the heading text strips nested tags,
    drops an unclosed trailing '<…' run and bare '>' chars
    (extract_text_content :21-36); tag matching is case-insensitive but
    the title text keeps original case.  A line whose close tag precedes
    its open tag would panic the reference — here it is skipped
    (documented divergence, the only sane batch semantics)."""
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("_t"))
    lines = base.select(
        "doc_id", F.length("_t").alias("_doc_len"),
        F.posexplode(F.split("_t", "\n")).alias("line_number", "line"))
    wdoc = Window.partitionBy("doc_id").orderBy("line_number")
    lines = lines.withColumn(
        "line_start",
        F.coalesce(F.sum(F.length("line") + 1).over(
            wdoc.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
        .cast("int"))
    cand = lines.withColumn(
        "level", F.explode(F.array(*[F.lit(i) for i in
                                     range(1, MAX_LEVEL + 1)])))
    start1 = F.expr(
        "instr(lower(line), '<h' || cast(level as string))")
    end1 = F.expr("instr(lower(line), '</h' || cast(level as string)"
                  " || '>')")
    # first '>' at/after the open tag (1-based within line)
    gt1 = start1 + F.expr(
        "instr(substring(lower(line), "
        "instr(lower(line), '<h' || cast(level as string))), '>')") - 1
    tag_content = F.substring(
        F.col("line"), gt1 + 1, end1 - gt1 - 1)
    text = F.trim(F.regexp_replace(F.regexp_replace(F.regexp_replace(
        tag_content, "<[^>]*>", ""), "<.*$", ""), ">", ""))
    heads = (cand
             .withColumn("_s", start1).withColumn("_e", end1)
             .withColumn("_g", gt1)
             .filter((F.col("_s") > 0) & (F.col("_e") > 0)
                     & (F.col("_g") > F.col("_s"))
                     & (F.col("_e") >= F.col("_g")))
             .withColumn("title", text)
             .filter(F.length("title") > 0)
             .withColumn("heading_start",
                         (F.col("line_start") + F.col("_s") - 1)
                         .cast("int"))
             .withColumn("heading_end",
                         (F.col("line_start") + F.col("_e") - 1 + 4
                          + F.length(F.col("level").cast("string")))
                         .cast("int"))
             .withColumn("_ord", F.col("line_number") * 10
                         + F.col("level"))
             .select("doc_id", "_doc_len", "_ord", "level", "title",
                     "line_number", "heading_start", "heading_end"))
    return _finish(heads)
