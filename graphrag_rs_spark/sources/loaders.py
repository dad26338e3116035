"""S2/S3 — file & tabular document ingestion.

S2 (reference text/parsers/{plaintext,markdown,html}.rs +
corpus/document_manager.rs:36-46 `DocumentType::from_extension`): load a
directory of txt/md/html files into the `documents` shape
(doc_id, title, content, format), stripping markup to plain text.  The
reference's layout parsers additionally extract heading hierarchies
(markdown.rs:17-90); the pipeline consumes plain content, which is what
we produce — headings survive as text lines.  Markup strip is pure
JVM `regexp_replace` chains (Catalyst codegen; no Python).

S3 (reference pipeline/data_import.rs:46-168 `ImportConfig` /
`ColumnMappings` / `DataImporter`): CSV/JSON/TSV import with declared
column→field mappings producing `entities` and `relationships` tables —
`spark.read.csv/json` + `selectExpr`, nothing more (the reference's
row-by-row loop with `max_errors` is a single-node artifact; a malformed
row in Spark is handled by the reader's `mode` option:
PERMISSIVE/DROPMALFORMED/FAILFAST).

The streaming variant (data_import.rs:604-612 `StreamingImporter`) is
`spark.readStream` over the same directory — see streaming/incremental.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# corpus/document_manager.rs:36-46 (pdf/xml are feature-gated in the
# reference and need binary decoders — out of scope, reported as unknown)
_EXT_FORMAT = {"txt": "text", "md": "markdown", "markdown": "markdown",
               "html": "html", "htm": "html", "json": "json"}


def detect_format(filename: Column) -> Column:
    """Lowercased extension → format name (`unknown` if unmapped)."""
    ext = F.lower(F.regexp_extract(filename, r"\.([A-Za-z0-9]+)$", 1))
    expr = F.lit("unknown")
    for e, fmt in reversed(list(_EXT_FORMAT.items())):
        expr = F.when(ext == e, F.lit(fmt)).otherwise(expr)
    return expr


def strip_markdown(col: Column) -> Column:
    """Markdown → plain text (parsers/markdown.rs semantics: structure
    removed, text preserved)."""
    c = F.regexp_replace(col, r"(?s)```.*?```", " ")          # code fences
    c = F.regexp_replace(c, r"`([^`]*)`", r"$1")              # inline code
    c = F.regexp_replace(c, r"!\[([^\]]*)\]\([^)]*\)", r"$1")  # images → alt
    c = F.regexp_replace(c, r"\[([^\]]*)\]\([^)]*\)", r"$1")  # links → text
    c = F.regexp_replace(c, r"(?m)^#{1,6}\s*", "")            # headings
    c = F.regexp_replace(c, r"(?m)^\s*>\s?", "")              # blockquotes
    c = F.regexp_replace(c, r"(?m)^(\s*)[-*+]\s+", r"$1")     # list bullets
    c = F.regexp_replace(c, r"(?m)^\s*([-*_]\s*){3,}$", "")   # hrules
    c = F.regexp_replace(c, r"(\*\*|__)(.*?)\1", r"$2")       # bold
    c = F.regexp_replace(c, r"(\*|_)(.*?)\1", r"$2")          # emphasis
    return F.trim(F.regexp_replace(c, r"[ \t]+", " "))


def strip_html(col: Column) -> Column:
    """HTML → plain text (parsers/html.rs semantics: script/style dropped,
    tags removed, core entities decoded)."""
    c = F.regexp_replace(col, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    c = F.regexp_replace(c, r"(?is)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<br\s*/?>|</p>|</div>|</h[1-6]>", "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    # &amp; decodes LAST: decoding it first would turn escaped entities
    # ('&amp;lt;' — the author writing '&lt;' as text) into '&lt;' and
    # then fabricate '<' markup via the later replacements
    for ent, rep in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"[ \t]+", " ")
    return F.trim(F.regexp_replace(c, r"\s*\n\s*", "\n"))


def load_documents(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of text-like files → (doc_id, title, content, format).

    doc_id = file path; title = file stem (document_manager.rs:236);
    content = markup-stripped text chosen by detected format.  One file =
    one document, read distributed (`wholetext` keeps files intact).
    """
    raw = (
        spark.read.text(path, wholetext=True)
        .select(F.input_file_name().alias("doc_id"),
                F.col("value").alias("raw"))
    )
    fmt = detect_format(F.col("doc_id"))
    content = (
        F.when(fmt == "markdown", strip_markdown(F.col("raw")))
        .when(fmt == "html", strip_html(F.col("raw")))
        .otherwise(F.col("raw"))
    )
    title = F.regexp_extract(F.col("doc_id"), r"([^/\\]+?)(\.[^./\\]+)?$", 1)
    return raw.select("doc_id", title.alias("title"),
                      content.alias("content"), fmt.alias("format"))


@dataclass
class ColumnMappings:
    """pipeline/data_import.rs:72-88 — declared source-column names."""
    entity_id: str
    entity_name: str
    entity_type: str
    relationship_source: str | None = None
    relationship_target: str | None = None
    relationship_type: str | None = None


def import_table(
    spark: SparkSession,
    path: str,
    fmt: str,
    mappings: ColumnMappings,
    mode: str = "PERMISSIVE",
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame | None]:
    """S3 bulk import → (entities, relationships-or-None).

    `fmt` ∈ {csv, tsv, json}; CSV/TSV read with header.  Entities dedup
    by id keeping the first occurrence in file order (the reference
    inserts sequentially into an IndexMap — first write wins).
    """
    if fmt in ("csv", "tsv"):
        reader = spark.read.option("header", True).option("mode", mode) \
            .option("sep", "\t" if fmt == "tsv" else delimiter)
        df = reader.csv(path)
    elif fmt == "json":
        df = spark.read.option("mode", mode).json(path)
    else:
        raise ValueError(f"unsupported import format {fmt!r}")

    m = mappings
    # _ord pins a DETERMINISTIC winner per id: partition index rides the
    # high bits of monotonically_increasing_id, so min_by(_ord) is
    # stable run-to-run where a bare dropDuplicates keeps whichever row
    # the plan touches first.  With a single input file this is
    # first-occurrence-in-file; with several, Spark orders non-bucketed
    # splits by size descending, so the winner is first-in-SPLIT-ORDER,
    # not necessarily first in listing order (acceptable — the
    # reference's HashMap insert keeps an arbitrary-but-single winner
    # too; only determinism matters for parity).
    ordered = df.withColumn("_ord", F.monotonically_increasing_id())
    entities = (
        ordered.select(
            F.col(m.entity_id).cast("string").alias("entity_id"),
            F.col(m.entity_name).cast("string").alias("name"),
            F.col(m.entity_type).cast("string").alias("entity_type"),
            "_ord",
        )
        # the reference skips a row unless id, name AND type are all
        # non-empty (data_import.rs:266)
        .filter((F.col("entity_id").isNotNull()
                 & (F.col("entity_id") != ""))
                & (F.col("name").isNotNull() & (F.col("name") != ""))
                & (F.col("entity_type").isNotNull()
                   & (F.col("entity_type") != "")))
        .groupBy("entity_id")
        .agg(F.min_by(F.struct("name", "entity_type"), "_ord").alias("_w"))
        .select("entity_id", F.col("_w.name").alias("name"),
                F.col("_w.entity_type").alias("entity_type"))
    )
    relationships = None
    if m.relationship_source and m.relationship_target:
        rel_type = (F.col(m.relationship_type).cast("string")
                    if m.relationship_type else F.lit("RELATED_TO"))
        relationships = (
            df.select(
                F.col(m.relationship_source).cast("string").alias("subj"),
                rel_type.alias("pred"),
                F.col(m.relationship_target).cast("string").alias("obj"),
            )
            .filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())
            .dropDuplicates(["subj", "pred", "obj"])
        )
    return entities, relationships
