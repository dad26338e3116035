"""Pipeline phase validation (evaluation/pipeline_validation.rs).

The reference validates ONE document's chunks / one entity list at a
time on the driver (pipeline_validation.rs:45-152 document processing,
:160-277 entity extraction, :285-387 relationship extraction, :395-484
graph construction, :504-533 report).  Here the same checks run over
whole TABLES: document-processing validation is a per-document groupBy
(one row per doc, every check replayed), and the entity /
relationship / graph phases reduce to a handful of global aggregates
cross-joined into one row and exploded into check/metric records — so
validating a 100 TB pipeline output costs two partial-aggregate passes
and two anti-joins, not a driver loop.

Checks replayed quirk-for-quirk:
- document processing (:50-143): non-empty doc, >=1 chunk, chunk-char
  coverage >= 0.9 (checked only when chunks exist), zero empty-trim
  chunks, metadata enrichment (always passes; ratio is a metric —
  chapter set OR keywords non-empty OR summary set, :107-114);
  avg_chunk_size uses the reference's max(1) denominator (:139-141).
- entity extraction (:165-258): entities present, confidence in
  [0,1], non-empty entity_type, non-empty trimmed name, mentions
  reference existing chunks (anti-join); metrics entities_count,
  avg_confidence, avg_mentions_per_entity.
- relationship extraction (:290-376): relationships present (only
  checked when entities exist), confidence valid, relation_type
  non-empty, both endpoints exist in the entity id set (anti-join);
  metrics relationships_count, relationships_per_entity,
  avg_relationship_confidence.
- graph construction (:405-467): graph non-empty, entities/chunk in
  [0.1, 10] (when chunks>0), relationships/entity > 0.1 (when
  entities>1).
- report (:504-533): overall = every phase passed; passed-check and
  total-check counts.

Documented divergences: f64 for f32 (confidences here are synthesized
as exact k/64 multiples in the contract query, so cross-engine sums
are exact); floats rounded 6 dp at output (emitted, never ranked);
mention lists are modeled as a (entity row → mentions table) relation,
the natural relational form of the reference's `Entity.mentions` Vec.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def validate_document_processing(
    documents: DataFrame,
    chunks: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document replay of DocumentProcessingValidator::validate →
    (doc_id, n_chunks, coverage, empty_chunks, metadata_ratio,
    avg_chunk_size, passed).  chunks needs (doc_id, content, chapter,
    keywords, summary)."""
    per_doc = chunks.groupBy(doc_id).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.length("content")).alias("_chars"),
        F.sum((F.trim(F.col("content")) == "").cast("int")).alias("_empty"),
        F.sum((F.col("chapter").isNotNull()
               | (F.size("keywords") > 0)
               | F.col("summary").isNotNull()).cast("int")).alias("_meta"))
    j = documents.select(doc_id, F.length(text_col).alias("_dlen")) \
        .join(per_doc, doc_id, "left")
    n = F.coalesce(F.col("_n"), F.lit(0))
    coverage = F.when(
        n > 0, F.col("_chars").cast("double") / F.col("_dlen"))
    passed = ((F.col("_dlen") > 0) & (n > 0)
              & F.coalesce(coverage >= 0.9, F.lit(False))
              & (F.coalesce(F.col("_empty"), F.lit(0)) == 0))
    return j.select(
        F.col(doc_id),
        n.alias("n_chunks"),
        F.round(coverage, 6).alias("coverage"),
        F.coalesce(F.col("_empty"), F.lit(0)).alias("empty_chunks"),
        F.round(F.when(n > 0, F.col("_meta").cast("double") / n)
                .otherwise(0.0), 6).alias("metadata_ratio"),
        F.round(F.coalesce(F.col("_chars"), F.lit(0)).cast("double")
                / F.greatest(n, F.lit(1)), 6).alias("avg_chunk_size"),
        passed.cast("int").alias("passed"),
    )


def _rows(*specs) -> Column:
    """(phase, item, kind, passed_col_or_None, value_col) structs."""
    out = []
    for phase, item, kind, passed, value in specs:
        out.append(F.struct(
            F.lit(phase).alias("phase"),
            F.lit(item).alias("item"),
            F.lit(kind).alias("kind"),
            (F.lit(None).cast("int") if passed is None
             else passed.cast("int")).alias("passed"),
            F.round(value.cast("double"), 6).alias("value")))
    return F.array(*out)


def pipeline_validation_report(
    documents: DataFrame,
    chunks: DataFrame,
    entities: DataFrame,
    mentions: DataFrame,
    relationships: DataFrame,
) -> DataFrame:
    """Entity / relationship / graph phase checks + the overall report
    as (phase, item, kind, passed, value) records.  Expects entities
    (entity_id, name, entity_type, confidence), mentions (entity_id,
    chunk_id), relationships (source, target, relation_type,
    confidence), chunks (doc_id, chunk_id, ...)."""
    ent_agg = entities.agg(
        F.count(F.lit(1)).alias("ne"),
        F.sum(((F.col("confidence") < 0.0)
               | (F.col("confidence") > 1.0)).cast("int")).alias("e_badc"),
        F.sum((F.col("entity_type") == "").cast("int")).alias("e_notype"),
        F.sum((F.trim(F.col("name")) == "").cast("int")).alias("e_noname"),
        F.sum(F.col("confidence").cast("double")).alias("e_csum"))
    bad_mentions = (mentions
                    .join(chunks.select("chunk_id").distinct(),
                          "chunk_id", "left_anti")
                    .agg(F.count(F.lit(1)).alias("m_bad")))
    n_mentions = mentions.agg(F.count(F.lit(1)).alias("nm"))
    eids = entities.select(F.col("entity_id").alias("_id")).distinct()
    orphans = (relationships
               .join(eids.withColumnRenamed("_id", "source"),
                     "source", "left_anti")
               .select("source", "target")
               .unionAll(relationships
                         .join(eids.withColumnRenamed("_id", "target"),
                               "target", "left_anti")
                         .join(eids.withColumnRenamed("_id", "source"),
                               "source", "left_semi")
                         .select("source", "target"))
               .agg(F.count(F.lit(1)).alias("r_orphan")))
    rel_agg = relationships.agg(
        F.count(F.lit(1)).alias("nr"),
        F.sum(((F.col("confidence") < 0.0)
               | (F.col("confidence") > 1.0)).cast("int")).alias("r_badc"),
        F.sum((F.col("relation_type") == "").cast("int")).alias("r_notype"),
        F.sum(F.col("confidence").cast("double")).alias("r_csum"))
    counts = documents.agg(F.count(F.lit(1)).alias("nd")).crossJoin(
        chunks.agg(F.count(F.lit(1)).alias("nc")))

    row = (ent_agg.crossJoin(bad_mentions).crossJoin(n_mentions)
           .crossJoin(orphans).crossJoin(rel_agg).crossJoin(counts))

    ne, nr, nc, nd = F.col("ne"), F.col("nr"), F.col("nc"), F.col("nd")
    # try_divide, not '/': ANSI mode (Spark 4 default) throws
    # DIVIDE_BY_ZERO on exactly the empty-table states these checks are
    # designed to REPORT.  NULL ratios feed ORs whose other disjunct is
    # true precisely when the denominator is 0 (nc==0 / ne<=1), so the
    # pass flags stay well-defined and the metric rows carry NULL.
    epc = F.try_divide(ne.cast("double"), nc)
    conn = F.try_divide(nr.cast("double"), ne)
    # Per-phase pass flags (pipeline_validation.rs:143,268,378,475).
    ent_ok = ((ne > 0) & (F.col("e_badc") == 0) & (F.col("e_notype") == 0)
              & (F.col("e_noname") == 0) & (F.col("m_bad") == 0))
    rel_ok = ((nr > 0) & (F.col("r_badc") == 0) & (F.col("r_notype") == 0)
              & (F.col("r_orphan") == 0))
    graph_ok = (((ne > 0) | (nd > 0))
                & ((nc == 0) | ((epc >= 0.1) & (epc <= 10.0)))
                & ((ne <= 1) | (conn > 0.1)))
    n_checks = F.lit(12)
    n_passed = (
        (ne > 0).cast("int") + (F.col("e_badc") == 0).cast("int")
        + (F.col("e_notype") == 0).cast("int")
        + (F.col("e_noname") == 0).cast("int")
        + (F.col("m_bad") == 0).cast("int")
        + (nr > 0).cast("int") + (F.col("r_badc") == 0).cast("int")
        + (F.col("r_notype") == 0).cast("int")
        + (F.col("r_orphan") == 0).cast("int")
        + ((ne > 0) | (nd > 0)).cast("int")
        + ((nc == 0) | ((epc >= 0.1) & (epc <= 10.0))).cast("int")
        + ((ne <= 1) | (conn > 0.1)).cast("int"))

    rows = _rows(
        ("entity", "entities_extracted", "check", ne > 0, ne),
        ("entity", "confidence_scores_valid", "check",
         F.col("e_badc") == 0, F.col("e_badc")),
        ("entity", "entity_types_populated", "check",
         F.col("e_notype") == 0, F.col("e_notype")),
        ("entity", "entity_names_valid", "check",
         F.col("e_noname") == 0, F.col("e_noname")),
        ("entity", "entity_mentions_valid", "check",
         F.col("m_bad") == 0, F.col("m_bad")),
        ("entity", "entities_count", "metric", None, ne),
        ("entity", "avg_confidence", "metric", None,
         F.try_divide(F.col("e_csum"), ne)),
        ("entity", "avg_mentions_per_entity", "metric", None,
         F.try_divide(F.col("nm").cast("double"), ne)),
        ("relationship", "relationships_extracted", "check", nr > 0, nr),
        ("relationship", "relationship_confidence_valid", "check",
         F.col("r_badc") == 0, F.col("r_badc")),
        ("relationship", "relationship_types_populated", "check",
         F.col("r_notype") == 0, F.col("r_notype")),
        ("relationship", "relationship_entities_exist", "check",
         F.col("r_orphan") == 0, F.col("r_orphan")),
        ("relationship", "relationships_count", "metric", None, nr),
        ("relationship", "relationships_per_entity", "metric", None,
         conn),
        ("relationship", "avg_relationship_confidence", "metric", None,
         F.try_divide(F.col("r_csum"), nr)),
        ("graph", "graph_not_empty", "check", (ne > 0) | (nd > 0),
         ne + nd),
        ("graph", "entity_chunk_ratio_reasonable", "check",
         (nc == 0) | ((epc >= 0.1) & (epc <= 10.0)), epc),
        ("graph", "graph_connectivity", "check",
         (ne <= 1) | (conn > 0.1), conn),
        ("graph", "documents", "metric", None, nd),
        ("graph", "chunks", "metric", None, nc),
        ("graph", "entities", "metric", None, ne),
        ("graph", "relationships", "metric", None, nr),
        ("pipeline", "entity_phase", "phase", ent_ok, F.lit(5)),
        ("pipeline", "relationship_phase", "phase", rel_ok, F.lit(4)),
        ("pipeline", "graph_phase", "phase", graph_ok, F.lit(3)),
        ("pipeline", "overall", "phase", ent_ok & rel_ok & graph_ok,
         n_passed),
        ("pipeline", "total_checks", "metric", None, n_checks),
    )
    return row.select(F.explode(rows).alias("r")).select("r.*")
