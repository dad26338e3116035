"""Corpus-level knowledge graph rollup (corpus/knowledge_graph.rs).

The reference builds a global KG on the driver from entity-linking
clusters (knowledge_graph.rs:103-330): one GlobalEntity per cluster
with an importance score, co-occurrence relations between clusters
sharing a document, and corpus statistics.  Here the same rollup is
three DataFrame aggregations over a flat `members` table
(cluster_id, canonical_name, entity_type, document_id, name) — the
relational form of the reference's Vec<EntityCluster>:

- global_entities (:150-184): per-cluster mention count, document
  frequency (= member count, the exact-match linker's :171 quirk),
  distinct-document spread, distinct-alias count, and importance
  (:277-292)  (ln(df)+1)·0.4 + (ln(tm)+1)·0.3 + spread·0.3, all /3.
- cross_doc_relations (:188-258): per-document cluster pairs rolled
  up corpus-wide; document_frequency counts sharing docs and
  confidence follows the reference's accumulate-0.1-per-extra-doc
  rule as the closed form min(0.7 + 0.1·(docs−1), 1).
- corpus_kg_stats (:293-330): totals, cross- vs single-document
  entities, avg connections 2·R/E, density R/(E·(E−1)/2), and the
  reference's documented largest-component simplification (= node
  count, :324-333).

NO libm in either engine's plan: ln() values come from a Python-
generated (n, round(ln(n)·1e6)) dimension joined by count — Java
Math.log and C libm log differ in the last ulp, which is exactly the
cross-engine-hash failure mode this repo bans.  The dim covers
1..LN_CAP and counts clamp to the cap (extend the cap at real scale;
it is O(cap) tiny broadcast rows).

Documented divergences: f64 for f32 (and the relation-confidence
closed form replaces the reference's f32 += 0.1 accumulation);
relation pairs are canonicalized (a < b, per-document DISTINCT
clusters) where the reference's HashMap iteration order can emit
either direction, duplicate-member double-counts, and even self-loops
nondeterministically; floats rounded 6 dp at output.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

LN_CAP = 8192


def ln_micro_rows(cap: int = LN_CAP) -> list[tuple[int, int]]:
    """(n, round(ln(n)*1e6)) for n in 1..cap — the shared no-libm log
    dimension; the DuckDB oracle embeds the SAME rows as literals."""
    return [(n, round(math.log(n) * 1_000_000)) for n in range(1, cap + 1)]


def _with_ln(df: DataFrame, spark, col: str, out: str) -> DataFrame:
    dim = spark.createDataFrame(ln_micro_rows(), "n int, lnm bigint")
    clamped = F.least(F.col(col), F.lit(LN_CAP)).cast("int")
    return (df.withColumn("_lnk", clamped)
            .join(F.broadcast(dim), F.col("_lnk") == F.col("n"))
            .drop("n", "_lnk")
            .withColumnRenamed("lnm", out))


def global_entities(members: DataFrame) -> DataFrame:
    """→ one row per cluster (knowledge_graph.rs:150-184)."""
    spark = members.sparkSession
    agg = members.groupBy("cluster_id").agg(
        F.min("canonical_name").alias("canonical_name"),
        F.min("entity_type").alias("entity_type"),
        F.count(F.lit(1)).alias("total_mentions"),
        F.countDistinct("document_id").alias("spread"),
        F.countDistinct("name").alias("n_aliases"))
    # exact-match linking quirk (entity_linker.rs:171): cluster
    # document_frequency is the MEMBER count, not the distinct-doc count.
    agg = agg.withColumn("document_frequency", F.col("total_mentions"))
    agg = _with_ln(agg, spark, "document_frequency", "_ln_df")
    agg = _with_ln(agg, spark, "total_mentions", "_ln_tm")
    importance = (
        (F.col("_ln_df") / 1000000.0 + 1.0) * 0.4
        + (F.col("_ln_tm") / 1000000.0 + 1.0) * 0.3
        + F.col("spread") * 0.3) / 3.0
    return agg.select(
        "cluster_id", "canonical_name", "entity_type",
        "document_frequency", "total_mentions", "spread", "n_aliases",
        F.round(importance, 6).alias("importance"),
        (F.col("document_frequency") > 1).cast("int")
        .alias("is_cross_document"))


def cross_doc_relations(members: DataFrame) -> DataFrame:
    """→ (source, target, relation_type, document_frequency,
    confidence) — knowledge_graph.rs:188-258 rolled up corpus-wide.
    Pairs are per-document DISTINCT clusters with source < target
    (canonicalized; see module docstring)."""
    de = members.select("document_id",
                        F.col("cluster_id").alias("c")).distinct()
    pairs = (de.alias("a")
             .join(de.alias("b"),
                   (F.col("a.document_id") == F.col("b.document_id"))
                   & (F.col("a.c") < F.col("b.c")))
             .select(F.col("a.document_id").alias("document_id"),
                     F.col("a.c").alias("source"),
                     F.col("b.c").alias("target")))
    rolled = pairs.groupBy("source", "target").agg(
        F.count(F.lit(1)).alias("document_frequency"))
    conf = F.least(
        0.7 + (F.col("document_frequency") - 1) * 0.1, F.lit(1.0))
    return rolled.select(
        "source", "target", F.lit("co_occurs").alias("relation_type"),
        "document_frequency", F.round(conf, 6).alias("confidence"))


def corpus_kg_stats(
    entities: DataFrame,
    relations: DataFrame,
) -> DataFrame:
    """→ one GraphStats row (knowledge_graph.rs:293-330), including
    the reference's largest-component = node-count simplification."""
    ea = entities.agg(
        F.count(F.lit(1)).alias("total_entities"),
        F.sum("is_cross_document").alias("cross_document_entities"))
    ra = relations.agg(F.count(F.lit(1)).alias("total_relations"))
    row = ea.crossJoin(ra)
    ne, nr = F.col("total_entities"), F.col("total_relations")
    return row.select(
        ne.cast("int").alias("total_entities"),
        nr.cast("int").alias("total_relations"),
        F.col("cross_document_entities").cast("int")
        .alias("cross_document_entities"),
        (ne - F.col("cross_document_entities")).cast("int")
        .alias("single_document_entities"),
        F.round(F.when(ne > 0, (nr * 2).cast("double") / ne)
                .otherwise(0.0), 6).alias("avg_entity_connections"),
        F.round(F.when(ne > 1,
                       nr.cast("double") / (ne * (ne - 1) / 2))
                .otherwise(0.0), 6).alias("graph_density"),
        ne.cast("int").alias("largest_component_size"),
    )
