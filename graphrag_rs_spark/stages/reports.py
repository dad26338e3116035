"""Extractive community reports (reference graph/leiden.rs:146-199,
:571-628 `generate_extractive_reports`; graph/community_report.rs).

Deterministic (no-LLM) path: per community gather members + intra-
community triples, group members by type, take the top names per type by
mention count, format a title/summary, rank by size — all as one
aggregation pipeline; the formatting runs JVM-side via concat/slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOP_NAMES_PER_TYPE = 5  # leiden.rs:168 takes top 5 names per entity type


def community_reports(
    communities: DataFrame,     # (entity_id, level, community)
    entities: DataFrame,        # (entity_id, name, entity_type, mention_count)
    triple_mentions: DataFrame,  # flat (subj, pred, obj)
    min_size: int = 2,
) -> DataFrame:
    """→ (community_id, level, size, n_internal_edges, title, summary, rank).

    rank = community size (leiden.rs ranks by size for extractive mode);
    title = top-2 member names; summary = per-type top member listing.
    """
    members = communities.join(
        entities.select("entity_id", "name", "entity_type", "mention_count"),
        "entity_id")

    sizes = members.groupBy("community", "level").agg(
        F.count(F.lit(1)).alias("size"))

    # intra-community edge counts: both endpoints in the same community
    cmap = communities.select(
        F.col("entity_id").alias("subj"), F.col("community").alias("c_s"),
        F.col("level").alias("level"))
    omap = communities.select(
        F.col("entity_id").alias("obj"), F.col("community").alias("c_o"),
        F.col("level").alias("l_o"))
    internal = (
        triple_mentions.select("subj", "obj").distinct()
        .join(cmap, "subj").join(omap, "obj")
        .filter((F.col("c_s") == F.col("c_o")) & (F.col("level") == F.col("l_o")))
        .groupBy(F.col("c_s").alias("community"), "level")
        .agg(F.count(F.lit(1)).alias("n_internal_edges"))
    )

    w = Window.partitionBy("community", "level", "entity_type").orderBy(
        F.col("mention_count").desc(), F.col("name").asc())
    top_named = members.withColumn("rn", F.row_number().over(w)) \
        .filter(F.col("rn") <= TOP_NAMES_PER_TYPE)

    # collect_list gives no ordering guarantee across aggregation — sort
    # the collected structs explicitly ((-mention_count, name) == the
    # window order above) instead of relying on row order surviving
    per_type = top_named.groupBy("community", "level", "entity_type").agg(
        F.concat_ws(", ", F.transform(
            F.sort_array(F.collect_list(
                F.struct((-F.col("mention_count")).alias("neg_mc"),
                         F.col("name").alias("name")))),
            lambda s: s["name"])).alias("names"))
    type_lines = per_type.groupBy("community", "level").agg(
        F.concat_ws(
            "; ",
            F.sort_array(F.collect_list(
                F.concat(F.col("entity_type"), F.lit(": "), F.col("names"))))
        ).alias("summary"))

    w_all = Window.partitionBy("community", "level").orderBy(
        F.col("mention_count").desc(), F.col("name").asc())
    titles = (
        members.withColumn("rn", F.row_number().over(w_all))
        .filter(F.col("rn") <= 2)
        .groupBy("community", "level")
        .agg(F.concat_ws(" & ", F.sort_array(F.collect_list("name")))
             .alias("title"))
    )

    return (
        sizes.filter(F.col("size") >= min_size)
        .join(titles, ["community", "level"])
        .join(type_lines, ["community", "level"])
        .join(internal, ["community", "level"], "left")
        .select(
            F.col("community").alias("community_id"), "level", "size",
            F.coalesce("n_internal_edges", F.lit(0)).alias("n_internal_edges"),
            "title", "summary",
            F.col("size").cast("double").alias("rank"),
        )
    )
