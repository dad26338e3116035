"""Q11 — hierarchical document-tree summarization (reference
summarization/mod.rs:179-934 `HierarchicalSummarizer`).

The reference builds a per-document tree bottom-up: leaves are chunks,
each internal node summarizes `fanout` children, the root is the
document summary; querying walks the tree top-down.  The reference's
node summaries come from an LLM; our deterministic extractive stand-in
takes the first sentence of each child (the reference's own extractive
fallback style, text/extractive_summarizer.rs) and concatenates.

Spark shape: one DataFrame per level, built by a driver loop of
`groupBy(doc_id, node_idx / fanout)` aggregations — O(log_fanout
max-chunks-per-doc) levels, each one shuffle partitioned by doc_id.
Object aggregation per group is bounded by `fanout` short strings, so
the map-side hash agg never blows up regardless of document count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FIRST_SENTENCE_RE = r"^\s*(.*?[.!?])(?:\s|$)"


def _first_sentence(col: F.Column, max_len: int) -> F.Column:
    sent = F.regexp_extract(col, FIRST_SENTENCE_RE, 1)
    return F.substring(
        F.when(F.length(sent) > 0, sent).otherwise(col), 1, max_len)


def hierarchical_summary(
    chunks: DataFrame,
    fanout: int = 4,
    max_len: int = 600,
    max_levels: int = 12,
) -> DataFrame:
    """→ (doc_id, level, node_idx, summary, n_leaves) for every tree node.

    `chunks` needs (doc_id, chunk_seq, content).  Level 0 = the chunks
    themselves; the highest level has exactly one node per document.
    Deterministic: children are ordered by node_idx at every level.
    """
    if fanout < 2:
        raise ValueError("fanout must be >= 2 to make progress")

    leaves = chunks.select(
        "doc_id",
        F.col("chunk_seq").cast("long").alias("node_idx"),
        F.lit(0).alias("level"),
        F.col("content").alias("summary"),
        F.lit(1).cast("long").alias("n_leaves"),
    ).localCheckpoint(eager=True)

    levels = [leaves]
    cur = leaves
    for lvl in range(1, max_levels + 1):
        counts = cur.groupBy("doc_id").count()
        widest = counts.agg(
            F.coalesce(F.max("count"), F.lit(0))).collect()[0][0]
        if widest <= 1:
            break
        # docs already reduced to one node are done — drop them from the
        # loop so they aren't pointlessly re-summarized every level
        active = cur.join(
            counts.filter(F.col("count") > 1).select("doc_id"), "doc_id")
        parents = (
            active.groupBy("doc_id",
                        F.floor(F.col("node_idx") / fanout).alias("pidx"))
            .agg(
                F.concat_ws(" ", F.transform(
                    F.sort_array(F.collect_list(F.struct(
                        F.col("node_idx").alias("idx"),
                        _first_sentence(F.col("summary"), max_len)
                        .alias("s")))),
                    lambda x: x["s"])).alias("summary"),
                F.sum("n_leaves").alias("n_leaves"),
            )
            .select("doc_id", F.col("pidx").alias("node_idx"),
                    F.lit(lvl).alias("level"),
                    F.substring("summary", 1, max_len).alias("summary"),
                    "n_leaves")
            .localCheckpoint(eager=True)
        )
        levels.append(parents)
        cur = parents

    out = levels[0]
    for df in levels[1:]:
        out = out.unionByName(df)
    return out


def document_summaries(tree: DataFrame) -> DataFrame:
    """Root node per document (the document-level summary)."""
    top = tree.groupBy("doc_id").agg(F.max("level").alias("level"))
    return tree.join(top, ["doc_id", "level"]).select(
        "doc_id", "summary", "n_leaves")
