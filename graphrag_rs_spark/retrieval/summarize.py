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


# ---------------------------------------------------------------- tree query
# DocumentTree::query (summarization/mod.rs:867-930): score every tree
# node against a query and return the top-k.  Node keywords follow the
# reference's construction — leaves get frequency keywords of their
# content (text/mod.rs:477-500, top-5 by count; HashMap tie order is
# nondeterministic there, here ties break word-ascending, documented),
# internal nodes take the 10 lexicographically-smallest DISTINCT
# keywords of their children (mod.rs:693-713 sort→dedup→truncate(10)).
# Keyword extraction runs IN-ROW (array ops, no explode/groupBy); the
# per-level merge reuses the tree's own groupBy(doc_id, idx/fanout)
# shape — O(levels) bounded shuffles, each keyed by doc_id.

# summarization/mod.rs:856-862 — the tree's own stop list (distinct
# from the BM25 list).
TREE_STOP_WORDS: list[str] = [
    "the", "be", "to", "of", "and", "a", "in", "that", "have", "i",
    "it", "for", "not", "on", "with", "he", "as", "you", "do", "at",
    "this", "but", "his", "by", "from", "they", "we", "say", "her",
    "she", "or", "an", "will", "my", "one", "all", "would", "there",
    "their", "what", "so", "up", "out", "if", "about", "who", "get",
    "which", "go", "me",
]


def extract_keywords_py(text: str, k: int = 5) -> list[str]:
    """Driver-side replica of text/mod.rs:477-500 for the one query
    string (count desc, word asc — deterministic tie-break)."""
    words = [w.lower() for w in text.split()
             if len(w) > 3 and w.lower() not in TREE_STOP_WORDS]
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [w for w, _ in ranked[:k]]


def _extract_keywords_col(text, k: int = 5):
    stop = F.array(*[F.lit(s) for s in TREE_STOP_WORDS])
    ws = F.filter(
        F.split(F.lower(text), r"\s+"),   # any whitespace, like .split()
        lambda w: (F.length(w) > 3) & ~F.array_contains(stop, w))
    scored = F.transform(
        F.array_distinct(ws),
        lambda d: F.struct(
            (-F.size(F.filter(ws, lambda w: w == d))).alias("nc"),
            d.alias("w")))
    return F.transform(F.slice(F.sort_array(scored), 1, k),
                       lambda s: s["w"])


def tree_keywords(tree: DataFrame, fanout: int = 4) -> DataFrame:
    """→ (doc_id, level, node_idx, keywords) for every tree node."""
    max_level = tree.agg(F.max("level")).collect()[0][0] or 0
    cur = tree.filter(F.col("level") == 0).select(
        "doc_id", "level", "node_idx",
        _extract_keywords_col(F.col("summary")).alias("keywords"))
    frames = [cur]
    for lvl in range(1, max_level + 1):
        parents = tree.filter(F.col("level") == lvl) \
            .select("doc_id", "level", "node_idx")
        merged = (cur.groupBy(
            "doc_id", F.floor(F.col("node_idx") / fanout).alias("node_idx"))
            .agg(F.slice(F.array_distinct(F.array_sort(
                F.flatten(F.collect_list("keywords")))), 1, 10)
                .alias("keywords")))
        cur = parents.join(merged, ["doc_id", "node_idx"]) \
            .select("doc_id", "level", "node_idx", "keywords") \
            .localCheckpoint(eager=True)
        frames.append(cur)
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df)
    return out


def tree_query(
    tree: DataFrame,
    keywords: DataFrame,
    query: str,
    max_results: int = 50,
) -> DataFrame:
    """mod.rs:867-930 — score = keyword-contains hits + 2×query-word
    overlap ratio + 0.5/(level+1); keep >0.1, top max_results.  Ranking
    is on the 6-dp-rounded score with (doc_id, level, node_idx)
    tie-break (reference sort_by partial_cmp ties are nondeterministic,
    documented divergence)."""
    qk = extract_keywords_py(query, 5)
    qw = query.split()
    nodes = tree.join(keywords, ["doc_id", "level", "node_idx"], "left") \
        .withColumn("keywords", F.coalesce(
            F.col("keywords"), F.array().cast("array<string>")))
    node_text = F.lower(F.concat_ws(
        " ", F.col("summary"), F.array_join(F.col("keywords"), " ")))
    node_words = F.filter(F.split(node_text, r"\s+"),
                          lambda w: w != "")
    kw_hits = sum(
        (F.when(node_text.contains(kw), 1).otherwise(0) for kw in qk),
        F.lit(0))
    overlap = sum(
        (F.when(F.array_contains(node_words, w.lower()), 1).otherwise(0)
         for w in qw),
        F.lit(0))
    score = (kw_hits.cast("double")
             + (overlap.cast("double") / float(len(qw))) * 2.0
             + F.lit(0.5) / (F.col("level") + 1))
    scored = nodes.select(
        "doc_id", "level", "node_idx",
        F.array_join("keywords", " ").alias("keywords"),
        F.round(score, 6).alias("score")) \
        .filter(F.col("score") > 0.1)
    return scored.orderBy(F.desc("score"), "doc_id", "level",
                          "node_idx").limit(max_results)
