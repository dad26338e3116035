"""Sequence packing: map documents to fixed token-budget training bins.

The concat-and-chunk assignment LLM pretraining uses: documents are laid
end-to-end in a deterministic order and cut every `budget` tokens; each
document learns which bin(s) it lands in (a doc may span a cut). The
whole layout is a pure function of (seed, groups, budget, doc ids), so
re-running on any cluster reproduces byte-identical shard assignments.

Shape at scale: a single global ordering would funnel 100 TB through one
sorting task, so documents are first salted into `groups` independent
pack groups by key hash, and the cumulative layout is a window per group
— one shuffle keyed on the group, each group sorted independently in
parallel. Bin ids are global: (group, local_bin) → group-major encoding.

No reference analogue (graphrag-rs is an indexing engine); part of the
training-pipeline family the task brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from graphrag_rs_spark.functions.hashing import tokens
from graphrag_rs_spark.operators.sampling import hash_bucket

# local bins per group are encoded group-major into a global bin id;
# 2^32 local bins × a 4k-token budget ≈ 17 T tokens per group — ample
_BIN_STRIDE = 1 << 32


def pack_token_bins(docs: DataFrame, budget: int,
                    id_col: str = "doc_id", text_col: str = "text",
                    n_tokens_col: str | None = None,
                    groups: int = 64, seed: str = "pack") -> DataFrame:
    """→ (doc_id, pack_group, n_tokens, start_offset, bin_first, bin_last,
         n_bins_spanned).

    Within a pack group, docs are laid out in (bucket, doc_id) order —
    hash-shuffled so adjacent source docs don't cluster in one bin, with
    the unique id as the total tie-break. A doc occupying tokens
    [start, start + n) falls in bins floor(start/budget) ..
    floor((start + n - 1)/budget); empty docs (0 tokens) sit in the bin
    at their offset and span 1.

    budget must be ≥ 1; groups ≥ 1. Choose groups so one group's docs
    sort comfortably in a task (e.g. 4096 groups at petabyte scale).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if groups < 1:
        raise ValueError(f"groups must be >= 1, got {groups}")

    n_tok = (F.col(n_tokens_col) if n_tokens_col
             else F.size(tokens(text_col)))
    bucket = hash_bucket(id_col, seed)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (bucket % F.lit(groups)).cast("int").alias("pack_group"),
        bucket.alias("_order"),
        n_tok.cast("bigint").alias("n_tokens"),
    )

    w = (Window.partitionBy("pack_group")
         .orderBy("_order", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    laid = base.select(
        "doc_id", "pack_group", "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .alias("start_offset"),
    )
    bin_first = F.floor(F.col("start_offset") / budget)
    bin_last = F.floor(
        (F.col("start_offset")
         + F.greatest(F.col("n_tokens") - 1, F.lit(0))) / budget)
    return laid.select(
        "doc_id", "pack_group", "n_tokens", "start_offset",
        (F.col("pack_group").cast("bigint") * _BIN_STRIDE + bin_first)
        .alias("bin_first"),
        (F.col("pack_group").cast("bigint") * _BIN_STRIDE + bin_last)
        .alias("bin_last"),
        (bin_last - bin_first + 1).cast("bigint").alias("n_bins_spanned"),
    )
