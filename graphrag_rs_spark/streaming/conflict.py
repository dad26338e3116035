"""I4 — conflict resolution for incremental graph upserts.

Distributed re-expression of the reference's ConflictResolver
(graph/incremental/conflict.rs:19-227): when an increment carries an
entity or relationship whose key already exists with different data,
resolve per a declared strategy:

  keep_existing — existing row wins; new data for conflicting keys is
                  dropped (conflict.rs:119-123)
  keep_new      — incoming row replaces the existing one (:124-128)
  merge         — field-wise merge (:175-227): the HIGHER-confidence side
                  contributes (name, entity_type, confidence) [entities]
                  or (pred, confidence) [relationships]; mention counts
                  add; context chunk sets union.  Ties keep existing
                  (the reference mutates a clone of `existing` and only
                  overwrites when new.confidence is STRICTLY greater).

The reference resolves conflicts one object at a time on the driver; here
each strategy is one joined DataFrame expression — the whole increment
resolves in a single shuffle on the key, and `merge`'s operations
(max-by, sum, set-union) are associative, so repeated increments are
order-independent, matching `merge_increment_tables`' compaction
invariant.  LLMDecision/UserPrompt/Custom strategies (conflict.rs:28-32)
are driver-side interaction seams, out of scope for a batch engine; the
`custom` hook below accepts any (existing, incoming) → resolved callable
operating on the joined DataFrame for parity with `with_custom_resolver`.

Non-conflicting rows (key present on only one side) always pass through
unchanged, whatever the strategy — a conflict needs two parties
(conflict.rs:51-65 ConflictType::EntityExists / RelationshipExists).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

ENTITY_KEY = ["entity_id"]
RELATIONSHIP_KEY = ["subj", "obj"]

_STRATEGIES = ("keep_existing", "keep_new", "merge")


def _split(existing: DataFrame, incoming: DataFrame, key: list[str]):
    """→ (existing-only, incoming-only, joined-conflicts) on `key`.

    The joined frame carries every non-key column twice: `<col>` from the
    existing side, `new_<col>` from the incoming side.
    """
    inc = incoming
    for c in incoming.columns:
        if c not in key:
            inc = inc.withColumnRenamed(c, f"new_{c}")
    only_e = existing.join(incoming.select(*key), key, "left_anti")
    only_i = incoming.join(existing.select(*key), key, "left_anti")
    both = existing.join(inc, key)
    return only_e, only_i, both


def _resolve(
    existing: DataFrame,
    incoming: DataFrame,
    key: list[str],
    strategy: str,
    merge_cols: Callable[[DataFrame], DataFrame],
    custom: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    if custom is None and strategy not in _STRATEGIES:
        raise ValueError(
            f"unknown conflict strategy {strategy!r}; expected one of "
            f"{_STRATEGIES} or a `custom` resolver")
    only_e, only_i, both = _split(existing, incoming, key)
    cols = existing.columns
    if custom is not None:
        resolved = custom(both)
    elif strategy == "keep_existing":
        resolved = both.select(*cols)
    elif strategy == "keep_new":
        resolved = both.select(
            *key, *[F.col(f"new_{c}").alias(c) for c in cols if c not in key])
    else:
        resolved = merge_cols(both)
    return only_e.select(*cols).unionByName(only_i.select(*cols)) \
        .unionByName(resolved.select(*cols))


def resolve_entity_conflicts(
    existing: DataFrame,
    incoming: DataFrame,
    strategy: str = "merge",
    custom: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Upsert `incoming` entities into `existing` under a conflict strategy.

    Both sides: (entity_id, name, entity_type, confidence, mention_count).
    merge semantics = conflict.rs:175-201 merge_entities — strictly-higher
    new confidence takes (name, entity_type, confidence); mention sets
    union (here: counts add, the mentions themselves live in the
    `mentions` table where dedup is by (entity_id, chunk_id, start)).
    """
    new_wins = F.col("new_confidence") > F.col("confidence")

    def merge_cols(both: DataFrame) -> DataFrame:
        return both.select(
            "entity_id",
            F.when(new_wins, F.col("new_name")).otherwise(F.col("name"))
            .alias("name"),
            F.when(new_wins, F.col("new_entity_type"))
            .otherwise(F.col("entity_type")).alias("entity_type"),
            F.greatest("confidence", "new_confidence").alias("confidence"),
            (F.col("mention_count") + F.col("new_mention_count"))
            .alias("mention_count"),
        )

    return _resolve(existing, incoming, ENTITY_KEY, strategy,
                    merge_cols, custom)


def _fold_edges(df: DataFrame) -> DataFrame:
    """Collapse (subj, pred, obj)-grained rows to one row per (subj, obj).

    max(struct(confidence, pred)) picks the highest-confidence predicate
    (lexicographically-last pred on exact confidence ties — deterministic);
    context keys union.  One shuffle on the edge key, which the conflict
    join immediately reuses.
    """
    return df.groupBy("subj", "obj").agg(
        F.max(F.struct("confidence", "pred")).alias("_best"),
        F.array_sort(F.array_distinct(F.flatten(
            F.collect_list("context_keys")))).alias("context_keys"),
    ).select(
        "subj", F.col("_best.pred").alias("pred"), "obj",
        F.col("_best.confidence").alias("confidence"),
        F.size("context_keys").alias("n_context"), "context_keys")


def resolve_relationship_conflicts(
    existing: DataFrame,
    incoming: DataFrame,
    strategy: str = "merge",
    custom: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Upsert `incoming` triples into `existing` under a conflict strategy.

    Both sides: (subj, pred, obj, confidence, n_context, context_keys) —
    the folded form from `triples.triples_with_context`.  Conflict key is
    the edge (subj, obj), matching the reference's Relationship identity
    (source, target; conflict.rs:203-227): a conflicting increment may
    re-type the edge.  merge = strictly-higher new confidence takes
    (pred, confidence); context sets union (sorted, deduped).

    The input fold is keyed (subj, pred, obj) and may legitimately carry
    several preds per edge; joining multi-row sides on (subj, obj) would
    fan out and emit duplicate edge rows, breaking the order-independent
    compaction invariant.  Both sides are therefore pre-folded to one row
    per edge first (highest confidence takes pred — pred desc breaks
    exact ties deterministically; contexts union), which is the same
    associative merge the strategy itself applies, so fold-then-resolve
    equals resolve-pairwise in any order — when confidences differ.
    EXACT-confidence ties are the one caveat: pairwise merge keeps the
    EXISTING pred (reference semantics — new wins only on strictly
    higher confidence, conflict.rs:203-227), which is order-dependent by
    definition, while the fold's pred-desc tie-break is order-free; the
    two can disagree on which equal-confidence pred survives.  The
    reference pins the pairwise rule, so the divergence is inherent to
    compacting it associatively, not fixable here.
    """
    existing = _fold_edges(existing)
    incoming = _fold_edges(incoming)
    new_wins = F.col("new_confidence") > F.col("confidence")

    def merge_cols(both: DataFrame) -> DataFrame:
        ctx = F.array_sort(F.array_distinct(
            F.concat("context_keys", "new_context_keys")))
        return both.select(
            "subj",
            F.when(new_wins, F.col("new_pred")).otherwise(F.col("pred"))
            .alias("pred"),
            "obj",
            F.greatest("confidence", "new_confidence").alias("confidence"),
            F.size(ctx).alias("n_context"),
            ctx.alias("context_keys"),
        )

    return _resolve(existing, incoming, RELATIONSHIP_KEY, strategy,
                    merge_cols, custom)
