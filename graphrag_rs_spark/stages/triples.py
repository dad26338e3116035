"""Stage 3 — (subj, pred, obj) triple emission (R1-R5).

Pure DataFrame work, no Python in the hot path:

  R1 co-occurrence pairs — self-join of chunk_entities on chunk_id with a
     deterministic (first_offset, entity_id) ordering predicate; the
     reference pairs i<j in extraction order (entity/mod.rs:830-843), which
     is Rust-HashMap-nondeterministic — we pin the order (SURVEY.md §7).
  R2 predicate typing   — the rule table (entity/mod.rs:851-889) compiled
     to a when()-chain over pre-computed per-chunk contains() flags, so
     the full chunk text never rides through the join.
  R3 confidence/context — literals (lib.rs:561-568).
  R4 dedup              — groupBy(subj, pred, obj) + collect_set(context).
  R5 endpoint validation— inner joins guarantee both endpoints exist.

Skew note: the self-join shuffles on chunk_id; per-chunk entity count is
bounded by chunk_size, so pair fan-out per key is bounded (~hundreds), no
salting needed here.  AQE skew-join stays on as a backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.config import PipelineConfig, DEFAULT_CONFIG

# keyword → flag column; see infer_relationship_type (entity/mod.rs:851-889)
_CONTEXT_KEYWORDS = {
    "kw_works_for": "works for",
    "kw_employed_by": "employed by",
    "kw_founded": "founded",
    "kw_ceo": "CEO",
    "kw_born_in": "born in",
    "kw_from": "from",
    "kw_lives_in": "lives in",
    "kw_based_in": "based in",
    "kw_headquartered": "headquartered",
    "kw_married": "married",
    "kw_spouse": "spouse",
    "kw_colleague": "colleague",
    "kw_partner": "partner",
}


def chunk_context_flags(chunks: DataFrame) -> DataFrame:
    """Per-chunk boolean flags for the predicate rule table (JVM contains)."""
    cols = [F.col("content").contains(kw).alias(name)
            for name, kw in _CONTEXT_KEYWORDS.items()]
    return chunks.select("chunk_id", *cols)


def _pred_expr() -> F.Column:
    """infer_relationship_type as a when()-chain over (t1, t2, kw_* flags)."""
    t1, t2 = F.col("t1"), F.col("t2")
    c = lambda n: F.col(n)  # noqa: E731

    person_org = ((t1 == "PERSON") & (t2 == "ORGANIZATION")) | \
                 ((t1 == "ORGANIZATION") & (t2 == "PERSON"))
    person_loc = ((t1 == "PERSON") & (t2 == "LOCATION")) | \
                 ((t1 == "LOCATION") & (t2 == "PERSON"))
    org_loc = ((t1 == "ORGANIZATION") & (t2 == "LOCATION")) | \
              ((t1 == "LOCATION") & (t2 == "ORGANIZATION"))
    person_person = (t1 == "PERSON") & (t2 == "PERSON")

    return (
        F.when(person_org,
               F.when(c("kw_works_for") | c("kw_employed_by"), "WORKS_FOR")
                .when(c("kw_founded") | c("kw_ceo"), "LEADS")
                .otherwise("ASSOCIATED_WITH"))
        .when(person_loc,
              F.when(c("kw_born_in") | c("kw_from"), "BORN_IN")
               .when(c("kw_lives_in") | c("kw_based_in"), "LOCATED_IN")
               .otherwise("ASSOCIATED_WITH"))
        .when(org_loc,
              F.when(c("kw_headquartered") | c("kw_based_in"),
                     "HEADQUARTERED_IN")
               .otherwise("LOCATED_IN"))
        .when(person_person,
              F.when(c("kw_married") | c("kw_spouse"), "MARRIED_TO")
               .when(c("kw_colleague") | c("kw_partner"), "COLLEAGUE_OF")
               .otherwise("KNOWS"))
        .otherwise("RELATED_TO")
    )


def emit_triples(
    chunk_entities: DataFrame,
    chunks: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """→ distinct (subj, pred, obj, confidence, context_chunks)."""
    ce = chunk_entities.select("chunk_id", "entity_id", "entity_type",
                               "first_offset")
    a = ce.alias("a")
    b = ce.alias("b")
    ordered = (F.col("a.first_offset") < F.col("b.first_offset")) | (
        (F.col("a.first_offset") == F.col("b.first_offset"))
        & (F.col("a.entity_id") < F.col("b.entity_id"))
    )
    pairs = a.join(b, on=(F.col("a.chunk_id") == F.col("b.chunk_id")) & ordered) \
        .select(
            F.col("a.chunk_id").alias("chunk_id"),
            F.col("a.entity_id").alias("subj"),
            F.col("a.entity_type").alias("t1"),
            F.col("b.entity_id").alias("obj"),
            F.col("b.entity_type").alias("t2"),
        )

    flags = chunk_context_flags(chunks)
    typed = pairs.join(flags, "chunk_id").select(
        "subj", "obj", _pred_expr().alias("pred"), "chunk_id")

    return (
        typed.groupBy("subj", "pred", "obj")
        .agg(F.sort_array(F.collect_set("chunk_id")).alias("context_chunks"))
        .select(
            "subj", "pred", "obj",
            F.lit(float(cfg.relationship_confidence)).alias("confidence"),
            "context_chunks",
        )
    )
