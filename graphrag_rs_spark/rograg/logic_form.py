"""ROGRAG logic-form retrieval (rograg/logic_form.rs) as batch joins.

The reference parses a query into a (predicate, arguments) logic form
with six ordered regex patterns (logic_form.rs:403-500, first match
wins) and executes it against the KG with driver-side loops
(:587-760).  Here both halves are corpus-scale DataFrame passes:

- parse: a when-chain of rlike in pattern order + regexp_extract for
  the argument groups.  The reference's greedy `(.+)\\??` quirk — a
  trailing '?' stays inside the captured argument, so "what is x?"
  binds nothing downstream — is preserved (and tested).
- Is-execution (:604-631): entities whose lowercased name CONTAINS the
  argument; confidence is the reference's name similarity, which inside
  a contains-match reduces to 1.0 (exact) / 0.8 (containment) — the
  Jaccard branch (:763-786) is unreachable here by construction.
- entity resolution for Related/Compare (:749-760): exact lowercase
  match first, then partial (containment either way).  The reference
  breaks partial-match ties by HashMap iteration order
  (nondeterministic); here ties break exact-first then name ascending
  (documented divergence).
- Related (:634-680): a direct edge between the resolved pair yields
  "{e1} {rel_type} {e2}" at the edge's confidence; both-resolved with
  no edge yields the reference's literal "No direct relationship found
  between {e1} and {e2}" at 0.3; an unresolved side yields nothing.
- Compare (:693-720): "{e1} is a {t1} while {e2} is a {t2}" at 0.7.
- Happened/Caused (:723-744): parse-only — the reference's executors
  are TODO stubs returning no bindings; preserved.

Every stage is a broadcast join against the (tiny) entity/edge tables;
the query stream never shuffles except the per-query resolution window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# (predicate, pattern, has_second_arg) in reference order
PATTERNS: list[tuple[str, str, bool]] = [
    ("is", r"(?i)what (?:is|are) (?:the )?(.+)\??", False),
    ("is", r"(?i)who (?:is|are) (?:the )?(.+)\??", False),
    ("related",
     r"(?i)how (?:is|are) (.+?) (?:related to|connected to) (.+)\??", True),
    ("happened", r"(?i)when (?:did|does|will) (.+?) (?:happen|occur)\??",
     False),
    ("caused", r"(?i)why (?:did|does) (.+?) (?:cause|lead to) (.+)\??",
     True),
    # group 2 is GREEDY like the reference — the optional "on/in terms
    # of" tail is dead in practice there too (the greedy .+ eats it)
    ("compare",
     r"(?i)compare (.+?) (?:and|with|to) (.+)"
     r"(?:\s+(?:on|in terms of) (.+))?\??", True),
]

# the no-relationship fallback message (logic_form.rs:668) is built
# inline in rel_b from concat literals; keep it there — a parallel
# template constant would silently drift on edit


def parse_logic_form(queries: DataFrame, id_col: str = "query_id",
                     query_col: str = "query") -> DataFrame:
    """→ (query_id, predicate, x, y): first matching pattern's
    extraction; unparseable queries are absent (the reference returns
    None and falls through to other strategies)."""
    q = F.col(query_col)
    pred, x, y = None, None, None
    for p, rx, two in reversed(PATTERNS):
        hit = q.rlike(rx)
        px = F.trim(F.regexp_extract(q, rx, 1))
        py = F.trim(F.regexp_extract(q, rx, 2)) if two \
            else F.lit(None).cast("string")
        pred = F.when(hit, p) if pred is None else \
            F.when(hit, p).otherwise(pred)
        x = F.when(hit, px) if x is None else F.when(hit, px).otherwise(x)
        y = F.when(hit, py) if y is None else F.when(hit, py).otherwise(y)
    return (queries.select(F.col(id_col).alias("query_id"),
                           pred.alias("predicate"),
                           x.alias("x"), y.alias("y"))
            .filter(F.col("predicate").isNotNull()
                    & (F.col("x") != "")))


def _resolve(parsed: DataFrame, entities: DataFrame,
             arg: str) -> DataFrame:
    """find_entity_by_name for one argument column: exact lowercase
    match first, else containment either way; ties exact-first then
    name asc.  → (query_id, {arg}_name, {arg}_type)."""
    a = F.lower(F.col(arg))
    n = F.lower(F.col("name"))
    cand = (parsed.select("query_id", arg)
            .join(entities, n.contains(a) | a.contains(n))
            .withColumn("_exact", (n == a).cast("int")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_exact").desc(), F.col("name").asc())
    return (cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("query_id", F.col("name").alias(f"{arg}_name"),
                    F.col("entity_type").alias(f"{arg}_type")))


def logic_form_retrieve(queries: DataFrame, entities: DataFrame,
                        edges: DataFrame) -> DataFrame:
    """→ (query_id, predicate, variable, value, confidence).

    `entities`: (name, entity_type); `edges`: (src, dst, rel_type,
    confidence) — one row per unordered pair (src < dst)."""
    parsed = parse_logic_form(queries)

    is_q = parsed.filter(F.col("predicate") == "is")
    is_b = (is_q.join(F.broadcast(entities),
                      F.lower(F.col("name"))
                      .contains(F.lower(F.col("x"))))
            .select("query_id", "predicate", F.lit("X").alias("variable"),
                    F.concat("name", F.lit(" ("), "entity_type",
                             F.lit(")")).alias("value"),
                    F.when(F.lower("name") == F.lower("x"), 1.0)
                    .otherwise(0.8).alias("confidence")))

    two = parsed.filter(F.col("predicate").isin("related", "compare")
                        & F.col("y").isNotNull() & (F.col("y") != ""))
    rx = _resolve(two, entities, "x")
    ry = _resolve(two, entities, "y")
    both = two.join(rx, "query_id").join(ry, "query_id")

    rel = both.filter(F.col("predicate") == "related")
    e = edges.select("src", "dst", "rel_type",
                     F.col("confidence").alias("_ec"))
    hit = ((F.col("src") == F.col("x_name"))
           & (F.col("dst") == F.col("y_name"))) \
        | ((F.col("src") == F.col("y_name"))
           & (F.col("dst") == F.col("x_name")))
    rel_b = (rel.join(F.broadcast(e), hit, "left")
             .select("query_id", "predicate",
                     F.lit("R").alias("variable"),
                     F.when(F.col("rel_type").isNotNull(),
                            F.concat("x_name", F.lit(" "), "rel_type",
                                     F.lit(" "), "y_name"))
                     .otherwise(F.concat(
                         F.lit("No direct relationship found between "),
                         F.col("x_name"), F.lit(" and "),
                         F.col("y_name"))).alias("value"),
                     F.coalesce("_ec", F.lit(0.3)).alias("confidence")))

    cmp_b = (both.filter(F.col("predicate") == "compare")
             .select("query_id", "predicate",
                     F.lit("comparison").alias("variable"),
                     F.concat("x_name", F.lit(" is a "), "x_type",
                              F.lit(" while "), "y_name", F.lit(" is a "),
                              "y_type").alias("value"),
                     F.lit(0.7).alias("confidence")))

    return is_b.unionByName(rel_b).unionByName(cmp_b)
