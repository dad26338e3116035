"""Maximal Marginal Relevance (MMR) diversified reranking.

Engine-added retrieval/curation operator (Carbonell & Goldstein 1998):
the reference's reranking family (reranking/cross_encoder.rs, RRF in
HOW_IT_WORKS.md:870) re-scores by relevance only; MMR greedily selects
k items trading relevance against redundancy with what is already
selected:

    pick_i = argmax_{d in remaining}  lam * rel(d)
             - (1 - lam) * max_{s in selected} cos(d, s)

Greedy selection is inherently sequential PER QUERY — the one place
Python is semantically required — so the operator is an Arrow-batched
``applyInPandas`` grouped by query id: one shuffle on the query key,
then O(k · n · dim) work per group where n is the candidate-list length
(callers pass an ANN/BM25 top-N, so n is bounded by contract, never the
corpus).  At 100 TB the parallelism unit is the query — millions of
query groups spread over executors; no state crosses groups.

Determinism / cross-engine parity (repo invariant): every cosine is a
sequential left fold in double precision (bit-identical to Spark's
``F.aggregate`` and DuckDB's ``list_dot_product``) rounded to 6 dp
BEFORE the max; the MMR score is rounded to 6 dp BEFORE the argmax; ties
break on id ascending.  Python's ``round`` is correctly-rounded decimal
(half-even at exact boundaries) while Spark/DuckDB round half-away —
they can only disagree when the scaled value is EXACTLY representable at
a .5 decimal boundary, which products of already-6dp-rounded cosines do
not hit except at exact values (0, 1) where all three agree.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _cos6(a: list[float], b: list[float]) -> float:
    """Sequential-fold cosine, 6-dp rounded — the same operation order as
    F.aggregate(zip_with(...)) on the Spark side and list_dot_product on
    the DuckDB oracle side (IEEE doubles, left-to-right accumulation)."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    denom = (na ** 0.5) * (nb ** 0.5)
    if denom == 0.0:
        return 0.0
    return round(dot / denom, 6)


def mmr_select(rows: list[tuple], k: int, lam: float) -> list[tuple]:
    """Greedy MMR over [(id, rel, vec)] → [(id, pick, score)].

    Pure function (unit-testable without Spark).  rel must already be
    6-dp rounded.  First pick maximizes lam*rel (max-sim over the empty
    selected set is 0.0, so the formula is uniform across picks)."""
    mu = round(1.0 - lam, 12)
    # rows keyed by their INDEX, not candidate id: duplicate ids in the
    # input are distinct candidates with (possibly) different vectors,
    # so each row keeps its own running max-sim (ADVICE r3 — an
    # id-keyed dict silently shared one max across duplicates)
    remaining = list(enumerate(rows))
    out: list[tuple] = []
    # incremental running max-sim per candidate row: each pick costs
    # one cosine per remaining candidate (vs the newly selected vector)
    # instead of re-scanning the whole selected set — O(k·n·dim) total,
    # identical values (max is associative).  None = empty selected set
    # (scores as 0.0); a true max can be negative, so 0.0 is not a
    # valid init once anything is selected.
    maxsim: dict[int, float | None] = {i: None for i in range(len(rows))}
    last_vec = None
    for pick in range(1, min(k, len(rows)) + 1):
        if last_vec is not None:
            for (i, (_, _, vec)) in remaining:
                s = _cos6(vec, last_vec)
                if maxsim[i] is None or s > maxsim[i]:
                    maxsim[i] = s
        best = None
        for (i, (cid, rel, vec)) in remaining:
            ms = maxsim[i] if maxsim[i] is not None else 0.0
            score = round(lam * rel - mu * ms, 6)
            # argmax with (id asc, row-index asc) tie-break
            if best is None or score > best[1] or \
                    (score == best[1] and (cid, i) < (best[0][1][0],
                                                      best[0][0])):
                best = ((i, (cid, rel, vec)), score)
        out.append((best[0][1][0], pick, best[1]))
        last_vec = best[0][1][2]
        remaining = [r for r in remaining if r[0] != best[0][0]]
    return out


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "rel",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, vec_id, pick, mmr_score): greedy MMR top-k per query.

    `candidates` holds one row per (query, candidate) with a relevance
    score and the candidate's embedding; relevance is re-rounded to 6 dp
    here so callers can pass raw scores.  pick is the 1-based selection
    order; mmr_score is the (rounded) objective value at selection time.
    """
    dtypes = dict(candidates.dtypes)
    schema = (f"query_id {dtypes[query_col]}, vec_id {dtypes[id_col]}, "
              f"pick int, mmr_score double")
    prepared = candidates.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        F.round(F.col(rel_col), 6).alias("rel"),
        F.col(vec_col).cast("array<double>").alias("vv"),
    )

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        rows = [(r.vec_id, float(r.rel), list(r.vv))
                for r in pdf.itertuples(index=False)]
        rows.sort(key=lambda t: t[0])
        picked = mmr_select(rows, k, lam)
        return pd.DataFrame({
            "query_id": [qid] * len(picked),
            "vec_id": [p[0] for p in picked],
            "pick": [p[1] for p in picked],
            "mmr_score": [p[2] for p in picked],
        })

    return prepared.groupBy("query_id").applyInPandas(run_group, schema)
