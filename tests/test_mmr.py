"""MMR diversified reranking (retrieval/mmr.py)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.retrieval.mmr import _cos6, mmr_rerank, mmr_select


def _vec(*xs):
    return [float(x) for x in xs]


class TestMmrSelect:
    def test_lambda_one_is_pure_relevance_order(self):
        rows = [(1, 0.5, _vec(1, 0)), (2, 0.9, _vec(1, 0)),
                (3, 0.7, _vec(0, 1))]
        out = mmr_select(rows, k=3, lam=1.0)
        assert [r[0] for r in out] == [2, 3, 1]
        assert [r[1] for r in out] == [1, 2, 3]
        # scores are lam*rel (no diversity term at lam=1)
        assert [r[2] for r in out] == [0.9, 0.7, 0.5]

    def test_diversity_skips_near_duplicate(self):
        # 1 and 2 are identical vectors; 3 is orthogonal with lower rel.
        # Pure relevance picks (1, 2); MMR at lam=0.5 picks (1, 3):
        # score(2) = .5*.89 - .5*1.0 < score(3) = .5*.60 - .5*0.
        rows = [(1, 0.9, _vec(1, 0)), (2, 0.89, _vec(1, 0)),
                (3, 0.60, _vec(0, 1))]
        out = mmr_select(rows, k=2, lam=0.5)
        assert [r[0] for r in out] == [1, 3]

    def test_tie_breaks_on_id_asc(self):
        rows = [(7, 0.5, _vec(1, 0)), (3, 0.5, _vec(0, 1))]
        out = mmr_select(rows, k=1, lam=1.0)
        assert out[0][0] == 3

    def test_negative_similarity_is_a_bonus_not_clamped(self):
        # candidate 3 points OPPOSITE to pick 1: max-sim = -1, so the
        # diversity term ADDS 0.5 — true max semantics (matches the SQL
        # oracle's un-clamped max()).
        rows = [(1, 0.9, _vec(1, 0)), (2, 0.2, _vec(0, 1)),
                (3, 0.1, _vec(-1, 0))]
        out = mmr_select(rows, k=2, lam=0.5)
        assert out[1][0] == 3
        assert out[1][2] == pytest.approx(0.5 * 0.1 + 0.5 * 1.0)

    def test_k_larger_than_candidates_stops_early(self):
        rows = [(1, 0.9, _vec(1, 0)), (2, 0.1, _vec(0, 1))]
        out = mmr_select(rows, k=10, lam=0.7)
        assert len(out) == 2


class TestCos6Parity:
    def test_matches_spark_fold_rounding(self, spark):
        """The pandas-side sequential-fold cosine must equal Spark's
        F.aggregate(zip_with(...)) rounded to 6 dp on real float data —
        the cross-engine invariant the oracle relies on."""
        from pyspark.sql import functions as F
        from graphrag_rs_spark.operators.similarity import cosine

        a = [0.123456789, -0.87654321, 0.5, 0.33333333]
        b = [0.99999999, 0.11111111, -0.25, 0.66666666]
        df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
        got = df.select(F.round(cosine(F.col("a"), F.col("b")), 6)
                        .alias("s")).head()["s"]
        assert _cos6(a, b) == got

    def test_zero_vector_similarity_is_zero(self):
        assert _cos6([0.0, 0.0], [1.0, 2.0]) == 0.0


class TestMmrRerank:
    def test_groups_independent_and_schema(self, spark):
        rows = [
            # query 10: 1 and 2 identical, 3 orthogonal
            (10, 1, 0.9, _vec(1, 0)), (10, 2, 0.89, _vec(1, 0)),
            (10, 3, 0.60, _vec(0, 1)),
            # query 20: plain relevance order (all orthogonal-ish)
            (20, 1, 0.8, _vec(1, 0)), (20, 2, 0.7, _vec(0, 1)),
        ]
        df = spark.createDataFrame(
            rows, "query_id int, vec_id int, rel double, "
                  "embedding array<double>")
        out = mmr_rerank(df, k=2, lam=0.5)
        assert out.columns == ["query_id", "vec_id", "pick", "mmr_score"]
        got = {(r.query_id, r.pick): r.vec_id for r in out.collect()}
        assert got == {(10, 1): 1, (10, 2): 3, (20, 1): 1, (20, 2): 2}

    def test_rel_rounded_before_selection(self, spark):
        # two candidates whose rel differs only past 6 dp: rounding makes
        # them tie, so the id tie-break decides — parallelism-invariant.
        rows = [(1, 5, 0.50000004, _vec(1, 0)),
                (1, 2, 0.50000001, _vec(0, 1))]
        df = spark.createDataFrame(
            rows, "query_id int, vec_id int, rel double, "
                  "embedding array<double>")
        out = mmr_rerank(df, k=1, lam=1.0).collect()
        assert out[0].vec_id == 2


def test_mmr_select_duplicate_ids_score_independently():
    """ADVICE r3: duplicate candidate ids are distinct rows — each keeps
    its own running max-sim against its OWN vector."""
    from graphrag_rs_spark.retrieval.mmr import mmr_select
    rows = [
        ("a", 1.0, [1.0, 0.0]),
        ("a", 0.9, [0.0, 1.0]),   # same id, orthogonal vector
        ("b", 0.8, [1.0, 0.0]),
    ]
    out = mmr_select(rows, k=3, lam=0.5)
    assert [r[0] for r in out] == ["a", "a", "b"]
    # second pick: the duplicate 'a' row is orthogonal to the first
    # pick, so its max-sim is 0 and its score is lam*0.9 = 0.45; the
    # id-keyed bug shared max-sim 1.0 (self-sim of the other 'a' row)
    # and scored it 0.9*0.5 - 0.5*1.0 = -0.05
    assert out[1][2] == 0.45
