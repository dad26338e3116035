"""Sequence packing into fixed token-budget bins (training-pipeline op)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.packing import pack_token_bins


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(f"d{i}", " ".join(f"w{j}" for j in range(10 + i)))
            for i in range(40)]
    rows.append(("empty", ""))
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_layout_is_gapless_and_contiguous(docs):
    out = pack_token_bins(docs, budget=50, groups=3, seed="s")
    rows = sorted(out.collect(),
                  key=lambda r: (r["pack_group"], r["start_offset"]))
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r["pack_group"], []).append(r)
    for grp in by_group.values():
        offset = 0
        for r in grp:                       # end-to-end, no gaps
            assert r["start_offset"] == offset
            offset += r["n_tokens"]
    # every group-local bin index is consistent with the offsets
    for r in rows:
        first = r["bin_first"] % (1 << 32)
        last = r["bin_last"] % (1 << 32)
        assert first == r["start_offset"] // 50
        end = r["start_offset"] + max(r["n_tokens"] - 1, 0)
        assert last == end // 50
        assert r["n_bins_spanned"] == last - first + 1


def test_deterministic_across_partitionings(docs):
    a = {r["doc_id"]: (r["bin_first"], r["start_offset"]) for r in
         pack_token_bins(docs, budget=50, groups=3).collect()}
    b = {r["doc_id"]: (r["bin_first"], r["start_offset"]) for r in
         pack_token_bins(docs.repartition(11), budget=50,
                         groups=3).collect()}
    assert a == b


def test_empty_doc_and_validation(docs):
    out = {r["doc_id"]: r for r in
           pack_token_bins(docs, budget=50, groups=2).collect()}
    e = out["empty"]
    assert e["n_tokens"] == 0 and e["n_bins_spanned"] == 1
    assert e["bin_first"] == e["bin_last"]
    with pytest.raises(ValueError):
        pack_token_bins(docs, budget=0)
    with pytest.raises(ValueError):
        pack_token_bins(docs, budget=10, groups=0)


def test_precomputed_token_counts_column(spark):
    df = spark.createDataFrame(
        [("a", 30), ("b", 30), ("c", 30)],
        "doc_id string, n_tok int")
    out = pack_token_bins(df, budget=50, groups=1,
                          n_tokens_col="n_tok")
    spans = {r["doc_id"]: r["n_bins_spanned"] for r in out.collect()}
    # 90 tokens into 50-token bins: exactly one doc straddles the cut
    assert sorted(spans.values()) == [1, 1, 2]
