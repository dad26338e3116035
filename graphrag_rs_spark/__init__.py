"""graphrag_rs_spark — a from-scratch PySpark-native GraphRAG construction engine.

Rebuilds the indexing path of the reference engine (scheur/graphrag-rs,
a single-node Rust workspace) as idiomatic Spark DataFrame transforms:

    transcripts (conv_id, turn_idx, role, text, tool, ts)
      → per-conversation chunk assembly     (stages.chunking)
      → pattern entity/mention extraction   (stages.extraction, Arrow-batched UDF)
      → (subj, pred, obj) triple emission   (stages.triples)
      → canonicalization via similarity join + small-star/large-star CC
                                            (stages.canonicalize, algos.cc)
      → graph materialization + communities (stages.materialize)

plus the query-side operators (BM25, TF-IDF, vector top-k) and the
training-data-pipeline operators (dedup family, ANN, text analysis,
multimodal plumbing) under `retrieval/` and `operators/`.

Reference semantics are transliterated once into `reference_logic.py`
(pure Python, no Spark); both the offline oracle (`oracle.py`) and the
distributed UDFs import the same functions, so single-node vs cluster
parity is structural, not accidental.
"""

__version__ = "0.1.0"

from graphrag_rs_spark.config import PipelineConfig  # noqa: F401
