"""Pipeline configuration.

Mirrors the reference's config surface (reference: graphrag-core/src/config/mod.rs:844-895
defaults) with only the knobs the indexing path consumes. Everything else
(LLM endpoints, caches, server) is out of scope for a batch Spark engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # Chunking (reference: config/mod.rs:850-855)
    chunk_size: int = 1000
    chunk_overlap: int = 200
    # "fixed" = text/mod.rs:123-168 (default); "hierarchical" =
    # text/chunking.rs:47-103 (T2, RecursiveCharacterTextSplitter style)
    chunking_strategy: str = "fixed"

    # Entity extraction (reference: config/mod.rs:859-867).  NOTE: the
    # reference's *config* default is ["PERSON","ORG","LOCATION"], where
    # "ORG" silently falls through to the generic extractor
    # (entity/mod.rs:170-173) and yields nothing above min_confidence.
    # We default to the EntityExtractor::new semantics
    # (entity/mod.rs:110-116): PERSON / ORGANIZATION / LOCATION.
    entity_types: tuple[str, ...] = ("PERSON", "ORGANIZATION", "LOCATION")
    min_confidence: float = 0.7
    # E6 allow/exclude regex over entity names (reference:
    # config/mod.rs:862-867 custom_patterns / entity filtering).  Applied
    # as JVM-side rlike filters after the extractor UDF so Catalyst can
    # fuse them with downstream projections.
    include_name_pattern: str | None = None
    exclude_name_patterns: tuple[str, ...] = ()

    # Relationship emission (reference: config/mod.rs:887-889, lib.rs:561-568)
    relationship_confidence: float = 0.5
    extract_relationships: bool = True

    # Canonicalization (reference: entity/string_similarity_linker.rs:40-52)
    link_min_similarity: float = 0.85
    link_max_edit_distance: int = 2
    link_use_phonetic: bool = False

    # Spark-side scale knobs (no reference counterpart; cluster tuning)
    # Max non-identity alias rows broadcast during the L5 rewrite; above
    # this, top-K-by-mention-count broadcast + unhinted cold-tail join
    # (AQE decides).  2M rows ≈ ~150 MB serialized — comfortably inside
    # executor/driver headroom, far below where broadcast breaks down.
    alias_broadcast_hot_k: int = 2_000_000
    shuffle_partitions: int = 32
    salt_buckets: int = 8          # salting fan-out for skewed conversations
    cc_max_iterations: int = 50    # safety bound for the CC join loop
    arrow_batch_size: int = 2048

    def spark_confs(self) -> dict[str, str]:
        return {
            "spark.sql.shuffle.partitions": str(self.shuffle_partitions),
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.sql.execution.arrow.maxRecordsPerBatch": str(self.arrow_batch_size),
            # collect_set/collect_list aggregates (context folding) fall
            # back to sort-based aggregation after 128 groups by default —
            # pathological for high-cardinality triple keys; keep the
            # hash path (groups are small sets of short strings)
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold":
                "5000000",
        }


DEFAULT_CONFIG = PipelineConfig()
