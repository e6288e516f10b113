"""Pipeline configuration.

Mirrors the reference's pydantic ``Settings`` surface
(`src/BioOntologyKG/embedding/settings.py:7-30`: batch size, model name,
data dir) but for a Ray Data pipeline: per-stage batch sizes, actor-pool
concurrency, embedding dimension, and shuffle knobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- batch sizing (reference precedent: 10/32/100/1000 hand-rolled
    # batches, SURVEY.md §4.1; here the streaming executor does the batching)
    extract_batch_size: int = 4096
    link_batch_size: int | None = None  # None → whole blocks
    embed_batch_size: int = 1024

    # --- actor pools (stateful stages, SURVEY.md §2.4)
    link_concurrency: int = 4
    embed_concurrency: int = 4

    # --- embedding space (reference: 768-d PubMedBERT; ours: deterministic
    # hash embeddings, dim configurable — 32 in tests)
    embedding_dim: int = 32

    # --- shuffle / skew handling
    union_find_max_iters: int = 12
    salt_buckets: int = 16          # hot-key salting factor for two-phase aggs
    num_output_partitions: int = 16

    # --- linking semantics
    min_link_score: float = -1.0    # cosine floor for ambiguous-alias resolution
    embed_all_contexts: bool = False  # True → ctx embedding for EVERY matched
                                      # turn (what a transformer embedder costs);
                                      # False → only ambiguous-alias turns
    drop_obsolete: bool = True      # obsolete ontology terms must not link

    # --- predicates whose edges are undirected → canonical (lo, hi) key
    # (reference: uniprot_intact.cql:31-40 symmetric-pair dedup)
    symmetric_predicates: tuple = ("INTERACTS_WITH", "SAME_AS")

    # --- output
    output_dir: str = "/tmp/bioontologykg_ray/out"
    write_manifests: bool = True

    def __post_init__(self):
        if self.embedding_dim <= 0:
            raise ValueError("embedding_dim must be positive")


DEFAULT_CONFIG = PipelineConfig()
