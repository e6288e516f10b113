"""Pipeline configuration.

Mirrors the reference's pydantic ``Settings`` surface
(`src/BioOntologyKG/embedding/settings.py:7-30`: batch size, model name,
data dir) but for a Ray Data pipeline: per-stage batch sizes, actor-pool
concurrency, embedding dimension, and shuffle knobs. Every knob here is
read somewhere — dead config was deleted in round 2 (ADVICE).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # --- batch sizing (reference precedent: 10/32/100/1000 hand-rolled
    # batches, SURVEY.md §4.1; here the streaming executor does the batching)
    extract_batch_size: int = 4096
    link_batch_size: int | None = None  # None → whole blocks

    # --- actor pools (stateful stages, SURVEY.md §2.4)
    # link_stateless=True runs entity linking as stateless tasks with a
    # per-worker cached index (dictionary-bound lookup → use every CPU,
    # fuse with read+extract); False reserves the fixed actor pool
    # below — the shape for heavyweight linker state (real transformer,
    # GPU residency; see stages/linker.link_triples)
    link_stateless: bool = True
    link_concurrency: int = 4

    # --- embedding space (reference: 768-d PubMedBERT; ours: deterministic
    # hash embeddings, dim configurable — 32 in tests)
    embedding_dim: int = 32

    # --- shuffle / skew handling
    union_find_max_iters: int = 12
    salt_buckets: int = 16          # hot-key salting factor for two-phase aggs

    # --- linking semantics
    min_link_score: float = -1.0    # cosine floor for ambiguous-alias
                                    # resolution: best candidate below the
                                    # floor → the triple dead-letters
    embed_all_contexts: bool = False  # True → ctx embedding for EVERY matched
                                      # turn (what a transformer embedder costs);
                                      # False → only ambiguous-alias turns
    strict_ordering: bool = False   # True → physically run extraction on the
                                    # (conv_id, turn_idx)-sorted corpus; False
                                    # (default) commutes the sort off the
                                    # triple path — same triple multiset
                                    # (extraction is per-turn; equality is
                                    # tested), minus the full-text all-to-all
    drop_obsolete: bool = True      # obsolete ontology terms must not link

    # --- canonical-mapping application routing: label sets up to this
    # size broadcast as a dict (ray.put once, read per actor); larger
    # sets apply via a partitioned co-group join (no driver collect)
    broadcast_mapping_max: int = 5_000_000

    # --- predicates whose edges are undirected → canonical (lo, hi) key
    # (reference: uniprot_intact.cql:31-40 symmetric-pair dedup)
    symmetric_predicates: tuple = ("INTERACTS_WITH", "SAME_AS")

    # --- flagged-corpus intermediate routing: the linked/dead/same-as
    # consumers either share one plasma materialization (fast, bounded:
    # only while the estimated flagged size fits spill_fraction of the
    # object store) or a scratch-parquet spill (one streaming write,
    # column-pruned/predicate-pushed re-reads — the 100-TB path, where
    # the intermediate belongs on disk). Estimated size ≈ 3× input
    # parquet bytes (measured inflation of flagged vs transcripts).
    spill_fraction: float = 0.25
    scratch_root: str = "/tmp/bioontologykg_ray/scratch"

    def __post_init__(self):
        if self.embedding_dim <= 0:
            raise ValueError("embedding_dim must be positive")


DEFAULT_CONFIG = PipelineConfig()
