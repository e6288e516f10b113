"""Arrow schemas for every logical table in the engine.

Input shape is fixed by BASELINE.json ``input_hint``; node/edge shapes
re-express the reference's property-graph model (SURVEY.md §1.4) as
Parquet tables.
"""

from __future__ import annotations

import pyarrow as pa

EMBED_DIM = 32  # test-scale dim (reference uses 768; FIXTURES.md F2 says D=32)

# F1 — primary pipeline input (BASELINE.json input_hint)
TRANSCRIPTS = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# F2 — linker dictionary (mirrors GOTerm, reference
# src/BioOntologyKG/importers/import_go_obo.py:22-39)
def ontology_terms_schema(dim: int = EMBED_DIM) -> pa.Schema:
    return pa.schema(
        [
            pa.field("term_id", pa.string()),
            pa.field("name", pa.string()),
            pa.field("namespace", pa.string()),
            pa.field("definition", pa.string()),
            pa.field("synonyms", pa.list_(pa.string())),
            pa.field("xrefs", pa.list_(pa.string())),
            pa.field("alt_ids", pa.list_(pa.string())),
            pa.field("is_obsolete", pa.bool_()),
            pa.field("embedding", pa.list_(pa.float32(), dim)),
        ]
    )


# Raw extracted triples — surface forms + provenance (reference precedent:
# GORelationship import_go_obo.py:41-46, monarch row→triple)
RAW_TRIPLES = pa.schema(
    [
        pa.field("subj_surface", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj_surface", pa.string()),
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("span_start", pa.int32()),
    ]
)

# Linked triples — surfaces resolved to term ids
LINKED_TRIPLES = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
    ]
)

# Final graph tables (SURVEY.md §1.4: nodes/edges Parquet instead of Neo4j)
def nodes_schema(dim: int = EMBED_DIM) -> pa.Schema:
    return pa.schema(
        [
            pa.field("node_id", pa.string()),
            pa.field("label", pa.string()),
            pa.field("name", pa.string()),
            pa.field("props", pa.string()),  # json-encoded property map
            pa.field("embedding", pa.list_(pa.float32(), dim)),
        ]
    )


EDGES = pa.schema(
    [
        pa.field("src", pa.string()),
        pa.field("predicate", pa.string()),
        pa.field("dst", pa.string()),
        pa.field("n_mentions", pa.int64()),   # provenance: supporting mention count
    ]
)

# Dead-letter table (reference K5 failure-log sink,
# neo4j_cancerkg_builder.py:299-321)
DEAD_LETTER = pa.schema(
    [
        pa.field("kind", pa.string()),       # e.g. 'unlinked_mention'
        pa.field("payload", pa.string()),
        pa.field("reason", pa.string()),
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
    ]
)
