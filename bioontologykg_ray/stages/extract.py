"""Mention detection + (subj, pred, obj) triple extraction.

Re-expresses the reference's document→triple parsers — OBO
``parse_relationships`` (`src/BioOntologyKG/importers/import_go_obo.py:115-145`),
the MonarchKG row→triple mapping
(`src/BioOntologyKG/importers/monarchkg/import_monarchkg_relationships.py:108-117`)
and the PubMed field extractors (M1, `neo4j_pubmed_batch_processor.py:96-324`)
— as a stateful ``map_batches`` stage over Arrow batches.

State held once per actor (reference T1 precedent — model/pattern load
in ``__init__``): the compiled mention/relation regex and the
deterministic context embedder (token-vector cache). Per batch, each
turn's text is scanned with the compiled pattern; a context embedding is
computed once per turn (not per triple) and attached so the linker can
resolve ambiguous aliases without re-reading the text.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data

# Longest phrases first so "is a" never shadows "is the same as".
RELATION_PHRASES = [
    ("is the same as", "SAME_AS"),
    ("interacts with", "INTERACTS_WITH"),
    ("is part of", "PART_OF"),
    ("regulates", "REGULATES"),
    ("is a", "IS_A"),
]

MENTION = r"(?:[a-z]+-)+\d+"
TRIPLE_PATTERN = (
    rf"({MENTION}) ({'|'.join(re.escape(p) for p, _ in RELATION_PHRASES)}) ({MENTION})\."
)


class TripleExtractor:
    """Actor-pool batch fn: pyarrow batch in → raw-triples pyarrow batch out."""

    def __init__(self, dim: int = 32):
        from bioontologykg_ray.functions.embedding import embed_text

        self.dim = dim
        self.pattern = re.compile(TRIPLE_PATTERN)
        self.phrase_to_pred = dict(RELATION_PHRASES)
        self._embed = embed_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()

        subjs: list[str] = []
        preds: list[str] = []
        objs: list[str] = []
        convs: list[str] = []
        turns: list[int] = []
        spans: list[int] = []
        embs: list[np.ndarray] = []
        for i, text in enumerate(texts):
            matches = list(self.pattern.finditer(text))
            if not matches:
                continue
            ctx = self._embed(text, self.dim)  # once per turn, reused per triple
            for m in matches:
                subjs.append(m.group(1))
                preds.append(self.phrase_to_pred[m.group(2)])
                objs.append(m.group(3))
                convs.append(conv[i])
                turns.append(turn[i])
                spans.append(m.start())
                embs.append(ctx)

        emb_flat = (
            np.concatenate(embs).astype(np.float32)
            if embs
            else np.empty(0, dtype=np.float32)
        )
        return pa.table(
            {
                "subj_surface": pa.array(subjs, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "obj_surface": pa.array(objs, pa.string()),
                "conv_id": pa.array(convs, pa.string()),
                "turn_idx": pa.array(turns, pa.int32()),
                "span_start": pa.array(spans, pa.int32()),
                "ctx_emb": pa.FixedSizeListArray.from_arrays(pa.array(emb_flat), self.dim),
            }
        )


# Per-worker-process extractor cache for the stateless-task variant:
# state (compiled regex + token-vector cache) amortizes across every
# batch a worker process handles, without reserving pool CPUs.
_TASK_STATE: dict[int, TripleExtractor] = {}


def extract_batch(batch: pa.Table, dim: int = 32) -> pa.Table:
    ex = _TASK_STATE.get(dim)
    if ex is None:
        ex = _TASK_STATE[dim] = TripleExtractor(dim)
    return ex(batch)


def extract_triples(
    ds: ray.data.Dataset,
    dim: int = 32,
    batch_size: int = 4096,
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """Transcripts → raw triples (surface forms + provenance + ctx embedding).

    Default is stateless tasks (elastic, no CPU reservation — extraction
    state is cheap and cached per worker process); pass ``concurrency``
    to pin an actor pool instead (the shape a heavyweight model-based
    extractor would use)."""
    if concurrency is None:
        return ds.map_batches(
            extract_batch,
            fn_kwargs={"dim": dim},
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return ds.map_batches(
        TripleExtractor,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
