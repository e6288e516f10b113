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
    """Actor-pool batch fn: pyarrow batch in → raw-triples pyarrow batch out.

    ``ambiguous`` (an optional broadcast set of alias surfaces with >1
    linker candidate) pushes the disambiguation predicate down: the
    context embedding — the expensive per-turn step — is only computed
    when one of the turn's mentions actually needs embedding-scored
    resolution. Turns without ambiguous mentions carry a zero context."""

    def __init__(self, dim: int = 32, ambiguous=None):
        import ray as _ray

        from bioontologykg_ray.functions.embedding import embed_text

        self.dim = dim
        self.pattern = re.compile(TRIPLE_PATTERN)
        self.phrase_to_pred = dict(RELATION_PHRASES)
        self._embed = embed_text
        if ambiguous is not None and isinstance(ambiguous, _ray.ObjectRef):
            ambiguous = _ray.get(ambiguous)
        self.ambiguous = ambiguous  # None → always embed

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()

        zero = np.zeros(self.dim, dtype=np.float32)
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
            if self.ambiguous is None or any(
                m.group(1).lower() in self.ambiguous
                or m.group(3).lower() in self.ambiguous
                for m in matches
            ):
                ctx = self._embed(text, self.dim)  # once per turn
            else:
                ctx = zero
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
_TASK_STATE: dict[tuple, TripleExtractor] = {}


def extract_batch(batch: pa.Table, dim: int = 32, ambiguous=None) -> pa.Table:
    import ray as _ray

    ref_key = ambiguous.hex() if isinstance(ambiguous, _ray.ObjectRef) else id(ambiguous)
    key = (dim, ref_key)
    ex = _TASK_STATE.get(key)
    if ex is None:
        ex = _TASK_STATE[key] = TripleExtractor(dim, ambiguous)
    return ex(batch)


def extract_triples(
    ds: ray.data.Dataset,
    dim: int = 32,
    batch_size: int = 4096,
    concurrency: int | tuple | None = None,
    ambiguous=None,
) -> ray.data.Dataset:
    """Transcripts → raw triples (surface forms + provenance + ctx embedding).

    Default is stateless tasks (elastic, no CPU reservation — extraction
    state is cheap and cached per worker process); pass ``concurrency``
    to pin an actor pool instead (the shape a heavyweight model-based
    extractor would use). ``ambiguous``: broadcast set of alias surfaces
    needing embedding-scored disambiguation (see TripleExtractor)."""
    if concurrency is None:
        return ds.map_batches(
            extract_batch,
            fn_kwargs={"dim": dim, "ambiguous": ambiguous},
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return ds.map_batches(
        TripleExtractor,
        fn_constructor_kwargs={"dim": dim, "ambiguous": ambiguous},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
