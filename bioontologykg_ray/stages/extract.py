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
        self._amb_arr = (
            pa.array(sorted(ambiguous), pa.string()) if ambiguous is not None else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # null-safe: one NULL text would TypeError the whole batch join
        texts = [t if t is not None else "" for t in batch["text"].to_pylist()]
        n = len(texts)
        import pyarrow.compute as pc

        # ONE regex scan over a "\n"-joined megastring instead of a
        # Python finditer call + list alloc per row (the round-2 hot-loop
        # fix: 2.8x on the measured extraction profile). The pattern can
        # never match across the separator — mentions and relation
        # phrases contain no newline — so the match set is identical;
        # match → row recovers via searchsorted on row start offsets,
        # and span_start stays the true within-text offset.
        mega = "\n".join(texts)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
        row_starts = np.zeros(n, dtype=np.int64)
        if n > 1:
            np.cumsum(lens[:-1] + 1, out=row_starts[1:])

        subjs: list[str] = []
        phrases: list[str] = []
        objs: list[str] = []
        mstarts: list[int] = []
        for m in self.pattern.finditer(mega):
            subjs.append(m.group(1))
            phrases.append(m.group(2))
            objs.append(m.group(3))
            mstarts.append(m.start())

        k = len(subjs)
        mstart_arr = np.asarray(mstarts, dtype=np.int64)
        rows = (
            np.searchsorted(row_starts, mstart_arr, side="right") - 1
            if k
            else np.empty(0, dtype=np.int64)
        )
        spans = (mstart_arr - row_starts[rows]).astype(np.int32) if k else np.empty(0, np.int32)

        subj_arr = pa.array(subjs, pa.string())
        obj_arr = pa.array(objs, pa.string())
        pred_arr = pa.array([self.phrase_to_pred[p] for p in phrases], pa.string())

        # rows needing a context embedding: all rows with matches when no
        # ambiguity pushdown, else only rows where some mention surface
        # is a genuinely ambiguous alias (vectorized is_in, not a Python
        # any() per match)
        if k == 0:
            need = np.empty(0, dtype=np.int64)
        elif self._amb_arr is None:
            need = np.unique(rows)
        else:
            hit = pc.or_(
                pc.is_in(pc.utf8_lower(subj_arr), value_set=self._amb_arr),
                pc.is_in(pc.utf8_lower(obj_arr), value_set=self._amb_arr),
            ).to_numpy(zero_copy_only=False)
            need = np.unique(rows[hit])

        ctx_rows = np.zeros((n, self.dim), dtype=np.float32) if n else np.zeros((0, self.dim), np.float32)
        for r in need:
            ctx_rows[r] = self._embed(texts[r], self.dim)  # once per turn
        emb_flat = ctx_rows[rows].ravel() if k else np.empty(0, dtype=np.float32)

        rows_idx = pa.array(rows, pa.int64())
        return pa.table(
            {
                "subj_surface": subj_arr,
                "pred": pred_arr,
                "obj_surface": obj_arr,
                "conv_id": pc.take(batch["conv_id"].combine_chunks(), rows_idx),
                "turn_idx": pc.take(
                    batch["turn_idx"].combine_chunks(), rows_idx
                ).cast(pa.int32()),
                "span_start": pa.array(spans, pa.int32()),
                "ctx_emb": pa.FixedSizeListArray.from_arrays(pa.array(emb_flat), self.dim),
            }
        )


# Per-worker-process extractor cache for the stateless-task variant:
# state (compiled regex + token-vector cache) amortizes across every
# batch a worker process handles, without reserving pool CPUs.
# entries hold a strong reference to the keyed payload and verify it
# with `is`: a bare id() key could alias a NEW object at a GC-reused
# address and silently gate ctx embeddings on the WRONG ambiguous set
# (see linker._TASK_LINKERS — same round-2 review finding)
_TASK_STATE: dict[tuple, tuple[object, TripleExtractor]] = {}


def extract_batch(batch: pa.Table, dim: int = 32, ambiguous=None) -> pa.Table:
    import ray as _ray

    ref_key = ambiguous.hex() if isinstance(ambiguous, _ray.ObjectRef) else id(ambiguous)
    key = (dim, ref_key)
    hit = _TASK_STATE.get(key)
    if hit is not None and hit[0] is ambiguous:
        return hit[1](batch)
    ex = TripleExtractor(dim, ambiguous)
    _TASK_STATE[key] = (ambiguous, ex)
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
