"""Entity linking: mention surface → canonical ontology term id.

Re-expresses the reference's lookup-and-score linking machinery:

- alias dictionary lookup (exact match after normalization) — the
  MERGE-by-key / alias-split precedent (`cql/import/import_hgnc.cql:28-37`,
  J3 prefix/alias matching `cql/import/cosmic/import_cosmic_genes.cql:41-46`);
- embedding-scored disambiguation for ambiguous aliases — the kNN
  vector search + cosine scorer precedent (T5/T6,
  `src/BioOntologyKG/embedding/PubMedBERTEmbedder.py:142-152`,
  `neo4j_pubmed_batch_embeddings_processor.py:750-812`);
- obsolete terms never link (`is_obsolete`, `import_go_obo.py:105`).

Scale design: the ontology index is built ONCE and broadcast with
``ray.put``; every linker actor reads it in ``__init__`` (one object
store fetch per actor, zero-copy shared on a node — NOT re-shipped per
batch). Linking itself is a stateful ``map_batches`` actor-pool stage.

Determinism (SURVEY.md §7.5): output is independent of batch/actor
assignment — no cross-batch mutable caches influence results; ambiguous
candidates are scored with per-candidate float32 dots (identical
arithmetic to the oracle) rounded to 1e-6, ties broken by smallest
term_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def normalize_surface(s: str) -> str:
    """Key normalization — load-bearing for join correctness (M7,
    `cql/remediation/remediate_uniprot_pubmed_ids.cql:8-27`)."""
    return s.strip().lower()


def build_alias_index(ontology: pa.Table, drop_obsolete: bool = True) -> dict:
    """alias surface → candidates, as a broadcastable payload:

    ``unamb_keys``/``unamb_vals``: parallel Arrow string arrays — alias →
    its single non-obsolete term_id (the ``pc.index_in`` fast path);
    ``amb_keys``: Arrow array of the ambiguous aliases;
    ``ambiguous``: alias → (term_ids sorted, float32 embedding rows) —
    only the genuinely ambiguous tail is Python (dozens-to-thousands of
    entries), everything alias-cardinality-sized stays columnar.

    The columnar-only payload matters twice at scale: construction is
    vectorized end-to-end (the driver's serial floor — this function
    runs once per job before any task can start), and ``ray.put``
    serializes Arrow buffers zero-copy instead of pickling
    millions-of-entries Python dicts (measured: dict payload cost more
    to put than to build at 1.3M terms).
    """
    def _one_chunk(col: pa.ChunkedArray) -> pa.Array:
        c = col.combine_chunks()
        return c if isinstance(c, pa.Array) else (
            c.chunk(0) if c.num_chunks else pa.array([], col.type)
        )

    tids_arrow = _one_chunk(ontology["term_id"])
    names_arr = _one_chunk(ontology["name"])
    obso = np.asarray(
        ontology["is_obsolete"].combine_chunks().to_numpy(zero_copy_only=False),
        dtype=bool,
    )
    n_terms = len(tids_arrow)
    emb_flat = np.asarray(ontology["embedding"].combine_chunks().flatten())
    emb = emb_flat.reshape(n_terms, -1)
    if emb.dtype != np.float32:
        emb = emb.astype(np.float32)

    # Vectorized (alias surface, term row) explode: names contribute one
    # surface per term; synonyms flatten with Arrow list parent indices.
    # Replaces a Python setdefault-per-surface loop (~8 µs/alias) that
    # sat on the driver's serial floor (BASELINE.md Amdahl note). Within
    # an alias the grouping order is irrelevant: single-candidate
    # aliases have one row, ambiguous ones re-sort by term_id anyway.
    syn_list = _one_chunk(ontology["synonyms"])
    syn_parent = np.asarray(syn_list.value_parent_indices())
    rows_all = np.concatenate([np.arange(n_terms, dtype=np.int64), syn_parent])
    surf_all = pa.concat_arrays([names_arr, syn_list.flatten()])
    norm_all = pc.utf8_lower(pc.utf8_trim_whitespace(surf_all))
    if drop_obsolete and obso.any():
        keep = ~obso[rows_all]
        rows_all = rows_all[keep]
        norm_all = norm_all.take(pa.array(np.flatnonzero(keep)))

    # factorize + stable sort: one C pass groups every alias; uniques
    # keep first-appearance order (determinism irrelevant — see above)
    codes, uniques = pd.factorize(
        norm_all.to_numpy(zero_copy_only=False), sort=False
    )
    # dedupe (alias, term) pairs BEFORE counting: a surface listed twice
    # for the SAME term (name repeated in synonyms, or two synonyms
    # normalizing equal) is not ambiguous — counting raw occurrences
    # would push it onto the embedding-scored path (and under a
    # min_link_score floor could even dead-letter it) for no reason
    pair = codes.astype(np.int64) * np.int64(n_terms) + rows_all
    dup = pd.Series(pair).duplicated().to_numpy()
    if dup.any():
        keep_pair = ~dup
        rows_all = rows_all[keep_pair]
        codes = codes[keep_pair]
    counts = np.bincount(codes, minlength=len(uniques))
    order = np.argsort(codes, kind="stable")
    starts = np.searchsorted(codes[order], np.arange(len(uniques)))

    single = counts == 1
    unamb_keys = pa.array(uniques[single], pa.string())
    unamb_rows = rows_all[order[starts[single]]]
    unamb_vals = tids_arrow.take(pa.array(unamb_rows))

    ambiguous: dict[str, tuple[list[str], np.ndarray]] = {}
    multi_codes = np.flatnonzero(~single)
    if multi_codes.size:
        # gather ONLY the ambiguous tail (python conversion stays
        # proportional to ambiguous aliases, not the alias universe)
        sel = np.concatenate(
            [order[starts[c]: starts[c] + counts[c]] for c in multi_codes]
        )
        rows_sel = rows_all[sel]
        tid_sel = tids_arrow.take(pa.array(rows_sel)).to_pylist()
        off = 0
        for c in multi_codes:
            k = int(counts[c])
            rows = rows_sel[off: off + k]
            tid_slice = tid_sel[off: off + k]
            srt = sorted(range(k), key=lambda i: tid_slice[i])
            ambiguous[uniques[c]] = (
                [tid_slice[i] for i in srt], emb[rows[srt]]
            )
            off += k
    return {
        "ambiguous": ambiguous,
        "unamb_keys": unamb_keys,
        "unamb_vals": unamb_vals,
        "amb_keys": pa.array(list(ambiguous.keys()), pa.string()),
    }


def resolve_ambiguous(
    candidates: list[str], cand_emb: np.ndarray, ctx: np.ndarray,
    min_score: float = -1.0,
) -> str | None:
    """argmax cosine(ctx, candidate), scores rounded to 1e-6; ties →
    smallest term_id. Embeddings are pre-L2-normalized, so the dot IS
    the cosine. The dot runs in float64 so the DuckDB oracle
    (``list_inner_product`` over DOUBLE[]) computes bit-identical
    scores. Best score below ``min_score`` → None (the mention
    dead-letters; ADVICE round 1 — the floor used to be dead config)."""
    best_tid, best_score = None, None
    ctx64 = ctx.astype(np.float64)
    for tid, row in zip(candidates, cand_emb):
        score = round(float(np.dot(row.astype(np.float64), ctx64)), 6)
        if best_score is None or score > best_score:
            best_tid, best_score = tid, score
    if best_score is not None and best_score < min_score:
        return None
    return best_tid


class EntityLinker:
    """Actor-pool batch fn over zero-copy Arrow batches of raw triples;
    emits linked triples with a ``linked`` flag + ``reason`` for the
    dead-letter route (K5).

    Fast path is pure Arrow C kernels: normalize → ``pc.index_in``
    against the broadcast alias dictionary → ``pc.take``. Only rows
    whose alias is genuinely ambiguous fall into the Python scoring
    loop (embedding cosine, reference T5/T6 semantics)."""

    def __init__(self, index_ref, min_score: float = -1.0):
        idx = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        self.amb: dict = idx["ambiguous"]
        self.unamb_keys = idx["unamb_keys"]
        self.unamb_vals = idx["unamb_vals"]
        self.amb_keys = idx["amb_keys"]
        self.min_score = min_score

    def _lookup(self, surfaces: pa.ChunkedArray, ctx_mat: np.ndarray):
        """Returns (resolved string array with nulls, norm python list)."""
        norm = pc.utf8_lower(pc.utf8_trim_whitespace(surfaces))
        idx = pc.index_in(norm, value_set=self.unamb_keys)
        resolved = pc.take(self.unamb_vals, idx)  # null where not found
        if len(self.amb):
            amb_hit = pc.is_valid(pc.index_in(norm, value_set=self.amb_keys))
            amb_rows = np.flatnonzero(amb_hit.combine_chunks().to_numpy(zero_copy_only=False))
        else:
            amb_rows = np.empty(0, dtype=np.int64)
        if amb_rows.size:
            norm_py = norm.combine_chunks().to_pylist()
            out = resolved.combine_chunks().to_pylist()
            for r in amb_rows:
                hit = self.amb[norm_py[r]]
                out[r] = resolve_ambiguous(hit[0], hit[1], ctx_mat[r], self.min_score)
            resolved = pa.array(out, pa.string())
        return resolved

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ctx = batch["ctx_emb"].combine_chunks()
        dim = ctx.type.list_size
        ctx_mat = np.asarray(ctx.flatten()).reshape(n, dim) if n else np.zeros((0, 1))
        subj = self._lookup(batch["subj_surface"], ctx_mat)
        obj = self._lookup(batch["obj_surface"], ctx_mat)
        subj_ok = pc.is_valid(subj)
        obj_ok = pc.is_valid(obj)
        linked = pc.and_(subj_ok, obj_ok)
        reason = pc.if_else(
            subj_ok,
            pc.if_else(obj_ok, "", "unlinked_object"),
            "unlinked_subject",
        )
        return pa.table(
            {
                "subj": pc.fill_null(subj, ""),
                "pred": batch["pred"],
                "obj": pc.fill_null(obj, ""),
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "subj_surface": batch["subj_surface"],
                "obj_surface": batch["obj_surface"],
                "linked": linked,
                "reason": reason,
            }
        )


# Per-worker-process linker cache for the stateless-task variant (same
# pattern as extract._TASK_STATE): the broadcast index deserializes once
# per worker process and amortizes across every batch that worker runs.
# cache entries keep a strong reference to the keyed payload and verify
# identity with `is`: a bare id() key could alias a NEW object allocated
# at a GC-reused address and silently serve a linker built from the OLD
# index (round-2 review finding)
_TASK_LINKERS: dict[tuple, tuple[object, EntityLinker]] = {}


def link_batch(batch: pa.Table, index_ref=None, min_score: float = -1.0) -> pa.Table:
    key = (index_ref.hex() if isinstance(index_ref, ray.ObjectRef) else id(index_ref),
           min_score)
    hit = _TASK_LINKERS.get(key)
    if hit is not None and hit[0] is index_ref:
        return hit[1](batch)
    lk = EntityLinker(index_ref, min_score)
    _TASK_LINKERS[key] = (index_ref, lk)
    return lk(batch)


def link_triples(
    raw: ray.data.Dataset,
    index_ref,
    batch_size: int | None = None,
    concurrency: int | tuple | None = None,
    min_score: float = -1.0,
) -> ray.data.Dataset:
    """Raw triples → linked triples (+dead-letter rows flagged).

    ``concurrency=None`` (default) runs linking as STATELESS TASKS with
    a per-worker-process cached index: the lookup is dictionary-bound,
    not model-bound, so tasks use every CPU (an actor pool clamped to
    half the cores idles the other half for the whole stage) and fuse
    with the upstream read+extract into one streaming operator. The
    broadcast index is fetched once per worker process — NOT per batch.

    Pass an int/tuple ``concurrency`` to run the FIXED-size actor pool
    instead — the right shape when linking holds heavyweight state (a
    real transformer embedder, GPU residency): Ray's autoscaling pool
    ramps far too slowly for short stages (measured 38.5s vs 11.7s on
    10M triples), and the pool is clamped to ≤ half the CPUs so the
    stateless stages sharing the execution never starve."""
    from bioontologykg_ray.util import clamp_pool

    if concurrency is None:
        return raw.map_batches(
            link_batch,
            fn_kwargs={"index_ref": index_ref, "min_score": min_score},
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    if isinstance(concurrency, int):
        concurrency = clamp_pool(concurrency)
    return raw.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"index_ref": index_ref, "min_score": min_score},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

