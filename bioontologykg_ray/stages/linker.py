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
import ray
import ray.data


def normalize_surface(s: str) -> str:
    """Key normalization — load-bearing for join correctness (M7,
    `cql/remediation/remediate_uniprot_pubmed_ids.cql:8-27`)."""
    return s.strip().lower()


def build_alias_index(ontology: pa.Table, drop_obsolete: bool = True) -> dict:
    """alias surface → candidates; plus term embedding rows.

    Returns a plain-python payload suitable for ``ray.put`` broadcast:
    ``unambiguous``: alias → term_id (single non-obsolete candidate)
    ``ambiguous``:   alias → (term_ids sorted, float32 matrix rows)
    ``term_info``:   term_id → (name, namespace, embedding row index)
    ``emb``:         (n_terms, dim) float32 matrix
    """
    tids = ontology["term_id"].to_pylist()
    names = ontology["name"].to_pylist()
    namespaces = ontology["namespace"].to_pylist()
    syns = ontology["synonyms"].to_pylist()
    obso = ontology["is_obsolete"].to_pylist()
    emb = np.asarray(ontology["embedding"].combine_chunks().flatten()).reshape(
        len(tids), -1
    ).astype(np.float32)

    alias_to: dict[str, list[int]] = {}
    for row, (tid, name, syn_list, ob) in enumerate(zip(tids, names, syns, obso)):
        if drop_obsolete and ob:
            continue
        for surface in [name, *(syn_list or [])]:
            alias_to.setdefault(normalize_surface(surface), []).append(row)

    unambiguous: dict[str, str] = {}
    ambiguous: dict[str, tuple[list[str], np.ndarray]] = {}
    for alias, rows in alias_to.items():
        if len(rows) == 1:
            unambiguous[alias] = tids[rows[0]]
        else:
            rows = sorted(rows, key=lambda r: tids[r])  # stable tie-break order
            ambiguous[alias] = ([tids[r] for r in rows], emb[rows])
    term_info = {
        tids[r]: (names[r], namespaces[r], r) for r in range(len(tids))
    }
    return {
        "unambiguous": unambiguous,
        "ambiguous": ambiguous,
        "term_info": term_info,
        "emb": emb,
    }


def resolve_ambiguous(candidates: list[str], cand_emb: np.ndarray, ctx: np.ndarray) -> str:
    """argmax cosine(ctx, candidate), scores rounded to 1e-6; ties →
    smallest term_id. Embeddings are pre-L2-normalized, so the dot IS
    the cosine. Identical arithmetic in the single-process oracle."""
    best_tid, best_score = None, None
    for tid, row in zip(candidates, cand_emb):
        score = round(float(np.dot(row, ctx)), 6)
        if best_score is None or score > best_score:
            best_tid, best_score = tid, score
    return best_tid


class EntityLinker:
    """Actor-pool batch fn over raw triples; emits linked triples with a
    ``linked`` flag + ``reason`` for the dead-letter route (K5)."""

    def __init__(self, index_ref):
        idx = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        self.unamb: dict = idx["unambiguous"]
        self.amb: dict = idx["ambiguous"]

    def _resolve(self, surface: str, ctx: np.ndarray) -> str | None:
        alias = normalize_surface(surface)
        tid = self.unamb.get(alias)
        if tid is not None:
            return tid
        hit = self.amb.get(alias)
        if hit is None:
            return None
        return resolve_ambiguous(hit[0], hit[1], ctx)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # fast path: vectorized dict map for unambiguous aliases
        subj_norm = batch["subj_surface"].str.strip().str.lower()
        obj_norm = batch["obj_surface"].str.strip().str.lower()
        subj = subj_norm.map(self.unamb)
        obj = obj_norm.map(self.unamb)
        # slow path: ambiguous aliases (small minority) via embedding score
        need_s = subj.isna() & subj_norm.isin(self.amb.keys())
        need_o = obj.isna() & obj_norm.isin(self.amb.keys())
        if need_s.any():
            ctxs = batch.loc[need_s, "ctx_emb"]
            subj.loc[need_s] = [
                resolve_ambiguous(*self.amb[a], np.asarray(c, dtype=np.float32))
                for a, c in zip(subj_norm[need_s], ctxs)
            ]
        if need_o.any():
            ctxs = batch.loc[need_o, "ctx_emb"]
            obj.loc[need_o] = [
                resolve_ambiguous(*self.amb[a], np.asarray(c, dtype=np.float32))
                for a, c in zip(obj_norm[need_o], ctxs)
            ]
        linked = subj.notna() & obj.notna()
        reason = pd.Series("", index=batch.index, dtype="object")
        reason[subj.isna()] = "unlinked_subject"
        reason[obj.isna()] = "unlinked_object"
        return pd.DataFrame(
            {
                "subj": subj.fillna(""),
                "pred": batch["pred"],
                "obj": obj.fillna(""),
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "subj_surface": batch["subj_surface"],
                "obj_surface": batch["obj_surface"],
                "linked": linked,
                "reason": reason,
            }
        )


def link_triples(
    raw: ray.data.Dataset,
    index_ref,
    batch_size: int = 4096,
    concurrency: int | tuple = 4,
) -> ray.data.Dataset:
    """Raw triples → linked triples (+dead-letter rows flagged).

    Autoscaling actor pool (1, concurrency): the minimum never starves
    the task stages of CPUs, the maximum bounds the pool's footprint."""
    if isinstance(concurrency, int):
        concurrency = (1, max(1, concurrency))
    return raw.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def split_linked(ds: ray.data.Dataset):
    """Split into (linked triples, dead letters). Materializes once so the
    two branches don't re-execute the upstream pipeline."""
    mat = ds.materialize()
    linked = mat.filter(expr="linked == True").select_columns(
        ["subj", "pred", "obj", "conv_id", "turn_idx"]
    )
    dead = mat.filter(expr="linked == False").select_columns(
        ["subj_surface", "obj_surface", "pred", "reason", "conv_id", "turn_idx"]
    )
    return linked, dead
