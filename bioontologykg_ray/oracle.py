"""Single-process pure-Python oracle — the conformance reference.

Implements exactly the semantics the Ray pipeline must reproduce
(extraction → linking → union-find canonicalization → dedup), with
plain loops and dicts, no Ray — mirroring how the reference repo
actually runs (single process, sequential; SURVEY.md §4.1). Golden
triples from this oracle gate the distributed pipeline at P/R ≥ 0.95
(BASELINE.json).

Deliberately independent code: no shared stage logic beyond the two
spec-level primitives (the triple regex and the deterministic embedding
function, which *define* the extraction grammar and the pseudo-model).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

from bioontologykg_ray.functions.embedding import embed_text
from bioontologykg_ray.stages.extract import RELATION_PHRASES, TRIPLE_PATTERN
import re


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-id root so canonical ids match the distributed min-label
            lo, hi = sorted((ra, rb))
            self.parent[hi] = lo

    def root(self, x: str) -> str:
        if x not in self.parent:
            return x
        return self.find(x)


def oracle_triples(
    transcripts: pa.Table,
    ontology: pa.Table,
    dim: int = 32,
    symmetric_predicates: tuple = ("INTERACTS_WITH", "SAME_AS"),
) -> dict:
    """Run the whole workload sequentially. Returns dict with:
    ``linked``   set of (subj, pred, obj, conv_id, turn_idx) pre-canonical
    ``edges``    dict (src, predicate, dst) → mention count (canonical)
    ``nodes``    set of canonical node ids
    ``dead``     count of triples dropped for unlinked endpoints
    """
    pattern = re.compile(TRIPLE_PATTERN)
    phrase_to_pred = dict(RELATION_PHRASES)

    # --- alias index (reference: MERGE-key dictionaries)
    tids = ontology["term_id"].to_pylist()
    names = ontology["name"].to_pylist()
    syns = ontology["synonyms"].to_pylist()
    obso = ontology["is_obsolete"].to_pylist()
    embs = np.asarray(
        ontology["embedding"].combine_chunks().flatten(), dtype=np.float32
    ).reshape(len(tids), -1)
    alias: dict[str, list[int]] = defaultdict(list)
    for i in range(len(tids)):
        if obso[i]:
            continue
        for s in [names[i], *(syns[i] or [])]:
            alias[s.strip().lower()].append(i)

    def link(surface: str, ctx: np.ndarray) -> str | None:
        cands = alias.get(surface.strip().lower())
        if not cands:
            return None
        if len(cands) == 1:
            return tids[cands[0]]
        best_tid, best_score = None, None
        for i in sorted(cands, key=lambda r: tids[r]):
            # float64 like the distributed linker (and the DuckDB
            # DOUBLE[] oracle) — a float32 accumulation lands exactly on
            # the 1e-6 rounding grid and can flip the argmax
            score = round(
                float(np.dot(embs[i].astype(np.float64), ctx.astype(np.float64))),
                6,
            )
            if best_score is None or score > best_score:
                best_tid, best_score = tids[i], score
        return best_tid

    # --- sequential extract + link over turns in stable order
    rows = sorted(
        zip(
            transcripts["conv_id"].to_pylist(),
            transcripts["turn_idx"].to_pylist(),
            transcripts["text"].to_pylist(),
        )
    )
    linked: list[tuple] = []
    dead = 0
    uf = UnionFind()
    for conv_id, turn_idx, text in rows:
        matches = list(pattern.finditer(text))
        if not matches:
            continue
        ctx = embed_text(text, dim)
        for m in matches:
            s = link(m.group(1), ctx)
            o = link(m.group(3), ctx)
            pred = phrase_to_pred[m.group(2)]
            if s is None or o is None:
                dead += 1
                continue
            linked.append((s, pred, o, conv_id, turn_idx))
            if pred == "SAME_AS":
                uf.union(s, o)

    # --- ontology alt_ids are same-as inputs too
    for tid, alts in zip(tids, ontology["alt_ids"].to_pylist()):
        for alt in alts or []:
            uf.union(tid, alt)

    # --- canonical rewrite + dedup/count
    edges: dict[tuple, int] = defaultdict(int)
    nodes: set[str] = set()
    for s, pred, o, conv_id, turn_idx in linked:
        if pred == "SAME_AS":
            continue
        cs, co = uf.root(s), uf.root(o)
        if pred in symmetric_predicates and cs > co:
            cs, co = co, cs
        edges[(cs, pred, co)] += 1
        nodes.add(cs)
        nodes.add(co)

    return {"linked": linked, "edges": dict(edges), "nodes": nodes, "dead": dead}


def precision_recall(sys_set: set, gold_set: set) -> tuple[float, float]:
    if not sys_set and not gold_set:
        return 1.0, 1.0
    tp = len(sys_set & gold_set)
    p = tp / len(sys_set) if sys_set else 0.0
    r = tp / len(gold_set) if gold_set else 0.0
    return p, r
