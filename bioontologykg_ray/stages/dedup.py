"""Exact dedup + edge canonicalization + skew-safe counting.

Reference precedents:
- D1 MERGE-on-key idempotent upsert (every importer) → hash-partition by
  key + per-group first/merge;
- D2 duplicate-group cleanup keep-first
  (`cql/remediation/remediate_duplicate_pubmed_ids.cql:1-13`);
- D4/J6 symmetric-pair dedup — canonical (lo, hi) endpoint order
  (`cql/import/uniprot/uniprot_intact.cql:31-40`,
  `cql/import/cosmic/import_cosmic_gene_census.cql:59-68`).

Scale pattern: every global groupby here is preceded by a per-batch
partial combine inside ``map_batches`` (emit one row per key per batch),
so the shuffle moves keys, not rows — the two-phase aggregation the
head-entity skew requires (SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

SEP = "\x1f"  # unit separator — never occurs in ids/predicates


def canonicalize_symmetric(
    ds: ray.data.Dataset, symmetric_predicates: tuple
) -> ray.data.Dataset:
    """For symmetric predicates, order endpoints (lo, hi) so A-r-B and
    B-r-A dedup to one edge (J6 ``id(u1) < id(u2)`` analogue)."""
    preds = list(symmetric_predicates)

    def fn(t: pa.Table) -> pa.Table:
        is_sym = pc.is_in(t["pred"], value_set=pa.array(preds, pa.string()))
        flip = pc.and_(is_sym, pc.greater(t["subj"], t["obj"]))
        subj = pc.if_else(flip, t["obj"], t["subj"])
        obj = pc.if_else(flip, t["subj"], t["obj"])
        return t.set_column(t.schema.get_field_index("subj"), "subj", subj).set_column(
            t.schema.get_field_index("obj"), "obj", obj
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def count_triples(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(subj, pred, obj) → distinct edges with mention counts.

    Phase 1 (map side): per-batch value_counts — one row per key per
    batch. Phase 2: groupby the composite key, Sum the partials. The
    composite key keeps the groupby single-column; split back after."""

    from bioontologykg_ray.stages.agg import sorted_group_apply

    def partial(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t["subj"], t["pred"], t["obj"], SEP)
        # a null field nulls the composite key and pandas' combine
        # groupby would then silently DROP the row — fail loudly like
        # the packed path (count_edges_packed) does
        if key.null_count:
            raise ValueError(
                "count_triples: null subj/pred/obj in input "
                f"({key.null_count} rows)"
            )
        vc = pc.value_counts(key)
        return pa.table(
            {"key": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # millions of distinct triples: parallel range-sorted combine over the
    # reduced partials (see stages/agg.py), never a single combine task
    combine = lambda df: df.groupby("key", as_index=False)["n"].sum()
    empty = pd.DataFrame({"key": pd.Series(dtype="object"), "n": pd.Series(dtype="int64")})
    # hash_sort: the composite string key would make the range sort
    # compare ~60-byte strings per row; sorting its uint64 hash moves
    # the same rows with int compares (combine still groups by the real
    # key, so collisions stay exact)
    summed = sorted_group_apply(partials, "key", combine, empty, hash_sort=True)

    def split(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["key"], SEP)
        return pa.table(
            {
                "src": pc.list_element(parts, 0),
                "predicate": pc.list_element(parts, 1),
                "dst": pc.list_element(parts, 2),
                "n_mentions": t["n"].cast(pa.int64()),
            }
        )

    return summed.map_batches(split, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Fused integer-space canonicalize + symmetric order + dedup/count.
#
# The flagship's edge-table tail (canonical rewrite → SAME_AS drop →
# symmetric (lo, hi) endpoint order → distinct+count) operated on
# ~80-byte string triple keys; at sf16 (38M turns) that chain was 55%
# of end-to-end wall and its corpus-order exchange shipped those
# strings. In the broadcast-mapping regime (id vocabulary =
# ontology term_ids ∪ alt_ids, dimension-sized by construction) the
# whole chain runs in INT space instead: ids dictionary-encode against
# the SORTED vocab — index order == lexicographic string order, so the
# symmetric lo/hi flip and min-root semantics are bit-identical to the
# string path — the canonical mapping becomes an int→int take, and
# (subj, pred, obj) packs into ONE uint64. The exchange then ships
# 16 bytes/row of pure ints and every sort/group compare is a word
# compare. Runs as stateless tasks (full-width parallelism, no actor
# clamp) with the encode tables broadcast once and cached per worker.
# ---------------------------------------------------------------------------

# entries hold (payload, state): the strong ref + `is` check guards the
# non-ObjectRef id() key against GC address reuse, and the size bound
# caps worker RSS when a long-lived driver broadcasts a fresh state per
# partition/run (each entry holds a vocab-sized pd.Index)
_PACK_STATE: dict[str, tuple[object, dict]] = {}
_PACK_STATE_MAX = 4


def _pack_state(state_ref) -> dict:
    """Per-worker-process cache of the derived encode tables (same
    pattern as linker._TASK_LINKERS): the broadcast payload deserializes
    once per worker; the pandas Index hash table builds once and
    amortizes across every batch the worker runs."""
    key = (
        state_ref.hex() if isinstance(state_ref, ray.ObjectRef) else str(id(state_ref))
    )
    hit = _PACK_STATE.get(key)
    st = None
    if hit is not None and (
        isinstance(state_ref, ray.ObjectRef) or hit[0] is state_ref
    ):
        st = hit[1]
    if st is None:
        payload = (
            ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
        )
        vocab: np.ndarray = payload["vocab"]  # sorted, unique, object dtype
        preds: list[str] = payload["preds"]
        v = len(vocab)
        canon = np.arange(v, dtype=np.int64)
        mapping: dict = payload["mapping"]
        if mapping:
            keys = np.asarray(list(mapping.keys()), dtype=object)
            vals = np.asarray(list(mapping.values()), dtype=object)
            ki = np.searchsorted(vocab, keys)
            vi = np.searchsorted(vocab, vals)
            if (
                (ki >= v).any() or (vi >= v).any()
                or (vocab[np.minimum(ki, v - 1)] != keys).any()
                or (vocab[np.minimum(vi, v - 1)] != vals).any()
            ):
                raise ValueError(
                    "count_edges_packed: canonical mapping contains ids "
                    "outside the vocab — packed-path contract violation"
                )
            canon[ki] = vi
        while len(_PACK_STATE) >= _PACK_STATE_MAX:
            _PACK_STATE.pop(next(iter(_PACK_STATE)))
        st = {
            "index": pd.Index(vocab),
            "vocab": vocab,
            "canon": canon,
            "pindex": pd.Index(np.asarray(preds, dtype=object)),
            "preds": np.asarray(preds, dtype=object),
            "sym_lut": np.array([p in payload["sym"] for p in preds]),
            "drop_lut": np.array([p in payload["drop"] for p in preds]),
            "V": np.uint64(v),
            "P": np.uint64(len(preds)),
        }
        _PACK_STATE[key] = (state_ref, st)
    return st


def _pack_partial(t: pa.Table, state_ref=None) -> pa.Table:
    """Per-batch: encode → canonicalize → drop → flip → pack → unique."""
    st = _pack_state(state_ref)
    subj = t["subj"].to_numpy(zero_copy_only=False)
    obj = t["obj"].to_numpy(zero_copy_only=False)
    pred = t["pred"].to_numpy(zero_copy_only=False)
    s = st["index"].get_indexer(subj)
    o = st["index"].get_indexer(obj)
    p = st["pindex"].get_indexer(pred)
    if (s < 0).any() or (o < 0).any() or (p < 0).any():
        bad_id = next(
            (x for x, i in zip(subj, s) if i < 0),
            next((x for x, i in zip(obj, o) if i < 0), None),
        )
        bad_p = next((x for x, i in zip(pred, p) if i < 0), None)
        raise ValueError(
            f"count_edges_packed: id/predicate outside the vocab "
            f"(id={bad_id!r}, pred={bad_p!r}) — packed-path contract violation"
        )
    s = st["canon"][s]
    o = st["canon"][o]
    keep = ~st["drop_lut"][p]
    s, o, p = s[keep], o[keep], p[keep]
    flip = st["sym_lut"][p] & (s > o)
    s2 = np.where(flip, o, s).astype(np.uint64)
    o2 = np.where(flip, s, o).astype(np.uint64)
    code = (s2 * st["P"] + p.astype(np.uint64)) * st["V"] + o2
    codes, counts = np.unique(code, return_counts=True)
    return pa.table(
        {
            "code": pa.array(codes, pa.uint64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def _pack_unpack(t: pa.Table, state_ref=None) -> pa.Table:
    st = _pack_state(state_ref)
    code = t["code"].to_numpy(zero_copy_only=False).astype(np.uint64)
    v, p_n = st["V"], st["P"]
    o = (code % v).astype(np.int64)
    rem = code // v
    p = (rem % p_n).astype(np.int64)
    s = (rem // p_n).astype(np.int64)
    return pa.table(
        {
            "src": pa.array(st["vocab"][s], pa.string()),
            "predicate": pa.array(st["preds"][p], pa.string()),
            "dst": pa.array(st["vocab"][o], pa.string()),
            "n_mentions": t["n"].cast(pa.int64()),
        }
    )


def count_edges_packed(
    linked: ray.data.Dataset,
    vocab_ids,
    predicates,
    mapping: dict,
    symmetric_predicates: tuple,
    drop_predicates: tuple = ("SAME_AS",),
) -> ray.data.Dataset:
    """(subj, pred, obj) triples whose ids live in a CLOSED, broadcastable
    vocabulary → canonicalized distinct edges with mention counts
    (src, predicate, dst, n_mentions) — exact fusion of
    ``canonicalize_triples`` + SAME_AS drop + ``canonicalize_symmetric``
    + ``count_triples`` in dictionary-encoded integer space.

    ``vocab_ids``: every id a triple endpoint or mapping entry may hold
    (flagship: ontology term_ids ∪ alt_ids). ``predicates``: the
    extractor's closed relation set. ``mapping``: the path-compressed
    canonical mapping (``mapping_dict``). Unknown ids/predicates raise —
    this path is only routed to when the vocabulary contract holds; the
    string chain remains the open-vocabulary fallback."""
    from bioontologykg_ray.stages.agg import sorted_group_apply

    vocab = np.unique(np.asarray(list(vocab_ids), dtype=object))
    preds = sorted(set(predicates))
    v, p_n = len(vocab), len(preds)
    if v * v * p_n >= 2**63:
        raise ValueError(
            f"count_edges_packed: vocab too large to pack (V={v}, P={p_n})"
        )
    state_ref = ray.put(
        {
            "vocab": vocab,
            "preds": preds,
            "mapping": dict(mapping),
            "sym": frozenset(symmetric_predicates),
            "drop": frozenset(drop_predicates),
        }
    )
    partials = linked.map_batches(
        _pack_partial, fn_kwargs={"state_ref": state_ref}, batch_format="pyarrow"
    )
    combine = lambda df: df.groupby("code", as_index=False)["n"].sum()  # noqa: E731
    empty = pd.DataFrame(
        {"code": pd.Series(dtype="uint64"), "n": pd.Series(dtype="int64")}
    )
    # codes are already uint64 — the range sort exchanges 16 B/row and
    # compares words; no hash_sort indirection needed
    summed = sorted_group_apply(partials, "code", combine, empty)
    return summed.map_batches(
        _pack_unpack, fn_kwargs={"state_ref": state_ref}, batch_format="pyarrow"
    )


def dedup_first_by_key(
    ds: ray.data.Dataset, key_cols: list[str], order_cols: list[str]
) -> ray.data.Dataset:
    """Keep-first dedup (D2): per-batch partial keep-first, then a global
    groupby keep-first, ordering by ``order_cols`` (deterministic under
    any batch/actor assignment)."""

    from bioontologykg_ray.stages.agg import two_phase_agg

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order_cols, kind="mergesort").drop_duplicates(
            key_cols, keep="first"
        )

    # idempotent partial: min-ordered row per key per batch; combine picks
    # the min-ordered row across partials — vectorized, no per-key state
    return two_phase_agg(ds, keep_first, keep_first)


def distinct_values(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Distinct values of one column: per-batch unique → vectorized
    two-phase combine (no per-key accumulators)."""
    from bioontologykg_ray.stages.agg import two_phase_agg

    def per_batch(t: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(t[col].combine_chunks())})

    pre = ds.map_batches(per_batch, batch_format="pyarrow")
    return two_phase_agg(
        pre,
        lambda df: df.drop_duplicates(),
        lambda df: df.drop_duplicates(),
    )
