"""Deduplication family: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Extends the reference's exact-key dedup (D1/D2, SURVEY.md §2.8) with the
near-duplicate operators a training-data pipeline needs. Each operator
is a composition of vectorized ``map_batches`` + shuffles; all
high-cardinality group operations go through stages/agg.py
(two-phase vectorized aggregation / sorted-block group apply) instead of
Ray's per-key-accumulator aggregate:

- exact:      content hash → partial min-id per batch → combine (MERGE
              first-wins, `remediate_duplicate_pubmed_ids.cql:1-13`)
- n-gram Jaccard: inverted shingle index (explode → sorted group apply →
              pair count) — EXACT pair Jaccard, SQL-verifiable
- MinHash+LSH: shingle → signature → band → bucket pairs → exact-Jaccard
              verify. The scale path: at 100 TB drop ultra-frequent
              shingles and band keys with huge buckets (cap documented).
- SimHash:    64-bit signature, banded buckets, Hamming verify
- embedding:  label-blocked pairwise cosine (the general form blocks by
              coarse quantization bucket)

All pair outputs are (id_a < id_b, score rounded to 1e-6) so results are
deterministic and order-insensitive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from bioontologykg_ray.functions import hashing as H
from bioontologykg_ray.functions.textstats import md5_hex
from bioontologykg_ray.stages.agg import (
    grouped_count,
    grouped_distinct,
    sorted_group_apply,
    two_phase_agg,
)

_EMPTY_PAIRS = pd.DataFrame(
    {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)}
)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup_docs(ds: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text") -> ray.data.Dataset:
    """One row per distinct text, keeping the minimum id (first-wins
    MERGE semantics). Two-phase: per-batch (hash, min id) partials, then
    a vectorized combine — the shuffle moves one row per distinct text
    per batch, never the full corpus."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df[text_col].map(md5_hex)
        return (
            pd.DataFrame({"text_md5": h, id_col: df[id_col]})
            .groupby("text_md5", as_index=False)[id_col]
            .min()
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("text_md5", as_index=False)[id_col].min()

    return two_phase_agg(ds, partial, combine)


# --------------------------------------------------------------------------
# candidate-pair emission over an inverted index (shared by n-gram / LSH)
# --------------------------------------------------------------------------

def _pairs_apply(key_col: str):
    """Vectorized-within-task pair emitter: receives complete key groups
    (sorted-block contract, stages/agg.py), emits all (a < b) doc pairs
    per group."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby(key_col, sort=False):
            ids = np.unique(g["doc_id"].to_numpy())
            if ids.size >= 2:
                ia, ib = np.triu_indices(ids.size, 1)
                out_a.append(ids[ia])
                out_b.append(ids[ib])
        if not out_a:
            return _EMPTY_PAIRS.copy()
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a).astype(np.int64),
                "b": np.concatenate(out_b).astype(np.int64),
            }
        )

    return fn


# --------------------------------------------------------------------------
# exact n-gram Jaccard via inverted shingle index
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds: ray.data.Dataset, n: int = 3, tau: float = 0.5
) -> ray.data.Dataset:
    """All doc pairs with exact word-n-gram Jaccard ≥ tau.

    shingle-explode → pair-emit per shingle (sorted-block apply) →
    pair-count = |A∩B|; per-doc set sizes are broadcast (small side)
    for the final |A∪B| division. Ultra-frequent shingles are the skew
    hazard at scale — the cap would be applied identically in engine
    and oracle."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows_s, rows_d = [], []
        for did, text in zip(df["doc_id"], df["text"]):
            for s in H.shingle_strings(text, n):
                rows_s.append(s)
                rows_d.append(did)
        return pd.DataFrame({"shingle": rows_s, "doc_id": np.asarray(rows_d, np.int64)})

    exploded = ds.map_batches(explode, batch_format="pandas").materialize()

    sizes_df = grouped_count(exploded, ["doc_id"]).to_pandas()
    sizes_ref = ray.put(dict(zip(sizes_df["doc_id"], sizes_df["n"])))

    pairs = sorted_group_apply(exploded, "shingle", _pairs_apply("shingle"), _EMPTY_PAIRS)
    inter = grouped_count(pairs, ["a", "b"], out_col="c", sorted_combine=True)
    return _finish_jaccard(inter, sizes_ref, tau)


def _finish_jaccard(inter: ray.data.Dataset, sizes_ref, tau: float) -> ray.data.Dataset:
    class Finish:
        def __init__(self, ref, tau):
            self.sizes = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.tau = tau

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            a = df["a"].to_numpy()
            b = df["b"].to_numpy()
            c = df["c"].to_numpy().astype(np.float64)
            na = pd.Series(a).map(self.sizes).to_numpy(dtype=np.float64)
            nb = pd.Series(b).map(self.sizes).to_numpy(dtype=np.float64)
            union = na + nb - c
            j = np.where(union > 0, c / np.maximum(union, 1e-12), 1.0)
            keep = j >= self.tau
            return pd.DataFrame(
                {
                    "doc_a": a[keep].astype(np.int64),
                    "doc_b": b[keep].astype(np.int64),
                    "jaccard": np.round(j[keep], 6),
                }
            )

    return inter.map_batches(
        Finish, fn_constructor_kwargs={"ref": sizes_ref, "tau": tau},
        batch_format="pandas", concurrency=(1, 2),
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    n: int = 3,
    tau: float = 0.6,
    num_perm: int = 64,
    rows_per_band: int = 2,
) -> ray.data.Dataset:
    """Candidate pairs from LSH banding, verified with EXACT Jaccard.

    With r=2, b=32 the miss probability at j=0.6 is (1-0.36)^32 ≈ 6e-7,
    so the verified output equals the exact-Jaccard result in practice
    (the SQL oracle runs the exact computation)."""
    a_p, b_p = H.minhash_params(num_perm)

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        keys, dids = [], []
        for did, text in zip(df["doc_id"], df["text"]):
            sh = H.shingle_hashes(text, n)
            sig = H.minhash_signature(sh, a_p, b_p)
            for k in H.lsh_band_keys(sig, rows_per_band):
                keys.append(k)
                dids.append(did)
        return pd.DataFrame({"band": keys, "doc_id": np.asarray(dids, np.int64)})

    bands = ds.map_batches(band_rows, batch_format="pandas")
    cand = sorted_group_apply(bands, "band", _pairs_apply("band"), _EMPTY_PAIRS)
    cand = grouped_distinct(cand, ["a", "b"])

    # shingle sets: small side broadcast (at 100 TB: hash-partitioned join
    # of pair→shingle-set instead)
    def sets(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "sh": [np.sort(H.shingle_hashes(t, n)) for t in df["text"]],
            }
        )

    sets_df = ds.map_batches(sets, batch_format="pandas").to_pandas()
    sets_ref = ray.put(dict(zip(sets_df["doc_id"], sets_df["sh"])))

    class Verify:
        def __init__(self, ref, tau):
            self.sets = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.tau = tau

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            a_l, b_l, j_l = [], [], []
            for a, b in zip(df["a"], df["b"]):
                j = H.jaccard(self.sets[a], self.sets[b])
                if j >= self.tau:
                    a_l.append(a)
                    b_l.append(b)
                    j_l.append(round(j, 6))
            return pd.DataFrame(
                {
                    "doc_a": np.asarray(a_l, np.int64),
                    "doc_b": np.asarray(b_l, np.int64),
                    "jaccard": np.asarray(j_l, np.float64),
                }
            )

    return cand.map_batches(
        Verify, fn_constructor_kwargs={"ref": sets_ref, "tau": tau},
        batch_format="pandas", concurrency=(1, 2),
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_pairs(ds: ray.data.Dataset, max_hamming: int = 3) -> ray.data.Dataset:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.
    Banded buckets guarantee recall for distance < #bands (=4)."""

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        keys, dids, sigs = [], [], []
        for did, text in zip(df["doc_id"], df["text"]):
            h = H.simhash64(text)
            for k in H.simhash_band_keys(h):
                keys.append(k)
                dids.append(did)
                sigs.append(h)
        return pd.DataFrame(
            {"band": keys, "doc_id": np.asarray(dids, np.int64),
             "sig": np.asarray(sigs, np.uint64)}
        )

    bands = ds.map_batches(sig_rows, batch_format="pandas")

    def pairs_with_sig(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("band", sort=False):
            g = g.drop_duplicates("doc_id").sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            sigs = g["sig"].to_numpy()
            if ids.size < 2:
                continue
            ia, ib = np.triu_indices(ids.size, 1)
            ham = np.array(
                [H.hamming64(int(sigs[i]), int(sigs[j])) for i, j in zip(ia, ib)],
                dtype=np.int64,
            )
            keep = ham <= max_hamming
            if keep.any():
                out.append(
                    pd.DataFrame(
                        {"a": ids[ia][keep].astype(np.int64),
                         "b": ids[ib][keep].astype(np.int64),
                         "ham": ham[keep]}
                    )
                )
        if not out:
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
                 "ham": pd.Series(dtype=np.int64)}
            )
        return pd.concat(out, ignore_index=True)

    empty = pd.DataFrame(
        {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
         "ham": pd.Series(dtype=np.int64)}
    )
    cands = sorted_group_apply(bands, "band", pairs_with_sig, empty)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["a", "b"], as_index=False)["ham"].min()

    uniq = two_phase_agg(cands, combine, combine)
    return uniq.map_batches(
        lambda df: df.rename(columns={"a": "doc_a", "b": "doc_b", "ham": "hamming"}),
        batch_format="pandas",
    )


# --------------------------------------------------------------------------
# embedding-cosine near-dup (label-blocked)
# --------------------------------------------------------------------------

def embedding_neardup_pairs(
    ds: ray.data.Dataset, tau: float = 0.30, block_col: str = "label"
) -> ray.data.Dataset:
    """Pairs within a blocking key whose cosine ≥ tau. The blocking key
    stands in for a coarse quantization bucket (IVF cell) at scale;
    block count is small, so per-block map_groups dispatch is fine."""

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        M = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        nrm = np.linalg.norm(M, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        C = (M / nrm) @ (M / nrm).T
        ia, ib = np.triu_indices(ids.size, 1)
        cos = np.round(C[ia, ib], 6)
        keep = cos >= tau
        return pd.DataFrame(
            {
                "vec_a": ids[ia][keep].astype(np.int64),
                "vec_b": ids[ib][keep].astype(np.int64),
                "cos": cos[keep],
            }
        )

    return ds.groupby(block_col).map_groups(per_block, batch_format="pandas")
