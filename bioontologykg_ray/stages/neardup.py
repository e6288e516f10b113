"""Deduplication family: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Extends the reference's exact-key dedup (D1/D2, SURVEY.md §2.8) with the
near-duplicate operators a training-data pipeline needs. Each operator
is a composition of vectorized ``map_batches`` + ``groupby`` shuffles:

- exact:      content hash → hash-partition → keep min key (MERGE
              first-wins, `remediate_duplicate_pubmed_ids.cql:1-13`)
- n-gram Jaccard: inverted shingle index (explode → co-group → pair
              count) — EXACT pair Jaccard, SQL-verifiable
- MinHash+LSH: shingle → signature → band → bucket groupby → candidate
              pairs → exact-Jaccard verify. The scale path: at 100 TB
              drop ultra-frequent shingles and band keys with huge
              buckets (document the cap); here buckets are tiny.
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
import pyarrow.compute as pc
import ray
import ray.data

from bioontologykg_ray.functions import hashing as H
from bioontologykg_ray.functions.textstats import md5_hex


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup_docs(ds: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text") -> ray.data.Dataset:
    """One row per distinct text, keeping the minimum id (first-wins
    MERGE semantics). Two-phase: per-batch (hash, min id) partials, then
    groupby(hash).min — the shuffle moves one row per distinct text per
    batch, never the full corpus."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df[text_col].map(md5_hex)
        out = (
            pd.DataFrame({"text_md5": h, id_col: df[id_col]})
            .groupby("text_md5", as_index=False)[id_col]
            .min()
        )
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    merged = partials.groupby("text_md5").min(id_col)
    return merged.map_batches(
        lambda t: pa.table({"text_md5": t.column(0), id_col: t.column(1)}),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard via inverted shingle index
# --------------------------------------------------------------------------

def _pairs_from_group(g: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(g["doc_id"].to_numpy())
    if ids.size < 2:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                             "b": pd.Series(dtype=np.int64)})
    ia, ib = np.triu_indices(ids.size, 1)
    return pd.DataFrame({"a": ids[ia].astype(np.int64), "b": ids[ib].astype(np.int64)})


def ngram_jaccard_pairs(
    ds: ray.data.Dataset, n: int = 3, tau: float = 0.5
) -> ray.data.Dataset:
    """All doc pairs with exact word-n-gram Jaccard ≥ tau.

    shingle-explode → groupby(shingle) pair-emit → groupby(pair) count =
    |A∩B|; per-doc sizes are broadcast (small side) for the final
    |A∪B| division. Ultra-frequent shingles are the skew hazard at
    scale — the cap would be applied identically in engine and oracle."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows_s, rows_d = [], []
        for did, text in zip(df["doc_id"], df["text"]):
            for s in H.shingle_strings(text, n):
                rows_s.append(s)
                rows_d.append(did)
        return pd.DataFrame({"shingle": rows_s, "doc_id": np.asarray(rows_d, np.int64)})

    exploded = ds.map_batches(explode, batch_format="pandas").materialize()

    # |A| per doc — small side, collected + broadcast
    sizes_df = (
        exploded.groupby("doc_id").count().to_pandas()
    )
    sizes = dict(zip(sizes_df["doc_id"], sizes_df["count()"]))
    sizes_ref = ray.put(sizes)

    pairs = (
        exploded.groupby("shingle")
        .map_groups(_pairs_from_group, batch_format="pandas")
    )

    def pair_key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["a"], pa.string()), pc.cast(t["b"], pa.string()), "|"
        )
        return pa.table({"key": key})

    inter = pairs.map_batches(pair_key, batch_format="pyarrow").groupby("key").count()

    class Finish:
        def __init__(self, ref, tau):
            self.sizes = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.tau = tau

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["key"].to_pylist()
            cnt = t.column(1).to_pylist()
            a_l, b_l, j_l = [], [], []
            for k, c in zip(keys, cnt):
                a, b = (int(x) for x in k.split("|"))
                union = self.sizes[a] + self.sizes[b] - c
                j = c / union if union else 1.0
                if j >= self.tau:
                    a_l.append(a)
                    b_l.append(b)
                    j_l.append(round(j, 6))
            return pa.table(
                {
                    "doc_a": pa.array(a_l, pa.int64()),
                    "doc_b": pa.array(b_l, pa.int64()),
                    "jaccard": pa.array(j_l, pa.float64()),
                }
            )

    return inter.map_batches(
        Finish, fn_constructor_kwargs={"ref": sizes_ref, "tau": tau},
        batch_format="pyarrow", concurrency=(1, 2),
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
    cand = (
        bands.groupby("band")
        .map_groups(_pairs_from_group, batch_format="pandas")
    )

    def pair_key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["a"], pa.string()), pc.cast(t["b"], pa.string()), "|"
        )
        return pa.table({"key": key})

    cand_dist = cand.map_batches(pair_key, batch_format="pyarrow").groupby("key").count()

    # shingle sets: small side broadcast (at 100 TB: hash-partitioned join
    # of pair→shingle-set instead)
    def sets(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "sh": [H.shingle_hashes(t, n) for t in df["text"]],
            }
        )

    sets_df = ds.map_batches(sets, batch_format="pandas").to_pandas()
    sets_ref = ray.put(dict(zip(sets_df["doc_id"], sets_df["sh"])))

    class Verify:
        def __init__(self, ref, tau):
            self.sets = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.tau = tau

        def __call__(self, t: pa.Table) -> pa.Table:
            a_l, b_l, j_l = [], [], []
            for k in t["key"].to_pylist():
                a, b = (int(x) for x in k.split("|"))
                j = H.jaccard(np.sort(self.sets[a]), np.sort(self.sets[b]))
                if j >= self.tau:
                    a_l.append(a)
                    b_l.append(b)
                    j_l.append(round(j, 6))
            return pa.table(
                {
                    "doc_a": pa.array(a_l, pa.int64()),
                    "doc_b": pa.array(b_l, pa.int64()),
                    "jaccard": pa.array(j_l, pa.float64()),
                }
            )

    return cand_dist.map_batches(
        Verify, fn_constructor_kwargs={"ref": sets_ref, "tau": tau},
        batch_format="pyarrow", concurrency=(1, 2),
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
                sigs.append(np.uint64(h))
        return pd.DataFrame(
            {"band": keys, "doc_id": np.asarray(dids, np.int64),
             "sig": np.asarray(sigs, np.uint64)}
        )

    bands = ds.map_batches(sig_rows, batch_format="pandas")

    def pairs_with_sig(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = g["sig"].to_numpy()
        if ids.size < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "ham": pd.Series(dtype=np.int64)})
        ia, ib = np.triu_indices(ids.size, 1)
        ham = np.array(
            [H.hamming64(int(sigs[i]), int(sigs[j])) for i, j in zip(ia, ib)],
            dtype=np.int64,
        )
        return pd.DataFrame({"a": ids[ia].astype(np.int64),
                             "b": ids[ib].astype(np.int64), "ham": ham})

    cands = bands.groupby("band").map_groups(pairs_with_sig, batch_format="pandas")
    good = cands.filter(expr=f"ham <= {max_hamming}")

    def dedup_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["key"] = df["a"].astype(str) + "|" + df["b"].astype(str)
        return df

    uniq = (
        good.map_batches(dedup_key, batch_format="pandas")
        .groupby("key")
        .min("ham")
    )

    def split(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["key"], "|")
        return pa.table(
            {
                "doc_a": pc.cast(pc.list_element(parts, 0), pa.int64()),
                "doc_b": pc.cast(pc.list_element(parts, 1), pa.int64()),
                "hamming": t.column(1).cast(pa.int64()),
            }
        )

    return uniq.map_batches(split, batch_format="pyarrow")


# --------------------------------------------------------------------------
# embedding-cosine near-dup (label-blocked)
# --------------------------------------------------------------------------

def embedding_neardup_pairs(
    ds: ray.data.Dataset, tau: float = 0.30, block_col: str = "label"
) -> ray.data.Dataset:
    """Pairs within a blocking key whose cosine ≥ tau. The blocking key
    stands in for a coarse quantization bucket (IVF cell) at scale."""

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
