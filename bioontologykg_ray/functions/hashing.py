"""Hashing primitives for near-duplicate detection: word-shingles,
MinHash signatures, SimHash, LSH banding.

All hashes are hashlib/zlib-based (stable across processes — never the
builtin ``hash``). Used by stages/neardup.py.
"""

from __future__ import annotations

import hashlib
import zlib
from functools import lru_cache as _lru_cache

import numpy as np

from bioontologykg_ray.functions.textstats import tokens



def shingle_strings(text: str, n: int = 3) -> list[str]:
    """Distinct word n-gram shingles (space-joined); SQL-mirrorable."""
    toks = tokens(text)
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return sorted({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct shingles → uint64 hashes, vectorized (siphash via
    ``pd.util.hash_array`` with the fixed default key — process-stable,
    C speed; per-shingle hashlib was the hot loop in round 1)."""
    import pandas as pd

    sh = shingle_strings(text, n)
    if not sh:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(sh, dtype=object), categorize=False)


def minhash_params(num_perm: int = 64, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Multipliers are forced ODD (a |= 1): an even ``a`` makes
    ``a*h mod 2^64`` non-injective (low bits lost), quietly weakening the
    permutation family the LSH miss-probability bound assumes (ADVICE
    round 1). Odd multipliers are bijective mod 2^64."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**61 - 2, size=num_perm).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, 2**61 - 2, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 signature = min over shingles of (a*h+b) mod p.

    Vectorized outer product; 128-bit-safe via Python-int-free splitting
    is unnecessary here because (a*h) wraps mod 2^64 — we keep the
    *wrapped* product as the permutation (a fixed deterministic mixing),
    which preserves the MinHash property for dedup purposes."""
    if sh.size == 0:
        return np.full(a.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    prod = sh[None, :] * a[:, None] + b[:, None]  # uint64 wrap-around mix
    return prod.min(axis=1)


def lsh_band_keys(sig: np.ndarray, rows_per_band: int = 2) -> list[int]:
    """Band the signature: one stable int64 bucket key per band
    ((band << 32) | crc32 — int keys sort/merge far faster than the
    round-1 'band:digest' strings)."""
    if sig.shape[0] % rows_per_band:
        raise ValueError(
            f"signature length {sig.shape[0]} not divisible by "
            f"rows_per_band={rows_per_band} — trailing permutations would "
            "be paid for but never bucket anything (silent recall loss)"
        )
    nb = sig.shape[0] // rows_per_band
    keys = []
    for band in range(nb):
        chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
        keys.append((band << 32) | zlib.crc32(chunk.tobytes()))
    return keys


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over shingle-hash sets (hash collisions negligible)."""
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


@_lru_cache(maxsize=1_048_576)
def md5_low64(token: str) -> int:
    """Low 8 bytes of md5 as little-endian uint64 — bit-for-bit equal to
    DuckDB 1.0's ``md5_number_lower(token)``, which is what makes the
    SimHash signature SQL-verifiable (checked in tests)."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[8:16], "little")


def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over unigram token hashes (md5-low64, so
    the DuckDB oracle can recompute the identical signature). Vectorized
    bit-majority: one (n_tokens, 64) unpack + column sum."""
    toks = tokens(text)
    if not toks:
        return 0
    hs = np.fromiter((md5_low64(t) for t in toks), dtype=np.uint64, count=len(toks))
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = 2 * bits.astype(np.int64).sum(axis=0) - len(toks)  # (+1/-1 majority)
    out = np.uint64(0)
    set_bits = np.flatnonzero(acc > 0)
    for i in set_bits:
        out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_band_keys(h: int, bands: int = 4) -> list[int]:
    """Split 64 bits into ``bands`` chunks; equal chunk → candidate pair
    (catches all pairs with hamming distance < bands). Int keys:
    (band << width) | chunk."""
    width = 64 // bands
    mask = (1 << width) - 1
    return [(i << width) | ((h >> (i * width)) & mask) for i in range(bands)]
