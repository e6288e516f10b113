"""Hashing primitives for near-duplicate detection: word-shingles,
MinHash signatures, SimHash, LSH banding.

All hashes are hashlib/zlib-based (stable across processes — never the
builtin ``hash``). Used by stages/neardup.py.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

from bioontologykg_ray.functions.textstats import tokens

_MERSENNE = np.uint64(2**61 - 1)


def shingle_strings(text: str, n: int = 3) -> list[str]:
    """Distinct word n-gram shingles (space-joined); SQL-mirrorable."""
    toks = tokens(text)
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return sorted({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})


def hash64(s: str) -> int:
    """Stable 64-bit hash."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    return np.array([hash64(s) for s in shingle_strings(text, n)], dtype=np.uint64)


def minhash_params(num_perm: int = 64, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**61 - 2, size=num_perm).astype(np.uint64)
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


def lsh_band_keys(sig: np.ndarray, rows_per_band: int = 2) -> list[str]:
    """Band the signature: one stable bucket key per band."""
    nb = sig.shape[0] // rows_per_band
    keys = []
    for band in range(nb):
        chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
        digest = zlib.crc32(chunk.tobytes())
        keys.append(f"{band}:{digest}")
    return keys


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over shingle-hash sets (hash collisions negligible)."""
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over unigram token hashes."""
    toks = tokens(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = hash64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_band_keys(h: int, bands: int = 4) -> list[str]:
    """Split 64 bits into ``bands`` chunks; equal chunk → candidate pair
    (catches all pairs with hamming distance < bands)."""
    width = 64 // bands
    mask = (1 << width) - 1
    return [f"{i}:{(h >> (i * width)) & mask}" for i in range(bands)]
