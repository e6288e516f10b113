"""Deterministic pseudo-embeddings (the sandbox stand-in for PubMedBERT).

The reference embeds text with a stateful transformer
(`src/BioOntologyKG/embedding/PubMedBERTEmbedder.py:19-140`, CLS/mean
pooling, L2-normalize `entrez_gene_embedding.py:14-21`). No model
weights exist in this container, so the engine's embedding model is a
deterministic hashed bag-of-words: each token hashes (hashlib — stable
across processes, unlike builtin ``hash``) to a fixed pseudo-random
vector; a text embeds to the L2-normalized sum of its token vectors.
This preserves the *semantics the pipeline needs* — same text → same
vector, shared tokens → higher cosine — with the same actor-pool
plumbing a real model would use.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np


@lru_cache(maxsize=262_144)
def token_vec(token: str, dim: int = 32) -> np.ndarray:
    """Stable pseudo-random unit-ish vector for one token."""
    out = np.empty(dim, dtype=np.float32)
    raw = b""
    counter = 0
    while len(raw) < dim * 4:
        raw += hashlib.blake2b(
            token.encode("utf-8"), digest_size=32, salt=counter.to_bytes(8, "little")
        ).digest()
        counter += 1
    ints = np.frombuffer(raw[: dim * 4], dtype="<i4").astype(np.float64)
    out[:] = (ints / 2**31).astype(np.float32)  # uniform-ish in [-1, 1)
    return out


def embed_text(text: str, dim: int = 32) -> np.ndarray:
    """L2-normalized hashed bag-of-words embedding (T2 mean-pool analogue)."""
    acc = np.zeros(dim, dtype=np.float32)
    for tok in text.lower().split():
        acc += token_vec(tok, dim)
    n = float(np.linalg.norm(acc))
    if n > 0:
        acc = acc / n
    return acc


def embed_texts(texts, dim: int = 32) -> np.ndarray:
    """Batch variant → (n, dim) float32 matrix, rows L2-normalized."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        out[i] = embed_text(t, dim)
    return out


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    """Reference T5 scorer semantics (`PubMedBERTEmbedder.py:142-152`)."""
    na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))
