"""Batched embedding stage — the canonical stateful actor pool.

Reference T1/T2/T3 (`src/BioOntologyKG/embedding/PubMedBERTEmbedder.py:19-140`:
load model once, batch-encode with truncation, pooling flag;
`entrez_gene_embedding.py:14-21`: mean-pool + L2-normalize;
`pubmed_embedding_remediation.py:110`: model-name + timestamp provenance
columns). The model here is the deterministic hashed-BoW embedder
(functions/embedding.py) — same actor-pool plumbing a transformer
would use: weights/caches in ``__init__``, vectorized encode per batch,
``concurrency × num_cpus`` sized to the node, text truncated before
encoding (M12, TEXT_CHAR_LIMIT=2000).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

TEXT_CHAR_LIMIT = 2000  # reference entrez_gene_embedding.py:10


class HashEmbedder:
    """Actor: text column → fixed_size_list<float32>[dim] embedding column
    (+ model provenance), pooling ∈ {'mean', 'max'}."""

    MODEL_NAME = "hash-bow-v1"

    def __init__(self, dim: int = 32, pooling: str = "mean",
                 text_col: str = "text", out_col: str = "embedding",
                 char_limit: int = TEXT_CHAR_LIMIT):
        from bioontologykg_ray.functions.embedding import token_vec

        if pooling not in ("mean", "max"):
            raise ValueError(pooling)
        self.dim = dim
        self.pooling = pooling
        self.text_col = text_col
        self.out_col = out_col
        self.char_limit = char_limit
        self._token_vec = token_vec

    def _encode(self, text: str) -> np.ndarray:
        toks = text[: self.char_limit].lower().split()
        if not toks:
            return np.zeros(self.dim, dtype=np.float32)
        M = np.stack([self._token_vec(t, self.dim) for t in toks])
        v = M.mean(axis=0) if self.pooling == "mean" else M.max(axis=0)
        n = float(np.linalg.norm(v))
        return (v / n).astype(np.float32) if n > 0 else v.astype(np.float32)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, s in enumerate(texts):
            out[i] = self._encode(s or "")
        emb = pa.FixedSizeListArray.from_arrays(pa.array(out.ravel()), self.dim)
        t = t.append_column(self.out_col, emb)
        return t.append_column(
            "embedding_model", pa.array([self.MODEL_NAME] * len(texts), pa.string())
        )


def embed_texts_stage(
    ds: ray.data.Dataset,
    dim: int = 32,
    pooling: str = "mean",
    text_col: str = "text",
    batch_size: int = 1024,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """The T1-shaped stage: fixed actor pool, batched encode."""
    from bioontologykg_ray.util import clamp_pool

    return ds.map_batches(
        HashEmbedder,
        fn_constructor_kwargs={"dim": dim, "pooling": pooling, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=clamp_pool(concurrency),
    )
