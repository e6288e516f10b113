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
        # mean path delegates to functions/embedding.embed_text — ONE
        # implementation of the engine's hash-embedding model (sum vs
        # mean differ by a scalar the L2 norm erases), so extract's
        # ctx_emb and this stage can never drift apart
        if self.pooling == "mean":
            from bioontologykg_ray.functions.embedding import embed_text

            return embed_text(text[: self.char_limit], self.dim)
        toks = text[: self.char_limit].lower().split()
        if not toks:
            return np.zeros(self.dim, dtype=np.float32)
        M = np.stack([self._token_vec(t, self.dim) for t in toks])
        v = M.max(axis=0)
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


class TransformerEmbedder:
    """Real-model actor matching the reference embedder contract
    (`src/BioOntologyKG/embedding/PubMedBERTEmbedder.py:19-140`):
    tokenizer+model loaded ONCE per actor in ``__init__`` (optionally
    onto CUDA when the stage reserves GPUs), texts pre-truncated to
    ``char_limit`` (2000, `entrez_gene_embedding.py:10`) then tokenized
    to ``max_tokens`` (512 — BERT max len), pooling ∈ {'cls', 'mean',
    'max'} over the last hidden state (mean/max are attention-masked),
    output L2-normalized float32.

    Construction REQUIRES torch + transformers; in environments without
    them (this sandbox) it raises ImportError and ``make_embedder``
    falls back to :class:`HashEmbedder` — the fallback selection is the
    unit-tested contract."""

    def __init__(self, model_name: str = "microsoft/BiomedNLP-PubMedBERT-base-uncased-abstract",
                 pooling: str = "mean", text_col: str = "text",
                 out_col: str = "embedding", char_limit: int = TEXT_CHAR_LIMIT,
                 max_tokens: int = 512, device: str | None = None):
        import torch  # guarded: ImportError routes make_embedder to the hash fallback
        from transformers import AutoModel, AutoTokenizer

        if pooling not in ("cls", "mean", "max"):
            raise ValueError(pooling)
        self.torch = torch
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModel.from_pretrained(model_name)
        self.device = device or ("cuda" if torch.cuda.is_available() else "cpu")
        self.model.to(self.device).eval()
        self.model_name = model_name
        self.pooling = pooling
        self.text_col = text_col
        self.out_col = out_col
        self.char_limit = char_limit
        self.max_tokens = max_tokens

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = [(s or "")[: self.char_limit] for s in t[self.text_col].to_pylist()]
        with self.torch.no_grad():
            enc = self.tokenizer(
                texts, padding=True, truncation=True, max_length=self.max_tokens,
                return_tensors="pt",
            ).to(self.device)
            hidden = self.model(**enc).last_hidden_state  # (n, L, d)
            if self.pooling == "cls":
                v = hidden[:, 0]
            else:
                mask = enc["attention_mask"].unsqueeze(-1)
                if self.pooling == "mean":
                    v = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1)
                else:
                    v = hidden.masked_fill(mask == 0, float("-inf")).max(1).values
            v = self.torch.nn.functional.normalize(v, dim=1)
            out = v.cpu().numpy().astype(np.float32)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(out.ravel()), out.shape[1])
        t = t.append_column(self.out_col, emb)
        return t.append_column(
            "embedding_model", pa.array([self.model_name] * len(texts), pa.string())
        )


def make_embedder(backend: str = "auto", **kwargs):
    """Embedder factory: ('auto'|'transformer'|'hash') → (cls, ctor
    kwargs). 'auto' probes for torch+transformers and falls back to the
    deterministic HashEmbedder when absent (the reference contract with
    the model swapped for a hermetic stand-in).

    NOTE: the transformer path's output width is MODEL-determined —
    ``dim`` only applies to the hash backend; consumers sized by
    cfg.embedding_dim must use backend='hash' or a matching model."""
    if backend not in ("auto", "transformer", "hash"):
        raise ValueError(f"unknown embedder backend {backend!r}")

    def _hash_kwargs(kw):
        # same whitelist as the auto-fallback: an explicit 'hash' with a
        # transformer-only kwarg (e.g. model_name) must be ignored, not
        # TypeError in HashEmbedder.__init__ (ADVICE r3)
        kw = {
            k: v for k, v in kw.items()
            if k in ("dim", "pooling", "text_col", "out_col", "char_limit")
        }
        if kw.get("pooling") == "cls":  # hash stand-in has no CLS token
            kw["pooling"] = "mean"
        return kw

    if backend == "hash":
        return HashEmbedder, _hash_kwargs(kwargs)
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401

        t_kwargs = {
            k: v for k, v in kwargs.items()
            if k in ("model_name", "pooling", "text_col", "out_col",
                     "char_limit", "max_tokens", "device")
        }
        return TransformerEmbedder, t_kwargs
    except ImportError:
        if backend == "transformer":
            raise
        return HashEmbedder, _hash_kwargs(kwargs)


def embed_texts_stage(
    ds: ray.data.Dataset,
    dim: int = 32,
    pooling: str = "mean",
    text_col: str = "text",
    batch_size: int = 1024,
    concurrency: int = 4,
    backend: str = "hash",
    num_gpus: float = 0,
    **backend_kwargs,
) -> ray.data.Dataset:
    """The T1-shaped stage: fixed actor pool, batched encode.

    ``backend='auto'`` uses the real transformer when torch is
    installed; ``num_gpus`` is forwarded to the actor pool so each
    embedder actor reserves a GPU slice (the reference's single-process
    `.to('cuda')` becomes per-actor placement)."""
    from bioontologykg_ray.util import clamp_pool

    cls, kw = make_embedder(
        backend, dim=dim, pooling=pooling, text_col=text_col, **backend_kwargs
    )
    ray_kwargs = {"num_gpus": num_gpus} if num_gpus else {}
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=clamp_pool(concurrency),
        **ray_kwargs,
    )
