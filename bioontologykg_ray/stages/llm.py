"""LLM generation as an actor-pool stage (reference T7 parity).

The reference carries an experimental causal-LM runner
(`src/BioOntologyKG/llm/install_kimi_k2_llm.py:1-100`: load tokenizer +
model once, device-place, generate for a prompt). Re-expressed
Ray-Data-first, that is the same shape as the embedder (T1/T3): a
callable CLASS whose ``__init__`` loads the model once per actor and
whose ``__call__`` generates for a BATCH of prompts, with ``num_gpus``
forwarded to the pool for per-actor device placement.

Backends mirror ``stages/embed.py``'s unit-tested contract:

* ``TransformerCausalLM`` — real torch/transformers backend (guarded
  import; absent in this sandbox, construction raises ImportError).
* ``FakeCausalLM`` — hermetic deterministic stand-in whose "generation"
  is a pure function of the prompt (template prefix + the prompt's
  first ``max_new_tokens`` whitespace tokens), chosen precisely so the
  DuckDB oracle can replay it exactly — the Ray-side plumbing (actor
  pool, batching, truncation, token accounting, provenance columns) is
  the real, tested artifact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

PROMPT_CHAR_LIMIT = 2000


class FakeCausalLM:
    """Deterministic stand-in: completion = ``prefix`` + the first
    ``max_new_tokens`` whitespace-run-delimited tokens of the truncated
    prompt. Output columns: completion, n_prompt_tokens,
    n_completion_tokens, llm_model."""

    MODEL_NAME = "fake-causal-v1"

    def __init__(self, prompt_col: str = "prompt", out_col: str = "completion",
                 max_new_tokens: int = 8, prefix: str = "SUMMARY:",
                 char_limit: int = PROMPT_CHAR_LIMIT):
        self.prompt_col = prompt_col
        self.out_col = out_col
        self.max_new_tokens = max_new_tokens
        self.prefix = prefix
        self.char_limit = char_limit

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = (
            df[self.prompt_col].astype(str).str[: self.char_limit]
            .str.strip().str.split()
        )
        n_in = toks.str.len().fillna(0).astype(np.int64)
        head = toks.map(lambda l: l[: self.max_new_tokens] if l else [])
        df = df.copy()
        df[self.out_col] = head.map(lambda l: (self.prefix + " " + " ".join(l)).strip())
        df["n_prompt_tokens"] = n_in
        df["n_completion_tokens"] = head.str.len().astype(np.int64)
        df["llm_model"] = self.MODEL_NAME
        return df


class TransformerCausalLM:
    """Real-model actor matching the reference runner's contract
    (`install_kimi_k2_llm.py:30-76`): tokenizer + model loaded ONCE per
    actor, device-placed (CUDA when the stage reserves GPUs), batched
    greedy generation, token accounting from the tokenizer. Guarded:
    construction raises ImportError without torch/transformers and
    ``make_llm`` falls back to :class:`FakeCausalLM`."""

    def __init__(self, model_name: str, prompt_col: str = "prompt",
                 out_col: str = "completion", max_new_tokens: int = 64,
                 char_limit: int = PROMPT_CHAR_LIMIT, device: str | None = None):
        import torch  # guarded: ImportError routes make_llm to the fake
        from transformers import AutoModelForCausalLM, AutoTokenizer

        self.torch = torch
        # decoder-only batching: left padding (generate() must continue
        # from real tokens, not pad filler) and an explicit pad token
        # (GPT/Llama-family tokenizers ship none)
        self.tokenizer = AutoTokenizer.from_pretrained(
            model_name, padding_side="left"
        )
        if self.tokenizer.pad_token is None:
            self.tokenizer.pad_token = self.tokenizer.eos_token
        self.model = AutoModelForCausalLM.from_pretrained(model_name)
        self.device = device or ("cuda" if torch.cuda.is_available() else "cpu")
        self.model.to(self.device).eval()
        self.model_name = model_name
        self.prompt_col = prompt_col
        self.out_col = out_col
        self.max_new_tokens = max_new_tokens
        self.char_limit = char_limit

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        prompts = [str(s)[: self.char_limit] for s in df[self.prompt_col]]
        with self.torch.no_grad():
            enc = self.tokenizer(
                prompts, padding=True, truncation=True, return_tensors="pt"
            ).to(self.device)
            out = self.model.generate(
                **enc, max_new_tokens=self.max_new_tokens, do_sample=False
            )
        n_in = enc["attention_mask"].sum(1).cpu().numpy().astype(np.int64)
        gen = out[:, enc["input_ids"].shape[1]:]
        comp = self.tokenizer.batch_decode(gen, skip_special_tokens=True)
        # per-row generated length: early-stopping rows are padded to the
        # batch max by generate(); count only real (non-pad) tokens
        pad_id = self.tokenizer.pad_token_id
        n_out = (gen != pad_id).sum(1).cpu().numpy().astype(np.int64)
        df = df.copy()
        df[self.out_col] = comp
        df["n_prompt_tokens"] = n_in
        df["n_completion_tokens"] = n_out
        df["llm_model"] = self.model_name
        return df


def make_llm(backend: str = "auto", **kwargs):
    """('auto'|'transformer'|'fake') → (cls, ctor kwargs); 'auto' probes
    for torch+transformers and falls back to the deterministic fake."""
    if backend not in ("auto", "transformer", "fake"):
        raise ValueError(f"unknown llm backend {backend!r}")
    fake_keys = ("prompt_col", "out_col", "max_new_tokens", "prefix", "char_limit")
    if backend == "fake":
        return FakeCausalLM, {k: v for k, v in kwargs.items() if k in fake_keys}
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401

        t_keys = ("model_name", "prompt_col", "out_col", "max_new_tokens",
                  "char_limit", "device")
        return TransformerCausalLM, {k: v for k, v in kwargs.items() if k in t_keys}
    except ImportError:
        if backend == "transformer":
            raise
        return FakeCausalLM, {k: v for k, v in kwargs.items() if k in fake_keys}


def llm_generate_stage(
    ds: ray.data.Dataset,
    prompt_col: str = "prompt",
    backend: str = "fake",
    batch_size: int = 64,
    concurrency: int = 2,
    num_gpus: float = 0,
    **kwargs,
) -> ray.data.Dataset:
    """T7-shaped stage: fixed actor pool, batched generation, per-actor
    model load; ``num_gpus`` reserves a GPU slice per actor (the
    reference's single-process ``.to('cuda')`` as pool placement)."""
    from bioontologykg_ray.util import clamp_pool

    cls, kw = make_llm(backend, prompt_col=prompt_col, **kwargs)
    ray_kwargs = {"num_gpus": num_gpus} if num_gpus else {}
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=kw,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=clamp_pool(concurrency),
        **ray_kwargs,
    )
