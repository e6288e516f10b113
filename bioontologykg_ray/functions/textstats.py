"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

These extend the reference's text-normalization family (SURVEY.md §2.3)
with the large-scale corpus operations a training-data pipeline needs.
Every rule here is deliberately expressible in ANSI SQL so the driver's
DuckDB oracle can verify it bit-for-bit: token = maximal non-whitespace
run; ratios are exact integer-over-integer IEEE divisions; tie-breaks
are alphabetical.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[.,!?;]")

# per-language stopword token sets (alphabetical language order is the
# tie-break: de < en < es < fr)
LANG_STOPWORDS = {
    "de": ("der", "und", "die"),
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "et", "les"),
}
ALL_STOPWORDS = frozenset(w for ws in LANG_STOPWORDS.values() for w in ws)


def tokens(text: str) -> list[str]:
    return [t for t in _WS.split(text) if t]


def token_count(text: str) -> int:
    return len(tokens(text))


def lang_scores(text: str, toks: list[str] | None = None) -> dict[str, int]:
    toks = tokens(text) if toks is None else toks
    return {
        lang: sum(1 for t in toks if t in ws) for lang, ws in LANG_STOPWORDS.items()
    }


def predict_lang(text: str, toks: list[str] | None = None) -> str:
    """argmax stopword hits; zero hits → 'und'; ties → alphabetical."""
    scores = lang_scores(text, toks)
    mx = max(scores.values())
    if mx == 0:
        return "und"
    for lang in sorted(scores):  # de, en, es, fr
        if scores[lang] == mx:
            return lang
    raise AssertionError


def quality_stats(text: str, toks: list[str] | None = None) -> dict:
    toks = tokens(text) if toks is None else toks
    n_tok = len(toks)
    n_chars = len(text)
    total_tok_len = sum(len(t) for t in toks)
    stop_hits = sum(1 for t in toks if t in ALL_STOPWORDS)
    punct = len(_PUNCT.findall(text))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": (total_tok_len / n_tok) if n_tok else 0.0,
        "stopword_ratio": (stop_hits / n_tok) if n_tok else 0.0,
        "punct_count": punct,
    }


def quality_label(n_tokens: int, stopword_ratio: float) -> str:
    if n_tokens < 20:
        return "too_short"
    if stopword_ratio <= 0.01:
        return "low_stopword"
    return "ok"


# GPT-2-style pre-tokenizer shape: contractions, letter runs, digit
# runs, non-space symbol runs (RE2-compatible — no lookarounds — so the
# DuckDB oracle runs the IDENTICAL pattern)
# digit RUNS ([0-9]+), like GPT-2's ` ?\p{N}+` — single-digit pieces
# would inflate the token-budget proxy ~4x on numeric text
BPE_PRETOKEN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
_BPE = re.compile(BPE_PRETOKEN)


def bpe_token_count(text: str) -> int:
    """Pre-tokenizer piece count — the standard fast proxy for BPE token
    budgets (each piece splits into ≥1 BPE tokens; piece count is the
    scheduling/truncation metric a data pipeline actually uses)."""
    return len(_BPE.findall(text))


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


# --- rolling-hash fingerprint (vectorized polynomial hash) -----------------

_FP_BASE = np.uint64(257)
_FP_MOD = np.uint64(2**31 - 1)


def rolling_min_hash(text: str, k: int = 16) -> int:
    """Minimum polynomial rolling hash over all k-char windows — a
    content-defined fingerprint robust to local edits (winnowing-style).
    O(n) vectorized; returns an int in [0, 2^31)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(b)
    if n == 0:
        return 0
    if n <= k:
        h = np.uint64(0)
        for c in b:
            h = (h * _FP_BASE + c) % _FP_MOD
        return int(h)
    # prefix hashes H[i] = hash(text[:i]); window = (H[i+k] - H[i]*B^k) mod M
    H = np.zeros(n + 1, dtype=np.uint64)
    for i in range(n):  # scalar mod-loop; acceptable (cheap vs regex work)
        H[i + 1] = (H[i] * _FP_BASE + b[i]) % _FP_MOD
    Bk = np.uint64(pow(int(_FP_BASE), k, int(_FP_MOD)))
    win = (H[k:] + (_FP_MOD * _FP_MOD - (H[:-k] * Bk) % _FP_MOD)) % _FP_MOD
    return int(win.min())


_DOC_STATS_EMPTY = pd.DataFrame(
    {
        "n_chars": pd.Series(dtype="int64"),
        "n_tokens": pd.Series(dtype="int64"),
        "mean_token_len": pd.Series(dtype="float64"),
        "stopword_ratio": pd.Series(dtype="float64"),
        "punct_count": pd.Series(dtype="int64"),
        "lang_pred": pd.Series(dtype="object"),
        "quality": pd.Series(dtype="object"),
    }
)


def doc_stats_frame(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Batch helper for map_batches(batch_format='pandas'). Tokenizes
    each text ONCE (quality + language share the split); empty batches
    return the full 7-column schema (pd.DataFrame([]) has no columns,
    which breaks block-schema unification)."""
    if df.empty:
        return _DOC_STATS_EMPTY.copy()
    tok_lists = [tokens(t) for t in df[text_col]]
    rows = [quality_stats(t, tk) for t, tk in zip(df[text_col], tok_lists)]
    out = pd.DataFrame(rows, index=df.index)
    out["lang_pred"] = [
        predict_lang(t, tk) for t, tk in zip(df[text_col], tok_lists)
    ]
    out["quality"] = [
        quality_label(r["n_tokens"], r["stopword_ratio"]) for r in rows
    ]
    return out


def repetition_frame(
    df: pd.DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> pd.DataFrame:
    """Gopher-style per-document repetition signals (Rae et al. 2021
    §A1.1 use duplicate-line/most-common-n-gram fractions as quality
    filters): token count, distinct tokens, most-common token count,
    most-common bigram count, duplicate-token ratio.

    Fully vectorized per batch (explode + groupby on the batch index —
    no Python loop over rows, no shuffle: every doc is wholly inside
    its batch). The SQL oracle replays it with UNNEST + window-free
    GROUP BYs, so the driver verifies it value-exact.
    """
    toks = df[text_col].astype(str).str.strip().str.split()
    n_tokens = toks.str.len().astype("int64")
    ex = toks.explode().dropna()
    grp = ex.groupby(level=0)
    n_distinct = grp.nunique()
    top_token = ex.groupby([ex.index, ex]).size().groupby(level=0).max()
    nxt = grp.shift(-1)
    big = (ex + " " + nxt).dropna()
    if len(big):
        top_big = big.groupby([big.index, big]).size().groupby(level=0).max()
    else:
        top_big = pd.Series(dtype="int64")
    idx = df.index
    out = pd.DataFrame({
        id_col: df[id_col],
        "n_tokens": n_tokens,
        "n_distinct": n_distinct.reindex(idx).fillna(0).astype("int64"),
        "top_token_n": top_token.reindex(idx).fillna(0).astype("int64"),
        "top_bigram_n": top_big.reindex(idx).fillna(0).astype("int64"),
    })
    nt = out["n_tokens"].to_numpy(np.float64)
    nd = out["n_distinct"].to_numpy(np.float64)
    out["dup_ratio"] = np.where(nt > 0.0, 1.0 - nd / np.maximum(nt, 1.0), 0.0)
    return out
