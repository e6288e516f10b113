"""Training-corpus curation: eval-set decontamination + deterministic
stratified sampling.

Reference precedent: the reference curates its input with row
predicates and existence joins (SURVEY M13/J5 —
``src/BioOntologyKG/importers/readcube/import_readcube_papers.py:145-167``
drops non-curated / already-imported records before upsert). These
stages are the LLM-training-data counterparts of that gatekeeping:

* ``contamination_flags`` — GPT-3-appendix-C-style decontamination:
  flag corpus documents that share any word n-gram with a benchmark
  (eval) set, so they can be excluded from training shards.
* ``stratified_sample`` — deterministic mixture sampling: keep each
  document with a per-group probability, decided by a stable hash of
  the document id (NOT a random draw), so the sample is reproducible
  under any row order, resharding, or incremental append — the same
  property ``train_val_split`` relies on.

100-TB shape
------------
The eval set is the SMALL side by nature (benchmark suites are KBs-MBs
against a 100-TB corpus): its distinct n-gram hashes are collected once
(bounded by eval size, never by corpus size), ``ray.put`` once, and
probed per batch with a vectorized sorted-array membership test — the
broadcast-small-side pattern, no shuffle touches the corpus. Sampling
is embarrassingly parallel (pure per-batch filter, zero exchange).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data

from bioontologykg_ray.functions.hashing import md5_low64


def _word_ngram_hashes(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All word n-grams across a batch of texts → (row_idx, md5_low64)
    pairs, deduplicated WITHIN each row.

    Construction is vectorized: one explode to a flat token array, then
    n-1 shifted string concatenations build every n-gram in one pass;
    only the *unique* n-gram strings of the batch are md5-hashed (md5 is
    kept for DuckDB ``md5_number_lower`` oracle parity; any stable
    64-bit hash works at scale).
    """
    toks = texts.fillna("").str.split()
    ex = toks.explode().dropna()
    if len(ex) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.uint64))
    row = ex.index.to_numpy()          # batch row index per token
    tok = ex.to_numpy(dtype=object)
    m = len(tok) - (n - 1)
    if m <= 0:
        return (np.empty(0, np.int64), np.empty(0, np.uint64))
    # n-gram i spans tokens i..i+n-1; valid only when it stays in-row
    valid = row[: m] == row[n - 1:]
    gram = tok[:m].copy()
    for k in range(1, n):
        gram = np.char.add(np.char.add(gram.astype(str), " "), tok[k: m + k].astype(str))
    gram = gram[valid]
    rows = row[:m][valid]
    # hash unique strings once, then scatter back
    uniq, inv = np.unique(gram, return_inverse=True)
    uh = np.fromiter((md5_low64(g) for g in uniq), dtype=np.uint64, count=len(uniq))
    h = uh[inv]
    # dedupe (row, hash) pairs so hit counts are per-DISTINCT-n-gram
    pairs = np.unique(np.stack([rows.astype(np.int64), h.view(np.int64)], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1].view(np.uint64)


def eval_ngram_hashes(
    eval_ds: ray.data.Dataset, text_col: str = "text", n: int = 8
) -> np.ndarray:
    """Distinct word-n-gram hashes of the eval set, as a SORTED uint64
    array. Driver memory is bounded by the EVAL set (the small side),
    never the corpus."""
    parts = [
        np.unique(_word_ngram_hashes(b[text_col], n)[1])
        for b in eval_ds.select_columns([text_col]).iter_batches(
            batch_format="pandas", batch_size=4096
        )
    ]
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(parts))


def contamination_flags(
    ds: ray.data.Dataset,
    eval_hashes_ref,
    *,
    text_col: str = "text",
    n: int = 8,
) -> ray.data.Dataset:
    """Appends an ``n_hits`` column: the number of DISTINCT word
    n-grams of the document that appear in the eval set (all input
    columns are preserved, so the stage composes into filter chains).
    ``eval_hashes_ref`` is ``ray.put`` of the sorted array from
    :func:`eval_ngram_hashes` (shipped once, shared zero-copy by every
    task). Every input document appears in the output (0 hits for clean
    or too-short docs)."""

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        ev = ray.get(eval_hashes_ref) if not isinstance(eval_hashes_ref, np.ndarray) else eval_hashes_ref
        hits = np.zeros(len(df), dtype=np.int64)
        rows, h = _word_ngram_hashes(df[text_col].reset_index(drop=True), n)
        if len(h) and len(ev):
            # true binary-search probe against the SORTED eval array
            # (np.isin would re-sort both sides per batch)
            idx = np.searchsorted(ev, h)
            idx_c = np.minimum(idx, len(ev) - 1)
            m = rows[(idx < len(ev)) & (ev[idx_c] == h)]
            if len(m):
                np.add.at(hits, m, 1)
        return df.assign(n_hits=hits)

    return ds.map_batches(flag, batch_format="pandas")


def stratified_sample(
    ds: ray.data.Dataset,
    rates: dict[str, float],
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    buckets: int = 10_000,
) -> ray.data.Dataset:
    """Deterministic per-group downsampling: a row survives iff
    ``md5_low64("sample:" + str(id)) % buckets < rate[group] * buckets``.
    The purpose salt ("sample:") keeps this decision INDEPENDENT of the
    other hash-bucketed decisions over the same ids (eval holdout,
    train/val/test split) — an unsalted shared hash correlates them
    perfectly (e.g. any sample rate ≤ 0.9% would force every survivor
    into the unsalted %100 split's 'train' bucket, leaving val/test
    empty). A pure per-batch filter — no shuffle, no RNG, stable under
    resharding; rerunning or appending data never resamples survivors."""
    thresh = {g: int(round(r * buckets)) for g, r in rates.items()}
    default_t = int(round(default_rate * buckets))

    # arrow blocks: zero-copy filter, and empty output slices size
    # cleanly (empty OBJECT-dtype pandas blocks trip Ray's np.vectorize
    # size estimator into log noise)
    def keep(t) -> "ray.data.block.Block":
        import pyarrow as pa

        b = np.fromiter(
            (md5_low64("sample:" + str(i)) % buckets for i in t[id_col].to_pylist()),
            dtype=np.int64, count=t.num_rows,
        )
        lim = np.fromiter(
            (thresh.get(g, default_t) for g in t[group_col].to_pylist()),
            dtype=np.int64, count=t.num_rows,
        )
        return t.filter(pa.array(b < lim))

    return ds.map_batches(keep, batch_format="pyarrow")


# --------------------------------------------------------------------------
# C4-style segment-level corpus dedup
# --------------------------------------------------------------------------

def segment_explode(
    ds: ray.data.Dataset,
    *,
    window: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Split each document into consecutive NON-overlapping ``window``-
    word segments (the C4 paper dedups at the three-sentence level; on
    unstructured text the fixed word window is the deterministic
    analogue). Trailing partial windows are dropped. Output rows:
    (id_col, seg_idx, seg). Pure per-batch map — no exchange."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        # split on the single-space delimiter (NOT whitespace runs) so
        # the SQL oracle's string_split(text, ' ') sees identical tokens
        words = df[text_col].fillna("").str.split(" ")
        n_segs = (words.str.len() // window).to_numpy()
        reps = np.repeat(np.arange(len(df)), n_segs)
        seg_idx = (
            np.concatenate([np.arange(n) for n in n_segs])
            if len(df) else np.empty(0, np.int64)
        )
        wl = words.to_numpy(dtype=object)
        segs = [
            " ".join(wl[r][i * window:(i + 1) * window])
            for r, i in zip(reps, seg_idx)
        ]
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy()[reps],
                "seg_idx": seg_idx.astype(np.int64),
                "seg": pd.Series(segs, dtype="object"),
            }
        )

    return ds.map_batches(explode, batch_format="pandas")


def segment_dedup(
    ds: ray.data.Dataset,
    *,
    window: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Corpus-LEVEL segment dedup with document reassembly (C4 §2.2
    "deduplicate ... discarding all but one of any three-sentence span
    occurring more than once"): a segment survives iff it is the
    lexicographically first occurrence (min (doc_id, seg_idx)) of its
    text across the WHOLE corpus; every document is then rebuilt from
    its surviving segments in order.

    Output: one row per document that has >= 1 full segment —
    (id_col, n_segments, n_kept, clean_text). ``clean_text`` is ''
    when every segment lost.

    100-TB shape: two keyed exchanges over the exploded segment stream
    (by segment for winner marking, by doc for reassembly) — both via
    ``sorted_group_apply(hash_sort=True)`` range-sorts over a uint64
    key hash; nothing corpus-derived touches the driver.
    """
    from bioontologykg_ray.stages.agg import sorted_group_apply

    exploded = segment_explode(
        ds, window=window, id_col=id_col, text_col=text_col
    )

    def mark_winners(df: pd.DataFrame) -> pd.DataFrame:
        # receives complete seg groups; first occurrence after the
        # (seg, doc, idx) sort is the global keeper for that segment
        df = df.sort_values(["seg", id_col, "seg_idx"])
        return df.assign(kept=~df.duplicated("seg"))

    marked = sorted_group_apply(exploded, "seg", mark_winners, hash_sort=True)

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype=df[id_col].dtype if id_col in df else "int64"),
                    "n_segments": pd.Series(dtype="int64"),
                    "n_kept": pd.Series(dtype="int64"),
                    "clean_text": pd.Series(dtype="object"),
                }
            )
        df = df.sort_values([id_col, "seg_idx"])
        g = df.groupby(id_col)
        out = pd.DataFrame(
            {
                "n_segments": g.size().astype("int64"),
                "n_kept": g["kept"].sum().astype("int64"),
            }
        )
        txt = df[df["kept"]].groupby(id_col)["seg"].agg(" ".join)
        out["clean_text"] = out.index.map(txt).fillna("")
        return out.reset_index()

    return sorted_group_apply(marked, id_col, assemble, hash_sort=True)


# =========================================================================
# PII redaction — scrub emails / phone numbers / IPv4 addresses before a
# corpus enters training shards. Reference precedent: the reference's
# per-field cleanup transforms (SURVEY M3/M8 — brace stripping, empty→null
# casts) are the same shape: a pure vectorized rewrite of one text column.
#
# The rule strings live HERE and are interpolated verbatim into the DuckDB
# oracle SQL — one source of truth, and the subset of regex syntax used
# (character classes, \d, \b, bounded repeats; no lookaround/backrefs)
# behaves identically under Python `re` and DuckDB's RE2.
#
# 100-TB shape: pure per-batch map, zero exchange, patterns compiled once
# per worker process at module import.
# =========================================================================

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Order matters and is part of the contract: emails are scrubbed first
# (a phone-shaped local part like `555-123-4567@x.io` redacts as ONE
# email, not a phone inside an address), phones before IPv4. Numeric
# hosts (`c@1.2.3.4`) are not emails under the rule (alphabetic TLD
# required); their host redacts as an IPv4.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", PII_EMAIL, "<EMAIL>"),
    ("phone", PII_PHONE, "<PHONE>"),
    ("ipv4", PII_IPV4, "<IP>"),
)

_PII_COMPILED = tuple((name, re.compile(pat), repl) for name, pat, repl in PII_RULES)


def redact_pii(
    ds: ray.data.Dataset, text_col: str = "text", out_col: str = "clean_text"
) -> ray.data.Dataset:
    """Scrub PII from ``text_col`` → ``out_col``; adds an int64
    ``n_<rule>`` match count per rule (counted on the text as each rule
    sees it, i.e. after the preceding rules' replacements)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").astype(str)
        for name, pat, repl in _PII_COMPILED:
            df["n_" + name] = s.str.count(pat).astype(np.int64)
            s = s.str.replace(pat, repl, regex=True)
        df[out_col] = s
        return df

    return ds.map_batches(fn, batch_format="pandas")


def global_shuffle(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> ray.data.Dataset:
    """Deterministic global training-order shuffle: order every row by
    a stable hash of its id, then stripe round-robin into ``n_shards``
    balanced shards → (id, shard, pos_in_shard).

    This is the "shuffle the corpus before training" step done without
    RNG state: the order is a pure function of the ids, so it is
    reproducible across reruns, resharding and incremental appends
    (appended rows interleave into the same global order). The global
    rank comes from the distributed prefix-sum scan (stages/scan.py:
    per-block offsets are O(#blocks) driver state, never O(#rows)).

    Contract: ids are UNIQUE (duplicate ids share a hash and violate
    prefix_sum's unique-order-key assumption — run exact dedup first on
    dirty corpora). Hash collisions would alias two rows' order too;
    with 64-bit md5 that is negligible below ~1e9 rows per shuffle —
    shuffle per shard-group beyond that, or widen the hash."""
    from bioontologykg_ray.stages.scan import prefix_sum

    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "__h": np.fromiter(
                    (md5_low64(str(i)) for i in df[id_col]),
                    dtype=np.uint64, count=len(df),
                ),
                "__one": np.ones(len(df), dtype=np.int64),
            }
        )

    ranked = prefix_sum(
        ds.map_batches(add_h, batch_format="pandas"), "__h", "__one", out_col="__r"
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        pos = df["__r"].to_numpy(np.int64) - 1  # inclusive sum → 0-based rank
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "shard": pos % np.int64(n_shards),
                "pos_in_shard": pos // np.int64(n_shards),
            }
        )

    return ranked.map_batches(finish, batch_format="pandas")
